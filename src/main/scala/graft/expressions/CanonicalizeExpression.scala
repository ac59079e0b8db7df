package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The C4/mC4 canonical-normalization kernel (d15) as ONE codegen'd
  * single-pass expression:
  *
  *   lower → non-[a-z0-9 ] → ' ' → collapse space runs → trim
  *
  * Declared as a 3-step `regexp_replace` chain, the same transform walks
  * the regex engine over every byte of the corpus three times and
  * materializes two intermediate strings per row — measured as the
  * dominant cost of the d15 scan at the 100× sweep scale. This kernel
  * emits the canonical form in one allocation-free byte pass for ASCII
  * input (the entire synthetic corpus, and the overwhelming bulk of any
  * real web corpus after NFC), and falls back to the EXACT original
  * chain — `UTF8String.toLowerCase` (what Spark's `lower` calls) plus the
  * same `java.util.regex` patterns `regexp_replace` compiles — the moment
  * a row contains a non-ASCII byte, so the two forms are behaviorally
  * identical on every input, not just the tested ones (the Kelvin-sign
  * K→k and İ-decomposition lowercasing edge cases live only on the
  * fallback path, where the original code handles them bit-for-bit).
  *
  * Null-safe; non-string inputs are a type-check error, not a cast.
  */
case class AsciiCanon(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ascii_canon requires a string input, got ${other.sql}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "ascii_canon"

  override def nullSafeEval(input: Any): Any =
    AsciiCanon.canon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.AsciiCanon.canon($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AsciiCanon {

  // the exact patterns the declarative chain compiled
  private val nonAlnum = java.util.regex.Pattern.compile("[^a-z0-9 ]")
  private val spaceRuns = java.util.regex.Pattern.compile(" +")
  private val edges = java.util.regex.Pattern.compile("^ +| +$")

  /** Static kernel shared by eval and generated code. */
  def canon(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    while (i < n) { // non-ASCII anywhere → bit-exact legacy path
      if (s.getByte(i) < 0) return canonFallback(s)
      i += 1
    }
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    i = 0
    while (i < n) {
      var c = s.getByte(i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = c
        o += 1
      } else pendingSpace = true // space and every other char: a run of gap
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** The original lower + 3-regex chain, verbatim (non-ASCII rows only). */
  private def canonFallback(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase.toString
    val noPunct = nonAlnum.matcher(lowered).replaceAll(" ")
    val collapsed = spaceRuns.matcher(noPunct).replaceAll(" ")
    UTF8String.fromString(edges.matcher(collapsed).replaceAll(""))
  }

  /** Column-level entry point. */
  def asciiCanon(s: Column): Column =
    GraftBridge.column(AsciiCanon(GraftBridge.expression(s)))
}
