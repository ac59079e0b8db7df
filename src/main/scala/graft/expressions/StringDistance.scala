package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared Jaro-Winkler runtime: called from both the interpreted
  * `nullSafeEval` and the generated code, so the two paths cannot drift.
  *
  * Semantics pinned to the classic Winkler formulation (the one DuckDB /
  * RapidFuzz implement, verified empirically against
  * `jaro_winkler_similarity` on boundary cases):
  *   - match window = max(|a|,|b|)/2 - 1 (floor, min 0);
  *   - transpositions = half the out-of-order count among matched chars;
  *   - jaro = (m/|a| + m/|b| + (m-t)/m) / 3, 0 when m = 0 (so two empty
  *     strings score 0, matching DuckDB, not the "1.0" some libraries use);
  *   - Winkler prefix boost `jw = j + l·0.1·(1-j)` applied only when
  *     jaro > 0.7, with the common-prefix length l capped at 4.
  *
  * Operates on Java chars (UTF-16 units). For the corpus this engine
  * normalizes at ingest (NFC via [[NfcNormalize]]) that matches DuckDB's
  * codepoint walk on everything below the astral planes; supplementary
  * characters would count as two units — acceptable for a
  * typo/variant-mining score, documented rather than hidden.
  */
object StringDistanceRuntime {
  def jaroWinkler(aU: UTF8String, bU: UTF8String): Double = {
    val a = aU.toString
    val b = bU.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // Out-of-order count among matched characters, walked in tandem.
    var k = 0
    var outOfOrder = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) outOfOrder += 1
        k += 1
      }
      i += 1
    }
    val t = outOfOrder / 2.0
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (l < maxPrefix && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Native Jaro-Winkler similarity over two string columns.
  *
  * Spark ships `levenshtein` but no Jaro-Winkler; DuckDB has
  * `jaro_winkler_similarity` as a builtin. A Scala UDF would box both
  * strings per row and break whole-stage codegen in the blocked self-join
  * where this runs |bucket|² times; this expression stays inside the
  * generated plan (the generated code calls the same static runtime the
  * interpreted path uses — one implementation, two entry points).
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires two string inputs, got ${l.sql} / ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceRuntime.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.StringDistanceRuntime.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringDistance {
  /** Column-level entry point. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftBridge.column(
      JaroWinkler(GraftBridge.expression(a), GraftBridge.expression(b)))
}
