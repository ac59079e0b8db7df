package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native, codegen'd expression.
  *
  * Why an expression at all (the engine's no-UDF discipline): text landing
  * from heterogeneous scrapers mixes composed ("é") and decomposed
  * ("e"+U+0301) encodings of the SAME text, which silently breaks every
  * byte-keyed operator downstream — exact dedup fingerprints (d1), shingle
  * hashes (d2/d11), groupBy keys, sort orders. Canonicalizing to NFC at
  * ingest is the standard fix; Spark ships no builtin for it (DuckDB has
  * `nfc_normalize`), and a Scala UDF would drop the surrounding projection
  * out of whole-stage codegen on exactly the wide-scan path where this
  * runs. `java.text.Normalizer` implements the same Unicode 15 canonical
  * composition tables DuckDB's `utf8proc` does, so the cross-engine oracle
  * contract holds by both implementing the same published standard.
  *
  * Null-safe; non-string inputs are a type-check error, not a cast. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string input, got ${other.sql}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Column-level entry point. */
  def nfcNormalize(s: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(s)))
}
