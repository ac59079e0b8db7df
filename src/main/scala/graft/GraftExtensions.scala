package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{CosineSimilarity, MinKDistinctLongs, NfcNormalize,
  TopKDoubles}

/** SparkSessionExtensions entry point: exposes the engine's native
  * expressions to SQL users.
  *
  * Install with either
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`. The DataFrame API
  * ([[graft.expressions.VectorExpressions]]) works without installation.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("topk_vals"),
      new ExpressionInfo(classOf[TopKDoubles].getName, "topk_vals"),
      (exprs: Seq[Expression]) =>
        TopKDoubles(exprs.head, exprs(1)).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("mink_distinct"),
      new ExpressionInfo(classOf[MinKDistinctLongs].getName, "mink_distinct"),
      (exprs: Seq[Expression]) =>
        MinKDistinctLongs(exprs.head, exprs(1)).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[graft.expressions.JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) =>
        graft.expressions.JaroWinkler(exprs.head, exprs(1))))
    // optimizer tier: the unbounded-buffer top-k idiom rewrites to the
    // bounded aggregate automatically (see BoundedTopKRewrite's contract)
    e.injectOptimizerRule(_ => graft.plans.BoundedTopKRewrite)
  }
}
