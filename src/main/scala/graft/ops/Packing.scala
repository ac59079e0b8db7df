package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concatenate documents (in a total
  * key order) into one token stream and slice it into fixed-budget training
  * sequences, letting documents split across sequence boundaries — the
  * standard dataloader packing that wastes zero pad tokens. The assignment
  * is pure arithmetic over the exclusive global running sum of token
  * counts, so it needs exactly one scalable primitive:
  * [[Ranking.globalRunningSum]] (two-pass, no single-partition window).
  */
object Packing {

  /** Per-doc sequence assignment under `budget` tokens per sequence:
    * `seq_first`/`seq_last` = ids of the first/last training sequence the
    * doc lands in, `n_splits` = how many boundaries cut it. Empty docs
    * attach to `seq_first` with no splits. */
  def sequenceAssignments(docs: DataFrame, orderCols: Seq[Column],
                          tokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    Ranking.globalRunningSum(
        docs.withColumn("__toks", tokensCol.cast("long")),
        orderCols, col("__toks"), "__off")
      .withColumn("seq_first", expr(s"__off div $budget"))
      .withColumn("seq_last",
        when(col("__toks") <= 0, col("seq_first"))
          .otherwise(expr(s"(__off + __toks - 1) div $budget")))
      .withColumn("n_splits", col("seq_last") - col("seq_first"))
      .drop("__off", "__toks")
  }
}
