package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed (a hot
  * user, a null-ish default key, one viral document).
  *
  * [[saltedJoin]] implements the classic salt-and-replicate scheme: the
  * skewed (large) side gets a random salt in [0, n); the small side is
  * replicated n times, once per salt value; the join key becomes
  * (key, salt), spreading each hot key over n tasks. AQE's runtime skew-join
  * handles moderate skew automatically; salting is the deterministic
  * plan-level tool for known-pathological keys.
  */
object Skew {

  /** Replicate `small` across `n` salt values and join against `large`
    * salted uniformly at random. Result equals a plain inner/left join on
    * `key` (salt columns are dropped). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, n: Int,
                 joinType: String = "inner"): DataFrame = {
    require(n > 0)
    val salted = large.withColumn("__salt", (rand(seed = 7) * n).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Flag keys whose frequency exceeds `threshold` × the mean — the
    * discovery half: run on a sample, feed the hot-key list to a targeted
    * salt or a broadcast-isolate plan. */
  def hotKeys(df: DataFrame, key: String, threshold: Double = 10.0): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val meanRow = counts.agg(avg(col("cnt"))).head()
    if (meanRow.isNullAt(0)) counts // empty input → no hot keys
    else counts.filter(col("cnt") >= meanRow.getDouble(0) * threshold)
  }
}
