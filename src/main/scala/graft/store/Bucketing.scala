package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Co-located (shuffle-free) joins via bucketing.
  *
  * At 100 TB the dominant cost of a fact-fact join is the shuffle of both
  * sides. Writing both tables bucketed by the join key with the same bucket
  * count lets Spark plan a SortMergeJoin with NO Exchange on either side —
  * each task joins bucket i of A against bucket i of B. The write pays the
  * shuffle once; every subsequent join reads co-located.
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. The resulting plan
    * must contain no Exchange over either scan (asserted in BucketingSpec). */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
