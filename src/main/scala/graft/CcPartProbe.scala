package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERDICT r13 item 7 probe: does pre-partitioning the checkpointed CC edge
  * relation by `dst` remove the per-round edges exchange once the labels
  * side stops broadcasting (the 100 TB regime)?
  *
  * Replays [[graft.ops.DedupOps.connectedComponents]]'s loop body verbatim
  * over the d6 LSH pair graph at ScaleGen sf1 with
  * `spark.sql.autoBroadcastJoinThreshold=-1` (forcing the at-scale
  * sort-merge regime), A/B: edges checkpointed as-is vs
  * `repartition($"dst")` before the checkpoint. Prints one round's
  * formatted join plan (grep the edges side for Exchange) and the loop
  * wall time for each arm. Observability tooling only.
  *
  * Usage: runMain graft.CcPartProbe [sfDir]
  */
object CcPartProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sigs = graft.ops.DedupOps.signatures(docs, "doc_id", "text", 16).cache()
    val pairs = graft.ops.DedupOps.pairsFromSignatures(sigs, 16, 4)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b")).localCheckpoint() // shared input
    println(s"pairs: ${pairs.count()}")

    def loop(tag: String, prePartition: Boolean): Unit = {
      val t0 = System.nanoTime()
      val edgesRaw = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct()
      val edges = (if (prePartition) edgesRaw.repartition(col("dst")) else edgesRaw)
        .localCheckpoint()
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")).localCheckpoint()
      def labelSum(df: DataFrame): java.math.BigDecimal =
        df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)"))).head().getDecimal(0)
      var prevSum = labelSum(labels)
      var converged = false
      var rounds = 0
      var printed = false
      while (!converged && rounds < 25) {
        val nbrMin = edges
          .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
          .groupBy(col("src").as("id")).agg(min(col("nl")).as("nl"))
        val next = labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        if (!printed) {
          println(s"--- $tag round-0 plan ---")
          next.explain("formatted")
          printed = true
        }
        labels = next.localCheckpoint(eager = false)
        val s = labelSum(labels)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        rounds += 1
      }
      println(f"RESULT $tag rounds=$rounds sum=$prevSum " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }

    // warm both arms once (codegen/JIT), then measure
    loop("warmup-plain", prePartition = false)
    loop("plain", prePartition = false)
    loop("prepart", prePartition = true)
    loop("plain2", prePartition = false)
    loop("prepart2", prePartition = true)
    spark.stop()
  }
}
