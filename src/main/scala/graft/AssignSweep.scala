package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence harness for the two-tier IVF coarse quantizer: measures the
  * nearest-centroid ASSIGN cost of the flat (broadcast, N·nlist) form vs the
  * tiered (shuffle-join, ~N·(nlist1 + probeTop·nlist2)) form as nlist grows,
  * on a fixed corpus. Flat cost must grow ~linearly with nlist; tiered cost
  * must stay near-flat (both tiers bounded by ~sqrt(nlist) at the sweep's
  * sizing), which is the 100 TB argument for lifting the nlist <= 64
  * broadcast ceiling (VERDICT r8 #2 / round-9 task 1).
  *
  * Shots are INTERLEAVED flat/tiered within each rep and min-merged per
  * variant (docs/PLANS.md "ambient-spike methodology") so a background spike
  * cannot charge one variant and not the other.
  *
  * Usage: runMain graft.AssignSweep [sfDir] — one JSON line per nlist config
  * plus a summary line.
  */
object AssignSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-testdata/sf5")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val e = Tables.embeddings(spark, sfDir).cache()
    val n = e.count() // also materializes the cache outside the timings

    // (stride, topMult): nlist = n/stride, nlist1 = nlist/topMult ~ sqrt(nlist)
    val configs = Seq((1536L, 8), (384L, 16), (96L, 32), (24L, 64))

    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val rows = configs.map { case (stride, topMult) =>
      val cent = e.filter(col("vec_id") % stride === 0)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
      val top = e.filter(col("vec_id") % (stride * topMult) === 0)
        .select(col("vec_id").as("top_id"), col("embedding").as("top_vec"))
      val nlist = cent.count()
      val nlist1 = top.count()
      // force the full assign (the sum over assignments cannot be pruned)
      def runFlat(): Unit =
        graft.ops.SimilarityOps.assignToCentroids(e, cent, "vec_id", "embedding")
          .agg(sum(col("centroid_id"))).collect()
      def runTiered(): Unit =
        graft.ops.SimilarityOps.assignToCentroidsTiered(e, cent, top, "vec_id", "embedding")
          .agg(sum(col("centroid_id"))).collect()
      val shots = (1 to reps).map(_ => (timeIt(runFlat()), timeIt(runTiered())))
      val flatS = shots.map(_._1).min
      val tieredS = shots.map(_._2).min
      println(f"""{"metric":"assign_sweep","nlist":$nlist,"nlist1":$nlist1,"flat_sec":$flatS%.3f,"tiered_sec":$tieredS%.3f,"n":$n}""")
      (nlist, nlist1, flatS, tieredS)
    }
    val first = rows.head; val last = rows.last
    println(f"""{"metric":"assign_sweep_summary","n":$n,"nlist_growth":${last._1.toDouble / first._1}%.1f,"flat_growth":${last._3 / first._3}%.2f,"tiered_growth":${last._4 / first._4}%.2f}""")
    spark.stop()
  }
}
