package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.DedupOps

/** Warm same-JVM A/B of the alternating-CC convergence check (VERDICT r6
  * #5): the round-5 per-round `count + except` pair vs the round-6 single
  * commutative signature aggregate (+ one authoritative `except` at the
  * probed fixpoint). Runs both variants interleaved on the d6b input
  * (sf0.1 LSH pairs at est_jaccard >= 0.5) and reports wall time and Spark
  * job counts per run. Test-scope main:
  *   sbt "Test/runMain graft.tools.AbConvergence"
  */
object AbConvergence {

  /** The round-5 loop body, verbatim semantics: count+except every round. */
  private def alternatingOldCheck(pairs: DataFrame, maxIter: Int = 40): DataFrame = {
    val nodes = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id"))).distinct().localCheckpoint()
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val m = sym.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      sym.join(m, "src").filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      val withM = e.join(m, "src")
      withM.select(col("dst").as("src"), col("m").as("dst"))
        .union(m.select(col("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
    }
    var edges = pairs
      .select(greatest(col("id_a"), col("id_b")).as("src"),
        least(col("id_a"), col("id_b")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      converged = next.count() == edges.count() && next.except(edges).isEmpty
      edges = next
      rounds += 1
    }
    require(converged)
    nodes.join(edges.select(col("src").as("id"), col("dst").as("cluster_id")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    // d6b's real input is small (hundreds-thousands of edges) — there the
    // check cost is all fixed job overhead. `synthetic` mode builds a path
    // graph (worst-case round count, every round's except shuffles the full
    // edge relation) at a size where the per-round cost is data, not
    // overhead: N-1 edges over N nodes, ~log2(N) alternating rounds.
    val pairs = (if (args.contains("synthetic")) {
      val n = sys.env.getOrElse("SPARK_GRAFT_AB_NODES", "2000000").toLong
      spark.range(n - 1).select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    } else {
      val docs = Tables.documents(spark, sfDir)
      val sigs = DedupOps.signatures(docs, "doc_id", "text", 16)
      DedupOps.pairsFromSignatures(sigs, 16, 4)
        .filter(col("est_jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"))
    }).localCheckpoint() // shared, prepaid

    def time(name: String)(f: => DataFrame): Unit = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val n = f.count()
      println(f"[ab] $name%-10s wall=${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        f"jobs=${jobs.get() - j0}%3d rows=$n")
    }
    // warm both code paths once, then interleave measured runs
    time("warm-new")(DedupOps.connectedComponentsAlternating(pairs))
    time("warm-old")(alternatingOldCheck(pairs))
    for (i <- 1 to 3) {
      time(s"new-$i")(DedupOps.connectedComponentsAlternating(pairs))
      time(s"old-$i")(alternatingOldCheck(pairs))
    }
    spark.stop()
  }
}
