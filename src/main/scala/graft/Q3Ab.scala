package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Exact

/** Throwaway A/B: q3_top_orders old (join-then-agg) vs new (eager agg)
  * with interleaved shots, min-merged. */
object Q3Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-testdata/sf31")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def oldShape() = {
      val c = broadcast(Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING"))
      val o = Tables.orders(spark, sfDir)
      val l = Tables.lineitem(spark, sfDir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(Exact.sumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }
    def newShape() = SparkEntry.queries("q3_top_orders")(spark, sfDir)
    // variant 3: post-join agg (old) but orders semi-shrunk + projected
    // before its exchange
    def v3Shape() = {
      val c = broadcast(Tables.customer(spark, sfDir)
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey")))
      val o = Tables.orders(spark, sfDir)
        .join(c, col("o_custkey") === col("c_custkey")).select(col("o_orderkey"))
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(Exact.sumD(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }

    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val shots = (1 to reps).map { _ =>
      (timeIt(oldShape().collect()), timeIt(newShape().collect()), timeIt(v3Shape().collect()))
    }
    val o = shots.map(_._1).min; val n = shots.map(_._2).min; val v = shots.map(_._3).min
    println(f"""{"metric":"q3_ab","sf":"$sfDir","old_sec":$o%.2f,"new_sec":$n%.2f,"v3_sec":$v%.2f,"reps":$reps}""")
    spark.stop()
  }
}
