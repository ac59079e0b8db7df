package graft

import org.apache.spark.sql.SparkSession

/** Plan observability: print the formatted physical plan of selected
  * `SparkEntry.queries` entries without executing them — the iterate-on-
  * the-plan loop ("explain until it's the plan you'd want, not the first
  * one that passed") as a one-liner.
  *
  * Usage: runMain graft.Explain <sfDir> <name1,name2,...>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((n, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if names.forall(_.contains(n))) {
      println(s"\n=== $n ===")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"FAILED to plan: ${e.getMessage}") }
    }
    spark.stop()
  }
}
