package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.ops.Skew
import graft.store.Bucketing

/** Bucketed joins must plan without a shuffle; salted joins must equal the
  * plain join. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // orphaned managed-table dirs survive across JVMs (in-memory catalog)
    val loc = new java.io.File(s"spark-warehouse/$name")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
  }

  test("co-located join over same-bucketed tables has no shuffle exchange") {
    dropTable("b_left"); dropTable("b_right")
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "b_left", "k", 8, sortCol = Some("k"))
    Bucketing.writeBucketed(right, "b_right", "k", 8, sortCol = Some("k"))
    val joined = Bucketing.colocatedJoin(spark, "b_left", "b_right", "k")
    assert(joined.count() === 1000)
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, s"expected shuffle-free bucketed join, got:\n${joined.queryExecution.executedPlan}")
  }

  test("salted join equals plain join under heavy key skew") {
    // 10k rows all on 3 keys — pathological skew
    val large = (1 to 10000).map(i => (i % 3L, i)).toDF("k", "payload")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "tag")
    val plain = large.join(small, Seq("k")).groupBy($"tag").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedJoin(large, small, "k", n = 8).groupBy($"tag").count()
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }

  test("hotKeys finds the pathological keys") {
    val df = ((1 to 1000).map(_ => 42L) ++ (1L to 100L)).toDF("k")
    val hot = Skew.hotKeys(df, "k", threshold = 10.0).as[(Long, Long)].collect()
    assert(hot.map(_._1).toSeq === Seq(42L))
  }
}
