package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Optimizer-rule tier: BoundedTopKRewrite contract. */
class PlansSpec extends SparkSpec {

  private def withExtSession[A](f: SparkSession => A): A = {
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder().master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("rewrites the slice/sort/collect_list idiom to the bounded aggregate, both sort spellings") {
    withExtSession { s =>
      import s.implicits._
      val df = (1 to 300).map(i => (i % 5, (i * 17 % 83).toDouble)).toDF("g", "v")
      val viaSortArray = df.groupBy($"g")
        .agg(collect_list($"v").as("l"))
        .select($"g", slice(sort_array($"l", asc = false), 1, 3).as("t"))
      val viaArraySort = df.groupBy($"g")
        .agg(collect_list($"v").as("l"))
        .select($"g", slice(reverse(array_sort($"l")), 1, 3).as("t"))
      for (q <- Seq(viaSortArray, viaArraySort)) {
        val opt = q.queryExecution.optimizedPlan.toString
        assert(opt.contains("topk_vals"), s"rewrite fired:\n$opt")
        assert(!opt.contains("collect_list"), s"unbounded buffer gone:\n$opt")
      }
      // results identical to the un-extended engine's idiom
      val expect = df.groupBy($"g")
        .agg(graft.expressions.TopKAggregate.topkVals($"v", 3).as("t"))
        .select($"g", $"t").as[(Int, Seq[Double])].collect().toMap
      val got = viaSortArray.as[(Int, Seq[Double])].collect().toMap
      assert(got === expect)
    }
  }

  test("declines when the raw list escapes, or the column is not double") {
    withExtSession { s =>
      import s.implicits._
      val df = (1 to 50).map(i => (i % 3, i.toDouble)).toDF("g", "v")
      val escapes = df.groupBy($"g").agg(collect_list($"v").as("l"))
        .select($"g", slice(sort_array($"l", asc = false), 1, 3).as("t"), size($"l").as("n"))
      assert(escapes.queryExecution.optimizedPlan.toString.contains("collect_list"))
      // escape keeps full semantics: n is the GROUP size, not k
      assert(escapes.collect().map(_.getInt(2)).toSet.max > 3)
      val ints = (1 to 50).map(i => (i % 3, i)).toDF("g", "v")
        .groupBy($"g").agg(collect_list($"v").as("l"))
        .select(slice(sort_array($"l", asc = false), 1, 3))
      assert(ints.queryExecution.optimizedPlan.toString.contains("collect_list"))
    }
  }
}
