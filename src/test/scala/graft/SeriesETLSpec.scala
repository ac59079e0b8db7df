package graft

import graft.batch.{SeriesETL, SplitSpec}

/** Golden scenario 4 (FIXTURES.md §6): n=100, p=5, K=4 →
  * train 75 / validation prefixes 80,85,90,95 / test-inputs 95 / targets 5;
  * plus the degenerate 5% fallback (preprocess.py:108-114). */
class SeriesETLSpec extends SparkSpec {
  import spark.implicits._

  test("split bounds: canonical n=100 p=5 K=4") {
    val b = SplitSpec.bounds(100, 5, 4)
    assert(b.p === 5)
    assert(b.trainLen === 75)
    assert(b.validationLens === Seq(80, 85, 90, 95))
    assert(b.testInputLen === 95)
    assert(b.testTargetLen === 5)
  }

  test("split bounds: degenerate fallback p = int(0.05 n)") {
    val b = SplitSpec.bounds(20, 5, 4) // 20 < 5*(4+1)+5 = 30 → p = int(1.0) = 1
    assert(b.p === 1)
    assert(b.trainLen === 15)
    assert(b.validationLens === Seq(16, 17, 18, 19))
    // tiny n → p can be 0 → empty target split, reproduced faithfully
    val z = SplitSpec.bounds(10, 5, 4)
    assert(z.p === 0)
    assert(z.testTargetLen === 0)
  }

  test("dataframe splits partition the series in order") {
    val df = (1 to 100).map(i => (f"m$i%03d", i.toDouble)).toDF("tx_minute", "v")
    val (train, vals, testIn, testTgt) = SeriesETL.split(df, "tx_minute", 5, 4)
    assert(train.count() === 75)
    assert(vals.map(_._2.count()) === Seq(80L, 85L, 90L, 95L))
    assert(testIn.count() === 95)
    val tgt = testTgt.orderBy("tx_minute").as[(String, Double)].collect()
    assert(tgt.map(_._2).toSeq === Seq(96.0, 97.0, 98.0, 99.0, 100.0))
  }

  test("toSeries collects ordered target array with start key") {
    val df = Seq(("2024-01-01 00:03", 3.0), ("2024-01-01 00:01", 1.0),
      ("2024-01-01 00:02", 2.0)).toDF("tx_minute", "v")
    val ts = SeriesETL.toSeries(df, "tx_minute", "v")(spark).collect()
    assert(ts.length === 1)
    assert(ts.head.start === "2024-01-01 00:01")
    assert(ts.head.target.toSeq === Seq(1.0, 2.0, 3.0))
  }

  test("gapFillMinutes: dense spine, per-minute sums, forward fill, leading nulls") {
    import org.apache.spark.sql.functions._
    // key A observes minutes 0 (two events) and 3; key B only minute 2 —
    // global span is minutes 0..4 (B's leading minutes have nothing to carry)
    val df = Seq(
      ("A", "2024-01-01 00:00:10", 1.5), ("A", "2024-01-01 00:00:40", 2.0),
      ("A", "2024-01-01 00:03:05", 7.0),
      ("B", "2024-01-01 00:02:30", 4.25), ("B", "2024-01-01 00:04:59", 0.75))
      .toDF("k", "ts_s", "v").withColumn("ts", to_timestamp(col("ts_s")))
    val out = SeriesETL.gapFillMinutes(df, "ts", "k", "v")
      .select(col("k"), date_format(col("m"), "mm").cast("int").as("mi"),
        col("v"), col("fv"))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out.size === 10, "2 keys x 5 spine minutes")
    assert(out(("A", 0)) === ((Some(3.5), Some(3.5))), "per-minute sum of both events")
    assert(out(("A", 1)) === ((None, Some(3.5))) && out(("A", 2)) === ((None, Some(3.5))))
    assert(out(("A", 3)) === ((Some(7.0), Some(7.0))))
    assert(out(("A", 4)) === ((None, Some(7.0))), "carry past the last observation")
    assert(out(("B", 0)) === ((None, None)) && out(("B", 1)) === ((None, None)),
      "minutes before a key's first observation stay null")
    assert(out(("B", 2)) === ((Some(4.25), Some(4.25))))
    assert(out(("B", 3)) === ((None, Some(4.25))))
    assert(out(("B", 4)) === ((Some(0.75), Some(0.75))))
    // physical layout cannot change the fill
    val re = SeriesETL.gapFillMinutes(df.repartition(7), "ts", "k", "v")
      .orderBy("k", "m").collect().toSeq
    val base = SeriesETL.gapFillMinutes(df, "ts", "k", "v")
      .orderBy("k", "m").collect().toSeq
    assert(re === base)
  }
}
