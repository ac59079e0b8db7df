package graft

import graft.ops.AsOfJoin

/** Backward as-of join semantics: most-recent-at-or-before match, tie
  * visibility at equal time, inner vs left behavior, tiebreak determinism. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 7L, "d")
  ).toDF("k", "t", "lv")
  private lazy val right = Seq(
    (1L, 8L, 100), (1L, 15L, 200), (2L, 99L, 300), (1L, 20L, 400)
  ).toDF("k", "rt", "rv")

  test("inner: matches the greatest right time <= left time, per key") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .select("k", "t", "lv", "rv").as[(Long, Long, String, Int)].collect().toSet
    // (1,10)→8/100; (1,20)→20/400 (equal time visible); (2,5): no rt<=5 → dropped
    assert(out === Set((1L, 10L, "a", 100), (1L, 20L, "b", 400)))
  }

  test("left: unmatched rows survive with null payload") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("rv"), joinType = "left")
      .select("k", "t", "rv").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (if (r.isNullAt(2)) None else Some(r.getInt(2))))
      .toMap
    assert(out((2L, 5L)) === None)
    assert(out((3L, 7L)) === None)
    assert(out((1L, 10L)) === Some(100))
  }

  test("right duplicates at the same (key,time) resolve by tiebreak, deterministically") {
    val dupRight = Seq((1L, 8L, 10, 1L), (1L, 8L, 99, 2L)).toDF("k", "rt", "rv", "seq")
    val out = AsOfJoin.backward(left.filter($"t" === 10), dupRight, Seq("k"),
      "t", "rt", Seq("rv"), rightTiebreak = Some("seq"))
      .select("rv").as[Int].collect()
    assert(out.toSeq === Seq(99), "highest tiebreak wins")
  }

  test("forward: matches the smallest right time >= left time, per key") {
    val out = AsOfJoin.forward(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .select("k", "t", "lv", "rv").as[(Long, Long, String, Int)].collect().toSet
    // (1,10)→15/200; (1,20)→20/400 (equal time visible); (2,5)→99/300;
    // (3,7): no right rows for key 3 → dropped
    assert(out === Set((1L, 10L, "a", 200), (1L, 20L, "b", 400), (2L, 5L, "c", 300)))
  }

  test("forward left: rows past the last right row survive with null payload") {
    val lateLeft = Seq((1L, 25L, "z")).toDF("k", "t", "lv")
    val out = AsOfJoin.forward(lateLeft, right, Seq("k"), "t", "rt", Seq("rv"),
      joinType = "left").select("rv").collect()
    assert(out.length === 1 && out.head.isNullAt(0),
      "no right row at-or-after t=25 for key 1")
  }

  test("nearest: argmin |dt| both directions, ties backward, exact time is backward at 0") {
    // key 1 right times: 8, 15, 20
    val out = AsOfJoin.nearest(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .select("k", "t", "rv", "asof_dt", "asof_dir")
      .as[(Long, Long, Int, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // (1,10): back 8 (dt 2) vs fwd 15 (dt 5) → backward
    assert(out((1L, 10L)) === ((100, 2L, "backward")))
    // (1,20): right row AT 20 → backward, dt 0
    assert(out((1L, 20L)) === ((400, 0L, "backward")))
    // (2,5): nothing before, 99 after → forward
    assert(out((2L, 5L)) === ((300, 94L, "forward")))
    // (3,7): no right rows for key 3 → dropped under inner
    assert(!out.contains((3L, 7L)))
    // equidistant candidates resolve BACKWARD
    val eq = Seq((1L, 10L, "m")).toDF("k", "t", "lv")
    val sym = Seq((1L, 7L, 1), (1L, 13L, 2)).toDF("k", "rt", "rv")
    val pick = AsOfJoin.nearest(eq, sym, Seq("k"), "t", "rt", Seq("rv"))
      .select("rv", "asof_dir").as[(Int, String)].collect()
    assert(pick.toSeq === Seq((1, "backward")))
    // left joinType keeps the unmatched row with null payload and dir
    val lf = AsOfJoin.nearest(left.filter($"k" === 3), right.filter($"k" === 1),
      Seq("k"), "t", "rt", Seq("rv"), joinType = "left")
      .select("asof_dir").collect()
    assert(lf.length === 1 && lf.head.isNullAt(0))
  }
}
