package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.batch.SplitSpec
import graft.monitor.ThresholdUpdate
import graft.streaming.EnvelopeBatcher

/** Property-based invariants (SURVEY.md §5 test plan item 2). Pure-function
  * properties — the Spark-side behavior is covered by the golden suites. */
object PropertySpec extends Properties("graft") {

  private val pre = "{\"txs\":["
  private val suf = "]}"

  property("splitBoundsPartitionSeries") =
    forAll(Gen.choose(1, 10), Gen.choose(1, 6), Gen.choose(0L, 5000L)) { (p, k, extra) =>
      val n = p.toLong * (k + 1) + p + extra // ≥ minDataLength → no fallback
      val b = SplitSpec.bounds(n, p, k)
      b.p == p &&
        b.trainLen == n - p - k.toLong * p &&
        b.validationLens.length == k &&
        b.validationLens.zipWithIndex.forall { case (len, i) =>
          len == n - p - (k - i - 1).toLong * p } &&
        b.validationLens.lastOption.forall(_ == b.testInputLen) &&
        b.testInputLen + b.testTargetLen == n
    }

  property("degenerateBoundsUseFivePercent") =
    forAll(Gen.choose(2, 10), Gen.choose(1, 6)) { (p, k) =>
      val min = p.toLong * (k + 1) + p
      forAll(Gen.choose(20L, math.max(21L, min - 1))) { n0 =>
        val n = math.min(n0, min - 1)
        val b = SplitSpec.bounds(n, p, k)
        b.p == (n * 0.05).toInt && b.trainLen >= 0 && b.testTargetLen == b.p
      }
    }

  private def ql(t: Double, p: Double, q: Double): Double =
    if (t > p) q * (t - p) else (1 - q) * (p - t)

  property("pinballNonNegativeZeroAtExact") =
    forAll(Gen.choose(-1e6, 1e6), Gen.choose(-1e6, 1e6), Gen.choose(0.01, 0.99)) {
      (t, p, q) => ql(t, p, q) >= 0.0 && ql(t, t, q) == 0.0
    }

  property("thresholdUpdateMonotone") =
    forAll(Gen.choose(0.0, 1.0), Gen.choose(0.001, 1.0)) { (wql, thr) =>
      ThresholdUpdate.next(wql, thr) <= thr + 1e-15 &&
        ThresholdUpdate.next(thr, thr) == thr
    }

  property("splitBoundariesPartitionHashSpace") =
    forAll(Gen.choose(2, 6).flatMap(k => Gen.listOfN(k, Gen.choose(1, 100)))) { ws =>
      val tot = ws.sum.toDouble
      val fr = ws.zipWithIndex.map { case (w, i) => (s"s$i", w / tot) }
      val bounds = graft.ops.Sampling.splitBoundaries(fr)
      // bands cover [0, 2^32) exactly, in declaration order, each width
      // within 1 of fraction * 2^32 (rounding), so every 32-bit hash lands
      // in exactly one split
      bounds.map(_._1) == fr.map(_._1) &&
        bounds.last._2 == 4294967296L &&
        bounds.map(_._2) == bounds.map(_._2).sorted &&
        bounds.zip(0L +: bounds.map(_._2).init).forall { case ((name, hi), lo) =>
          val width = hi - lo
          val want = fr.find(_._1 == name).get._2 * 4294967296.0
          math.abs(width - want) <= fr.length + 1.0
        }
    }

  property("envelopeBatcherCapsAndContent") = {
    val genTx = Gen.choose(1, 400).map("x" * _)
    forAll(Gen.listOf(genTx), Gen.choose(50, 600)) { (txs, payloadCap) =>
      val cap = pre.length + suf.length + payloadCap
      val (batches, dropped) = EnvelopeBatcher.split(pre, suf, txs, cap)
      batches.forall(b => EnvelopeBatcher.envelopeSize(pre, suf, b) <= cap) &&
        batches.flatten == txs.filter(t => pre.length + suf.length + t.length <= cap) &&
        dropped == txs.filter(t => pre.length + suf.length + t.length > cap)
    }
  }
}
