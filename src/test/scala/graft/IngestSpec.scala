package graft

import graft.streaming.EnvelopeBatcher

/** S2 batching semantics (lib.js:95-176): greedy ≤maxBytes packing,
  * oversize-tx discard, content preservation. */
class IngestSpec extends SparkSpec {

  private val pre = """{"detail":{"txs":["""
  private val suf = "]}}"

  test("split packs greedily and respects the byte cap") {
    val txs = Seq.fill(10)("x" * 100) // each 100 B
    val cap = pre.length + suf.length + 3 * 100 + 2 // exactly 3 txs + separators
    val (batches, dropped) = EnvelopeBatcher.split(pre, suf, txs, cap)
    assert(dropped.isEmpty)
    assert(batches.map(_.size) === Seq(3, 3, 3, 1))
    assert(batches.flatten === txs, "order and content preserved")
    batches.foreach { b =>
      assert(EnvelopeBatcher.envelopeSize(pre, suf, b) <= cap)
    }
  }

  test("a tx that cannot fit alone is discarded") {
    val big = "y" * 1000
    val small = "z" * 10
    val cap = pre.length + suf.length + 500
    val (batches, dropped) = EnvelopeBatcher.split(pre, suf, Seq(small, big, small), cap)
    assert(dropped === Seq(big))
    assert(batches.flatten === Seq(small, small))
  }

  test("empty input yields no batches") {
    val (batches, dropped) = EnvelopeBatcher.split(pre, suf, Nil)
    assert(batches.isEmpty && dropped.isEmpty)
  }
}
