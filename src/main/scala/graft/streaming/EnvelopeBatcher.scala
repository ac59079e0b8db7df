package graft.streaming

/** S2 — the producer's size-bounded envelope batching
  * (ref: resources/services/ingestion-worker/lib.js:95-176): an envelope
  * whose serialized size exceeds the 256 000-byte bus limit is split
  * greedily over its txs; a single tx that alone exceeds the limit is
  * discarded (lib.js:136-143). Size = serialized envelope bytes
  * (lib.js:15-33 measures the JSON entry size).
  *
  * This is a producer-side physical batching concern — Spark partitions are
  * not size-capped — but the semantics matter for fixture generation and for
  * feeding size-limited downstream buses from foreachBatch sinks.
  */
object EnvelopeBatcher {
  val DefaultMaxBytes = 256000

  /** Serialized size of an envelope holding `txs` (UTF-8 bytes). */
  def envelopeSize(envelopePrefix: String, envelopeSuffix: String, txs: Seq[String]): Int = {
    val sep = if (txs.isEmpty) 0 else txs.length - 1
    envelopePrefix.getBytes("UTF-8").length + envelopeSuffix.getBytes("UTF-8").length +
      txs.map(_.getBytes("UTF-8").length).sum + sep
  }

  /** Greedy split: pack txs in order into envelopes of ≤ maxBytes; drop txs
    * that cannot fit alone (returned separately for the metric sink). */
  def split(envelopePrefix: String, envelopeSuffix: String, txs: Seq[String],
            maxBytes: Int = DefaultMaxBytes): (Seq[Seq[String]], Seq[String]) = {
    val overhead = envelopePrefix.getBytes("UTF-8").length +
      envelopeSuffix.getBytes("UTF-8").length
    val dropped = Seq.newBuilder[String]
    val batches = Seq.newBuilder[Seq[String]]
    var current = Vector.empty[String]
    var currentBytes = overhead
    txs.foreach { tx =>
      val txBytes = tx.getBytes("UTF-8").length
      if (overhead + txBytes > maxBytes) dropped += tx
      else {
        val sep = if (current.isEmpty) 0 else 1
        if (currentBytes + sep + txBytes > maxBytes) {
          if (current.nonEmpty) batches += current
          current = Vector(tx)
          currentBytes = overhead + txBytes
        } else {
          current :+= tx
          currentBytes += sep + txBytes
        }
      }
    }
    if (current.nonEmpty) batches += current
    (batches.result(), dropped.result())
  }
}
