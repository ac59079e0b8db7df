package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** P2/O2/S10 — streaming dedup-by-key with TTL: drop any row whose key was
  * already admitted within the TTL window
  * (ref: resources/lambdas/stream_processing/main.py:31-69 — DynamoDB
  * conditional put with a 3 h item TTL,
  * lib/ingestion/data-ingestion-stack.ts:75).
  *
  * Two faithful variants (SURVEY.md §7.4 hard part 1):
  *  - [[withinWatermark]] — event-time-bounded state
  *    (`dropDuplicatesWithinWatermark`): deterministic, replay-safe, the
  *    right default for an engine. State is dropped once the watermark passes
  *    the key's event time + delay, so state size is bounded by
  *    (rate × delay), independent of total history — the property that keeps
  *    this operator viable at 100 TB/day.
  *  - [[processingTimeTtl]] — exact reference semantics: TTL measured in
  *    *processing* time via `flatMapGroupsWithState` with a per-key
  *    ProcessingTimeTimeout. Non-deterministic under replay (as is the
  *    reference); provided for behavioral parity.
  */
object StreamDedup {

  /** Event-time dedup: requires `df` to carry a watermark-able event-time
    * column. `delay` bounds how late a duplicate can arrive and still be
    * caught (reference TTL: "3 hours"). */
  def withinWatermark(df: DataFrame, keyCols: Seq[String], eventTimeCol: String,
                      delay: String = "3 hours"): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Exact-TTL dedup keyed by a string column: admits the first row per key,
    * drops subsequent rows until `ttlMs` of processing time has elapsed since
    * ADMISSION (duplicates do not refresh the TTL — DynamoDB's conditional
    * put fails without touching the item). Mirrors the conditional-put +
    * item-TTL pair.
    *
    * State holds the admission timestamp, and the timeout is re-armed with
    * the REMAINING ttl on every invocation: Spark's GroupState contract
    * clears a pending timeout whenever the function runs for a key without
    * setting a new one, so a duplicate arrival would otherwise cancel
    * expiry and leak the key's state forever.
    *
    * Works on streaming Datasets only (uses flatMapGroupsWithState). */
  def processingTimeTtl(df: DataFrame, keyCol: String, ttlMs: Long): DataFrame = {
    implicit val rowEnc: Encoder[Row] = Encoders.row(df.schema)
    implicit val strEnc: Encoder[String] = Encoders.STRING
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    df.as[Row](rowEnc)
      .groupByKey(r => r.getAs[String](keyCol))
      .flatMapGroupsWithState[Long, Row](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout()) {
        (_: String, rows: Iterator[Row], state: GroupState[Long]) =>
          val now = state.getCurrentProcessingTimeMs()
          if (state.hasTimedOut) {
            // TTL elapsed: forget the key (next arrival is admitted afresh).
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            val remaining = state.get + ttlMs - now
            if (remaining <= 0) {
              // TTL elapsed but the timeout hadn't fired yet: re-admit.
              state.update(now)
              state.setTimeoutDuration(ttlMs)
              if (rows.hasNext) Iterator.single(rows.next()) else Iterator.empty
            } else {
              // seen within TTL: drop the duplicates, re-arm the REMAINING ttl
              state.setTimeoutDuration(remaining)
              Iterator.empty
            }
          } else {
            state.update(now)
            state.setTimeoutDuration(ttlMs)
            // admit exactly one row per key per first-seen batch
            if (rows.hasNext) Iterator.single(rows.next()) else Iterator.empty
          }
      }
  }
}
