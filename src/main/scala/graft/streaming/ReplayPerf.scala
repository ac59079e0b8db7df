package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scoped checkpoint-performance override for the replay harnesses
  * (r14 opt, guide §1/§7.3 — measured from driver thread dumps).
  *
  * Spark 4.1 wraps every streaming-checkpoint file write in
  * `ChecksumCheckpointFileManager` (`spark.sql.streaming.checkpoint.
  * fileChecksum.enabled`, default true): each offsets/commit/state-delta
  * file gets a companion `.checksum` file and every create funnels through
  * a blocking future pool. On the local-FS replay fixtures this doubles the
  * per-batch file creates, and — with no Hadoop native IO in this
  * environment — every create pays a forked `chmod` shell
  * (`RawLocalFileSystem.setPermission` → `Shell.runCommand`; executor
  * stacks spend the batch parked in `ChecksumCheckpointFileManager.
  * awaitResult`). Measured on e2e_stream_join at sf0.1/32c: 12.3–18.7 s
  * with checksums vs 7.4–7.9 s without — the state-store commit path was
  * >80% of every batch's addBatch time, at ~0 CPU.
  *
  * Scoped (set + restore) rather than session-global: the checksum is a
  * CORRUPTION-DETECTION feature for long-lived production checkpoints on
  * remote stores; a deployment replaying years of state through flaky
  * object storage may want it back on, and scoping keeps the trade local
  * to these replay operators. Results are unaffected either way — the
  * checkpoint contents are identical modulo the companion checksum files.
  */
object ReplayPerf {
  def withFastCheckpoints[A](spark: SparkSession)(f: => A): A = {
    val key = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
