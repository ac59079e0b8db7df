package graft.store

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-Audit-Publish (the staged-commit pattern table formats run under
  * names like branch + audit + fast-forward): a candidate snapshot is
  * written to an UNPUBLISHED staging generation, data-quality audits run
  * against the staged bytes (what was actually written, not the dataframe
  * that produced them — a writer bug is exactly what WAP exists to catch),
  * and only a fully clean candidate becomes visible, via an atomic
  * manifest rename. Readers resolve through the manifest, so a failed
  * candidate is never observable and the previously published generation
  * keeps serving.
  *
  * Crash windows: the manifest is written to a dot-tmp and atomically
  * renamed (ATOMIC_MOVE + REPLACE_EXISTING) — a crash before the rename
  * leaves the old generation published and a stale tmp that the next
  * publish overwrites; a crash after staging leaves an orphan gen dir that
  * is invisible (manifest-excluded) and reclaimable by a vacuum of
  * non-published generations. Scale: the staged write is the query's own
  * distributed write; audits are ordinary Spark aggregates over the staged
  * relation; the publish step itself is ONE metadata rename regardless of
  * data size.
  */
object WriteAuditPublish {

  /** A named audit: returns the number of violating rows in the staged
    * candidate (0 = pass). */
  final case class Audit(name: String, violations: DataFrame => Long)

  /** Stage `candidate` under `dir/stage/gen=<gen>`, audit the STAGED
    * relation, and publish atomically iff every audit returns 0.
    * Returns (published, per-audit violation counts). */
  def writeAuditPublish(candidate: DataFrame, dir: String, gen: Long,
      audits: Seq[Audit]): (Boolean, Seq[(String, Long)]) = {
    val spark = candidate.sparkSession
    val stage = s"$dir/stage/gen=$gen"
    candidate.write.mode("overwrite").parquet(stage)
    val staged = spark.read.parquet(stage)
    val results = audits.map(a => a.name -> a.violations(staged))
    val ok = results.forall(_._2 == 0L)
    if (ok) publishManifest(dir, gen)
    (ok, results)
  }

  /** The atomic half on its own (exposed so tests can crash between stage
    * and publish): point the manifest at `gen`. */
  def publishManifest(dir: String, gen: Long): Unit = {
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, ".MANIFEST.tmp")
    Files.write(tmp, gen.toString.getBytes("UTF-8"))
    Files.move(tmp, Paths.get(dir, "MANIFEST"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Currently published generation, if any. */
  def publishedGen(dir: String): Option[Long] = {
    val m = Paths.get(dir, "MANIFEST")
    if (Files.exists(m))
      Some(new String(Files.readAllBytes(m), "UTF-8").trim.toLong)
    else None
  }

  /** Read the published table (resolves through the manifest — staged but
    * unpublished generations are invisible by construction). */
  def readPublished(spark: SparkSession, dir: String): DataFrame = {
    val gen = publishedGen(dir).getOrElse(
      throw new IllegalStateException(s"no published generation under $dir"))
    spark.read.parquet(s"$dir/stage/gen=$gen")
  }
}
