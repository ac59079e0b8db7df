package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.store.WriteAuditPublish._

/** Write-Audit-Publish: publish gating, reader isolation, crash windows. */
class WapSpec extends SparkSpec {

  private def audits = Seq(
    Audit("no_null_keys", _.filter(col("k").isNull).count()),
    Audit("nonneg", _.filter(col("v") < 0).count()))

  test("clean candidate publishes; poisoned candidate stays invisible") {
    import spark.implicits._
    val dir = tmpDir("wap")
    val clean = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val (ok1, r1) = writeAuditPublish(clean, dir, 1L, audits)
    assert(ok1 && r1.forall(_._2 == 0L))
    assert(publishedGen(dir).contains(1L))
    assert(readPublished(spark, dir).as[(String, Long)].collect().toSet ===
      Set(("a", 1L), ("b", 2L)))
    val poisoned = clean.unionByName(
      Seq((null.asInstanceOf[String], -5L)).toDF("k", "v"))
    val (ok2, r2) = writeAuditPublish(poisoned, dir, 2L, audits)
    assert(!ok2 && r2.exists(_._2 > 0))
    // reader still serves gen 1 — the failed candidate is not observable
    assert(publishedGen(dir).contains(1L))
    assert(readPublished(spark, dir).as[(String, Long)].collect().toSet ===
      Set(("a", 1L), ("b", 2L)))
    // the poisoned bytes exist ONLY in the unpublished staging area
    assert(Files.exists(Paths.get(dir, "stage", "gen=2")))
  }

  test("crash between stage and publish leaves the old generation serving; dead writer's tmp is inert") {
    import spark.implicits._
    val dir = tmpDir("wap-crash")
    val v1 = Seq(("a", 1L)).toDF("k", "v")
    assert(writeAuditPublish(v1, dir, 1L, audits)._1)
    // crash injection: gen 2 stages (clean) but the process dies BEFORE
    // publishManifest — simulated by staging directly
    Seq(("a", 99L)).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$dir/stage/gen=2")
    // plus a torn manifest tmp from the dead writer (gen-unique name: a
    // concurrent/later publisher must never rename someone else's bytes)
    Files.write(Paths.get(dir, ".MANIFEST.2.tmp"), "2".getBytes("UTF-8"))
    assert(publishedGen(dir).contains(1L), "old generation still published")
    assert(readPublished(spark, dir).as[(String, Long)].collect().toSet ===
      Set(("a", 1L)))
    // recovery: the NEXT publish (gen 3) lands through ITS OWN tmp; the
    // dead writer's orphan stays inert (vacuum's job, not publish's) and
    // the published pointer is unaffected by it
    val v3 = Seq(("a", 3L), ("c", 4L)).toDF("k", "v")
    assert(writeAuditPublish(v3, dir, 3L, audits)._1)
    assert(publishedGen(dir).contains(3L))
    assert(readPublished(spark, dir).as[(String, Long)].collect().toSet ===
      Set(("a", 3L), ("c", 4L)))
    assert(!Files.exists(Paths.get(dir, ".MANIFEST.3.tmp")), "own tmp consumed")
    assert(Files.exists(Paths.get(dir, ".MANIFEST.2.tmp")),
      "dead writer's orphan tmp untouched — never renamed by another publisher")
    // a RETRY of the dead writer's gen overwrites its own stale tmp and lands
    publishManifest(dir, 2L)
    assert(publishedGen(dir).contains(2L))
    assert(!Files.exists(Paths.get(dir, ".MANIFEST.2.tmp")), "retry consumes its tmp")
  }

  test("audits judge the staged bytes, and a re-publish of an old gen is an atomic flip back") {
    import spark.implicits._
    val dir = tmpDir("wap-flip")
    assert(writeAuditPublish(Seq(("a", 1L)).toDF("k", "v"), dir, 1L, audits)._1)
    assert(writeAuditPublish(Seq(("a", 2L)).toDF("k", "v"), dir, 2L, audits)._1)
    assert(publishedGen(dir).contains(2L))
    // rollback = republish the manifest at gen 1; no data rewrite
    publishManifest(dir, 1L)
    assert(readPublished(spark, dir).as[(String, Long)].collect().toSet ===
      Set(("a", 1L)))
  }
}
