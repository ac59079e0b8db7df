package graft

import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loader contract against the CURRENT driver-generated testdata.
  *
  * Round-9 postmortem: the driver regenerated /root/testdata with
  * events.ts re-encoded timestamp[ns]→timestamp[us] and the hardcoded
  * nanos workaround in Tables.events threw an AnalysisException that
  * silently blacked out 39/81 queries — discovered only by the judge, a
  * full round later. This spec makes the next silent testdata
  * regeneration fail LOUDLY and LOCALLY: it opens every table at
  * sf0.001, asserts the engine loader accepts it, and on a timestamp
  * mismatch prints the physical type of every timestamp-ish column so
  * the fix is one glance away.
  *
  * Supported events.ts encodings (see Tables.events):
  *   - INT64 TIMESTAMP(NANOS), surfaced as LongType via nanosAsLong
  *   - timestamp[us] NTZ (TimestampNTZType) — cast once to session-TZ
  *   - timestamp[us] UTC-adjusted (TimestampType) — used directly
  */
class LoaderContractSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def describeTimestampish(table: String): String = {
    val raw = spark.read.parquet(s"$sfDir/$table.parquet")
    raw.schema.fields
      .filter(f => f.dataType == TimestampType || f.dataType == TimestampNTZType ||
        f.name.toLowerCase.contains("ts") || f.name.toLowerCase.contains("date"))
      .map(f => s"${f.name}: ${f.dataType.sql}")
      .mkString(s"[$table physical types] ", ", ", "")
  }

  test("every testdata table loads and has rows") {
    Tables.all.foreach { t =>
      val n =
        try {
          val df =
            if (t == "events") Tables.events(spark, sfDir)
            else Tables.load(spark, sfDir, t)
          df.count()
        } catch {
          case e: Throwable =>
            fail(s"loader rejected $t — ${describeTimestampish(t)}\n${e.getMessage}")
        }
      assert(n > 0, s"$t loaded but is empty")
    }
  }

  test("events.ts physical encoding is one the loader supports, and loads as session-TZ timestamp") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physical: DataType =
      spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    assert(
      physical == LongType || physical == TimestampType || physical == TimestampNTZType,
      s"events.ts landed with UNSUPPORTED physical type $physical — " +
        s"extend Tables.events. ${describeTimestampish("events")}")
    // whatever the file stores, the engine-facing column is session-TZ micros
    val loaded = Tables.events(spark, sfDir)
    assert(loaded.schema("ts").dataType == TimestampType,
      s"Tables.events must normalize ts to TimestampType, got ${loaded.schema("ts").dataType}")
    // and the values are sane epoch micros (not nanos mis-read as micros,
    // which would land ~50,000 years out)
    val year = loaded.selectExpr("max(year(ts))").head().getInt(0)
    assert(year > 2000 && year < 2100,
      s"events.ts values decode to year $year — wrong unit interpretation?")
  }
}
