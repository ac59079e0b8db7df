package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Physical-layout keys for multi-dimensional data skipping.
  *
  * A table sorted on ONE column gives parquet min/max stats selectivity on
  * that column only; a 2-D range query (user ∈ [a,b] AND value ∈ [c,d])
  * over 100 TB then scans every file. Sorting by the Morton (Z-order)
  * interleave of both dimensions makes each file's zkey range bound BOTH
  * dimensions at once — the standard clustering move (Delta/Iceberg
  * OPTIMIZE ZORDER BY) that turns the same stats into 2-D file skipping.
  *
  * The key is pure bit arithmetic (32 shift/mask/or terms, one codegen'd
  * projection — no UDF), so any engine computes the identical BIGINT and
  * a write path can `sortWithinPartitions(zkey)` with zero extra state.
  */
object Layout {

  /** Morton interleave of the low 16 bits of two non-negative dimensions:
    * bit i of `a` lands at 2i+1, bit i of `b` at 2i — a 32-bit zkey. */
  def morton16(a: Column, b: Column): Column = {
    val aa = a.cast("long").bitwiseAND(lit(0xFFFFL))
    val bb = b.cast("long").bitwiseAND(lit(0xFFFFL))
    (0 until 16).map { i =>
      shiftleft(shiftright(aa, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(bb, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as engine-portable SQL (for oracles / pushdown
    * into engines that take expression strings). */
  def morton16Sql(aExpr: String, bExpr: String): String =
    (0 until 16).map { i =>
      s"((((($aExpr) >> $i) & 1) << ${2 * i + 1}) | (((($bExpr) >> $i) & 1) << ${2 * i}))"
    }.mkString("(", " | ", ")")

  /** Write `df` clustered on `key` into `nFiles` range-partitioned, sorted
    * files — each file then owns a contiguous key range, which is what
    * gives its min/max stats their selectivity. */
  def clusteredWrite(df: DataFrame, key: Column, nFiles: Int,
                     path: String): Unit =
    df.repartitionByRange(nFiles, key).sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** Per-file [min, max] of long columns, read from the parquet FOOTERS
    * alone — zero data pages touched. This is exactly the stats relation a
    * table format (Iceberg/Delta manifests) serves at planning time; here
    * it is read straight from the files so the pruning arithmetic can be
    * demonstrated without a format dependency. */
  def parquetFileRanges(spark: SparkSession, dir: String,
                        cols: Seq[String]): Seq[(String, Seq[(Long, Long)])] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    fs.listStatus(new Path(dir)).map(_.getPath)
      .filter(_.getName.startsWith("part-")).toSeq.sortBy(_.getName).map { p =>
        val rd = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try {
          val blocks = rd.getFooter.getBlocks.asScala.toSeq
          val ranges = cols.map { c =>
            val stats = blocks.map(_.getColumns.asScala
              .find(_.getPath.toDotString == c)
              .getOrElse(sys.error(s"column $c missing from footer of $p"))
              .getStatistics)
            (stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
              stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max)
          }
          (p.getName, ranges)
        } finally rd.close()
      }
  }

  /** How many of `ranges`' files a 2-D box predicate must READ (their
    * [min,max] boxes intersect it) — the file-skipping count min/max stats
    * buy under a given layout. */
  def filesToRead(ranges: Seq[(String, Seq[(Long, Long)])],
                  box: Seq[(Long, Long)]): Int =
    ranges.count { case (_, rs) =>
      rs.zip(box).forall { case ((mn, mx), (lo, hi)) => mx >= lo && mn <= hi }
    }
}
