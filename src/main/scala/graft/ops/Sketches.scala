package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches.
  *
  * The classic 100 TB problem: COUNT(DISTINCT key) forces a full shuffle of
  * every distinct key; a HyperLogLog sketch answers the same question from
  * ONE narrow aggregation (m registers, kilobytes) with ~1.04/√m relative
  * error. Spark ships approx_count_distinct (HLL++), but its binary sketch
  * format is engine-private — useless for an engine-parity contract. This is
  * a from-scratch, DETERMINISTIC HLL on md5: every intermediate is either an
  * exact integer or an IEEE-basic-op double, so an independent engine (the
  * DuckDB oracle) reproduces the estimate bit for bit — the same
  * cross-engine-reproducibility property the rest of the suite builds on.
  *
  * Register arithmetic stays in exact integers: rank terms are
  * 2^(33−rho) ∈ {2^0..2^32} (w is a 32-bit hash window; rho = leading
  * zeros + 1, so the per-bucket register max is the term MINIMUM), empty
  * buckets contribute 2^33 (register 0), and the total Σ 2^(33−reg) ≤
  * m·2^33 = 2^45 fits a BIGINT exactly — the only roundings are the final
  * divisions and the small-range ln() correction.
  */
object Sketches {

  /** Number of hash buckets for precision `b` (register index = first `b`
    * bits of the md5; `b` must be a multiple of 4 so the bucket is a whole
    * hex prefix, expressible identically in both engines). */
  def buckets(b: Int): Int = { require(b % 4 == 0 && b > 0 && b <= 16); 1 << b }

  /** 2^(33−rho) for the 32-bit hash window `w`, as a first-match-wins
    * ladder over the leading-zero count (w = 0 → rho 33 → term 1).
    * [[termSql]] generates the identical ladder for the oracle. */
  def termColumn(w: Column): Column = {
    val first = when(w >= (1L << 31), lit(1L << 32))
    val chain = (1 to 31).foldLeft(first) { (c, k) =>
      c.when(w >= (1L << (31 - k)), lit(1L << (32 - k)))
    }
    coalesce(chain, lit(1L))
  }

  /** SQL mirror of [[termColumn]] — same branches, same order. */
  def termSql(wExpr: String): String =
    (0 to 31).map(k => s"WHEN $wExpr >= ${1L << (31 - k)} THEN ${1L << (32 - k)}")
      .mkString("CASE ", " ", " ELSE 1 END")

  /** HLL distinct-count estimate of `keyCol` over `df`: one row
    * (sum_int, nonzero_buckets, n_hll).
    *
    * Plan shape: per-row hash arithmetic → groupBy(bucket) MIN (partial
    * map-side, the exchange carries ≤ m narrow rows per partition) → a
    * single global row. No distinct, no wide shuffle — the property that
    * makes this the scale path for cardinality over 100 TB.
    *
    * Estimator: standard HLL with the small-range linear-counting branch
    * (raw ≤ 2.5m with empty buckets → m·ln(m/zeros)); the 64-bit
    * large-range correction is out of scope for a 32-bit hash window and
    * documented as such. */
  def hllDistinct(df: DataFrame, keyCol: Column, b: Int = 12): DataFrame = {
    val m = buckets(b)
    val hexChars = b / 4
    val hex = md5(keyCol.cast("string"))
    val bucket = conv(substring(hex, 1, hexChars), 16, 10).cast("long")
    val w = conv(substring(hex, hexChars + 1, 8), 16, 10).cast("long")
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    df.select(bucket.as("bucket"), termColumn(w).as("term"))
      .groupBy(col("bucket")).agg(min(col("term")).as("t"))
      .agg(sum(col("t")).as("present_sum"), count(lit(1)).as("nonzero_buckets"))
      .select(
        (col("present_sum") + (lit(m.toLong) - col("nonzero_buckets")) * lit(1L << 33))
          .as("sum_int"),
        col("nonzero_buckets"))
      .select(col("sum_int"), col("nonzero_buckets"),
        (alpha * lit(m.toDouble) * lit(m.toDouble) /
          (col("sum_int").cast("double") / lit((1L << 33).toDouble))).as("raw"),
        (lit(m.toLong) - col("nonzero_buckets")).cast("double").as("zeros"))
      .select(col("sum_int"), col("nonzero_buckets"),
        when(col("raw") <= lit(2.5) * lit(m.toDouble) && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
          .otherwise(col("raw")).as("n_hll"))
  }

  /** Mergeable partial sketches — THE property that makes a sketch a
    * distributed data structure rather than a one-shot query: per `partCol`
    * slice (a day, a shard, a landing batch), the register relation
    * (part, bucket, t = min term). Partials merge by register-wise MIN, and
    * because min is associative/commutative/idempotent the merged sketch
    * equals the direct sketch over the union EXACTLY — same registers, same
    * estimate, bit for bit (not approximately: the estimator never sees
    * which path produced the registers). At 100 TB this is the shape that
    * matters: per-partition sketches land incrementally (kilobytes each),
    * and any subset/rollup of parts is answerable later without re-reading
    * the data. */
  def hllRegistersBy(df: DataFrame, partCol: Column, keyCol: Column,
                     b: Int = 12): DataFrame = {
    val hexChars = b / 4
    val hex = md5(keyCol.cast("string"))
    val bucket = conv(substring(hex, 1, hexChars), 16, 10).cast("long")
    val w = conv(substring(hex, hexChars + 1, 8), 16, 10).cast("long")
    df.select(partCol.as("part"), bucket.as("bucket"), termColumn(w).as("term"))
      .groupBy(col("part"), col("bucket")).agg(min(col("term")).as("t"))
  }

  /** ONE-PASS multi-column HLL: registers for SEVERAL key expressions from
    * a single scan — the ANALYZE-TABLE shape, where re-reading 100 TB once
    * per column would multiply the dominant cost by the column count.
    * Each row fans out into ≤ |keys| narrow (cname, bucket, term) structs
    * (nulls skipped — NDV counts values, not rows), which collapse in the
    * same map-side-partial groupBy MIN as [[hllDistinct]]; the exchange
    * carries at most |keys|·m register rows per partition regardless of
    * data volume. One estimate row per name: (cname, n_hll). */
  def hllMultiCol(df: DataFrame, keys: Seq[(String, Column)],
                  b: Int = 12): DataFrame = {
    require(keys.nonEmpty)
    val m = buckets(b)
    val hexChars = b / 4
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val regs = keys.map { case (name, k) =>
      val hex = md5(k.cast("string"))
      val bucket = conv(substring(hex, 1, hexChars), 16, 10).cast("long")
      val w = conv(substring(hex, hexChars + 1, 8), 16, 10).cast("long")
      when(k.isNotNull,
        struct(lit(name).as("cname"), bucket.as("bucket"),
          termColumn(w).as("term")))
    }
    df.select(explode(array(regs: _*)).as("r"))
      .filter(col("r").isNotNull)
      .groupBy(col("r.cname").as("cname"), col("r.bucket").as("bucket"))
      .agg(min(col("r.term")).as("t"))
      .groupBy(col("cname"))
      .agg(sum(col("t")).as("present_sum"), count(lit(1)).as("nonzero_buckets"))
      .select(col("cname"),
        (col("present_sum") + (lit(m.toLong) - col("nonzero_buckets")) * lit(1L << 33))
          .as("sum_int"),
        col("nonzero_buckets"))
      .select(col("cname"), col("sum_int"), col("nonzero_buckets"),
        (alpha * lit(m.toDouble) * lit(m.toDouble) /
          (col("sum_int").cast("double") / lit((1L << 33).toDouble))).as("raw"),
        (lit(m.toLong) - col("nonzero_buckets")).cast("double").as("zeros"))
      .select(col("cname"), col("sum_int"), col("nonzero_buckets"),
        when(col("raw") <= lit(2.5) * lit(m.toDouble) && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
          .otherwise(col("raw")).as("n_hll"))
  }

  /** Merge partial register relations ([[hllRegistersBy]] output, or a
    * union of several) into the single-row estimate — register-wise MIN
    * then the standard estimator tail. Output row matches [[hllDistinct]]:
    * (sum_int, nonzero_buckets, n_hll). */
  def hllMergeRegisters(regs: DataFrame, b: Int = 12): DataFrame = {
    val m = buckets(b)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    regs.groupBy(col("bucket")).agg(min(col("t")).as("t"))
      .agg(sum(col("t")).as("present_sum"), count(lit(1)).as("nonzero_buckets"))
      .select(
        (col("present_sum") + (lit(m.toLong) - col("nonzero_buckets")) * lit(1L << 33))
          .as("sum_int"),
        col("nonzero_buckets"))
      .select(col("sum_int"), col("nonzero_buckets"),
        (alpha * lit(m.toDouble) * lit(m.toDouble) /
          (col("sum_int").cast("double") / lit((1L << 33).toDouble))).as("raw"),
        (lit(m.toLong) - col("nonzero_buckets")).cast("double").as("zeros"))
      .select(col("sum_int"), col("nonzero_buckets"),
        when(col("raw") <= lit(2.5) * lit(m.toDouble) && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
          .otherwise(col("raw")).as("n_hll"))
  }

  /** SLIDING-window per-day distinct estimate by register merge: the
    * rolling "7-day active users" question, answered from the SAME daily
    * partials [[hllRegistersBy]] lands — no re-read of the data, no
    * (day × key) shuffle. Each day-d register row serves target days
    * d..d+w−1 (an explode into ≤ w narrow rows — days×m total, metadata
    * scale), registers merge per (target day, bucket) by MIN, and each
    * day's estimate is EXACTLY the direct sketch of its window's union
    * (min-merge idempotence — the o16 contract, applied per frame).
    * An exact rolling COUNT(DISTINCT) would shuffle every (day, key) pair
    * w times; the sketch exchange carries registers only. */
  def hllSlidingBy(df: DataFrame, dayCol: Column, keyCol: Column,
                   windowDays: Int, b: Int = 12): DataFrame = {
    require(windowDays >= 1)
    val m = buckets(b)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val days = df.select(dayCol.as("day")).distinct()
    hllRegistersBy(df, dayCol, keyCol, b)
      .select(explode(sequence(col("part"), col("part") + (windowDays - 1)))
        .as("day"), col("bucket"), col("t"))
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day"), col("bucket")).agg(min(col("t")).as("t"))
      .groupBy(col("day"))
      .agg(sum(col("t")).as("present_sum"), count(lit(1)).as("nonzero_buckets"))
      .select(col("day"),
        (col("present_sum") + (lit(m.toLong) - col("nonzero_buckets")) * lit(1L << 33))
          .as("sum_int"),
        col("nonzero_buckets"))
      .select(col("day"), col("sum_int"), col("nonzero_buckets"),
        (alpha * lit(m.toDouble) * lit(m.toDouble) /
          (col("sum_int").cast("double") / lit((1L << 33).toDouble))).as("raw"),
        (lit(m.toLong) - col("nonzero_buckets")).cast("double").as("zeros"))
      .select(col("day"), col("sum_int"), col("nonzero_buckets"),
        when(col("raw") <= lit(2.5) * lit(m.toDouble) && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
          .otherwise(col("raw")).as("n_hll"))
  }

  /** Per-group HLL distinct estimates: [[hllDistinct]] with a group key
    * carried through both aggregations — the "distinct users per day"
    * question at 100 TB, where an exact per-group COUNT(DISTINCT) shuffles
    * every (group, key) pair but the sketch exchange carries at most
    * m narrow register rows PER GROUP per partition. One row per group:
    * (grp, sum_int, nonzero_buckets, n_hll). */
  def hllDistinctBy(df: DataFrame, grpCol: Column, keyCol: Column,
                    b: Int = 12): DataFrame = {
    val m = buckets(b)
    val hexChars = b / 4
    val hex = md5(keyCol.cast("string"))
    val bucket = conv(substring(hex, 1, hexChars), 16, 10).cast("long")
    val w = conv(substring(hex, hexChars + 1, 8), 16, 10).cast("long")
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    df.select(grpCol.as("grp"), bucket.as("bucket"), termColumn(w).as("term"))
      .groupBy(col("grp"), col("bucket")).agg(min(col("term")).as("t"))
      .groupBy(col("grp"))
      .agg(sum(col("t")).as("present_sum"), count(lit(1)).as("nonzero_buckets"))
      .select(col("grp"),
        (col("present_sum") + (lit(m.toLong) - col("nonzero_buckets")) * lit(1L << 33))
          .as("sum_int"),
        col("nonzero_buckets"))
      .select(col("grp"), col("sum_int"), col("nonzero_buckets"),
        (alpha * lit(m.toDouble) * lit(m.toDouble) /
          (col("sum_int").cast("double") / lit((1L << 33).toDouble))).as("raw"),
        (lit(m.toLong) - col("nonzero_buckets")).cast("double").as("zeros"))
      .select(col("grp"), col("sum_int"), col("nonzero_buckets"),
        when(col("raw") <= lit(2.5) * lit(m.toDouble) && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
          .otherwise(col("raw")).as("n_hll"))
  }

  // ---- KMV / bottom-k sketch (distinct counts AND set operations) --------

  /** 60-bit uniform hash for the KMV sketch: integer value of the first 15
    * md5 hex chars. 15 digits keep the sum strictly inside BIGINT in both
    * engines (16^15 = 2^60), and the hex-prefix form is reproducible
    * digit-for-digit by the oracle's strpos ladder ([[kmvHashSql]]). */
  def kmvHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** SQL mirror of [[kmvHash]] — the same 15-hex-digit integer ladder. */
  def kmvHashSql(keyExpr: String): String =
    (1 to 15).map(j =>
      s"(strpos('0123456789abcdef', substr(md5(CAST($keyExpr AS VARCHAR)), $j, 1)) - 1) * ${1L << (4 * (15 - j))}")
      .mkString(" + ")

  /** KMV (k-minimum-values) sketch of `keyCol` over `df`: ONE row holding
    * the ascending array of the k smallest distinct 60-bit hashes.
    *
    * Why a second cardinality sketch beside HLL: the KMV sketch retains
    * actual hash VALUES, so two sketches support set operations — the k
    * smallest of A ∪ B is computable from S_A ∪ S_B alone, and matching
    * values estimate |A ∩ B| / Jaccard — which HLL's rank-collapsed
    * registers cannot answer. The price is accuracy per byte (k longs vs
    * m 6-bit registers).
    *
    * Plan shape ([[graft.expressions.MinKDistinctLongs]]): one aggregate
    * whose buffer is bounded at k elements on BOTH aggregation sides — the
    * exchange carries one ≤ k-element array per partition, constant in
    * corpus size and key cardinality (strictly narrower than HLL's m
    * register rows). Merge is distinct-union-min-k: associative,
    * commutative, idempotent — partials from any partitioning or replay
    * merge to the identical sketch. */
  def kmvSketch(df: DataFrame, keyCol: Column, k: Int): DataFrame = {
    require(k >= 2)
    df.agg(graft.expressions.MinKAggregate.minkDistinct(kmvHash(keyCol), k)
      .as("vals"))
  }

  /** Distinct-count estimate from a KMV value array: a saturated sketch
    * estimates (k−1) · 2^60 / h_(k) (the classic bottom-k estimator); an
    * unsaturated one IS the exact distinct-hash count. Both branches are
    * single mirrored IEEE operations on exact integers — (k−1)·2^60 is
    * exactly representable (k ≤ 2^52), so the only rounding is the final
    * division, identical on any engine. */
  def kmvEstimate(vals: Column, k: Int): Column =
    kmvEstimateFrom(size(vals).cast("long"), element_at(vals, size(vals)), k)

  /** [[kmvEstimate]] from an already-extracted (n_kept, kth) pair — the
    * form used when the sketch lives as rows rather than an array. */
  def kmvEstimateFrom(nKept: Column, kth: Column, k: Int): Column =
    when(nKept < k, nKept.cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit((1L << 60).toDouble) /
        kth.cast("double"))

  /** Per-part KMV sketches — the mergeable-partial form ([[hllRegistersBy]]
    * / [[cmsCellsBy]] counterpart): one (part, vals) bottom-k array per
    * `partCol` slice. Partials merge by distinct-union-min-k over their
    * VALUES ([[kmvMergeSketches]]), and because that operation is
    * associative/commutative/idempotent the merged sketch equals the
    * direct sketch over the union EXACTLY — same values, same estimate,
    * same downstream set-operation behavior. */
  def kmvSketchBy(df: DataFrame, partCol: Column, keyCol: Column,
                  k: Int): DataFrame = {
    require(k >= 2)
    df.groupBy(partCol.as("part"))
      .agg(graft.expressions.MinKAggregate.minkDistinct(kmvHash(keyCol), k)
        .as("vals"))
  }

  /** Merge partial KMV sketches ([[kmvSketchBy]] output, or a union of
    * several) into one [[kmvSketch]]-shaped row: the partials' values
    * re-aggregated with the same bounded min-k aggregate (no re-hash —
    * the values ARE hashes). */
  def kmvMergeSketches(parts: DataFrame, k: Int): DataFrame =
    parts.select(explode(col("vals")).as("h"))
      .agg(graft.expressions.MinKAggregate.minkDistinct(col("h"), k).as("vals"))

  /** SQL mirror of [[kmvEstimate]] for a (n_kept, kth) pair. */
  def kmvEstimateSql(nKept: String, kth: String, k: Int): String =
    s"""CASE WHEN $nKept < $k THEN CAST($nKept AS DOUBLE)
       |     ELSE CAST('${(k - 1).toDouble}' AS DOUBLE) * CAST('${(1L << 60).toDouble}' AS DOUBLE)
       |          / CAST($kth AS DOUBLE) END""".stripMargin

  // ---- Count-Min sketch (heavy hitters without a per-key shuffle) --------

  /** Salted 32-bit row hash → bucket for CMS row `i`: integer value of the
    * first 8 md5 hex chars of "i:key", mod `w`. Pure integer arithmetic, so
    * the oracle reproduces every cell exactly. */
  private def cmsBucket(key: Column, i: Int, w: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$i:"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long"), lit(w.toLong))

  /** Build a d×w Count-Min sketch of `keyCol` occurrences: one row per
    * non-empty cell (row, bucket, cnt).
    *
    * The 100 TB shape: frequency questions without shuffling every distinct
    * key — the exchange carries at most d·w narrow cells per partition
    * (map-side partial COUNT), constant in both corpus size and key
    * cardinality. Point estimates then read d cells per key and take the
    * MIN (over-count only, never under: each cell is a superset sum). */
  def cmsBuild(df: DataFrame, keyCol: Column, d: Int = 4, w: Int = 512): DataFrame = {
    require(d >= 1 && d <= 16 && w >= 2)
    val cells = explode(array((0 until d).map(i =>
      struct(lit(i).as("row"), cmsBucket(keyCol, i, w).as("bucket"))): _*))
    df.select(cells.as("c"))
      .select(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .groupBy(col("row"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Per-part CMS cell relations — the mergeable partial form (HLL's
    * [[hllRegistersBy]] counterpart): one (part, row, bucket, cnt) cell
    * relation per `partCol` slice. CMS partials merge by cell-wise SUM —
    * counts are associative/commutative, so the merged sketch equals the
    * direct sketch over the union EXACTLY when parts partition the data
    * (unlike min-merge HLL, CMS merge is NOT idempotent: feeding the same
    * partial twice double-counts, which is the correct multiset
    * semantics). */
  def cmsCellsBy(df: DataFrame, partCol: Column, keyCol: Column,
                 d: Int = 4, w: Int = 512): DataFrame = {
    require(d >= 1 && d <= 16 && w >= 2)
    val cells = explode(array((0 until d).map(i =>
      struct(lit(i).as("row"), cmsBucket(keyCol, i, w).as("bucket"))): _*))
    df.select(partCol.as("part"), cells.as("c"))
      .select(col("part"), col("c.row").as("row"), col("c.bucket").as("bucket"))
      .groupBy(col("part"), col("row"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Merge partial CMS cell relations ([[cmsCellsBy]] output, or a union of
    * several) by cell-wise SUM into one [[cmsBuild]]-shaped sketch. */
  def cmsMergeCells(cells: DataFrame): DataFrame =
    cells.groupBy(col("row"), col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** CMS point estimates for `keys`: min over the d cells each key hashes
    * to. `sketch` is [[cmsBuild]] output (broadcast-small: ≤ d·w rows). */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: Column,
                  d: Int = 4, w: Int = 512): DataFrame = {
    val probes = keys.select(keyCol.as("key"),
      explode(array((0 until d).map(i =>
        struct(lit(i).as("row"), cmsBucket(keyCol, i, w).as("bucket"))): _*)).as("c"))
      .select(col("key"), col("c.row").as("row"), col("c.bucket").as("bucket"))
    probes.join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy(col("key")).agg(min(col("cnt")).as("n_cms"))
  }

  /** SQL mirror of [[cmsBucket]] for the oracle (same md5-prefix integer). */
  def cmsBucketSql(keyExpr: String, i: Int, w: Int): String = {
    val hexVal = (1 to 8).map(j =>
      s"(strpos('0123456789abcdef', substr(md5('$i:' || CAST($keyExpr AS VARCHAR)), $j, 1)) - 1) * ${1L << (4 * (8 - j))}")
      .mkString(" + ")
    s"(($hexVal) % $w)"
  }

  // ---- Bloom filter (runtime semi-join reduction) ------------------------

  /** Bit position of hash function `i` for `key` in an `mBits`-bit Bloom
    * filter: salted xxhash64 mod mBits. Deliberately NOT the md5 family the
    * oracle-mirrored sketches use: a Bloom prune needs no cross-engine
    * reproducibility (its correctness contract is only no-false-negatives —
    * the exact join downstream owes the oracle answer), and xxhash64 is a
    * codegen'd native hash, ~10x cheaper than md5's string-convert +
    * digest + hex-parse on the per-row hot path the prune lives in. */
  private def bloomPos(key: Column, i: Int, mBits: Int): Column =
    pmod(xxhash64(lit(i), key), lit(mBits.toLong))

  /** Build an `mBits`-bit Bloom filter of `keyCol` as ONE row holding a
    * dense array<bigint> of mBits/64 words.
    *
    * Why this exists: the classic 100 TB join-reduction move. A semi join
    * whose probe side is the 100 TB fact table shuffles every probe row to
    * its key's reducer before most of them are discarded. A Bloom filter of
    * the (small, filtered) build side is kilobytes; broadcast it and drop
    * the non-matching probe rows AT THE SCAN, before the exchange — no
    * false negatives, so a cheap exact join on the survivors gives the
    * exact answer while the shuffle carries only ~hit-rate of the input.
    * (Spark's own runtime row-group Bloom pruning can't be steered
    * per-query from the API; this is the explicit, plan-visible form.)
    *
    * Plan shape: build rows → k narrow (word, mask) cells → groupBy(word)
    * BIT_OR (map-side partial; exchange carries ≤ mBits/64 rows per
    * partition, constant in build size) → dense-array assembly against
    * `spark.range(mBits/64)` so absent words are explicit zeros and the
    * array index is positional. Everything stays in DataFrame land — no
    * driver-side bitset, no UDF. */
  def bloomBuild(df: DataFrame, keyCol: Column, mBits: Int = 1 << 16,
                 k: Int = 5): DataFrame = {
    require(mBits % 64 == 0 && mBits >= 64 && k >= 1 && k <= 16)
    val nWords = mBits / 64
    val cells = explode(array((0 until k).map(i => bloomPos(keyCol, i, mBits)): _*))
    val words = df.select(cells.as("pos"))
      .select((col("pos") / 64).cast("long").as("word_idx"),
        expr("shiftleft(1L, cast(pos % 64 as int))").as("mask"))
      .groupBy(col("word_idx")).agg(expr("bit_or(mask)").as("word"))
    words.sparkSession.range(nWords).toDF("word_idx")
      .join(words, Seq("word_idx"), "left")
      .select(col("word_idx"), coalesce(col("word"), lit(0L)).as("word"))
      .agg(sort_array(collect_list(struct(col("word_idx"), col("word")))).as("ws"))
      .select(transform(col("ws"), s => s.getField("word")).as("words"))
  }

  /** All-k-bits-set membership predicate: word lookup is positional
    * element_at (1-based), the mask a variable shift (the Scala shiftleft
    * builder only takes a literal count — call_function routes to the SQL
    * form that shifts by an expression). Codegen'd integer ops throughout;
    * the per-hash-row md5 appears twice (word index + bit) and codegen's
    * common-subexpression elimination collapses the pair. */
  def bloomMightContain(key: Column, words: Column, mBits: Int, k: Int): Column =
    (0 until k).map { i =>
      val pos = bloomPos(key, i, mBits)
      element_at(words, (pos / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pmod(pos, lit(64L)).cast("int"))) =!= 0L
    }.reduce(_ && _)

  /** Prune `probe` rows whose `probeKey` is certainly absent from the
    * filter, as a PURE SCAN PREDICATE: the words array is materialized
    * (one metadata-sized action — mBits/64 longs, kilobytes regardless of
    * build cardinality, the same driver-list budget as the IVF probed-cell
    * set) and inlined as a literal, so the test is a plain filter on probe
    * columns that PushPredicateThroughJoin drives below every downstream
    * join, onto the scan. This is the shape of Spark's own injected
    * runtime filters, made explicit and steerable.
    *
    * Why not stay lazy with a broadcast crossJoin of the 1-row words
    * relation? Measured on the o13 plan: the predicate then references the
    * joined words column, so it CANNOT sink below the subsequent semi
    * join — Catalyst broadcast the exact join first and the bloom test ran
    * AFTER it, pure overhead. A runtime filter only pays when it reaches
    * the scan side of the exchange; pinning that requires the predicate to
    * be join-free.
    *
    * Output is an exact SUPERSET of the true matches (no false
    * negatives) — compose with a real join on the survivors for exact
    * semantics. */
  def bloomPrune(probe: DataFrame, probeKey: Column, bloom: DataFrame,
                 mBits: Int = 1 << 16, k: Int = 5): DataFrame = {
    require(mBits % 64 == 0 && k >= 1 && k <= 16)
    val words = bloom.select(col("words")).head().getSeq[Long](0).toArray
    probe.filter(bloomMightContain(probeKey, lit(words), mBits, k))
  }

  // ---- Histogram quantiles (percentiles without a global sort) -----------

  /** Quantile estimates of `valueCol` from a fixed-bin histogram: per
    * requested quantile one row (q_str, rnk, bin, est).
    *
    * The 100 TB shape for percentiles: an exact quantile needs a global
    * sort (full-data range exchange); a histogram needs ONE narrow
    * groupBy(bin) COUNT — the exchange carries ≤ nBins integer cells per
    * partition, constant in data size — plus a min/max pre-pass that is
    * itself a partial-aggregated scan. Estimate error is bounded by the
    * bin width (hi−lo)/nBins.
    *
    * Determinism inventory: bin ids and counts are exact integers from
    * exactly rounded IEEE arithmetic on (value, lo, hi) — identical on any
    * engine; the cumulative walk is an ORDER BY bin window over ≤ nBins
    * rows (bounded relation — a single-partition window here is by
    * construction metadata-sized, not a scale smell); rank and the final
    * interpolation are mirrored expression-for-expression in the oracle,
    * with quantile fractions passed as shared literal STRINGS so both
    * engines parse the identical double. `qs` entries must be decimal
    * literals in (0,1]. */
  /** Histogram cells per partition under a SHARED bin spec: (part, bin,
    * cnt). The merge contract this relation carries — and o20 pins — is
    * that per-partition cells combine into the global histogram by
    * cell-wise SUM *iff the bin spec (lo, hi, nBins) is shared across
    * partitions*: each day binning against its own min/max would put the
    * same value in different bins and no cell algebra could reconcile
    * them. That is exactly why production pipelines fix the spec up front
    * (or use rank-mergeable sketches); here the spec is one global
    * broadcast min/max pre-pass. Completes the mergeable-partial matrix
    * beside HLL min-merge (o16, idempotent) and CMS sum-merge (o17,
    * multiset): histogram cells sum-merge like CMS — replays double-count.
    */
  def histCellsByPart(df: DataFrame, valueCol: Column, nBins: Int,
                      partCol: Column): DataFrame = {
    require(nBins >= 2)
    val st = df.agg(min(valueCol).as("lo"), max(valueCol).as("hi"))
    val width = (col("hi") - col("lo")) / lit(nBins)
    val bin = when(col("hi") === col("lo"), lit(0L))
      .otherwise(least(floor((valueCol - col("lo")) / width), lit(nBins - 1L)))
    df.crossJoin(broadcast(st)).select(partCol.as("part"), bin.as("bin"))
      .groupBy(col("part"), col("bin")).agg(count(lit(1)).as("cnt"))
  }

  def histQuantiles(df: DataFrame, valueCol: Column, nBins: Int,
                    qs: Seq[String]): DataFrame = {
    require(nBins >= 2 && qs.nonEmpty)
    val st = df.agg(min(valueCol).as("lo"), max(valueCol).as("hi"),
      count(lit(1)).as("n"))
    val width = (col("hi") - col("lo")) / lit(nBins)
    val bin = when(col("hi") === col("lo"), lit(0L))
      .otherwise(least(floor((valueCol - col("lo")) / width), lit(nBins - 1L)))
    val counts = df.crossJoin(broadcast(st)).select(bin.as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
    import org.apache.spark.sql.expressions.Window
    // global window over the BIN relation (nBins rows) — metadata, not data
    val cum = counts.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("bin"))))
    val qRows = qs.map(q =>
      s"SELECT '$q' AS q_str, CAST('$q' AS DOUBLE) AS q").mkString(" UNION ALL ")
    val ranks = df.sparkSession.sql(qRows).crossJoin(broadcast(st))
      .select(col("q_str"),
        greatest(lit(1L), ceil(col("q") * col("n")).cast("long")).as("rnk"),
        col("lo"), col("hi"))
    ranks.join(cum,
        col("cum") >= col("rnk") && col("cum") - col("cnt") < col("rnk"))
      .select(col("q_str"), col("rnk"), col("bin"),
        when(col("hi") === col("lo"), col("lo"))
          .otherwise(col("lo") + (col("hi") - col("lo")) / lit(nBins) *
            (col("bin") + (col("rnk") - (col("cum") - col("cnt"))).cast("double") / col("cnt")))
          .as("est"))
  }
}
