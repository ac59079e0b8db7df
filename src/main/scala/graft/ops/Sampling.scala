package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data assembly.
  *
  * `rand()`-based sampling is non-reproducible across retries, repartitions,
  * and engines — a training-mix built with it can never be audited or
  * rebuilt. These operators derive the keep/drop decision from a salted md5
  * of the row KEY, so the same row makes the same decision everywhere: the
  * sample is a pure per-row filter (codegen'd, no shuffle, no state), any
  * engine can reproduce it, and changing the salt draws an independent
  * sample. This is how large corpus pipelines pin train/val membership and
  * domain mixture weights at 100 TB.
  */
object Sampling {

  private val Two32 = 4294967296.0 // 2^32

  /** 32-bit uniform hash of (salt, key): integer value of the first 8 hex
    * chars of md5("salt:key"). Any engine reproduces it from the same md5. */
  def hash32(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** Integer keep-threshold for a sampling fraction (exact compare — no
    * double arithmetic at filter time). */
  def threshold(fraction: Double): Long = math.round(fraction * Two32)

  /** Reproducible Bernoulli sample: keep rows whose salted key-hash falls
    * below fraction·2^32. */
  def seededSample(df: DataFrame, key: Column, fraction: Double,
                   salt: String = "sample"): DataFrame =
    df.filter(hash32(key, salt) < threshold(fraction))

  /** Exactly-k-per-domain deterministic panel (eval sets, human-review
    * batches): rows ranked within each domain by their salted key-hash —
    * a reproducible shuffle — and the first k kept. Compiles to
    * WindowGroupLimit: bounded per-domain heaps on both sides of the
    * exchange, never a full per-domain sort. */
  def domainPanel(df: DataFrame, key: Column, domain: Column, k: Int,
                  salt: String = "panel"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(domain).orderBy(hash32(key, salt), key)
    df.withColumn("panel_rank", row_number().over(w)).filter(col("panel_rank") <= k)
  }

  /** Stratified sample of EXACTLY `total` rows with largest-remainder
    * (Hamilton) allocation across strata: quota_s = ⌊total·N_s/N⌋ plus one
    * extra for the (total − Σ⌊·⌋) strata with the largest remainders
    * total·N_s mod N (ties broken by stratum value) — Σ quota_s = total
    * EXACTLY, the property proportional rounding loses and eval-set
    * builders need ("exactly 200 docs, lang shares preserved"). Within a
    * stratum the quota is filled by the salted-hash order ([[hash32]]) — a
    * reproducible shuffle, so the selection is deterministic end to end
    * and every decision is integer arithmetic.
    *
    * Plan shape: stratum sizes are one narrow aggregation; the quota table
    * is strata-sized (metadata) and broadcast back; the per-stratum fill
    * is a WindowGroupLimit-bounded rank (k rows per stratum cross the
    * exchange, never a full sort). Requires total ≤ N (caller's contract;
    * a stratum smaller than its quota yields fewer rows — surfaced by the
    * n_sel column, not silently rebalanced).
    *
    * Returns the selected rows (stratum, key, pick_rank) — pick_rank is
    * the 1-based position in the stratum's hash order. */
  def stratifiedExact(df: DataFrame, key: Column, stratum: Column,
                      total: Int, salt: String = "strat"): DataFrame = {
    require(total >= 1)
    import org.apache.spark.sql.expressions.Window
    val sizes = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_s"))
    val withN = sizes.crossJoin(broadcast(
      sizes.agg(sum(col("n_s")).as("n_tot"))))
    val floorsSum = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // quota floor + remainder; the +1 seats go to the largest remainders
    // (rank over the strata-sized relation — metadata, not data)
    val quotas = withN.select(col("stratum"),
        expr(s"$total * n_s div n_tot").as("q_floor"),
        expr(s"($total * n_s) % n_tot").as("rem"))
      .withColumn("extra_rank",
        row_number().over(Window.orderBy(col("rem").desc, col("stratum"))))
      .withColumn("n_extra",
        (lit(total) - sum(col("q_floor")).over(floorsSum)).cast("long"))
      .select(col("stratum"),
        (col("q_floor") +
          when(col("extra_rank") <= col("n_extra"), 1L).otherwise(0L))
          .as("quota"))
    df.select(stratum.as("stratum"), key.as("key"))
      .withColumn("pick_rank", row_number().over(
        Window.partitionBy(col("stratum"))
          .orderBy(hash32(col("key"), salt), col("key"))))
      .join(broadcast(quotas), "stratum")
      .filter(col("pick_rank") <= col("quota"))
      .select(col("stratum"), col("key"), col("pick_rank"))
  }

  /** Data-constrained epoch allocation (Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models"): distribute a training-token
    * budget across strata by √-temperature weights, capping every stratum
    * at `maxEpochs` passes over its unique tokens (the paper's headline
    * result: repeating much past ~4 epochs stops buying loss), with budget
    * a capped stratum cannot absorb re-distributed to the still-uncapped
    * ones — a bounded water-fill of `rounds` unrolled iterations (each
    * round either drains the pool or caps ≥1 stratum, so #strata rounds
    * reach the fixpoint; the oracle unrolls the SAME count).
    *
    * All integer, overflow-safe at 100 TB: weights on the 1e6 sqrt grid
    * (the x13/c4 convention), per-round shares as `share_bp = w6·10⁴ div
    * Σw6` then `give = pool·share_bp div 10⁴`. Bounds, stated exactly:
    * the w6·10⁴ product needs w6 ≤ ~9.2e14, i.e. a per-stratum unique
    * token mass ≤ ~8.5e17 (≈ 3,400 PB of 4-byte tokens — the 100 TB
    * envelope clears by 4 orders of magnitude); the pool side needs
    * pool·share_bp ≤ Long.Max, i.e. a total budget ≤ ~9.2e14 tokens.
    * Per-round rounding
    * residue (≤ strata tokens) stays in the pool for the next round and
    * is reported, never silently lost. Plan shape: one narrow
    * tokens-per-stratum aggregation; every round is arithmetic over the
    * strata-sized relation with 1-row aggregates broadcast back —
    * metadata-sized regardless of corpus size.
    *
    * @param budgetBp total budget as basis points of the corpus's unique
    *                 token mass (35000 = 3.5 epochs' worth of tokens)
    * @return (stratum, toks, alloc_tokens, epochs_bp, capped) */
  def epochBudget(df: DataFrame, stratum: Column, tokens: Column,
                  budgetBp: Long, maxEpochs: Int, rounds: Int = 3): DataFrame = {
    require(budgetBp >= 0 && maxEpochs >= 1 && rounds >= 1)
    val sizes = df.select(stratum.as("stratum"), tokens.cast("long").as("t"))
      .groupBy(col("stratum")).agg(sum(col("t")).as("toks"))
      .filter(col("toks") > 0)
      .withColumn("w6",
        floor(sqrt(col("toks").cast("double")) * lit(1e6)).cast("long"))
      .withColumn("cap", col("toks") * maxEpochs)
    var st = sizes.crossJoin(broadcast(
        sizes.agg(expr(s"sum(toks) * $budgetBp div 10000").as("budget"))))
      .withColumn("alloc", lit(0L))
    for (_ <- 1 to rounds) {
      val pool = st.agg(
        (first(col("budget")) - sum(col("alloc"))).as("pool"),
        sum(when(col("alloc") < col("cap"), col("w6"))).as("w_act"))
      st = st.crossJoin(broadcast(pool))
        .withColumn("give",
          when(col("alloc") < col("cap") &&
               coalesce(col("w_act"), lit(0L)) > 0,
            expr("pool * (w6 * 10000 div w_act) div 10000")).otherwise(0L))
        .withColumn("alloc", least(col("cap"), col("alloc") + col("give")))
        .drop("give", "pool", "w_act")
    }
    st.select(col("stratum"), col("toks"), col("alloc").as("alloc_tokens"),
      expr("alloc * 10000 div toks").as("epochs_bp"),
      (col("alloc") === col("cap")).cast("int").as("capped"))
  }

  /** [[temperatureExact]] with a per-row WEIGHT instead of a row count:
    * strata are sized by Σweight — here soft-dedup effective tokens, so a
    * source full of near-duplicates gets the share its UNIQUE content
    * earns, not its inflated row count. Shares follow (Σw)^(1/2) on a 1e6
    * floor grid — 1e6 rather than temperatureExact's 1e10 because
    * `total · w` must stay inside BIGINT on BOTH engines at any corpus
    * size (the q22 overflow lesson, solved by grid choice instead of
    * decimal promotion: sqrt keeps the grid value ~√Σw·1e6, so even a
    * 10^18-token stratum stays ~3e15). Quotas by largest remainder, picks
    * by salted hash rank within the stratum — all integer downstream.
    *
    * @return (stratum, key, pick_rank, eff_w, quota) for picked rows. */
  def temperatureExactWeighted(df: DataFrame, key: Column, stratum: Column,
                               weight: Column, total: Int,
                               salt: String = "tempw"): DataFrame = {
    require(total >= 1)
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(stratum.as("stratum"), key.as("key"), weight.as("w"))
    val sizes = rows.groupBy(col("stratum"))
      .agg(sum(col("w")).as("eff_w"))
      .withColumn("w6",
        floor(sqrt(col("eff_w").cast("double")) * lit(1e6)).cast("long"))
    val withW = sizes.crossJoin(broadcast(
      sizes.agg(sum(col("w6")).as("w_tot"))))
    val floorsSum = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val quotas = withW.select(col("stratum"), col("eff_w"),
        expr(s"$total * w6 div w_tot").as("q_floor"),
        expr(s"($total * w6) % w_tot").as("rem"))
      .withColumn("extra_rank",
        // global window over the STRATA relation — metadata, not data
        row_number().over(Window.orderBy(col("rem").desc, col("stratum"))))
      .withColumn("n_extra",
        (lit(total) - sum(col("q_floor")).over(floorsSum)).cast("long"))
      .select(col("stratum"), col("eff_w"),
        (col("q_floor") +
          when(col("extra_rank") <= col("n_extra"), 1L).otherwise(0L))
          .as("quota"))
    rows.withColumn("pick_rank", row_number().over(
        Window.partitionBy(col("stratum"))
          .orderBy(hash32(col("key"), salt), col("key"))))
      .join(broadcast(quotas), "stratum")
      .filter(col("pick_rank") <= col("quota"))
      .select(col("stratum"), col("key"), col("pick_rank"),
        col("eff_w"), col("quota"))
  }

  /** √-temperature stratified allocation — the multilingual-balancing
    * sampler (quota_l ∝ n_l^(1/2)): big languages are down-weighted, small
    * ones up-weighted relative to proportional sampling, the standard
    * rebalancing an LLM data mixture applies before interleaving. α = 1/2
    * is chosen DELIBERATELY: sqrt is IEEE-correctly-rounded (engine-
    * identical), whereas pow(x, 0.7) is libm-ULP-exposed — the constraint
    * that picks the exponent, stated rather than hidden. Each weight
    * floors onto the exact 1e10 grid (floor, not a rounding DECIMAL cast
    * — the g1 lesson) and ALL allocation arithmetic downstream is integer
    * (quota floor + largest remainder, x11's machinery), so seat counts
    * can never drift by a remainder ULP across engines.
    *
    * Plan shape is x11's: strata-sized quota relation broadcast back, a
    * WindowGroupLimit-bounded per-stratum hash-order fill. */
  def temperatureExact(df: DataFrame, key: Column, stratum: Column,
                       total: Int, salt: String = "temp"): DataFrame = {
    require(total >= 1)
    import org.apache.spark.sql.expressions.Window
    val sizes = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_s"))
      .withColumn("w10",
        floor(sqrt(col("n_s").cast("double")) * lit(1e10)).cast("long"))
    val withW = sizes.crossJoin(broadcast(
      sizes.agg(sum(col("w10")).as("w_tot"))))
    val floorsSum = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val quotas = withW.select(col("stratum"), col("n_s"),
        expr(s"$total * w10 div w_tot").as("q_floor"),
        expr(s"($total * w10) % w_tot").as("rem"))
      .withColumn("extra_rank",
        // global window over the STRATA relation — metadata, not data
        row_number().over(Window.orderBy(col("rem").desc, col("stratum"))))
      .withColumn("n_extra",
        (lit(total) - sum(col("q_floor")).over(floorsSum)).cast("long"))
      .select(col("stratum"), col("n_s"),
        (col("q_floor") +
          when(col("extra_rank") <= col("n_extra"), 1L).otherwise(0L))
          .as("quota"))
    df.select(stratum.as("stratum"), key.as("key"))
      .withColumn("pick_rank", row_number().over(
        Window.partitionBy(col("stratum"))
          .orderBy(hash32(col("key"), salt), col("key"))))
      .join(broadcast(quotas), "stratum")
      .filter(col("pick_rank") <= col("quota"))
      .select(col("stratum"), col("key"), col("pick_rank"),
        col("n_s"), col("quota"))
  }

  /** Domain-weighted mixture in ONE pass: each row keeps with its domain's
    * rate (domains absent from `rates` drop). One scan, one codegen'd
    * filter — not a union of per-domain samples. */
  def mixtureSample(df: DataFrame, key: Column, domain: Column,
                    rates: Map[String, Double], salt: String = "mix"): DataFrame = {
    val thr = rates.foldLeft(lit(0L)) { case (acc, (d, r)) =>
      when(domain === d, lit(threshold(r))).otherwise(acc)
    }
    df.filter(hash32(key, salt) < thr)
  }

  /** Token-budget mixture: DERIVE each domain's Bernoulli rate from a
    * corpus-wide token budget instead of taking rates as given ([[
    * mixtureSample]]'s contract) — the "balance k domains into B tokens"
    * step a training-mix pipeline runs before sampling. Budget =
    * total·budgetNum/budgetDen tokens, split equally across domains; a
    * domain that under-supplies its share keeps everything (rate caps
    * at 1).
    *
    * Everything is BIGINT: budget and share by integer division, each
    * domain's keep-threshold = min(2^32, share·2^32 div domainTokens), and
    * membership is `hash32 < thr` — no double ever decides a row, so the
    * selection is bit-reproducible on any engine from md5 alone. (The
    * share·2^32 product bounds the integer path at ~2^31 share tokens;
    * past that, lift the same arithmetic into DECIMAL(38,0) — the
    * thresholds stay exact.)
    *
    * Returns the doc relation tagged (id, dom, n_tok, h, dom_tokens, thr,
    * selected) — callers filter or aggregate as needed. Scale shape: one
    * narrow per-domain token sum (broadcast back), one codegen'd filter;
    * no shuffle of the corpus itself. */
  def tokenBudgetMixture(df: DataFrame, key: Column, domain: Column,
                         tokens: Column, budgetNum: Long, budgetDen: Long,
                         salt: String = "mixbudget"): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0)
    val perDom = df.groupBy(domain.as("dom"))
      .agg(sum(tokens.cast("long")).as("dom_tokens"))
    val totals = perDom.agg(sum(col("dom_tokens")).as("total_tokens"),
      count(lit(1)).as("n_domains"))
    val doms = perDom.crossJoin(broadcast(totals))
      .withColumn("share",
        expr(s"total_tokens * $budgetNum div $budgetDen div n_domains"))
      .withColumn("thr",
        least(lit(1L << 32), expr("share * 4294967296 div dom_tokens")))
      .select(col("dom"), col("dom_tokens"), col("thr"))
    df.select(key.as("id"), domain.as("dom"), tokens.cast("long").as("n_tok"),
        hash32(key, salt).as("h"))
      .join(broadcast(doms), "dom")
      .withColumn("selected", (col("h") < col("thr")).cast("int"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006, A-Res): each row draws u ∈ (0,1] from its salted key
    * hash — u = (hash32 + 1) / 2^32, exact double arithmetic — and the
    * top-k rows by ln(u)/weight are a weighted sample without
    * replacement (P[selected] ∝ weight, marginally). The quality-weighted
    * corpus subset every training-mix pipeline draws, reproducible on any
    * engine because the draw is pure md5 arithmetic.
    *
    * The one transcendental, ln, sits behind a fixed 1e9 truncation (the
    * t9 contract): the rank key floor(ln(u)/w · 1e9) is a BIGINT, so a
    * 1-ULP libm difference between engines can only flip a key whose
    * product lands within ~1e-7 of an integer — and ordering ties break
    * on the key column regardless. The rank-filter top-k compiles to
    * TakeOrderedAndProject (verified in the formatted plan): bounded
    * per-partition heaps merged at the driver, only k rows survive to the
    * row_number window — never a global sort. */
  def weightedTopK(df: DataFrame, key: Column, weight: Column, k: Int,
                   salt: String = "wrs"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = (hash32(key, salt) + lit(1L)).cast("double") / lit(Two32)
    val rankKey =
      floor(log(u) / greatest(weight, lit(1L)).cast("double") * lit(1e9))
        .cast("long")
    df.withColumn("wkey", rankKey)
      .withColumn("wrank",
        row_number().over(Window.orderBy(col("wkey").desc, key)))
      .filter(col("wrank") <= k)
  }

  /** Cumulative hash-range boundaries for [[hashSplit]]: split i owns
    * [boundary(i-1), boundary(i)) of the 2^32 hash space, the LAST split
    * catching the rounding remainder so every row lands somewhere. */
  def splitBoundaries(fractions: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val cums = fractions.scanLeft(0L) { case (acc, (_, f)) => acc + threshold(f) }.tail
    fractions.map(_._1).zip(cums.init :+ (Two32.toLong))
  }

  /** Stable train/validation/test assignment: each row's split is a pure
    * function of its salted key-hash, so membership survives reruns,
    * repartitions, appends, and engine swaps — no row ever migrates between
    * train and holdout when the corpus grows (the leakage mode this op
    * exists to prevent). One codegen'd CASE per row; no shuffle. */
  def hashSplit(df: DataFrame, key: Column, fractions: Seq[(String, Double)],
                salt: String = "split", out: String = "split"): DataFrame = {
    val h = hash32(key, salt)
    val assign = splitBoundaries(fractions).foldRight(lit(null): Column) {
      case ((name, bound), acc) => when(h < bound, lit(name)).otherwise(acc)
    }
    df.withColumn(out, assign)
  }

  /** Deterministic global shuffle for training-data ordering: rows ranked
    * by (salted key-hash, key) — a reproducible random permutation — with a
    * shard id for file-level parallel write. The global position rides the
    * two-pass range-partitioned rank ([[Ranking.globalRowNumber]]), never a
    * single-partition window; the hash order is data-independent, so range
    * boundaries stay balanced at any corpus size. */
  def deterministicShuffle(df: DataFrame, key: Column, shards: Int,
                           salt: String = "shuffle"): DataFrame = {
    require(shards > 0)
    val hashed = df.withColumn("__h", hash32(key, salt))
    Ranking.globalRowNumber(hashed, Seq(col("__h"), key), "pos")
      .withColumn("shard", pmod(col("__h"), lit(shards.toLong)).cast("int"))
      .drop("__h")
  }
}
