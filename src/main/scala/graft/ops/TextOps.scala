package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: tokenization
  * stats, quality scoring, language-ID heuristic, document fingerprinting.
  *
  * All are per-row expressions built from codegen'd builtins — they run inside
  * whole-stage codegen with no shuffle, so they scale linearly with input
  * partitions (the only 100 TB concern is scan bandwidth).
  */
object TextOps {

  /** Whitespace tokenization (the reference-free baseline tokenizer). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Token count. Empty/blank text → 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** A small default stopword list (English function words present in the
    * synthetic corpus). */
  val defaultStopwords: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in", "is")

  /** Fraction of tokens that are stopwords (0 for empty docs). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val sw = array(stopwords.map(lit): _*)
    val n = tokenCount(text)
    when(n === 0, lit(0.0))
      .otherwise(size(filter(tokens(text), t => array_contains(sw, t))).cast("double") / n)
  }

  /** Fraction of characters that are not [a-z0-9 ] after lowercasing —
    * a punctuation/noise proxy used in quality filters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(lower(text), "[a-z0-9\\s]", "")).cast("double") / length(text))

  /** Mean token length in characters (0 for empty docs). */
  def meanTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "\\s+", "")).cast("double") / n)
  }

  /** Composite quality score in [0,1]: rewards mid-length docs with low
    * punctuation and a sane stopword rate (C4/Gopher-style heuristic,
    * deterministic and oracle-expressible). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val swScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    (lenScore + punctScore + swScore) / 3.0
  }

  /** Character n-gram language-ID heuristic: vowel density + marker-character
    * classes. Deterministic, intentionally simple (the synthetic corpus has no
    * real language signal; what matters is reproducible scoring). Returns a
    * language code column. */
  def langIdHeuristic(text: Column): Column = {
    val lower_ = lower(text)
    val n = greatest(length(lower_), lit(1)).cast("double")
    val vowelRatio = (length(lower_) - length(regexp_replace(lower_, "[aeiou]", ""))).cast("double") / n
    val nonAscii = length(regexp_replace(lower_, "[\\x00-\\x7F]", "")) > 0
    when(nonAscii, lit("xx"))
      .when(vowelRatio >= 0.42, lit("en"))
      .when(vowelRatio >= 0.36, lit("es"))
      .otherwise(lit("de"))
  }

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased text.
    * Collision-safe enough for exact-dup detection at 100 TB (128-bit). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Default merge vocabulary for the BPE-ish tokenizer: high-frequency
    * English character pairs (what one round of BPE training on English text
    * learns first). Order = merge priority. */
  val defaultMerges: Seq[String] = Seq(
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar")

  /** BPE-ish subword tokenization pattern. Greedy left-to-right: at each
    * position the highest-priority matching merge is taken, else one
    * non-space character — exactly the scan a regex alternation
    * `(m1|m2|…|\S)` performs. The same token stream falls out under both
    * leftmost-first (Java) and leftmost-longest (RE2/DuckDB) alternation
    * semantics, because every merge is strictly longer than the single-char
    * fallback — which is what makes the op oracle-mirrorable. Merges must be
    * regex-safe literals (the default vocabulary is). */
  def bpeishPattern(merges: Seq[String] = defaultMerges): String =
    merges.mkString("(", "|", "|\\S)")

  /** Subword tokens of the lowercased text (array column). A real BPE vocab
    * plugs in via `merges` — the scan shape is identical, only the vocabulary
    * grows; per-row, codegen'd, no shuffle. */
  def bpeishTokens(text: Column, merges: Seq[String] = defaultMerges): Column =
    regexp_extract_all(lower(text), lit(bpeishPattern(merges)), lit(0))

  /** Subword token count (empty/blank text → 0). */
  def bpeishTokenCount(text: Column, merges: Seq[String] = defaultMerges): Column =
    size(bpeishTokens(text, merges))

  /** Fraction of tokens that are repeats of an earlier token —
    * 1 − |distinct tokens| / |tokens| (Gopher-style repetition signal;
    * 0 for the degenerate single-token doc). Per-row, no shuffle. */
  def dupTokenFraction(text: Column): Column = {
    val toks = tokens(text)
    lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks)
  }

  /** Occurrence count of the most frequent adjacent token 2-gram (0 for
    * docs with fewer than two tokens). Sort the gram array, then the max
    * run length IS the max multiplicity — one pass over the sorted array,
    * no per-row hash map, no shuffle. */
  def topBigramCount(text: Column): Column = {
    val grams = array_sort(
      graft.expressions.MinHashExpressions.wordGrams(text, 2))
    val top = aggregate(grams,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(size(tokens(text)) < 2, lit(0L)).otherwise(top)
  }

  /** Fraction of adjacent-2-gram slots taken by the single most frequent
    * 2-gram (Gopher's top-n-gram filter signal; 0 below two tokens). */
  def topBigramFraction(text: Column): Column = {
    val n = size(tokens(text))
    when(n < 2, lit(0.0))
      .otherwise(topBigramCount(text).cast("double") / (n - 1))
  }

  /** Email / phone patterns for PII scrubbing. Deliberately writable in both
    * Java-regex and RE2 dialects (explicit character classes, no
    * backreferences/lookarounds) so the DuckDB oracle applies the identical
    * pattern. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+1-[0-9]{3}-[0-9]{4}"

  /** Count of pattern matches in the text (0 when none). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Text with emails and phone numbers masked. Per-row, codegen'd — the
    * scrub runs inside the scan at 100 TB like any other projection. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** Corpus-trained bigram language-model score (the CCNet/KenLM-style
    * perplexity-proxy quality filter, trained on the corpus itself): per
    * document, the mean log P(w2|w1) over its bigram occurrences, with
    * P(w2|w1) = C(w1 w2) / C(w1 ·) from global counts. Low (very negative)
    * means = improbable token sequences → filter candidates; high means =
    * repetitive/templated text.
    *
    * Scale shape: the bigram relation is one narrow (id, gram) row per
    * token; the model "training" is two grouped counts over it and the
    * scoring joins key on the same gram/context values (vocabulary-sized
    * build sides, corpus-sized probe — plain shuffled hash joins). Each
    * log term is truncated to DECIMAL(30,10) before the exact sum, so the
    * per-doc mean is order-independent at any parallelism and the oracle
    * reproduces it digit for digit.
    *
    * @return (id, n_bigrams, mean_logp)
    */
  /** Frequency-ranked vocabulary over the corpus (tokenizer-training lite):
    * term → (occurrence count, dense id), ids assigned by count descending
    * with ties broken by term — fully deterministic, so two engines (or two
    * runs over different partitionings) emit the identical id mapping.
    *
    * Scale shape: one narrow (term) row per token occurrence into a
    * partial-aggregated count; the ranking windows over the VOCABULARY
    * (distinct terms — orders of magnitude smaller than the corpus), and
    * `topK` bounds the output. For vocabularies past single-node window
    * size, rank via Ranking.globalRowNumber on the count relation. */
  def vocabulary(corpus: org.apache.spark.sql.DataFrame, textCol: String,
                 topK: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = corpus.select(explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("n_occ"))
    val w = Window.orderBy(col("n_occ").desc, col("term"))
    counts.withColumn("vocab_id", row_number().over(w).cast("long") - 1L)
      .filter(col("vocab_id") < topK)
  }

  /** Sliding-window token chunking with overlap — the context-window
    * chunker a RAG / pretraining pipeline runs before embedding or packing.
    * Chunk i covers tokens [i·stride, i·stride + chunkSize); a start beyond
    * the first is emitted only if it contributes at least one token past
    * its predecessor's end (start + chunkSize − stride < n), so no chunk is
    * a pure suffix of the previous one. The trailing chunk may be short.
    *
    * Built entirely from codegen'd array builtins (sequence → filter →
    * explode → slice): per-document work, no shuffle, and the explode
    * happens AFTER tokenization so the wide text column itself never fans
    * out — each output row carries only its ≤chunkSize token slice. At
    * 100 TB this is scan-bandwidth-bound, embarrassingly parallel. */
  def chunkWithOverlap(corpus: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String, chunkSize: Int,
                       stride: Int): org.apache.spark.sql.DataFrame = {
    require(chunkSize > 0 && 0 < stride && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    corpus.select(col(idCol), tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
      .select(col(idCol),
        explode(filter(sequence(lit(0), col("n") - 1, lit(stride)),
          p => (p === 0) || (p + lit(chunkSize - stride) < col("n"))))
          .as("start"),
        col("toks"))
      .select(col(idCol),
        expr(s"start div $stride").cast("long").as("chunk_id"),
        col("start").cast("long").as("chunk_start"),
        slice(col("toks"), col("start") + 1, lit(chunkSize)).as("chunk"))
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al.,
    * NeurIPS 2023): score every document of the raw pool by its importance
    * weight under hashed bag-of-n-gram language models of a TARGET domain
    * vs the pool, w(doc) = Σ_features [ln p̂_tgt(f) − ln p̂_raw(f)], add-one
    * smoothed over the occupied feature buckets. Features are word unigrams
    * + bigrams hashed into 4096 buckets (3 hex digits of md5 — the t26
    * feature-hashing idiom; hashing is DSIR's defining trick: it bounds the
    * LM dimension on an open vocabulary, and collisions pool counts
    * identically on both engines). The curation pipeline keeps the
    * top-weight documents — the deterministic top-k stand-in for the
    * paper's Gumbel-noise resampling (rand()-free, the x1/x13 membership
    * discipline).
    *
    * Determinism: all counts are exact integers; each bucket's log-ratio is
    * one mirrored IEEE chain truncated to DECIMAL(30,10) before the
    * per-doc sum (the t9 discipline), so doc weights are exact decimals —
    * order-independent, comparable, and rankable without fp ties.
    *
    * Scale shape: the feature relation is token-mass-sized and narrow; the
    * counts partial-aggregate into ≤4096 bucket rows (broadcast-small
    * weight table back onto the feature stream — no wide exchange), the
    * per-doc rollup is one id-keyed exchange. At 100 TB the job is
    * scan-bound: two passes over tokens, one 4096-row side relation.
    *
    * @return one row per non-blank doc: (id, n_feats, w_dec) — w_dec the
    *         exact decimal importance weight. */
  def dsirWeights(corpus: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, isTarget: Column): org.apache.spark.sql.DataFrame = {
    val base = corpus.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"), isTarget.as("tgt"),
        col(textCol).as("t"), tokens(col(textCol)).as("toks"))
    val occ = base.select(col("id"), col("tgt"),
        explode(concat(col("toks"),
          when(size(col("toks")) >= 2,
            graft.expressions.MinHashExpressions.wordGrams(col("t"), 2))
            .otherwise(array().cast("array<string>")))).as("g"))
      .withColumn("bucket",
        conv(substring(md5(col("g")), 1, 3), 16, 10).cast("long"))
      .select(col("id"), col("tgt"), col("bucket"))
    val cnt = occ.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c_raw"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("c_tgt"))
    val tot = cnt.agg(sum(col("c_raw")).cast("long").as("n_raw"),
      sum(col("c_tgt")).cast("long").as("n_tgt"), count(lit(1)).as("v"))
    val wg = cnt.crossJoin(broadcast(tot))
      .withColumn("w",
        (log((col("c_tgt") + 1).cast("double") /
             (col("n_tgt") + col("v")).cast("double"))
          - log((col("c_raw") + 1).cast("double") /
                (col("n_raw") + col("v")).cast("double")))
          .cast("decimal(30,10)"))
      .select(col("bucket"), col("w"))
    occ.join(broadcast(wg), "bucket")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("w_dec"))
  }

  def bigramLmScore(corpus: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String): org.apache.spark.sql.DataFrame = {
    val bg = corpus.select(col(idCol).as("id"),
      explode(graft.expressions.MinHashExpressions.wordGrams(col(textCol), 2)).as("gram"))
      .withColumn("ctx", split(col("gram"), " ").getItem(0))
    val cntB = bg.groupBy(col("gram")).agg(count(lit(1)).as("nb"))
    val cntC = bg.groupBy(col("ctx")).agg(count(lit(1)).as("nc"))
    bg.join(cntB, "gram").join(cntC, "ctx")
      .withColumn("logp", log(col("nb").cast("double") / col("nc").cast("double")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), Exact.avgD(col("logp"), 10).as("mean_logp"))
  }

  /** Bigram PMI collocation discovery: for every adjacent word pair seen at
    * least `minCount` times, the pointwise mutual information
    * ln(P(ab) / (P(a)·P(b))) with P from corpus unigram/bigram counts — the
    * classic collocation statistic (Church & Hanks 1990), the corpus-
    * analysis counterpart of t9's conditional-probability LM score.
    *
    * Determinism: counts are exact integers; the PMI argument is one
    * mirrored chain of exactly rounded IEEE ops (products may exceed 2^53 —
    * still deterministic, identically rounded on both engines); the single
    * ln's libm skew hides behind %.4f (the BM25 reasoning — transcendental
    * outputs don't sit on format midpoints). No ORDER BY on the double:
    * output is the full ≥ minCount SET, so a 1-ULP rank flip can't change
    * membership.
    *
    * Scale shape: token-sized narrow unigram/bigram relations into partial-
    * aggregated counts; the scoring joins are against the VOCABULARY
    * (broadcast-small); totals are one broadcast row each. Docs with < 2
    * tokens are excluded from BOTH counts (wordGrams degenerates there).
    */
  /** Skip-gram co-occurrence counts (the word2vec/GloVe training-prep
    * relation, Mikolov et al. 2013): every token pairs with the `window`
    * tokens FOLLOWING it (distance 1..window), pairs canonicalized unordered
    * (lexicographic least/greatest — binary collation on both engines), and
    * counted corpus-wide. Distinct from [[bigramPmi]], which sees only
    * adjacent pairs: the context window is what embedding trainers consume.
    *
    * Scale shape: pair generation is NARROW — per distance d ∈ 1..window,
    * `zip_with` of the token array against its d-shifted self (two slices),
    * flattened and exploded. The array is referenced at ROW level only: the
    * first cut indexed it with element_at inside a nested transform lambda,
    * and Catalyst re-evaluated the split() PER ELEMENT ACCESS — O(len²)
    * string splits per doc, measured 32.6 s at sf0.1 vs 0.35 s for this
    * form. The positional-self-join alternative (join tokens on
    * (doc, pos±d)) would shuffle the token relation `window` times. The
    * only exchange is the final groupBy on the pair string, a
    * vocabulary²-bounded relation map-side combine crushes. */
  def skipGramPairs(corpus: org.apache.spark.sql.DataFrame, textCol: String,
                    window: Int, minCount: Long): org.apache.spark.sql.DataFrame = {
    require(window >= 1, "window must be >= 1")
    val ws = col("__ws")
    val n = size(ws)
    // distance-d pairs: (ws[i], ws[i+d]) for i = 1..n-d (slice is 1-based);
    // greatest(n-d, 0) keeps slice lengths legal on short docs
    val pairsByDist = (1 to window).map { d =>
      zip_with(
        slice(ws, lit(1), greatest(n - d, lit(0))),
        slice(ws, lit(d + 1), greatest(n - d, lit(0))),
        (a, b) => concat_ws(" ", least(a, b), greatest(a, b)))
    }
    corpus.filter(size(tokens(col(textCol))) >= 2)
      .select(tokens(col(textCol)).as("__ws"))
      .select(explode(flatten(array(pairsByDist: _*))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
      .select(split(col("pair"), " ").getItem(0).as("w_a"),
        split(col("pair"), " ").getItem(1).as("w_b"), col("n_pair"))
  }

  def bigramPmi(corpus: org.apache.spark.sql.DataFrame, textCol: String,
                minCount: Long): org.apache.spark.sql.DataFrame = {
    val t2 = corpus.filter(size(tokens(col(textCol))) >= 2)
    val uni = t2.select(explode(tokens(col(textCol))).as("w"))
    val uc = uni.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val nt = uni.agg(count(lit(1)).as("n_tok"))
    val bg = t2.select(
      explode(graft.expressions.MinHashExpressions.wordGrams(col(textCol), 2)).as("gram"))
    val nb = bg.agg(count(lit(1)).as("n_bg"))
    val bc = bg.groupBy(col("gram")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    bc.withColumn("wa", split(col("gram"), " ").getItem(0))
      .withColumn("wb", split(col("gram"), " ").getItem(1))
      .join(broadcast(uc.select(col("w").as("wa"), col("n_w").as("n_a"))), "wa")
      .join(broadcast(uc.select(col("w").as("wb"), col("n_w").as("n_b"))), "wb")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nb))
      .select(col("gram"), col("n_ab"), col("n_a"), col("n_b"),
        log(col("n_ab").cast("double") * col("n_tok") * col("n_tok") /
          (col("n_a").cast("double") * col("n_b") * col("n_bg"))).as("pmi"))
  }

  /** Inverted index build — term → document frequency + a deterministic
    * capped posting sample (the `topDocs` lowest doc ids, ascending): the
    * retrieval-side data structure behind BM25/t11 and every
    * keyword-filtered corpus slice. The sample is CAPPED on purpose: full
    * posting lists for stop-terms are corpus-sized rows — the 100 TB shape
    * shards each term's postings into bucketed, delta-encoded blocks keyed
    * by (term, shard), and df comes from this same single groupBy; the
    * capped array here is the driver-checkable head of that layout.
    *
    * Determinism: postings are distinct'd, numerically sorted, sliced, then
    * stringified — physical layout cannot reorder them. All exchanges key
    * on the term; the per-doc distinct is token-sized and narrow; the
    * stop-term skew lands in single grouped rows (count + bounded list). */
  def invertedIndex(corpus: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, topDocs: Int = 10): org.apache.spark.sql.DataFrame = {
    require(topDocs >= 1)
    val tok = corpus.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    tok.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        concat_ws(",", transform(
          slice(array_sort(collect_list(col("id"))), 1, topDocs),
          d => d.cast("string"))).as("postings_head"))
  }

  /** BM25 keyword relevance of every document against a fixed query-term
    * set (Robertson/Sparck-Jones probabilistic ranking, the function behind
    * Lucene/Elasticsearch scoring and the lexical half of every
    * training-data quality/retrieval mix). Constants are the universal
    * defaults k1=1.2, b=0.75, baked in as source literals so the Spark side
    * and a SQL oracle parse the IDENTICAL doubles (deriving 1−b or k1+1
    * arithmetically could land 1 ULP off the other engine's parse).
    *
    * idf is the Lucene form ln((N − df + 0.5)/(df + 0.5) + 1) — always
    * positive, so a term in >half the corpus degrades smoothly instead of
    * flipping negative. Every arithmetic step except ln is an exactly
    * rounded IEEE op mirrored expression-for-expression in the oracle; the
    * ln lives per (doc × query-term) row and the per-doc sum routes through
    * an exact DECIMAL(30,10) accumulator (Exact.sumD), so the score is
    * order-independent at any parallelism and 1-ULP libm skew stays behind
    * the 4-decimal output rounding (the t9 contract).
    *
    * Scale shape: token-sized narrow relation → per-doc length rollup; the
    * scoring relation is only (docs containing a query term) × |terms|;
    * corpus stats (N, avgdl) are ONE broadcast row; df is |terms| rows.
    * No shuffle carries anything wider than (id, term, count).
    *
    * @return (id, n_hit = matched query terms, bm25 = summed score)
    */
  /** Per-document top-k TF-IDF keyword extraction: score(t,d) =
    * tf(t,d) · ln(N/df(t)) over the corpus, the k highest-scoring terms
    * per doc — the tagging/labeling pass beside [[bm25]]'s query scoring.
    *
    * Scale shape: tf is one (doc, term)-keyed count, df one term-keyed
    * count over the tf relation (already distinct per doc — no second
    * corpus scan), and the per-doc top-k compiles to WindowGroupLimit
    * (bounded per-doc heaps). Ranking uses the BIGINT-truncated score key
    * (t9 ln contract) with a term tie-break, so order is engine-exact;
    * corpus-wide terms score ln(1) = 0 — stopwords demote themselves, no
    * list needed. */
  def tfidfTopK(corpus: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, k: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = corpus.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"), explode(tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nn = tf.agg(count_distinct(col("id")).as("n"))
    val score = col("tf") * log(col("n").cast("double") / col("df"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("skey").desc, col("term"))
    tf.join(dfq, "term").crossJoin(broadcast(nn))
      .withColumn("score", score)
      .withColumn("skey", floor(col("score") * lit(1e9)).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("term"), col("rank"), col("tf"), col("df"),
        Exact.fmt(col("score"), 6).as("score_r"))
  }

  def bm25(corpus: org.apache.spark.sql.DataFrame, idCol: String,
           textCol: String, queryTerms: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty)
    val toks = corpus.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"), explode(tokens(lower(col(textCol)))).as("term"))
    val dl = toks.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val st = dl.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val norm = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    tf.join(dl, "id").crossJoin(broadcast(st)).join(broadcast(dfq), "term")
      .withColumn("contrib", idf * norm)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hit"), Exact.sumD(col("contrib"), 10).as("bm25"))
  }

  /** Held-out bigram-LM scoring with add-one smoothing — the perplexity
    * filter shape (CCNet-style: score candidate text under a model trained
    * on a REFERENCE corpus) with an n-gram model standing in for the
    * neural one. Differs from [[bigramLmScore]] (self-scored, unsmoothed)
    * exactly where it matters for filtering: unseen bigrams and
    * out-of-vocabulary tokens get finite smoothed mass instead of being
    * structurally impossible.
    *
    * Model: P(w|v) = (c(v,w)+1) / (c(v)+V+1) with counts from `train`,
    * V = |train vocabulary| (+1 absorbs the OOV class); test tokens
    * outside the vocabulary map to a reserved symbol first. Docs with
    * < 2 tokens are excluded from both sides (no bigram to score).
    *
    * Scale shape: train counts are two partial-aggregated token-sized
    * groupBys; the vocabulary map join and the count joins are all keyed
    * on tokens/bigrams (vocabulary-sized right sides); the test-side
    * bigram pairing is one per-doc window over (doc, position) — nothing
    * wider than the token stream shuffles, and V is one broadcast row.
    *
    * @return (id, n_bigrams, n_oov, mean_logp) per test doc. */
  def heldOutLmScore(train: org.apache.spark.sql.DataFrame,
                     test: org.apache.spark.sql.DataFrame,
                     idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val unk = "<unk>"
    def toked(df: org.apache.spark.sql.DataFrame) =
      df.filter(tokenCount(col(textCol)) >= 2)
    val trBg = toked(train).select(
        explode(graft.expressions.MinHashExpressions.wordGrams(col(textCol), 2)).as("gram"))
      .withColumn("ctx", split(col("gram"), " ").getItem(0))
    val cb = trBg.groupBy(col("gram")).agg(count(lit(1)).as("nb"))
    val cc = trBg.groupBy(col("ctx")).agg(count(lit(1)).as("nc"))
    val vocab = toked(train)
      .select(explode(tokens(col(textCol))).as("tok")).distinct()
    val vv = vocab.agg(count(lit(1)).as("v"))
    val teTok = toked(test).select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .join(vocab.withColumn("hit", lit(1)), Seq("tok"), "left")
      .select(col("id"), col("pos"),
        when(col("hit").isNull, lit(unk)).otherwise(col("tok")).as("m"))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val teBg = teTok
      .withColumn("nxt", lead(col("m"), 1).over(w))
      .withColumn("oov", when(col("m") === unk, 1L).otherwise(0L))
    val scored = teBg.filter(col("nxt").isNotNull)
      .withColumn("gram", concat(col("m"), lit(" "), col("nxt")))
      .join(cb, Seq("gram"), "left")
      .join(cc.withColumnRenamed("ctx", "m"), Seq("m"), "left")
      .crossJoin(broadcast(vv))
      .withColumn("logp", log(
        (coalesce(col("nb"), lit(0L)) + 1L).cast("double") /
        (coalesce(col("nc"), lit(0L)) + col("v") + 1L).cast("double")))
    val oov = teBg.groupBy(col("id")).agg(sum(col("oov")).as("n_oov"))
    scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), Exact.avgD(col("logp"), 10).as("mean_logp"))
      .join(oov, "id")
      .select(col("id"), col("n_bigrams"), col("n_oov"), col("mean_logp"))
  }

  /** Typo/variant candidate mining over the corpus vocabulary: distinct
    * tokens, blocked on (first char, ±maxLenDiff length — enforced as a
    * post-filter, the block key is the first char), scored with the native
    * [[graft.expressions.JaroWinkler]] codegen expression (Spark has no
    * builtin; a UDF here would break codegen inside the |block|² hot loop).
    *
    * Scale shape: the self-join runs over the DISTINCT VOCABULARY, not the
    * corpus — vocabulary grows ~Heaps-law sublinearly with corpus size, and
    * the equi-join on the leading character keeps candidate enumeration per
    * block. For CJK-scale alphabets the block key generalizes to a prefix;
    * for skewed Latin initials production would widen the key to the first
    * bigram — same plan shape.
    *
    * Output (term_a < term_b, jw) for pairs with jw > minJw. */
  def typoCandidates(corpus: org.apache.spark.sql.DataFrame, textCol: String,
                     minJw: Double, maxLenDiff: Int = 2): org.apache.spark.sql.DataFrame = {
    val vocab = corpus.filter(length(trim(col(textCol))) > 0)
      .select(explode(tokens(col(textCol))).as("t"))
      .filter(length(col("t")) > 0)
      .distinct()
    val a = vocab.select(col("t").as("term_a"),
      substring(col("t"), 1, 1).as("c1"))
    val b = vocab.select(col("t").as("term_b"),
      substring(col("t"), 1, 1).as("c1b"))
    a.join(b, col("c1") === col("c1b") && col("term_a") < col("term_b"))
      .filter(abs(length(col("term_a")) - length(col("term_b"))) <= maxLenDiff)
      .withColumn("jw", graft.expressions.StringDistance.jaroWinkler(
        col("term_a"), col("term_b")))
      .filter(col("jw") > minJw)
      .select(col("term_a"), col("term_b"), col("jw"))
  }

  /** Separator between BPE symbols inside a packed word string (U+001F unit
    * separator — cannot occur in whitespace-split tokens). */
  val BpeSep = "\u001f"

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are the
    * maximal stopword-free token runs (gaps-and-islands per doc), scored by
    * summing their words' degree/frequency ratios — words that habitually
    * co-occur inside long candidate phrases outrank frequent-but-isolated
    * ones. deg(w) here is Σ over phrase instances containing w of
    * (len − 1), i.e. CO-OCCURRING positions only (the common RAKE variant
    * that scores a lone word 0 rather than 1 — stated, since both exist in
    * the literature); score(w) = deg·1e6 div freq (integer-exact — a
    * rationals sum via per-word integral division, engine-identical);
    * phrase score = Σ over its token positions.
    *
    * Scale shape: the islands window partitions by DOC (never global); the
    * phrase/word relations are output-sized; the score join is against the
    * word-stat relation (vocabulary-bounded). Phrase length is filtered to
    * [minLen, maxLen] AFTER islanding — an island is doc-bounded, so no
    * intermediate exceeds the token relation.
    *
    * @return (phrase, n_words, n_occ, score_e6). */
  def rakeKeywords(corpus: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String] = defaultStopwords,
                   minLen: Int = 2, maxLen: Int = 4,
                   minOcc: Long = 1L): DataFrame = {
    require(minLen >= 1 && maxLen >= minLen)
    import org.apache.spark.sql.expressions.Window
    val sw = array(stopwords.map(lit): _*)
    val toks = corpus
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("did"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
    val wDoc = Window.partitionBy(col("did")).orderBy(col("pos"))
    val phrases = toks.filter(!array_contains(sw, col("w")))
      .withColumn("isl", col("pos") - row_number().over(wDoc))
      .groupBy(col("did"), col("isl"))
      .agg(array_sort(collect_list(struct(col("pos"), col("w")))).as("pw"))
      .select(transform(col("pw"), p => p.getField("w")).as("wsArr"))
      .withColumn("n_words", size(col("wsArr")))
      .filter(col("n_words").between(minLen, maxLen))
      .select(concat_ws(" ", col("wsArr")).as("phrase"), col("n_words"))
    val scores = phrases.select(col("n_words"),
        explode(split(col("phrase"), " ")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("n_words") - 1).as("deg"))
      .select(col("w"), expr("deg * 1000000 div freq").as("score_e6"))
    phrases.groupBy(col("phrase"), col("n_words"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= minOcc)
      .select(col("phrase"), col("n_words"), col("n_occ"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(scores, "w")
      .groupBy(col("phrase"), col("n_words"), col("n_occ"))
      .agg(sum(col("score_e6")).as("score_e6"))
  }

  /** Learned BPE merge table (Sennrich et al. '16 training loop, t28): R
    * rounds of [count adjacent symbol pairs over the vocabulary, weighted
    * by word frequency → merge the most frequent pair everywhere]. Returns
    * one row per learned merge: (round, a, b, n) with n the pair's corpus
    * count at selection time; ties break (n desc, a asc, b asc) so the
    * learned table is engine-independent.
    *
    * Two design points carry the scale and the oracle:
    *  - The loop runs over the DISTINCT-word relation (Heaps-law sublinear
    *    in corpus size), never the corpus: the corpus is scanned once for
    *    word counts, then R rounds touch only the vocabulary. The argmax
    *    collect is ONE row per round — the model boundary, like the
    *    forecaster — and each round is a partial-aggregated pair count
    *    (shuffle carries one row per distinct pair, not per word).
    *  - Greedy-leftmost merge application (BPE's contract, incl. the
    *    overlapping "aaa" case) is exactly left-to-right non-overlapping
    *    string `replace` on the separator-joined symbol string: replacing
    *    "a␟a" in "a␟a␟a" yields "aa␟a". Spark and DuckDB share those
    *    replace semantics, so the oracle unrolls to one (pairs, argmax,
    *    re-segment) CTE triple per merge round with no procedural code. */
  def bpeTrain(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    var v = docs
      .select(explode(tokens(lower(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .select(concat_ws(BpeSep,
        regexp_extract_all(col("term"), lit("."), lit(0))).as("w"), col("freq"))
      // vocabulary is metadata-sized (distinct words); checkpoint so the R
      // per-round plans don't each rescan the corpus for word counts
      .localCheckpoint()
    def pairCounts(vocab: DataFrame): DataFrame = vocab
      .select(col("freq"), split(col("w"), BpeSep).as("syms"))
      .select(col("freq"), explode(expr(
        """transform(slice(syms, 1, size(syms) - 1),
          |  (s, i) -> struct(s AS a, element_at(syms, i + 2) AS b))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("n"))
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = pairCounts(v)
        .orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, a, b, n))
        v = v.withColumn("w",
          replace(col("w"), lit(a + BpeSep + b), lit(a + b)))
      }
      r += 1
    }
    merges.result().toDF("round", "a", "b", "n")
  }

  /** Interpolated Kneser-Ney bigram scoring of held-out docs (Kneser & Ney
    * 1995; the Chen & Goodman 1998 interpolated form with fixed absolute
    * discount D = 3/4) — the published-standard smoothing beside t27's
    * add-one baseline:
    *
    *   P(w|v) = max(c(v,w) − D, 0)/c(v) + D·N1+(v,•)/c(v) · N1+(•,w)/N1+(••)
    *
    * With D = 3/4 every probability is the RATIONAL
    *   num = max(4·c(v,w) − 3, 0)·N1+(••) + 3·N1+(v,•)·N1+(•,w)
    *   den = 4·c(v)·N1+(••)
    * carried as exact longs; an unseen context backs off to the
    * continuation distribution (num = N1+(•,w), den = N1+(••)). The only
    * doubles are one division + ln on engine-identical operands, averaged
    * through the DECIMAL(30,10) accumulator (the t9/t27 contract) behind a
    * 4-decimal rendering. num = 0 (unseen w with no continuation mass) is
    * counted per doc and excluded from the mean, mirrored in the oracle.
    *
    * Scale shape: three grouped counts + one distinct over the train bigram
    * relation (one shuffle each, all partial-aggregated), broadcast of the
    * single N1+(••) row, and per-test-doc windows — nothing pairwise,
    * nothing driver-sided.
    *
    * @return (id, n_bigrams, n_zero, mean_logp). */
  def kneserNeyScore(train: org.apache.spark.sql.DataFrame,
                     test: org.apache.spark.sql.DataFrame,
                     idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def toked(df: org.apache.spark.sql.DataFrame) =
      df.filter(tokenCount(col(textCol)) >= 2)
    val trBg = toked(train).select(
        explode(graft.expressions.MinHashExpressions.wordGrams(col(textCol), 2)).as("gram"))
      .withColumn("ctx", split(col("gram"), " ").getItem(0))
      .withColumn("nxt", split(col("gram"), " ").getItem(1))
    val cb = trBg.groupBy(col("gram")).agg(count(lit(1)).as("c_vw"))
    val cc = trBg.groupBy(col("ctx"))
      .agg(count(lit(1)).as("c_v"), countDistinct(col("nxt")).as("n1v"))
    val cw = trBg.groupBy(col("nxt")).agg(countDistinct(col("ctx")).as("n1w"))
    val nbb = trBg.select(col("gram")).distinct().agg(count(lit(1)).as("nbb"))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val teBg = toked(test).select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("id"), col("tok").as("ctx"), col("nxt"))
    val scored = teBg
      .withColumn("gram", concat(col("ctx"), lit(" "), col("nxt")))
      .join(cb, Seq("gram"), "left")
      .join(cc, Seq("ctx"), "left")
      .join(cw, Seq("nxt"), "left")
      .crossJoin(broadcast(nbb))
      .withColumn("num", when(col("c_v").isNull, coalesce(col("n1w"), lit(0L)))
        .otherwise(
          greatest(coalesce(col("c_vw"), lit(0L)) * 4L - 3L, lit(0L)) * col("nbb")
            + lit(3L) * col("n1v") * coalesce(col("n1w"), lit(0L))))
      .withColumn("den", when(col("c_v").isNull, col("nbb"))
        .otherwise(lit(4L) * col("c_v") * col("nbb")))
    val counts = scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("num") === 0L, 1L).otherwise(0L)).as("n_zero"))
    val means = scored.filter(col("num") > 0L)
      .withColumn("logp", log(col("num").cast("double") / col("den").cast("double")))
      .groupBy(col("id")).agg(Exact.avgD(col("logp"), 10).as("mean_logp"))
    counts.join(means, Seq("id"), "left")
      .select(col("id"), col("n_bigrams"), col("n_zero"), col("mean_logp"))
  }

  /** Gopher stopword set (Rae et al. 2021 §A1.1): a doc must contain at
    * least two of these to pass the stop-word rule. Distinct from
    * [[defaultStopwords]] (a scoring list) — this is the published filter
    * list verbatim. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality-filter rule battery (Rae et al. 2021, "Scaling Language
    * Models: ..." appendix A1.1) — the published document-level heuristics a
    * crawl-scale pretraining pipeline applies before dedup:
    *
    *   1. word count in [50, 100000]
    *   2. mean word length in [3, 10] characters
    *   3. symbol-to-word ratio ('#' chars + '...' occurrences) ≤ 0.1
    *   4. ≤ 90% of lines start with a bullet ("- " / "* ")
    *   5. ≤ 30% of lines end with an ellipsis ("...")
    *   6. ≥ 80% of words contain at least one alphabetic character
    *   7. ≥ 2 distinct words from [[gopherStopwords]] present
    *
    * Rule 1's bounds are parameters (published defaults 50/100 000 words);
    * a snippet-scale corpus lowers minWords rather than discarding
    * everything; rule 7's count is likewise a parameter (published default
    * 2) — the five remaining rules are corpus-independent.
    *
    * EVERY rule is an integer cross-multiplication (10·n_sym ≤ n_words, not
    * n_sym/n_words ≤ 0.1): no ratio double ever exists, so the flags are
    * bit-identical across engines and immune to the q22 overflow class
    * (counters are doc-bounded ints; ×10 cannot overflow). Flags are emitted
    * individually, not only the conjunction — a filtering pipeline tunes and
    * audits rules one at a time (what fraction failed WHICH rule), and the
    * per-rule columns are what that audit reads.
    *
    * Scale shape: pure per-row narrow expressions over one scan — whole-stage
    * codegen, no exchange; the only 100 TB cost is scan bandwidth.
    *
    * @return input columns idCol + counters (n_words, n_lines) + the seven
    *         flags (f_*) + keep, all flags int 0/1. */
  def gopherRules(corpus: DataFrame, idCol: String, textCol: String,
                  minWords: Long = 50L, maxWords: Long = 100000L,
                  minStopwords: Long = 2L): DataFrame = {
    val t = col(textCol)
    val ws = filter(split(trim(t), "\\s+"), w => w =!= "")
    val lines = split(t, "\n")
    // counters (all bigint: len/size products stay far inside long range)
    val nWords = size(ws).cast("long")
    val sumLen = aggregate(ws, lit(0L), (acc, w) => acc + length(w))
    val nAlpha = size(filter(ws, w => w.rlike("[a-zA-Z]"))).cast("long")
    val nHash = (length(t) - length(replace(t, lit("#")))).cast("long")
    // '...' occurrences via non-overlapping leftmost replace — identical
    // semantics in java.lang.String.replace and DuckDB replace()
    val nEll = ((length(t) - length(replace(t, lit("...")))) / lit(3)).cast("long")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l => l.startsWith("- ") || l.startsWith("* "))).cast("long")
    val nEllLines = size(filter(lines, l => l.endsWith("..."))).cast("long")
    val nStop = gopherStopwords
      .map(s => array_contains(ws, s).cast("long")).reduce(_ + _)
    def flag(c: Column): Column = c.cast("int")
    corpus.select(col(idCol),
      nWords.as("n_words"), nLines.as("n_lines"),
      flag(nWords >= minWords && nWords <= maxWords).as("f_wordcount"),
      flag(sumLen >= nWords * 3L && sumLen <= nWords * 10L).as("f_meanlen"),
      flag((nHash + nEll) * 10L <= nWords).as("f_symbol"),
      flag(nBullet * 10L <= nLines * 9L).as("f_bullet"),
      flag(nEllLines * 10L <= nLines * 3L).as("f_ellipsis"),
      flag(nAlpha * 10L >= nWords * 8L).as("f_alpha"),
      flag(nStop >= minStopwords).as("f_stop"))
      .withColumn("keep",
        (col("f_wordcount") * col("f_meanlen") * col("f_symbol") * col("f_bullet")
          * col("f_ellipsis") * col("f_alpha") * col("f_stop")).cast("int"))
  }
}
