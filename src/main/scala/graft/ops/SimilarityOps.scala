package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over embedding columns
  * (`array<float>`).
  *
  * Brute force is the correctness baseline: broadcast the (small) query set,
  * score every corpus row, per-query top-k via a partitioned window. One
  * broadcast + one shuffle on query_id; corpus is streamed, never collected.
  *
  * The scale path is IVF-style partition pruning ([[ivfTopK]]): assign every
  * corpus vector to its nearest centroid (one pass), then probe only the
  * `nprobe` closest centroids per query — at 100 TB this turns a full-corpus
  * scan into reading ~nprobe/nlist of the data, and the centroid assignment
  * doubles as a physical partitioning key for the stored table.
  */
object SimilarityOps {

  /** Dot product of two double-array columns (sequential fold — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm of a double-array column. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity via composable higher-order functions — kept as the
    * reference implementation; lambdas evaluate interpreted and break
    * whole-stage codegen on the scoring hot loop. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine similarity — native codegen'd expression, numerically identical
    * to [[cosineHof]] (left-to-right accumulation, dot/(√na·√nb)). */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.cosineSim(a, b)

  /** Non-degenerate-vector predicate: a zero-norm vector (padding row,
    * failed encoder) makes cosine NaN, and Spark sorts NaN as the LARGEST
    * double — an unguarded zero vector would rank #1 for every query. All
    * scoring entry points filter on this. */
  private def nonZero(v: Column): Column =
    aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x) > 0

  /** Brute-force cosine top-k: for each row of `queries`, the k most similar
    * rows of `corpus` (self-matches by id are excluded; zero-norm vectors on
    * either side are dropped).
    *
    * @return (query_id, rank, neighbor_id, sim) — ties broken by neighbor id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv")).filter(nonZero(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv")).filter(nonZero(col("cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** IVF-style ANN: cluster the corpus once over `centroids` (id, vec), then
    * per query probe only the `nprobe` nearest centroids' partitions.
    * Approximate: recall depends on nprobe/centroid quality; exact within the
    * probed cells. */
  def ivfTopK(corpusAssigned: DataFrame, centroids: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame =
    scoreProbedCells(corpusAssigned,
      probeCells(queries, centroids, idCol, vecCol, nprobe), idCol, vecCol, k)

  /** The `nprobe` nearest centroids per query: (query_id, qv, centroid_id).
    * A tiny broadcast cross join — both sides are small by construction. */
  def probeCells(queries: DataFrame, centroids: DataFrame, idCol: String,
                 vecCol: String, nprobe: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv")).filter(nonZero(col("qv")))
    val cent = centroids.select(col("centroid_id"),
      col("centroid_vec").cast("array<double>").as("cent_v"))
      .filter(nonZero(col("cent_v")))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("cdist").desc, col("centroid_id"))
    q.crossJoin(broadcast(cent))
      .withColumn("cdist", cosine(col("qv"), col("cent_v")))
      .withColumn("r", row_number().over(wq)).filter(col("r") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id"))
  }

  /** Score the probed cells only: the broadcast join on centroid_id prunes
    * the corpus scan to ~nprobe/nlist of the data. Exact within the cells. */
  def scoreProbedCells(corpusAssigned: DataFrame, probes: DataFrame,
                       idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpusAssigned.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"), col("centroid_id"))
      .filter(nonZero(col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("sim"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Assign each corpus vector to its nearest centroid (cosine). Centroid set
    * must be broadcast-small (IVF nlist ~ sqrt(corpus)).
    *
    * Argmax by AGGREGATION, not window-top-1: a window over the exploded
    * N×nlist relation shuffles every scored row still carrying both vectors
    * (~KB each — at 100k×49 that is a multi-GB exchange, the most
    * spike-sensitive plan in the sf5 sweep), while the aggregate partial-
    * combines map-side so the exchange carries ONE narrow row per vector.
    * The struct ordering key and the array-typed `first` buffer make this a
    * SortAggregate — acceptable: the crossJoin emits each vector's nlist
    * scored rows CONSECUTIVELY, so the partial agg's sort sees pre-sorted
    * runs (near-linear), and the property that matters at scale — a narrow
    * exchange — still holds. Tie-break matches the window form exactly:
    * best csim, then smallest centroid_id (the ordering key sees the
    * negated id; unique ids make it total, so the result is
    * deterministic). */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame,
                        idCol: String, vecCol: String): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol),
      col(vecCol).cast("array<double>").as("__v")).filter(nonZero(col("__v")))
    val cent = centroids.select(col("centroid_id"),
      col("centroid_vec").cast("array<double>").as("cent_v"))
      .filter(nonZero(col("cent_v")))
    c.crossJoin(broadcast(cent))
      .select(col(idCol), col(vecCol),
        col("centroid_id"),
        struct(cosine(col("__v"), col("cent_v")).as("csim"),
          (-col("centroid_id")).as("nid")).as("__s"))
      .groupBy(col(idCol))
      .agg(first(col(vecCol)).as(vecCol),
        max_by(col("centroid_id"), col("__s")).as("centroid_id"))
      .select(col(idCol), col(vecCol), col("centroid_id"))
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * bucketed by SimHash-of-embedding-signs (random-hyperplane LSH without
    * randomness: the sign pattern of selected dimensions is the bucket key,
    * so only same-bucket pairs are compared).
    *
    * The two scale knobs, both surfaced at the query level:
    *   - `signDims` — bucket-key bits. More bits → smaller buckets → a
    *     cheaper self-join but lower recall (a near-dup pair flipping any
    *     keyed sign lands in different buckets).
    *   - `rotations` — multi-probe: rotation `r` buckets on dims
    *     `[r·signDims, (r+1)·signDims)`; a pair is a candidate if ANY
    *     rotation collides. Recall lost to a sign flip in one rotation is
    *     recovered by the others, at `rotations`× bucketing cost — the
    *     standard banding trade (P[miss] = Π_r P[flip in rotation r]).
    *
    * Candidate id pairs are DISTINCT'd before the vectors are joined back
    * for scoring (multi-probe collides the same pair in several rotations;
    * wide rows must exist once per candidate, not once per collision). */
  def embeddingNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, signDims: Int = 8,
                            rotations: Int = 1): DataFrame = {
    val v = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .filter(nonZero(col("v")))
    def key(r: Int) = concat_ws("", (r * signDims until (r + 1) * signDims).map(i =>
      when(col("v")(i) >= 0, lit("1")).otherwise(lit("0"))): _*)
    val keyed = v.select(col("id"),
      posexplode(array((0 until rotations).map(key): _*)).as(Seq("rot", "bucket")))
    val pairs = keyed.as("a")
      .join(keyed.as("b"),
        col("a.rot") === col("b.rot") && col("a.bucket") === col("b.bucket"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    pairs
      .join(v.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(v.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
