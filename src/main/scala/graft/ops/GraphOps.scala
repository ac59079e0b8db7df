package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph algorithms over edge relations — the second family
  * beside [[DedupOps.connectedComponents]]' label propagation.
  *
  * PageRank here is the data-curation signal (centrality over a document
  * similarity graph surfaces representative documents; its inverse flags
  * isolated outliers), not web-scale link analysis — but the execution
  * shape is the classic one: per iteration, one edge-keyed join to pick up
  * source ranks, one narrow groupBy(dst) of partial-aggregated
  * contributions, one left join back onto the node spine. Nothing wider
  * than the edge relation ever shuffles.
  *
  * Determinism contract: each per-edge contribution pr/outdeg is one
  * mirrored IEEE division FLOORED onto an exact 1e-10 integer grid before
  * the (integer, order-independent) sum — floor of a double is engine-
  * identical, whereas a double→DECIMAL cast rounds ties under engine-
  * specific modes (a one-grid-unit divergence observed against DuckDB on
  * exactly-midpoint contributions); the damping update is one mirrored
  * double chain per node. Dangling nodes (no out-edges) contribute
  * nothing — the dropped-mass PageRank variant, stated rather than
  * silently renormalized; ranks still converge and compare, they just
  * don't sum to 1.
  */
object GraphOps {

  /** `iters` damped PageRank iterations over directed `edges` (src, dst)
    * on the node set `nodes` (one column, same name as src/dst ids).
    * Returns (id, pr, out_deg, in_deg). Few-iteration use is the intended
    * shape; for long chains add a lineage cut per iteration (the d6/s8
    * localCheckpoint pattern). */
  def pageRank(nodes: DataFrame, edges: DataFrame, idCol: String,
               srcCol: String, dstCol: String, iters: Int,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "at least one iteration")
    // NOTE (r13 opt, measured and REJECTED): localCheckpoint lineage cuts
    // here (e / spine / per-iteration pr, the bfsHops pattern) made g1 1.6×
    // and g10 6.2× SLOWER at sf0.1 — the uncut plan shares the edge subtree
    // through ReusedExchange in ONE job, while the cuts force sequential
    // materialization jobs. Left uncut deliberately.
    val spine = nodes.select(col(idCol).as("id")).distinct()
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    val indeg = e.groupBy(col("dst")).agg(count(lit(1)).as("in_deg"))
    val n = spine.count()
    var pr = spine.withColumn("pr", lit(1.0) / n)
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr.select(col("id").as("src"), col("pr")), "src")
        .join(outdeg, "src")
        .select(col("dst"),
          floor(col("pr") / col("out_deg") * lit(1e10)).cast("long").as("c"))
      val sums = contrib.groupBy(col("dst"))
        .agg((sum(col("c")).cast("double") / lit(1e10)).as("in_sum"))
      pr = spine
        .join(sums.select(col("dst").as("id"), col("in_sum")), Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) / n + lit(damping) * coalesce(col("in_sum"), lit(0.0)))
            .as("pr"))
    }
    pr.join(outdeg.select(col("src").as("id"), col("out_deg")), Seq("id"), "left")
      .join(indeg.select(col("dst").as("id"), col("in_deg")), Seq("id"), "left")
      .select(col("id"), col("pr"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Personalized PageRank: identical fixed-iteration loop to [[pageRank]]
    * but the teleport mass (1−d) returns ONLY to the seed set (uniform over
    * it), and the walk starts there — scores become seed-relative
    * relevance (the recommendation / curation form: "how reachable is this
    * node from the labeled set"), not global centrality. Same exactness
    * contract as g1: per-edge contributions quantized to e10 BIGINTs so
    * the per-target sums are order-independent, one mirrored double step
    * per iteration. Seed membership is one broadcast-joinable relation;
    * everything else shuffles exactly like pageRank. */
  def personalizedPageRank(nodes: DataFrame, edges: DataFrame, idCol: String,
      srcCol: String, dstCol: String, seeds: DataFrame, iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "at least one iteration")
    // uncut like [[pageRank]] — see the measured-and-rejected note there.
    val spine = nodes.select(col(idCol).as("id")).distinct()
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    val seedSet = seeds.select(col(seeds.columns.head).as("id")).distinct()
      .withColumn("is_seed", lit(1))
    val sn = seedSet.count()
    require(sn > 0, "personalization needs a non-empty seed set")
    def withSeedFlag(base: DataFrame): DataFrame = base
      .join(broadcast(seedSet), Seq("id"), "left")
    var pr = withSeedFlag(spine)
      .select(col("id"), when(col("is_seed") === 1, lit(1.0) / sn)
        .otherwise(lit(0.0)).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr.select(col("id").as("src"), col("pr")), "src")
        .join(outdeg, "src")
        .select(col("dst"),
          floor(col("pr") / col("out_deg") * lit(1e10)).cast("long").as("c"))
      val sums = contrib.groupBy(col("dst"))
        .agg((sum(col("c")).cast("double") / lit(1e10)).as("in_sum"))
      pr = withSeedFlag(spine)
        .join(sums.select(col("dst").as("id"), col("in_sum")), Seq("id"), "left")
        .select(col("id"),
          (when(col("is_seed") === 1, lit(1.0 - damping) / sn).otherwise(lit(0.0))
            + lit(damping) * coalesce(col("in_sum"), lit(0.0))).as("pr"))
    }
    pr
  }

  /** Deterministic Luby maximal-independent-set rounds over the undirected
    * closure of `edges` — the conflict-free canonical-set primitive: when
    * edges mean "these two are near-duplicates / too similar", the MIS is a
    * maximal keep-set in which no two kept items conflict. Priorities are
    * content-derived (md5 of the id, id-suffixed so they are UNIQUE, not
    * just collision-unlikely), so the result is seed-stable across runs and
    * partitionings. Each round, in parallel: a node is SELECTED iff its
    * priority precedes every still-active neighbor's (two adjacent selects
    * are impossible — each would need the smaller priority); selected
    * nodes' active neighbors are REMOVED; survivors stay active for the
    * next round. Isolated nodes select in round 1 (no active neighbor).
    * Fixed `rounds` is the deterministic, oracle-unrollable form (the
    * kCoreRounds contract); Luby's argument kills a constant fraction of
    * edges per round, so few rounds leave few actives. Per round: one
    * neighbor-min aggregation + two key-partitioned anti joins — nothing
    * wider than the edge relation shuffles.
    *
    * Returns (id, state, rnd): state ∈ selected/removed/active, rnd = the
    * round it was decided (0 for still-active). */
  def misRounds(nodes: DataFrame, edges: DataFrame, idCol: String,
      srcCol: String, dstCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1)
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint() // reused every round by both directions
    val nbr = und.select(col("a").as("id"), col("b").as("nb"))
      .union(und.select(col("b").as("id"), col("a").as("nb")))
    // Priority = md5(id) ‖ len(id) ‖ ':' ‖ id. The suffix is a length-
    // prefixed encoding — injective for ARBITRARY string ids (the first ':'
    // always terminates the digits-only length), unlike a fixed-width lpad
    // which silently truncates ids past the pad width and could let two
    // adjacent nodes share a priority. The md5 prefix dominates ordering;
    // the suffix only disambiguates md5 collisions.
    def pri(c: Column): Column = {
      val s = c.cast("string")
      concat(md5(s), length(s).cast("string"), lit(":"), s)
    }
    var active = nodes.select(col(idCol).as("id"), pri(col(idCol)).as("h"))
      .localCheckpoint()
    var decided = active.sparkSession.emptyDataFrame
    var first = true
    for (r <- 1 to rounds) {
      val actNbr = nbr
        .join(active.select(col("id").as("nb"), col("h").as("nb_h")), "nb")
        .join(active.select(col("id")), "id")
      val minNbr = actNbr.groupBy(col("id")).agg(min(col("nb_h")).as("mn"))
      val sel = active.join(minNbr, Seq("id"), "left")
        .filter(col("mn").isNull || col("h") < col("mn"))
        .select(col("id"))
      val rem = nbr.join(sel.select(col("id").as("nb")), "nb")
        .select(col("id")).distinct()
        .join(active.select(col("id")), "id") // removed must have been active
        .join(sel, Seq("id"), "left_anti")    // (disjoint by the argument above)
      val decidedRound = sel.select(col("id"), lit("selected").as("state"),
          lit(r).as("rnd"))
        .unionByName(rem.select(col("id"), lit("removed").as("state"),
          lit(r).as("rnd")))
        // lazy cut (r14 opt, guide §1.2): the eager `active` checkpoint
        // below contains this relation, so one job materializes both
        .localCheckpoint(eager = false)
      decided = if (first) decidedRound else decided.unionByName(decidedRound)
      first = false
      active = active.join(decidedRound.select(col("id")), Seq("id"), "left_anti")
        .localCheckpoint()
    }
    val residual = active.select(col("id"), lit("active").as("state"),
      lit(0).as("rnd"))
    decided.unionByName(residual)
  }

  /** Bounded k-core peeling over the undirected closure of `edges`:
    * `rounds` iterations of "drop every node whose degree in the surviving
    * subgraph is < k". Round 1 filters on full-graph degree; each later
    * round recomputes degrees in the subgraph induced by the previous
    * round's survivors. With enough rounds this converges to the exact
    * k-core; bounded rounds are the deterministic, oracle-unrollable form
    * (the g1 fixed-iteration contract — stated, not hidden).
    *
    * Curation reading: survivors of late rounds sit in genuinely dense
    * similarity regions (a node propped up only by soon-to-be-peeled
    * neighbors drops in the next round); `rounds_survived` is a
    * cheap density ladder. Per round: two key-partitioned semi joins to
    * induce the subgraph + one narrow degree aggregation — nothing wider
    * than the edge relation shuffles, nothing data-sized broadcast.
    *
    * Returns (id, deg, rounds_survived, in_core): full degree, number of
    * peel rounds survived (0 = dropped immediately), and the final
    * survivor flag (1 iff alive after all `rounds`). All integers. */
  def kCoreRounds(nodes: DataFrame, edges: DataFrame, idCol: String,
                  srcCol: String, dstCol: String, k: Int,
                  rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val spine = nodes.select(col(idCol).as("id")).distinct()
    // lineage cuts (r13 opt — the bfsHops pattern, guide §3.3): `und` is
    // referenced twice per round and every `alive` builds on the previous
    // one, so uncut, round r's plan re-derives the (expensive — e.g. the
    // k-NN graph) edge subtree once per reference: the g3 plan was 22,512
    // formatted lines and planning itself became a cost. Checkpointing the
    // edge closure once and each round's survivor set keeps the plan
    // round-local; values are untouched (the relations are deterministic).
    // NOTE: localCheckpoint is EAGER (jobs run at construction) and
    // non-reliable (blocks lost, not recomputed, on executor loss) — the
    // bfsHops/labelProp trade, accepted here for the same reason.
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    val deg = und.select(col("a").as("id")).union(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    var alive = deg.filter(col("deg") >= k).select(col("id")).localCheckpoint()
    var flags = Vector(alive)
    for (_ <- 2 to rounds) {
      val ea = und
        .join(alive.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("id").as("b")), Seq("b"), "left_semi")
      val dr = ea.select(col("a").as("id")).union(ea.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("dk"))
      alive = dr.filter(col("dk") >= k).select(col("id")).localCheckpoint()
      flags = flags :+ alive
    }
    val withFlags = flags.zipWithIndex.foldLeft(
      spine.join(deg, Seq("id"), "left")) { case (acc, (f, i)) =>
      acc.join(f.withColumn(s"__f$i", lit(1L)), Seq("id"), "left")
    }
    val survived = flags.indices.map(i =>
      coalesce(col(s"__f$i"), lit(0L))).reduce(_ + _)
    withFlags.select(col("id"),
      coalesce(col("deg"), lit(0L)).as("deg"),
      survived.as("rounds_survived"),
      coalesce(col(s"__f${flags.size - 1}"), lit(0L)).as("in_core"))
  }

  /** Bounded multi-source BFS over the undirected closure of `edges`:
    * hop distance from the nearest seed, up to `rounds` hops, −1 beyond.
    * The curation reading: distance from a trusted/curated seed set is a
    * propagation-based quality prior (seed expansion), and the bounded
    * horizon is the deterministic, oracle-unrollable form of it (the g1/g3
    * fixed-iteration contract).
    *
    * Execution shape per round: one key-partitioned join of the CURRENT
    * FRONTIER against the edge relation + one anti join against the
    * settled set — the frontier, not the graph, is what moves, so a round
    * costs O(edges incident to the frontier) and nothing data-sized is
    * broadcast. Distances are exact integers.
    *
    * Returns one row per node in `nodes`: (id, dist) with dist ∈ [0,
    * rounds] or −1 if unreached within the horizon. */
  def bfsHops(nodes: DataFrame, edges: DataFrame, idCol: String,
              srcCol: String, dstCol: String, seeds: DataFrame,
              rounds: Int): DataFrame = {
    require(rounds >= 1)
    val spine = nodes.select(col(idCol).as("id")).distinct()
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    // lineage cuts (the d6/s8 localCheckpoint pattern): without them round
    // k's plan re-derives the (possibly expensive) edge relation once per
    // union branch — measured 46.7 s → ~1 s on the sf0.1 k-NN graph.
    val nbr = und.select(col("a").as("id"), col("b").as("nb"))
      .union(und.select(col("b").as("id"), col("a").as("nb")))
      .localCheckpoint()
    var settled = seeds.select(col(idCol).as("id")).distinct()
      .join(spine, Seq("id"), "left_semi")
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = settled.select(col("id"))
    for (d <- 1 to rounds) {
      val next = nbr.join(frontier, Seq("id"), "left_semi")
        .select(col("nb").as("id")).distinct()
        .join(settled.select(col("id")), Seq("id"), "left_anti")
        // lazy cut (r14 opt): settled's eager checkpoint below contains
        // `next`, so one job per round materializes both
        .localCheckpoint(eager = false)
      frontier = next
      settled = settled.unionByName(next.withColumn("dist", lit(d.toLong)))
        .localCheckpoint()
    }
    spine.join(settled, Seq("id"), "left")
      .select(col("id"), coalesce(col("dist"), lit(-1L)).as("dist"))
  }

  /** Common-neighbor link prediction over the undirected closure of
    * `edges`: for every NON-adjacent pair with at least `minCn` shared
    * neighbors, the three classic neighborhood scores — common-neighbor
    * count, Jaccard (basis points, integer division), and Resource
    * Allocation Σ 1/deg(z) (floored to exact 1e10 units per the g1 grid
    * discipline, so the sum is an order-independent integer).
    *
    * The wedge enumeration at an intermediate z materializes deg(z)² pairs
    * — the hub hazard triangle counting dodges by orientation, which is
    * NOT available here (every common-neighbor pair is output, not a
    * count). The standard production mitigation is explicit: intermediates
    * with deg(z) > `degCap` are excluded from wedge formation — part of
    * the operator contract (a super-hub shared by millions of pairs
    * carries ~zero link-prediction signal anyway; RA would weight it
    * 1/deg ≈ 0), mirrored in the oracle, and the work bound becomes
    * Σ_{deg(z)≤cap} deg(z)² ≤ cap·m regardless of skew.
    *
    * Returns (id_a, id_b, cn, jacc_bp, ra_e10), id_a < id_b, all
    * integers. */
  def linkPrediction(nodes: DataFrame, edges: DataFrame, idCol: String,
                     srcCol: String, dstCol: String, degCap: Int,
                     minCn: Int): DataFrame = {
    require(degCap >= 1 && minCn >= 1)
    // one lineage cut: und feeds the wedge join, the degree relation AND
    // the non-adjacency anti join — uncut, the edge derivation runs 4×.
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    val nbr = und.select(col("a").as("id"), col("b").as("nb"))
      .union(und.select(col("b").as("id"), col("a").as("nb")))
    val deg = nbr.groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // wedges through bounded-degree intermediates only
    val mid = nbr.select(col("nb").as("z"), col("id"))
      .join(deg.filter(col("deg") <= degCap)
        .select(col("id").as("z"), col("deg").as("degz")), "z")
    val m1 = mid.select(col("z"), col("id").as("id_a"), col("degz"))
    val m2 = mid.select(col("z"), col("id").as("id_b"))
    val scored = m1.join(m2, "z").filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("cn"),
        sum(expr(s"${10000000000L} div degz")).as("ra_e10"))
      .filter(col("cn") >= minCn)
    val nonAdj = scored.join(und,
      scored("id_a") === und("a") && scored("id_b") === und("b"), "left_anti")
    nonAdj
      .join(deg.select(col("id").as("id_a"), col("deg").as("da")), "id_a")
      .join(deg.select(col("id").as("id_b"), col("deg").as("db")), "id_b")
      .select(col("id_a"), col("id_b"), col("cn"),
        expr("cn * 10000 div (da + db - cn)").as("jacc_bp"),
        col("ra_e10"))
  }

  /** Per-node triangle counts and local clustering coefficients over the
    * UNDIRECTED closure of `edges` — the community-density signal beside
    * PageRank's centrality (dense neighborhoods = topical clusters;
    * coefficient 0 at high degree = hub spanning unrelated content).
    *
    * Algorithm is the degree-ordered orientation (Schank & Wagner / Cohen's
    * MapReduce form): orient each undirected edge from the (degree, id)-
    * SMALLER endpoint to the larger, count wedges only at each edge's
    * oriented source, and close them against the canonical edge set. Every
    * triangle has exactly one vertex that precedes both others in the
    * (degree, id) total order, so it is counted exactly once — and the
    * wedge relation is bounded by Σ out_deg², where orientation caps
    * out-degree at O(√m) for ANY degree distribution. That bound is the
    * whole 100 TB story: the naive wedge count at a celebrity hub of
    * degree d materializes d² pairs; oriented, the hub is the TARGET of
    * almost all its edges and its wedge fan-out collapses. No broadcast of
    * anything data-sized, three key-partitioned joins, all-integer output.
    *
    * Returns one row per node in `nodes`: (id, deg, tri, cc_bp) with
    * cc_bp = ⌊2·tri·10⁴ / (deg·(deg−1))⌋ basis points (integer division —
    * no doubles anywhere), 0 for deg < 2. */
  def triangleStats(nodes: DataFrame, edges: DataFrame, idCol: String,
                    srcCol: String, dstCol: String): DataFrame = {
    val spine = nodes.select(col(idCol).as("id")).distinct()
    // und is referenced three times (degree rollup, orientation, the
    // triangle-closing semi join) — checkpointed so the (expensive) edge
    // subtree is derived once (r13 opt, the linkPrediction pattern).
    // NOTE: localCheckpoint is EAGER — building this DataFrame runs Spark
    // jobs before any action, and the non-reliable checkpoint blocks are
    // lost (not recomputed) on executor loss in cluster mode — the same
    // trade bfsHops/labelProp already make.
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    val deg = und.select(col("a").as("id")).union(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val da = deg.select(col("id").as("a"), col("deg").as("dega"))
    val db = deg.select(col("id").as("b"), col("deg").as("degb"))
    val oriented = und.join(da, "a").join(db, "b")
      .select(
        when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
          col("a")).otherwise(col("b")).as("s"),
        when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
          col("b")).otherwise(col("a")).as("t"))
    val o1 = oriented.select(col("s"), col("t").as("x"))
    val o2 = oriented.select(col("s"), col("t").as("y"))
    val wedges = o1.join(o2, "s").filter(col("x") < col("y"))
    val tris = wedges.join(und,
      und("a") === wedges("x") && und("b") === wedges("y"), "left_semi")
    val perNode = tris.select(col("s").as("id"))
      .union(tris.select(col("x").as("id")))
      .union(tris.select(col("y").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("tri"))
    spine.join(deg, Seq("id"), "left").join(perNode, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .select(col("id"), col("deg"), col("tri"),
        when(col("deg") >= 2,
          expr("tri * 2 * 10000 div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("cc_bp"))
  }

  /** Synchronous label propagation (LPA) with clamped seeds — the
    * weak-supervision labeling pass of a training-data pipeline: a small
    * hand-labeled seed set spreads over the similarity graph so the corpus
    * gets machine labels plus an audit trail of how far each label
    * traveled.
    *
    * Semantics (deterministic, oracle-unrollable): each round, every
    * non-seed node takes the MAJORITY label among its labeled neighbors,
    * ties broken by MIN label; nodes with no labeled neighbor carry their
    * previous state; seed nodes are clamped to their given label forever.
    * Directed input edges are symmetrized + distinct'd here, so a mutual
    * kNN edge votes once, not twice.
    *
    * Scale shape per round: one edge↔state equi-join, one narrow
    * (node, label) count aggregate, one windowless argmax via
    * row_number(count DESC, label) bounded per node, two left joins back
    * onto the spine — nothing wider than the edge relation shuffles, same
    * as [[pageRank]]. Lineage is cut per round (localCheckpoint): rounds
    * are sequential by nature; without the cut each round re-plans all
    * predecessors and analysis time goes quadratic.
    */
  def labelPropagation(nodes: DataFrame, seeds: DataFrame, edges: DataFrame,
                       idCol: String, labelCol: String, srcCol: String,
                       dstCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "at least one round")
    val spine = nodes.select(col(idCol).as("id")).distinct()
    val sd = seeds.select(col(idCol).as("id"), col(labelCol).as("slabel"))
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .localCheckpoint() // reused every round; never recompute the kNN
    var state = spine.join(sd, Seq("id"), "left")
      .select(col("id"), col("slabel").as("label"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val votes = e
        .join(state.filter(col("label").isNotNull)
          .select(col("id").as("dst"), col("label").as("nlabel")), "dst")
        .groupBy(col("src"), col("nlabel"))
        .agg(count(lit(1)).as("c"))
      val maj = votes
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
            .orderBy(col("c").desc, col("nlabel"))))
        .filter(col("rn") === 1)
        .select(col("src").as("id"), col("nlabel").as("maj"))
      state = state
        .join(maj, Seq("id"), "left")
        .join(sd, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("slabel"), col("maj"), col("label")).as("label"))
        .localCheckpoint()
    }
    state
  }

  /** HITS hub/authority scores (Kleinberg '99) — UNNORMALIZED integer
    * form: h₀ = 1, then aᵣ(i) = Σ_{j→i} hᵣ₋₁(j) and hᵣ(i) = Σ_{i→j} aᵣ(j)
    * for a fixed round count. HITS rankings are invariant to the positive
    * per-round rescaling the textbook normalization applies, so dropping
    * it keeps every score an EXACT BIGINT — no double ever crosses the
    * engine/oracle boundary (the discipline pageRank needs a 1e10 floor
    * grid for comes free here). Magnitudes grow ~(d²)ʳ per round; with
    * bounded-degree graphs (k-NN, k≤64) and r≤4 they sit far inside Long.
    *
    * Scale shape per round: two edge-sized equi-joins + two narrow keyed
    * sums — identical exchange profile to [[pageRank]]. Nodes without
    * in/out edges score 0, not NULL. */
  def hits(nodes: DataFrame, edges: DataFrame, idCol: String, srcCol: String,
           dstCol: String, rounds: Int = 2): DataFrame = {
    require(rounds >= 1, "at least one round")
    val spine = nodes.select(col(idCol).as("id")).distinct()
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    var h = spine.withColumn("h", lit(1L))
    var a = spine.withColumn("a", lit(0L))
    for (_ <- 1 to rounds) {
      val aSum = e.join(h.select(col("id").as("src"), col("h")), "src")
        .groupBy(col("dst").as("id")).agg(sum(col("h")).as("s"))
      a = spine.join(aSum, Seq("id"), "left")
        .select(col("id"), coalesce(col("s"), lit(0L)).as("a"))
        // lazy cut (r14 opt): h's eager checkpoint below contains `a`
        .localCheckpoint(eager = false)
      val hSum = e.join(a.select(col("id").as("dst"), col("a")), "dst")
        .groupBy(col("src").as("id")).agg(sum(col("a")).as("s"))
      h = spine.join(hSum, Seq("id"), "left")
        .select(col("id"), coalesce(col("s"), lit(0L)).as("h"))
        .localCheckpoint()
    }
    spine.join(a, "id").join(h, "id")
      .select(col("id"), col("a").as("auth"), col("h").as("hub"))
  }
}
