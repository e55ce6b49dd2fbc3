package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distributed PageRank in exact integer fixed-point arithmetic.
  *
  * The graph family's second member after the connected-components
  * label propagation (`DupClusters`): an influence ranking over the
  * user co-activity graph. Everything is integer (rank scale 1e6,
  * floor division for both the damping factor and the per-neighbor
  * contribution split), so a fixed iteration count yields the
  * IDENTICAL ranks on any engine — the oracle unrolls the same three
  * iterations in SQL. Real PageRank runs float mass to convergence;
  * the fixed-point/fixed-iteration form trades a bounded quantization
  * error for reproducibility, the same trade every other oracle-
  * checked sketch in this engine makes (portable hashes, integer
  * rationals).
  *
  * Scale shape per iteration: contribs = ranks ⋈ degrees (a keyed
  * join of two |V|-row tables), then one edge-keyed shuffle to sum
  * incoming contributions — O(|E|) per round, the canonical Pregel
  * cost, with NOTHING corpus-sized on the driver. The edge builder
  * caps co-activity groups at [[MaxGroup]] users, so pair fan-out is
  * bounded at cap² per group (the hot-shingle rule applied to graph
  * construction: a flash-crowd hour would otherwise emit quadratic
  * edges and a hub that flattens the ranking).
  */
object GraphRank {

  val MaxGroup = 30L
  val RankScale = 1000000L
  val Iterations = 3

  /** Distinct (day, hour, event-type, user) activity cells — the ONE
    * pass over the events fact table the whole graph family derives
    * from. Callers that need both edges and a user subset (q162's
    * purchase seeds) should checkpoint this frame and branch from it
    * rather than re-scanning events: cells is bounded by
    * users × active-hours, orders of magnitude below |events|. */
  def activityCells(events: DataFrame): DataFrame =
    events.select(
      to_date(col("ts")).as("d"), hour(col("ts")).as("h"),
      col("event_type"), col("user_id")).distinct()

  /** Undirected co-activity edges: two users are linked when they were
    * both active in the same (day, hour, event-type) cell; cells with
    * more than [[MaxGroup]] distinct users are pruned as hubs. */
  def coActivityEdges(events: DataFrame): DataFrame =
    edgesFromCells(activityCells(events))

  /** Per-cell sorted member arrays of hub-pruned cells (≤ [[MaxGroup]]
    * distinct users) — THE capped-membership rule, defined once: every
    * co-activity edge builder (unweighted, weighted, temporal) derives
    * from this one grouped frame, so a change to the hub rule cannot
    * desync one graph family from the rest.
    *
    * ONE cell-keyed aggregation replaces the previous three-shuffle
    * pipeline (countDistinct pre-pass + join-back + member×member
    * self-join): group size is bounded by the cap, so the per-cell
    * pair fan-out the self-join produced through a shuffle now comes
    * from a codegen'd array comprehension over a ≤[[MaxGroup]]-element
    * array — guide §2.4's "remove shuffles outright" applied to the
    * edge build every graph query starts with (measured: the edge
    * materialization was the single largest stage of q100/q162/q227).
    * `collect_set` is order-nondeterministic, so the array is sorted
    * to keep pair generation deterministic; `cells` rows are distinct
    * by construction (activityCells), so set members == cell members. */
  private[graft] def cellMemberSets(cells: DataFrame): DataFrame = {
    val sets = cells.groupBy("d", "h", "event_type")
      .agg(sort_array(collect_set(col("user_id"))).as("us"))
      .filter(size(col("us")) <= MaxGroup)
    // AQE coalesces the small post-aggregation output to ~1 partition,
    // which would serialize the downstream pair EXPLODE (the fan-out
    // is where the work is — worst on the temporal multigraph, where
    // pairs carry per-hour stamps); re-spread the bounded member-set
    // frame so the comprehension runs at full width (guide §2.5's
    // "repartition immediately after the too-narrow input").
    sets.repartition(sets.sparkSession.sparkContext.defaultParallelism)
  }

  /** All ordered (u < v) member pairs of a sorted member array —
    * exactly the pair set the previous `a.user_id < b.user_id`
    * self-join emitted per cell, built array-side. */
  private[graft] def memberPairs(us: Column): Column =
    flatten(transform(us, (x, i) =>
      transform(slice(us, i + lit(2), size(us)), y =>
        struct(x.as("u"), y.as("v")))))

  /** The previous self-join spelling of the capped pair generation,
    * kept as the REFERENCE implementation: GraphEdgeParitySpec pins
    * the grouped-array builders to it row-for-row, so the two can
    * never drift. */
  private[graft] def cellPairsReference(cells: DataFrame): DataFrame = {
    val kept = cells.groupBy("d", "h", "event_type")
      .agg(countDistinct(col("user_id")).as("nu"))
      .filter(col("nu") <= MaxGroup)
      .select("d", "h", "event_type")
    val members = cells.join(kept, Seq("d", "h", "event_type"))
    members.as("a").join(members.as("b"),
      col("a.d") === col("b.d") && col("a.h") === col("b.h") &&
        col("a.event_type") === col("b.event_type") &&
        col("a.user_id") < col("b.user_id"))
  }

  /** [[coActivityEdges]] from a pre-built (possibly checkpointed)
    * [[activityCells]] frame. */
  def edgesFromCells(cells: DataFrame): DataFrame =
    cellMemberSets(cells)
      .select(explode(memberPairs(col("us"))).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .distinct()

  /** Fixed-point PageRank over undirected (u, v) edges: rank scale
    * 1e6, damping 85/100, [[Iterations]] rounds, floor division
    * throughout. Returns (user_id, rank_e6) for every graph node. */
  def pageRank(edges: DataFrame): DataFrame =
    pageRank(edges, Iterations)

  /** [[pageRank]] with an explicit round count (q100 keeps the
    * default [[Iterations]]; the convergence variant reuses this). */
  def pageRank(edges: DataFrame, iterations: Int): DataFrame = {
    // both directions: each undirected edge carries mass both ways.
    // The edge list and degree table feed every iteration (3 plan
    // branches each) — localCheckpoint them ONCE so the edge-build
    // subtree (distinct + group-cap + self-join) isn't re-executed
    // per branch; the same measured pattern as the MinHash signature
    // table. At cluster scale this is the materialized adjacency
    // every Pregel-style engine keeps resident between supersteps.
    val dir = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    val deg = dir.groupBy("u").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var ranks = deg.select(col("u"), lit(RankScale).as("rank_e6"))
    for (_ <- 1 to iterations) {
      ranks = rankRound(dir, deg, ranks)
    }
    ranks
  }

  /** One PageRank superstep: contribs = ranks ⋈ degrees, then an
    * edge-keyed shuffle summing incoming mass — O(|E|). */
  private def rankRound(dir: DataFrame, deg: DataFrame,
      ranks: DataFrame): DataFrame = {
    val contrib = ranks.join(deg, Seq("u"))
      .select(col("u"), expr("rank_e6 div deg").as("c"))
    dir.join(contrib, Seq("u"))
      .groupBy(col("v").as("u"))
      .agg(sum(col("c")).as("in_mass"))
      .select(col("u"),
        (lit(RankScale * 15 / 100) +
          expr("85 * in_mass div 100")).as("rank_e6"))
  }

  /** PageRank iterated to a FIXED POINT instead of a fixed round
    * count: after each superstep an L1 delta probe (sum of absolute
    * rank changes — ONE scalar to the driver, the [[DupClusters]]
    * convergence-probe pattern applied to rank mass) decides whether
    * to continue, bounded by `maxRounds`. Because the arithmetic is
    * integer fixed-point, delta = 0 is an EXACT fixed point — further
    * rounds reproduce the same ranks bit-for-bit, so a converged run
    * agrees with any fixed-iteration run of at least as many rounds
    * (property-tested in SamplingGraphSpec). Each round's ranks are
    * localCheckpointed: the delta probe and the next round both read
    * them, and the lineage would otherwise double per round.
    * Returns (ranks, roundsRun, converged). */
  def pageRankConverged(edges: DataFrame,
      maxRounds: Int = 20): (DataFrame, Int, Boolean) = {
    val dir = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    val deg = dir.groupBy("u").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var ranks = deg.select(col("u"), lit(RankScale).as("rank_e6"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val next = rankRound(dir, deg, ranks).localCheckpoint()
      val delta = next
        .join(ranks.withColumnRenamed("rank_e6", "prev_e6"), Seq("u"))
        .agg(coalesce(sum(abs(col("rank_e6") - col("prev_e6"))), lit(0L))
          .as("d"))
        .head().getLong(0)
      ranks = next
      round += 1
      converged = delta == 0L
    }
    (ranks, round, converged)
  }

  /** One personalized-PageRank superstep: like [[rankRound]] but the
    * teleport base lands only on SEED nodes — mass keeps flowing back
    * toward the seed set instead of spreading uniformly.
    *
    * SPARSE superstep: `ranks` carries only nodes with NONZERO mass.
    * A zero-rank node contributes `0 div deg = 0` to every neighbor
    * and re-derives its own next value from base (0 for a non-seed)
    * plus in-mass alone, so dropping it changes no arithmetic — the
    * dense and sparse iterations are value-identical, and the caller
    * re-densifies over the node spine once at the end. The point is
    * scale: with a localized seed set the live frontier is orders of
    * magnitude smaller than the node set (seeded mass only reaches
    * nodes within i hops by round i), so each round's joins move the
    * frontier, not the whole graph — the same reason push-style PPR
    * (Andersen-Chung-Lang) works on billion-node graphs. */
  private def pprRound(dir: DataFrame, deg: DataFrame, ranks: DataFrame,
      base: DataFrame): DataFrame = {
    val contrib = ranks.join(deg, Seq("u"))
      .select(col("u"), expr("rank_e6 div deg").as("c"))
    val inMass = dir.join(contrib, Seq("u"))
      .groupBy(col("v").as("u"))
      .agg(sum(col("c")).as("m"))
    // next-nonzero support ⊆ base ∪ in-mass: one full-outer equi-join
    // replaces the dense spine's two left joins
    base.join(inMass, Seq("u"), "full_outer")
      .select(col("u"),
        (coalesce(col("base"), lit(0L)) +
          expr("85 * coalesce(m, 0) div 100")).as("rank_e6"))
      .filter(col("rank_e6") > 0)
  }

  /** Personalized PageRank: the teleport vector concentrated on a
    * `seeds` set instead of uniform — rank becomes RELEVANCE TO THE
    * SEEDS, the graph-curation primitive (seed with known-good users/
    * docs, rank everything by seeded mass, harvest the top). Same
    * integer fixed-point discipline as q100: base = 15% of the rank
    * scale on each seed present in the graph, 85/100 damped in-mass,
    * [[Iterations]] unrolled rounds, floor division throughout — the
    * oracle replays the identical iterations in SQL. Scale shape per
    * round is q100's (one keyed join + one edge-keyed shuffle), plus
    * one broadcast-sized base join; seeds outside the graph drop (no
    * edges — no mass to receive or give). Output carries `is_seed`
    * derived from the checkpointed base frame — metadata-scale, no
    * second pass over the seed source. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iterations: Int = Iterations): DataFrame = {
    val dir = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    val deg = dir.groupBy("u").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val base = deg.join(seeds, Seq("u"), "left_semi")
      .select(col("u"), lit(RankScale * 15 / 100).as("base"))
      .localCheckpoint()
    // sparse initial vector: exactly the seeds (every base is nonzero)
    var ranks = base.select(col("u"), col("base").as("rank_e6"))
    for (_ <- 1 to iterations) {
      ranks = pprRound(dir, deg, ranks, base)
    }
    // re-densify once over the node spine: nodes the seeded mass never
    // reached report rank 0, exactly as the dense iteration yielded
    deg.select(col("u"))
      .join(ranks, Seq("u"), "left")
      .join(base.select(col("u"), lit(1).as("is_seed")), Seq("u"), "left")
      .select(col("u"), coalesce(col("rank_e6"), lit(0L)).as("rank_e6"),
        coalesce(col("is_seed"), lit(0)).cast("int").as("is_seed"))
  }

  /** q162: users ranked by relevance to the purchase-active seed set
    * over the co-activity graph — "who moves in the buyers' orbit". */
  def pprQuery(spark: SparkSession, dir: String,
      topN: Int = 100): DataFrame = {
    // one events scan: seeds and edges both branch off the cells
    // frame (distinct purchase users ≡ distinct users of purchase
    // cells), so the fact table is read once and the second pass
    // runs over the materialized metadata-scale cells table.
    val cells = activityCells(Tables.events(spark, dir)).localCheckpoint()
    val seeds = cells.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u")).distinct()
    personalizedPageRank(edgesFromCells(cells), seeds)
      .select(col("u").as("user_id"), col("rank_e6"), col("is_seed"))
      .orderBy(col("rank_e6").desc, col("user_id").asc)
      .limit(topN)
  }

  /** DuckDB oracle for [[pprQuery]] — same cells/edges as q100, the
    * seeded base vector, and the same three unrolled damped
    * iterations. */
  /** ONE oracle spelling of the co-activity graph (cells → capped
    * edges → directed edges → degrees; ends after `deg`, no trailing
    * comma) — shared by q100/q162 and the [[GraphTopology]] oracles so
    * the graph definition cannot drift between family members. */
  private[operators] def edgesOracleCte: String =
    s"""WITH cells AS (SELECT DISTINCT CAST(ts AS DATE) AS d,
           CAST(date_part('hour', ts) AS INT) AS h, event_type, user_id
         FROM events),
       kept AS (SELECT d, h, event_type FROM cells
                GROUP BY 1, 2, 3 HAVING count(*) <= $MaxGroup),
       m AS (SELECT cells.* FROM cells JOIN kept USING (d, h, event_type)),
       e AS (SELECT DISTINCT a.user_id AS u, b.user_id AS v
             FROM m a JOIN m b
               ON a.d = b.d AND a.h = b.h AND a.event_type = b.event_type
                 AND a.user_id < b.user_id),
       dir AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
       deg AS (SELECT u, count(*) AS deg FROM dir GROUP BY 1)"""

  def pprOracleSql: String = {
    val iter = (prev: String, out: String) =>
      s"""$out AS (SELECT n.u,
             coalesce(b.base, 0) + 85 * coalesce(i.m, 0) // 100 AS rank_e6
           FROM nodes n
           LEFT JOIN base b ON b.u = n.u
           LEFT JOIN (SELECT dir.v AS u,
                 sum($prev.rank_e6 // deg.deg) AS m
               FROM dir JOIN $prev ON $prev.u = dir.u
                 JOIN deg ON deg.u = dir.u
               GROUP BY 1) i ON i.u = n.u)"""
    s"""$edgesOracleCte,
       nodes AS (SELECT u FROM deg),
       seeds AS (SELECT DISTINCT user_id AS u FROM events
                 WHERE event_type = 'purchase'),
       base AS (SELECT n.u, ${RankScale * 15 / 100} AS base
                FROM nodes n JOIN seeds s ON s.u = n.u),
       r0 AS (SELECT n.u, coalesce(b.base, 0) AS rank_e6
              FROM nodes n LEFT JOIN base b ON b.u = n.u),
       ${iter("r0", "r1")},
       ${iter("r1", "r2")},
       ${iter("r2", "r3")}
     SELECT r3.u AS user_id, CAST(r3.rank_e6 AS BIGINT) AS rank_e6,
       CAST(CASE WHEN s.u IS NULL THEN 0 ELSE 1 END AS INT) AS is_seed
     FROM r3 LEFT JOIN seeds s ON s.u = r3.u
     ORDER BY rank_e6 DESC, user_id LIMIT 100"""
  }

  /** q100: top-ranked users of the co-activity graph. */
  def pageRankQuery(spark: SparkSession, dir: String,
      topN: Int = 100): DataFrame =
    pageRank(coActivityEdges(Tables.events(spark, dir)))
      .select(col("u").as("user_id"), col("rank_e6"))
      .orderBy(col("rank_e6").desc, col("user_id").asc)
      .limit(topN)

  /** DuckDB oracle for [[pageRankQuery]] — same edges, same three
    * unrolled integer iterations. */
  def pageRankOracleSql: String = {
    val iter = (prev: String, out: String) =>
      s"""$out AS (SELECT dir.v AS u,
             150000 + 85 * sum($prev.rank_e6 // deg.deg) // 100 AS rank_e6
           FROM dir JOIN $prev ON $prev.u = dir.u
             JOIN deg ON deg.u = dir.u
           GROUP BY 1)"""
    s"""$edgesOracleCte,
       r0 AS (SELECT u, $RankScale AS rank_e6 FROM deg),
       ${iter("r0", "r1")},
       ${iter("r1", "r2")},
       ${iter("r2", "r3")}
     SELECT u AS user_id, CAST(rank_e6 AS BIGINT) AS rank_e6
     FROM r3 ORDER BY rank_e6 DESC, u LIMIT 100"""
  }

  /** Weighted co-activity edges: same capped cells as
    * [[coActivityEdges]], but each (u, v) pair keeps HOW MANY cells
    * it shared — the multigraph the distinct() of the unweighted
    * build collapses. */
  def weightedCoActivityEdges(cells: DataFrame): DataFrame =
    cellMemberSets(cells)
      .select(explode(memberPairs(col("us"))).as("p"))
      .groupBy(col("p.u").as("u"), col("p.v").as("v"))
      .agg(count(lit(1)).cast("long").as("w"))

  /** q231: WEIGHTED PageRank — q100 with mass split proportionally
    * to tie strength (shared-cell count) instead of uniformly: the
    * realistic variant, since co-activity ties are not all equal and
    * a pair that shares fifty cells should pull more rank than a
    * one-cell coincidence. Per-edge contribution is
    * rank·w div strength(u) with floor division AT the edge (both
    * engines lose the same remainders), damping 85/100, rank scale
    * 1e6, [[Iterations]] unrolled rounds — the q100 integer
    * discipline on the weighted multigraph.
    *
    * Scale shape: identical to q100 — materialized weighted
    * adjacency + strength table checkpointed once, each round one
    * edge-keyed join + destination-keyed sum. */
  def weightedPageRankQuery(spark: SparkSession, dir: String,
      topN: Int = 100): DataFrame = {
    val edges = weightedCoActivityEdges(
      activityCells(Tables.events(spark, dir)))
    weightedPageRank(edges, Iterations)
      .select(col("u").as("user_id"), col("rank_e6"))
      .orderBy(col("rank_e6").desc, col("user_id").asc)
      .limit(topN)
  }

  /** [[weightedPageRankQuery]]'s core over (u, v, w) undirected
    * weighted edges. */
  def weightedPageRank(edges: DataFrame, iterations: Int): DataFrame = {
    val dir = edges.select(col("u"), col("v"), col("w"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v"),
        col("w")))
      .localCheckpoint()
    val strength = dir.groupBy("u").agg(sum(col("w")).as("s"))
      .localCheckpoint()
    var ranks = strength.select(col("u"), lit(RankScale).as("rank_e6"))
    for (_ <- 1 to iterations) {
      ranks = dir
        .join(ranks, Seq("u")).join(strength, Seq("u"))
        .select(col("v").as("u"),
          expr("rank_e6 * w div s").as("c"))
        .groupBy("u").agg(sum(col("c")).as("in_mass"))
        .select(col("u"),
          (lit(RankScale * 15 / 100) +
            expr("85 * in_mass div 100")).as("rank_e6"))
    }
    ranks
  }

  /** DuckDB oracle for [[weightedPageRankQuery]] — same weighted
    * graph, same [[Iterations]] unrolled integer rounds. */
  def weightedPageRankOracleSql: String = {
    val iter = (prev: String, out: String) =>
      s"""$out AS (SELECT wdir.v AS u,
             ${RankScale * 15 / 100} + 85 *
               sum($prev.rank_e6 * wdir.w // st.s) // 100 AS rank_e6
           FROM wdir JOIN $prev ON $prev.u = wdir.u
             JOIN st ON st.u = wdir.u
           GROUP BY 1)"""
    s"""WITH cells AS (SELECT DISTINCT CAST(ts AS DATE) AS d,
           CAST(date_part('hour', ts) AS INT) AS h, event_type, user_id
         FROM events),
       kept AS (SELECT d, h, event_type FROM cells
                GROUP BY 1, 2, 3 HAVING count(*) <= $MaxGroup),
       m AS (SELECT cells.* FROM cells JOIN kept USING (d, h, event_type)),
       we AS (SELECT a.user_id AS u, b.user_id AS v,
               CAST(count(*) AS BIGINT) AS w
             FROM m a JOIN m b
               ON a.d = b.d AND a.h = b.h AND a.event_type = b.event_type
                 AND a.user_id < b.user_id
             GROUP BY 1, 2),
       wdir AS (SELECT u, v, w FROM we UNION ALL SELECT v, u, w FROM we),
       st AS (SELECT u, sum(w) AS s FROM wdir GROUP BY 1),
       r0 AS (SELECT u, $RankScale AS rank_e6 FROM st),
       ${iter("r0", "r1")},
       ${iter("r1", "r2")},
       ${iter("r2", "r3")}
     SELECT u AS user_id, CAST(rank_e6 AS BIGINT) AS rank_e6
     FROM r3 ORDER BY rank_e6 DESC, u LIMIT 100"""
  }
}
