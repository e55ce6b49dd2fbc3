package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a duplicate-pair graph — the step every
  * production dedup pipeline needs BETWEEN candidate-pair generation
  * (exact hash / MinHash / SimHash / n-gram Jaccard) and document
  * selection: near-duplication is not transitive, so pairs (A,B) and
  * (B,C) must collapse into one cluster {A,B,C} with a single
  * canonical survivor, or the pipeline keeps one doc per PAIR instead
  * of one per FAMILY.
  *
  * Algorithm: distributed min-label propagation with pointer jumping.
  * Each round
  *   1. label(v) <- min(label(v), min over neighbors u of label(u))
  *      — one shuffle join edges⋈labels + one groupBy, and
  *   2. label(v) <- label(label(v)) (pointer jump: labels are node
  *      ids, so one self-join) — this halves tree depth per round,
  *      making convergence O(log d) rounds for diameter d instead of
  *      the O(d) of plain propagation (the same doubling idea as the
  *      large-star/small-star alternation of Kiveris et al.,
  *      "Connected Components in MapReduce and Beyond", SoCC'14).
  * Every round ends in `localCheckpoint` — iterative DataFrame loops
  * otherwise grow the lineage linearly and re-execute the whole
  * history each action; the checkpoint also backs the convergence
  * probe's action, so the probe reads cached blocks instead of
  * re-running the round. Labels are SEEDED with the direct-neighbor
  * minimum (round one's propagation fused into the node extraction),
  * so near-clique dup families — the common case — converge in the
  * seeding itself and the loop's first round merely confirms the
  * fixpoint. The iteration cap is a safety rail, not the expected
  * path.
  *
  * At 100 TB the label table is one row per doc in any dup pair —
  * orders of magnitude smaller than the corpus — and each round is
  * two key-partitioned shuffles of that table; nothing is ever
  * collected to the driver except the single-row convergence probe.
  */
object DupClusters {

  /** Cluster assignment for every node of the pair graph: returns
    * (node, cluster_id) where cluster_id is the MIN node id of the
    * component — deterministic canonical labels. `pairs` needs
    * columns `d1`/`d2`; direction does not matter. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // Canonicalize each pair to (min,max) BEFORE the dedup shuffle:
    // distinct then moves half the volume of the doubled edge set, and
    // still collapses a pair present in both directions. Doubling
    // afterwards is a free union feeding the next keyed shuffle.
    val canon = pairs.select(
      least(col("d1"), col("d2")).as("a"),
      greatest(col("d1"), col("d2")).as("b")).distinct()
    // Undirected: propagate both ways. Computed once, pinned — every
    // round re-reads it.
    val edges = canon.union(canon.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    // Seed with round one's neighbor minimum folded into the own id.
    // Extracting the node set alone would cost the same groupBy
    // shuffle; doing the min(b) aggregation in it lands the final
    // label immediately for near-clique dup families (every member
    // sees the minimum directly), so the loop usually only has to
    // CONFIRM convergence instead of running a full extra round.
    var labels = edges.groupBy(col("a").as("node"))
      .agg(min(col("b")).as("nbr"))
      .select(col("node"), least(col("node"), col("nbr")).as("lbl"))
      .localCheckpoint()
    // Convergence probe: labels only ever DECREASE, so the label sum
    // is strictly monotone until the fixpoint — equality of two
    // consecutive sums proves convergence with ONE cheap aggregate
    // per round instead of a change-detection join. Decimal
    // accumulation cannot overflow at any node-id scale.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("lbl").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head()
        .getDecimal(0) // coalesce: an empty pair set must not NPE
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // (1) neighbor minimum, folded with the node's own label. Every
      // labeled node has at least one edge (labels come from edges),
      // so the inner join loses nothing.
      val nbrMin = edges
        .join(labels.select(col("node").as("b"), col("lbl")), "b")
        .groupBy("a").agg(min("lbl").as("nbr"))
      val propagated = labels
        .join(nbrMin, col("node") === col("a"))
        .select(col("node"), least(col("lbl"), col("nbr")).as("lbl"))
      // (2) pointer jump: a label is itself a node id of the same
      // component, so label(label(v)) is one self-join away
      val next = propagated.as("x")
        .join(propagated.select(col("node").as("ln"), col("lbl").as("ll")),
          col("x.lbl") === col("ln"), "left")
        .select(col("x.node").as("node"),
          coalesce(col("ll"), col("x.lbl")).as("lbl"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
    }
    labels.select(col("node"), col("lbl").as("cluster_id"))
  }

  /** Full clustering report over a document table: every doc labeled
    * with its dup-cluster id (its own id when unpaired), the cluster
    * size, and the canonical flag (the min-id doc of each cluster is
    * the survivor a dedup pipeline keeps). */
  def clusterReport(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
    val labeled = docs.select(col("doc_id"))
      .join(cc, col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val sizes = labeled.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"),
        col("cluster_size").cast("long").as("cluster_size"),
        when(col("doc_id") === col("cluster_id"), 1).otherwise(0)
          .cast("int").as("is_canonical"))
      .orderBy("doc_id")
  }

  /** q161: cluster survivor by QUALITY — the production keep-rule a
    * dedup pipeline actually applies: within each near-dup cluster,
    * keep the doc with the most content (longest text; ties to the
    * lowest id), not the arbitrary min-id representative
    * [[clusterReport]] uses. The difference is material: min-id keeps
    * whatever crawled first, best-of-cluster keeps the fullest copy
    * (the Lee et al. 2022 recommendation for near-dup groups).
    *
    * Scale shape: same label propagation as q45, then one PARTITIONED
    * window per cluster (clusters are bounded by the capped pair
    * generation — a keyed shuffle, never a global sort) to rank
    * members by (len DESC, id ASC), and one join back to flag every
    * doc with its cluster's survivor. */
  def clusterBestReport(docs: DataFrame, pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cc = connectedComponents(pairs)
    val labeled = docs.select(col("doc_id"),
        length(col("text")).cast("long").as("len"))
      .join(cc, col("doc_id") === col("node"), "left")
      .select(col("doc_id"), col("len"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val ranked = labeled.withColumn("rn",
      row_number().over(Window.partitionBy(col("cluster_id"))
        .orderBy(col("len").desc, col("doc_id").asc)))
    val survivors = ranked.filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("survivor_id"))
    labeled.join(survivors, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("survivor_id"),
        when(col("doc_id") === col("survivor_id"), 1).otherwise(0)
          .cast("int").as("is_kept"))
      .orderBy("doc_id")
  }
}
