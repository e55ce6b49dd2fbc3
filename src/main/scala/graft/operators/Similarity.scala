package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.sources.Tables

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k (one pass over all vectors — the
  * exact answer, O(n·d) per query, embarrassingly parallel). Scale
  * path: random-hyperplane LSH bucketing — candidates come from the
  * query's bucket (plus multi-probe neighbors), shrinking the scanned
  * fraction by ~2^planes while keeping recall high for near vectors.
  *
  * All arithmetic uses higher-order array functions (zip_with /
  * aggregate) in double precision — sequential per-row accumulation,
  * deterministic, codegen-friendly, no UDFs.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double —
    * interpreted HOF formulation, kept as the registration-free
    * reference implementation (bit-identical to the codegen'd
    * [[graft.functions.DotProductFloat]]: same sequential order, same
    * double arithmetic). Hot paths register and use the expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Codegen'd dot product (requires VectorFunctions.register on the
    * session — every entry point in this object does it). */
  def dot(a: Column, b: Column): Column = VectorFunctions.dot(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane component for plane `p`,
    * dimension `i`: xxhash64 folded to [-1, 1]. Reproducible across
    * runs/executors with no driver-side randomness. */
  private def planeComponent(p: Int, i: Column): Column =
    (xxhash64(lit(p), i).cast("double") / lit(Long.MaxValue.toDouble))

  /** LSH bucket id: sign bit per hyperplane, packed to a long.
    * A narrow projection — the expensive part (planes×dims hash+mul)
    * runs executor-side inside codegen. `planes = 0` degenerates to a
    * single bucket (exact-recovery configuration: every pair becomes a
    * candidate — used where a downstream check needs full recall). */
  def hyperplaneBucket(vec: Column, planes: Int): Column =
    if (planes <= 0) lit(0L)
    else (0 until planes).map { p =>
      when(aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (s, v) => s + v) > 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact brute-force cosine top-k against the vector with id
    * `queryId`. The query vector is a broadcast-able 1-row frame; the
    * scan is a single narrow pass + TakeOrderedAndProject. */
  def bruteForceTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    VectorFunctions.register(embeddings.sparkSession)
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    Partitioning.spread(embeddings.filter(col("vec_id") =!= queryId))
      .crossJoin(broadcast(q))
      .withColumn("cos", cosine(col("embedding"), col("q_emb")))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"),
        (round(col("cos"), 6) * 1000000).cast("long").as("sim"))
  }

  /** Approximate top-k: only candidates in the query's hyperplane bucket
    * are scored. With `planes` bits the expected candidate fraction is
    * 2^-planes of the corpus; recall for high-cosine neighbors stays
    * high because near-parallel vectors agree on most sign bits.
    *
    * `probeFlips` enables multi-probe: also probe the buckets at
    * hamming distance 1 from the query's (one per flipped plane,
    * `probeFlips <= planes` of them) — the standard recall/cost dial
    * for sign-bit LSH. Scanned fraction grows to (1+probeFlips)/2^planes
    * while recovering neighbors that disagree on exactly one close
    * hyperplane. The probe set stays a broadcast (tiny) side. */
  def lshTopK(embeddings: DataFrame, queryId: Long, k: Int,
              planes: Int, probeFlips: Int = 0): DataFrame = {
    VectorFunctions.register(embeddings.sparkSession)
    val bucketed = Partitioning.spread(embeddings)
      .select(col("vec_id"), col("embedding"),
        hyperplaneBucket(col("embedding"), planes).as("bucket"))
    val q0 = bucketed.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), col("bucket").as("q_bucket"))
    val flips = lit(0L) +:
      (0 until math.min(probeFlips, math.max(planes, 0))).map(p => lit(1L << p))
    val q = q0.select(col("q_emb"),
      explode(array(flips.map(f => col("q_bucket").bitwiseXOR(f)): _*))
        .as("q_bucket"))
    // no dedup needed: a vector lives in exactly one bucket, and the
    // probe buckets are distinct, so each candidate matches once
    bucketed.filter(col("vec_id") =!= queryId)
      .join(broadcast(q), col("bucket") === col("q_bucket"))
      .withColumn("cos", cosine(col("embedding"), col("q_emb")))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"),
        (round(col("cos"), 6) * 1000000).cast("long").as("sim"))
  }

  /** Plane component for the PORTABLE hyperplane family: an integer in
    * [-1000, 1000] derived from the md5 prefix of "p,i" — computed
    * once driver-side and embedded as a literal in BOTH the Spark
    * expression and the generated oracle SQL (the same shared-
    * construction trick as the MinHash permutation family), so the two
    * engines provably use the same planes without per-row hashing. */
  private[graft] def portablePlaneComponent(p: Int, i: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md
      .digest(s"$p,$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2001L - 1000L
  }

  /** Portable hyperplane bucket: sign bits of INTEGER dot products
    * between the quantized embedding and integer plane vectors. Every
    * step is exact 64-bit integer arithmetic (|product sum| bounded by
    * dims·1024·1000 ≈ 2^26), so the bucket assignment is bit-identical
    * in any engine — unlike [[hyperplaneBucket]]'s float sums (the
    * xxhash64 at-scale default), whose accumulation order no oracle
    * can promise to reproduce at the sign boundary. `qv` must be a
    * MATERIALIZED quantized column (HOFs are interpreted; an inline
    * expression would re-quantize once per plane). */
  private def portableBucket(qv: Column, planes: Int, dims: Int): Column =
    if (planes <= 0) lit(0L)
    else (0 until planes).map { p =>
      val cs = array((0 until dims).map(i =>
        lit(portablePlaneComponent(p, i))): _*)
      when(aggregate(zip_with(qv, cs, (x, c) => x * c),
        lit(0L), (s, v) => s + v) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** The q56 portable bucketing applied to an embeddings frame:
    * spread, quantize (qv_i = round(double(x_i)·1024) — exact, power
    * of two), and assign the integer-hyperplane bucket. EVERY
    * portable-LSH entry point (q56 serving, the q150/q151 recall
    * reports, semantic dedup) goes through this one definition, so
    * the recall numbers measure exactly the configuration q56 serves
    * — a change to the quantization scale or plane family cannot
    * desynchronize them. */
  private def portableBucketed(embeddings: DataFrame, planes: Int,
      dims: Int): DataFrame =
    Partitioning.spread(embeddings)
      .select(col("vec_id"), col("embedding"),
        transform(col("embedding"),
          x => round(x.cast("double") * lit(1024)).cast("long")).as("qv"))
      .select(col("vec_id"), col("embedding"),
        portableBucket(col("qv"), planes, dims).as("bucket"))

  /** q150's single probe budget — home bucket + clamped flips. Shared
    * by the engine ([[annRecallQuery]]) and the oracle
    * ([[annRecallOracleSql]]) so the two cannot derive different
    * probe sets from the same (probeFlips, planes). */
  private[graft] def fixedBudget(probeFlips: Int, planes: Int): Int =
    math.min(probeFlips, math.max(planes, 0)) + 1

  /** q56: the approximate ANN path in its portable configuration —
    * genuinely approximate (with `planes` = 6 and 2 probe flips the
    * join scans ~3/64 of the corpus) yet exactly oracle-checkable,
    * because the bucket assignment is integer arithmetic on literal
    * plane constants the oracle SQL recomputes verbatim. Quantization:
    * qv_i = round(double(x_i) · 1024) — float→double is exact and 1024
    * is a power of two, so both engines round identical doubles. */
  def portableLshTopK(embeddings: DataFrame, queryId: Long, k: Int,
                      planes: Int, probeFlips: Int,
                      dims: Int = 64): DataFrame = {
    VectorFunctions.register(embeddings.sparkSession)
    val bucketed = portableBucketed(embeddings, planes, dims)
    val q0 = bucketed.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), col("bucket").as("q_bucket"))
    val flips = lit(0L) +:
      (0 until math.min(probeFlips, math.max(planes, 0))).map(p => lit(1L << p))
    val q = q0.select(col("q_emb"),
      explode(array(flips.map(f => col("q_bucket").bitwiseXOR(f)): _*))
        .as("q_bucket"))
    bucketed.filter(col("vec_id") =!= queryId)
      .join(broadcast(q), col("bucket") === col("q_bucket"))
      .withColumn("cos", cosine(col("embedding"), col("q_emb")))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"),
        (round(col("cos"), 6) * 1000000).cast("long").as("sim"))
  }

  /** q150: the ANN RECALL report — the measurement that decides
    * whether an approximate index is good enough to serve: for a
    * deterministic sample of query vectors, the exact brute-force
    * top-k is compared against the multi-probe portable-LSH top-k
    * (the q56 configuration), reporting per-query candidate volume,
    * hits, and recall. This is how recall is measured at ANY corpus
    * size: the exact side is inherently a brute-force pass, so it is
    * bounded by the QUERY SAMPLE (nQueries constant), never run
    * corpus×corpus — one broadcast of the sample against one corpus
    * scan for the exact side, one bucket-join for the approximate
    * side, and the per-query rank windows partition by query id over
    * sample-bounded row counts. Everything downstream of the cosine
    * ranks is exact integer arithmetic, and the bucket assignment is
    * the portable integer family, so the oracle recomputes the whole
    * report. */
  def annRecallQuery(spark: SparkSession, dir: String,
      nQueries: Int = 4, k: Int = 10, planes: Int = 6,
      probeFlips: Int = 2, dims: Int = 64): DataFrame =
    // the fixed-configuration report IS the curve at one budget: a
    // budget of f+1 probes = home bucket + f flips, exactly the q56
    // probe set (asserted equal in DedupSimilaritySpec)
    annRecallCurveQuery(spark, dir, nQueries, k, planes,
      budgets = Seq(fixedBudget(probeFlips, planes)), dims)
      .drop("budget")

  /** q151: the RECALL CURVE — [[annRecallQuery]] swept over probe
    * budgets in one pass, the actual tuning artifact: q150 reports
    * recall at one configuration; this reports recall-vs-probes so
    * the operator can read off the budget that clears the target.
    * Each vector lives in exactly ONE bucket, so a candidate matches
    * at most one probe (labeled with its flip LEVEL: 0 = home bucket,
    * p+1 = flip of plane p); a budget of b probes admits levels < b,
    * so the candidate table is computed ONCE and a broadcast budgets
    * list fans each candidate into the budgets that include it —
    * no per-budget rescan. Rank windows stay per (qid, budget):
    * sample-bounded × a constant budget list. */
  def annRecallCurveQuery(spark: SparkSession, dir: String,
      nQueries: Int = 4, k: Int = 10, planes: Int = 6,
      budgets: Seq[Int] = Seq(1, 3, 7), dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgets.nonEmpty && budgets.forall(b => b >= 1 && b <= planes + 1))
    VectorFunctions.register(spark)
    val bucketed = portableBucketed(Tables.embeddings(spark, dir),
      planes, dims).localCheckpoint()
    val queries = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("bucket").as("q_bucket"))
    // rank key: ROUNDED integer similarity (round(cos, 6) · 1e6), the
    // q81 lesson — ordering on the raw double would let a last-ulp
    // cross-engine difference flip membership at the rank-k boundary;
    // the rounded key only disagrees when the raw values straddle a
    // 1e-6 rounding edge, and ties break on vec_id in both engines
    val simE6 = (round(cosine(col("embedding"), col("q_emb")), 6)
      * 1000000).cast("long")
    val bySim = Window.partitionBy("qid")
      .orderBy(col("sim").desc, col("vec_id").asc)
    // exact feeds two branches (hits + n_true): checkpoint the
    // corpus×sample cosine pass so it runs once
    val exact = bucketed
      .join(broadcast(queries.select("qid", "q_emb")),
        col("vec_id") =!= col("qid"))
      .withColumn("sim", simE6)
      .withColumn("rn", row_number().over(bySim))
      .filter(col("rn") <= k)
      .select("qid", "vec_id")
      .localCheckpoint()
    // probe levels: 0 = home bucket, p+1 = single-bit flip of plane p.
    // Only levels below the LARGEST budget are generated — a probe no
    // budget admits would add bucket-join fan-out for nothing.
    val levelled = (0 until budgets.max).map(l => struct(lit(l).as("level"),
      (if (l == 0) col("q_bucket")
       else col("q_bucket").bitwiseXOR(lit(1L << (l - 1)))).as("pb")))
    val probes = queries.select(col("qid"), col("q_emb"),
      explode(array(levelled: _*)).as("p"))
      .select(col("qid"), col("q_emb"),
        col("p.level").as("level"), col("p.pb").as("pb"))
    // scored candidates feed approx AND candCounts: score once
    val cand = bucketed
      .join(broadcast(probes),
        col("bucket") === col("pb") && col("vec_id") =!= col("qid"))
      .withColumn("sim", simE6)
      .select("qid", "vec_id", "level", "sim")
      .localCheckpoint()
    val budgetsDf = {
      import spark.implicits._
      budgets.toDF("budget")
    }
    val perBudget = cand.join(broadcast(budgetsDf),
      col("level") < col("budget"))
    val bySimB = Window.partitionBy("qid", "budget")
      .orderBy(col("sim").desc, col("vec_id").asc)
    val approx = perBudget
      .withColumn("rn", row_number().over(bySimB))
      .filter(col("rn") <= k)
      .select(col("qid").as("a_qid"), col("budget").as("a_budget"),
        col("vec_id").as("a_vec"))
    val candCounts = perBudget.groupBy("qid", "budget")
      .agg(count(lit(1)).as("n_candidates"))
    val grid = exact.select("qid").distinct()
      .crossJoin(broadcast(budgetsDf))
    val trueCounts = exact.groupBy("qid").agg(count(lit(1)).as("n_true"))
    val hits = exact.crossJoin(broadcast(budgetsDf))
      .join(approx, col("qid") === col("a_qid") &&
        col("budget") === col("a_budget") && col("vec_id") === col("a_vec"),
        "left_semi")
      .groupBy("qid", "budget").agg(count(lit(1)).as("n_hits"))
    grid
      .join(broadcast(trueCounts), Seq("qid"))
      .join(hits, Seq("qid", "budget"), "left")
      .join(candCounts, Seq("qid", "budget"), "left")
      .select(col("qid"), col("budget").cast("long").as("budget"),
        col("n_true"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        expr("coalesce(n_hits, 0) * 100 div n_true").as("recall_pct"))
      .orderBy("qid", "budget")
  }

  /** DuckDB oracle for [[annRecallCurveQuery]] — same plane
    * constants, the same level-labeled probe set, a VALUES budgets
    * list. */
  def annRecallCurveOracleSql(nQueries: Int = 4, k: Int = 10,
      planes: Int = 6, budgets: Seq[Int] = Seq(1, 3, 7),
      dims: Int = 64): String = {
    val bits = (0 until planes).map { p =>
      val cs = (0 until dims)
        .map(i => portablePlaneComponent(p, i))
        .mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product(CAST(q AS DOUBLE[]), $cs) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("\n           + ")
    val probeBranches = (s"SELECT qid, q_emb, 0 AS level, q_bucket AS pb FROM qs" +:
      (0 until budgets.max - 1).map(p =>
        s"SELECT qid, q_emb, ${p + 1}, xor(q_bucket, ${1L << p}) FROM qs"))
      .mkString("\n                  UNION ALL ")
    val budgetVals = budgets.map(b => s"($b)").mkString(", ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
       qv AS (SELECT vec_id, emb,
           list_transform(emb, x -> CAST(round(x * 1024) AS BIGINT)) AS q
         FROM e),
       b AS (SELECT vec_id, emb, $bits AS bucket FROM qv),
       qs AS (SELECT vec_id AS qid, emb AS q_emb, bucket AS q_bucket
              FROM b WHERE vec_id < $nQueries),
       exact AS (SELECT qid, vec_id FROM (
           SELECT q.qid, b.vec_id,
             row_number() OVER (PARTITION BY q.qid
               ORDER BY CAST(round(list_cosine_similarity(b.emb, q.q_emb),
                   6) * 1000000 AS BIGINT) DESC,
                 b.vec_id) AS rn
           FROM b, qs q WHERE b.vec_id != q.qid)
         WHERE rn <= $k),
       probes AS ($probeBranches),
       cand AS (SELECT p.qid, b.vec_id, p.level,
                  CAST(round(list_cosine_similarity(b.emb, p.q_emb), 6)
                    * 1000000 AS BIGINT) AS sim
                FROM b JOIN probes p
                  ON b.bucket = p.pb AND b.vec_id != p.qid),
       budgets(budget) AS (VALUES $budgetVals),
       pb AS (SELECT c.qid, c.vec_id, c.sim, bu.budget
              FROM cand c JOIN budgets bu ON c.level < bu.budget),
       approx AS (SELECT qid, budget, vec_id FROM (
           SELECT qid, budget, vec_id,
             row_number() OVER (PARTITION BY qid, budget
               ORDER BY sim DESC, vec_id) AS rn
           FROM pb)
         WHERE rn <= $k),
       cc AS (SELECT qid, budget, CAST(count(*) AS BIGINT) AS n_candidates
              FROM pb GROUP BY 1, 2),
       grid AS (SELECT DISTINCT e.qid, bu.budget
                FROM exact e, budgets bu),
       tc AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_true
              FROM exact GROUP BY 1),
       hits AS (SELECT g.qid, g.budget,
                  CAST(count(a.vec_id) AS BIGINT) AS n_hits
                FROM grid g
                  LEFT JOIN exact e ON e.qid = g.qid
                  LEFT JOIN approx a ON a.qid = g.qid
                    AND a.budget = g.budget AND a.vec_id = e.vec_id
                GROUP BY 1, 2)
     SELECT h.qid, CAST(h.budget AS BIGINT) AS budget, tc.n_true,
       h.n_hits, coalesce(cc.n_candidates, 0) AS n_candidates,
       CAST(h.n_hits * 100 // tc.n_true AS BIGINT) AS recall_pct
     FROM hits h
       JOIN tc USING (qid)
       LEFT JOIN cc USING (qid, budget)
     ORDER BY qid, budget"""
  }

  /** DuckDB oracle for [[annRecallQuery]] — the curve oracle at the
    * single probeFlips+1 budget, budget column projected away (the
    * same relationship the engine sides have). */
  def annRecallOracleSql(nQueries: Int = 4, k: Int = 10,
      planes: Int = 6, probeFlips: Int = 2, dims: Int = 64): String = {
    val curve = annRecallCurveOracleSql(nQueries, k, planes,
      budgets = Seq(fixedBudget(probeFlips, planes)), dims)
    s"""SELECT qid, n_true, n_hits, n_candidates, recall_pct
       FROM ($curve) ORDER BY qid"""
  }

  /** q58: SemDeDup-style semantic deduplication — partition the corpus
    * into hyperplane-LSH buckets (the portable integer family, so the
    * oracle recomputes assignments exactly), then within each bucket
    * mark every vector that has a LOWER-id neighbor at cosine >= `tau`
    * as a duplicate of its earliest such neighbor. The scale shape of
    * the published SemDeDup recipe (cluster, then pairwise only inside
    * clusters): the quadratic step is bounded per bucket — `planes`
    * controls the bucket count (2^planes), so at 100 TB you raise
    * planes until buckets fit the pairwise budget; no all-pairs join
    * ever materializes. One shuffle on bucket for the pair join, one
    * keyed agg for the keeper, one join back for the labeling.
    *
    * Output per vector: bucket, keeper (the earliest in-bucket vector
    * within `tau`, or itself when unique), is_dup. */
  def semanticDedup(embeddings: DataFrame, planes: Int = 4,
                    tau: Double = 0.3, dims: Int = 64): DataFrame = {
    VectorFunctions.register(embeddings.sparkSession)
    // localCheckpoint: three plan branches (both pair sides + final
    // labeling join) would otherwise re-run the interpreted
    // quantize+bucket HOFs — the q24 signature-table lesson.
    val bucketed = portableBucketed(embeddings, planes, dims)
      .localCheckpoint()
    val a = bucketed.select(col("vec_id").as("a_id"),
      col("embedding").as("a_emb"), col("bucket"))
    val b = bucketed.select(col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("bucket"))
    val keepers = a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .filter(cosine(col("a_emb"), col("b_emb")) >= tau)
      .groupBy(col("b_id").as("vec_id"))
      .agg(min(col("a_id")).as("dup_of"))
    bucketed.select(col("vec_id"), col("bucket"))
      .join(keepers, Seq("vec_id"), "left")
      .withColumn("keeper", coalesce(col("dup_of"), col("vec_id")))
      .select(col("vec_id"), col("bucket"), col("keeper"),
        (col("keeper") =!= col("vec_id")).cast("long").as("is_dup"))
      .orderBy("vec_id")
  }

  // ---------------------------------------------------------------------------
  // IVF (inverted-file) ANN — the second scale path beside hyperplane LSH
  // ---------------------------------------------------------------------------

  /** Train an IVF coarse quantizer: k-means with deterministic
    * initialization (the k lowest vec_ids) and a fixed number of Lloyd
    * iterations. The k centroids (a few KB — k and dims are small
    * constants) live on the DRIVER between iterations, exactly as
    * MLlib's KMeans iterates: each Lloyd step is then ONE distributed
    * pass (broadcast-join assignment + per-dimension mean), and the
    * plan's lineage does not grow with `iters` — the previous
    * formulation chained iterations lazily, so every downstream
    * reference re-ran the whole training, the measured source of this
    * query's bench variance. Returns (cluster_id, centroid
    * ARRAY<DOUBLE>) as a local-relation frame, free to re-reference.
    * At 100 TB this trains on a sample; assignment is a single scan. */
  def trainIvfCentroids(embeddings: DataFrame, k: Int, iters: Int): DataFrame =
    centroidFrame(embeddings.sparkSession,
      trainIvfCentroidsLocal(embeddings, k, iters))

  private def trainIvfCentroidsLocal(embeddings: DataFrame, k: Int,
                                     iters: Int): Seq[(Int, Seq[Double])] = {
    val spark = embeddings.sparkSession
    VectorFunctions.register(spark)
    var cent: Seq[(Int, Seq[Double])] = embeddings.orderBy("vec_id").limit(k)
      .select(col("embedding").cast("array<double>"))
      .collect().toSeq.zipWithIndex
      .map { case (r, i) => (i + 1, r.getSeq[Double](0)) }
    for (_ <- 0 until iters) {
      cent = assignToCentroids(embeddings, centroidFrame(spark, cent))
        .select(col("cluster_id"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("cluster_id", "dim")
        .agg(avg(col("x")).as("m"))
        .groupBy("cluster_id")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cluster_id"),
          transform(col("dm"), e => e.getField("m")).as("centroid"))
        .collect().toSeq
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
    }
    cent
  }

  /** Trained-quantizer cache: a real IVF deployment trains the coarse
    * quantizer ONCE and serves every query against it — only the
    * assign+probe work is per-query. The centroids are a driver-side
    * Seq (a few KB), so the cache survives block-manager eviction and
    * `unpersist` sweeps; nothing distributed is pinned. Keyed by the
    * caller's corpus identity (e.g. the data directory). */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, Seq[Double])]]()

  private def centroidFrame(spark: SparkSession,
                            cent: Seq[(Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    cent.toDF("cluster_id", "centroid")
  }

  /** Assign each vector to its nearest centroid (max cosine — the
    * centroids are means of unit vectors, cosine argmax is the right
    * metric for normalized embeddings). Centroid set is broadcast; the
    * argmax is a struct-max hash aggregate (map-side partial combine,
    * so the shuffle carries ≤ one row per vector — a window over
    * vec_id would sort-shuffle all n×k scored rows instead). */
  def assignToCentroids(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    VectorFunctions.register(embeddings.sparkSession)
    embeddings
      .crossJoin(broadcast(centroids))
      .withColumn("cos_c", cosineMixed(col("embedding"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos_c"), (-col("cluster_id")).as("neg_cid"),
        col("embedding"))).as("best"))
      .select(col("vec_id"),
        (-col("best.neg_cid")).cast("int").as("cluster_id"),
        col("best.embedding").as("embedding"))
  }

  /** Cosine between a float vector and a double centroid: the centroid
    * is narrowed to float so the codegen'd dot expression applies —
    * this runs k times per vector per iteration, and the interpreted
    * HOF version dominated IVF training time. Float narrowing shifts
    * scores by ~1e-7 relative, irrelevant for nearest-centroid argmax. */
  private def cosineMixed(v: Column, c: Column): Column = {
    val cf = c.cast("array<float>")
    dot(v, cf) / (sqrt(dot(v, v)) * sqrt(dot(cf, cf)))
  }

  /** IVF top-k: score only vectors whose cluster is among the query's
    * `nprobe` nearest centroids. Scanned fraction ≈ nprobe/k of the
    * corpus; the cluster assignment is computed once and would be a
    * stored column in a persisted index. With `cacheKey` set, the
    * trained quantizer is reused across calls on the same corpus
    * (train-once/serve-many — the verdict's persisted-index posture);
    * without it every call trains fresh. The cache key folds in a
    * corpus CONTENT fingerprint (row count + max vec_id + the sum of a
    * per-row hash over id AND vector values — one scan, no shuffle,
    * still orders of magnitude cheaper than the iters× training scans),
    * so a corpus that changes under the same directory retrains instead
    * of silently serving stale centroids — including re-generated
    * embeddings written over unchanged ids. */
  def ivfTopK(embeddings: DataFrame, queryId: Long, k: Int,
              nClusters: Int, nprobe: Int, iters: Int = 2,
              cacheKey: Option[String] = None): DataFrame = {
    VectorFunctions.register(embeddings.sparkSession)
    val local = cacheKey match {
      case Some(key) =>
        // bit_xor fold: order-independent and overflow-free under ANSI
        // (a long sum of 2^63-scale hashes throws ARITHMETIC_OVERFLOW)
        val fp = embeddings
          .agg(count(lit(1)), max(col("vec_id")),
            expr("bit_xor(xxhash64(vec_id, embedding))")).head()
        centroidCache.computeIfAbsent(
          s"$key|${fp.getLong(0)}|${fp.get(1)}|${fp.get(2)}|$nClusters|$iters",
          _ => trainIvfCentroidsLocal(embeddings, nClusters, iters))
      case None => trainIvfCentroidsLocal(embeddings, nClusters, iters)
    }
    val centroids = centroidFrame(embeddings.sparkSession, local)
    val assigned = assignToCentroids(embeddings, centroids)
    val qVec = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    val probeClusters = centroids.crossJoin(broadcast(qVec))
      .withColumn("cos_c", cosineMixed(col("q_emb"), col("centroid")))
      .orderBy(col("cos_c").desc, col("cluster_id").asc)
      .limit(nprobe)
      .select("cluster_id")
    assigned
      .join(broadcast(probeClusters), "cluster_id")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qVec))
      .withColumn("cos", cosine(col("embedding"), col("q_emb")))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"),
        (round(col("cos"), 6) * 1000000).cast("long").as("sim"))
  }

  /** q81: the APPROXIMATE IVF path in a driver-checkable configuration
    * — the IVF sibling of [[portableLshTopK]] (q56), closing the gap
    * where only the LSH family's approximate path was driver-measured
    * (q36 registers IVF at nprobe = nClusters, i.e. exact recovery).
    *
    * Lloyd iterations average floats, and no oracle can promise to
    * reproduce a float mean at the argmin boundary — so the checkable
    * configuration replaces trained centroids with ANCHOR centroids:
    * the vectors with the `nAnchors` lowest ids (the same deterministic
    * seeding [[trainIvfCentroids]] starts from, zero iterations). Every
    * comparison the query makes — cluster assignment argmax, probe
    * selection, final ranking — happens on ROUNDED integer similarity
    * (round(cos,6)·1e6, the q73 trick), so the oracle recomputes each
    * decision exactly. The plan is the real IVF serving shape: anchors
    * broadcast for one-pass assignment, probe set broadcast, and only
    * ~nprobe/nAnchors of the corpus is scored against the query. */
  def ivfAnchorTopK(embeddings: DataFrame, queryId: Long, k: Int,
                    nAnchors: Int, nprobe: Int): DataFrame = {
    VectorFunctions.register(embeddings.sparkSession)
    def simE6(a: Column, b: Column): Column =
      (round(cosine(a, b), 6) * 1000000).cast("long")
    val anchors = embeddings
      .filter(col("vec_id") >= 1 && col("vec_id") <= nAnchors)
      .select(col("vec_id").cast("int").as("cluster_id"),
        col("embedding").as("a_emb"))
    // struct-max argmax (map-side partial combine): ≤ one shuffled row
    // per vector; ties on a_sim resolve to the smallest cluster_id.
    val assigned = Partitioning.spread(embeddings.filter(col("vec_id") =!= queryId))
      .crossJoin(broadcast(anchors))
      .select(col("vec_id"), col("embedding"), col("cluster_id"),
        simE6(col("embedding"), col("a_emb")).as("a_sim"))
      .groupBy("vec_id")
      .agg(max(struct(col("a_sim"), (-col("cluster_id")).as("neg_cid"),
        col("embedding"))).as("best"))
      .select(col("vec_id"),
        (-col("best.neg_cid")).cast("int").as("cluster_id"),
        col("best.embedding").as("embedding"))
    val qVec = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    val probe = anchors.crossJoin(broadcast(qVec))
      .select(col("cluster_id"), simE6(col("a_emb"), col("q_emb")).as("q_sim"))
      .orderBy(col("q_sim").desc, col("cluster_id").asc)
      .limit(nprobe)
      .select("cluster_id")
    assigned.join(broadcast(probe), "cluster_id")
      .crossJoin(broadcast(qVec))
      .select(col("vec_id"), col("cluster_id"),
        simE6(col("embedding"), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** DuckDB oracle for [[ivfAnchorTopK]] — recomputes the anchor
    * assignment, probe choice, and ranking from the same rounded
    * integer similarities. */
  def ivfAnchorOracleSql(nAnchors: Int = 8, nprobe: Int = 2,
                         k: Int = 10): String =
    s"""WITH a AS (SELECT CAST(vec_id AS INT) AS cluster_id,
              CAST(embedding AS DOUBLE[]) AS a_emb
            FROM embeddings WHERE vec_id BETWEEN 1 AND $nAnchors),
       e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
             FROM embeddings WHERE vec_id != 0),
       q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb
             FROM embeddings WHERE vec_id = 0),
       asg AS (SELECT vec_id, cluster_id, emb FROM (
           SELECT e.vec_id, a.cluster_id, e.emb,
                  row_number() OVER (PARTITION BY e.vec_id ORDER BY
                    CAST(round(list_cosine_similarity(e.emb, a.a_emb), 6)
                         * 1000000 AS BIGINT) DESC, a.cluster_id) AS rn
           FROM e CROSS JOIN a)
         WHERE rn = 1),
       pr AS (SELECT cluster_id FROM a CROSS JOIN q
              ORDER BY CAST(round(list_cosine_similarity(a.a_emb, q.q_emb), 6)
                            * 1000000 AS BIGINT) DESC, cluster_id
              LIMIT $nprobe)
     SELECT asg.vec_id, asg.cluster_id,
            CAST(round(list_cosine_similarity(asg.emb, q.q_emb), 6) * 1000000
                 AS BIGINT) AS sim
     FROM asg JOIN pr USING (cluster_id) CROSS JOIN q
     ORDER BY sim DESC, asg.vec_id LIMIT $k"""

  /** q73: embedding-space benchmark decontamination — the semantic
    * sibling of [[Dedup.benchmarkOverlap]] (n-gram overlap catches
    * verbatim leakage; cosine similarity catches paraphrased leakage).
    * Every corpus vector is scored against the EVAL set and flagged
    * with its best-matching eval item when max cosine >= `threshold`.
    *
    * Scale shape: the eval side is the benchmark suite — bounded and
    * small by construction — so it broadcasts and the corpus is
    * scanned ONCE with a codegen'd dot product per (corpus, eval)
    * pair; the argmax is a corpus-keyed window over `|eval|` rows per
    * key. No shuffle of the corpus beyond the window's key exchange,
    * and an LSH-bucketed variant (share buckets with
    * [[semanticDedup]]) drops even that for larger eval suites.
    * Here the fixture eval role is `vec_id % 10 == 0`. */
  def embedDecontaminate(embeddings: DataFrame, threshold: Double = 0.3)
      : DataFrame = {
    VectorFunctions.register(embeddings.sparkSession)
    val eval_ = embeddings.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("eval_id"), col("embedding").as("e_emb"))
    val corpus = Partitioning.spread(embeddings.filter(col("vec_id") % 10 =!= 0))
    val byVec = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id")
      .orderBy(col("sim_e6").desc, col("eval_id").asc)
    corpus.crossJoin(broadcast(eval_))
      .select(col("vec_id"), col("eval_id"),
        (round(cosine(col("embedding"), col("e_emb")), 6) * 1000000)
          .cast("long").as("sim_e6"))
      .withColumn("rn", row_number().over(byVec))
      .filter(col("rn") === 1 &&
        col("sim_e6") >= (threshold * 1000000).toLong)
      .select(col("vec_id"), col("eval_id"), col("sim_e6"))
      .orderBy("vec_id")
  }

  /** DuckDB oracle for [[embedDecontaminate]] (threshold 0.3). */
  def embedDecontaminateOracleSql: String =
    """WITH ev AS (SELECT vec_id AS eval_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings WHERE vec_id % 10 = 0),
       co AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings WHERE vec_id % 10 != 0),
       sc AS (SELECT co.vec_id, ev.eval_id,
                CAST(round(list_cosine_similarity(co.e, ev.e), 6) * 1000000
                     AS BIGINT) AS sim_e6
              FROM co CROSS JOIN ev),
       am AS (SELECT vec_id, eval_id, sim_e6 FROM sc
              QUALIFY row_number() OVER (PARTITION BY vec_id
                ORDER BY sim_e6 DESC, eval_id) = 1)
     SELECT vec_id, eval_id, sim_e6 FROM am
     WHERE sim_e6 >= 300000 ORDER BY vec_id"""

  /** Per-label embedding statistics (norms accumulated as scaled
    * integers for cross-engine determinism). */
  def embeddingStats(spark: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(spark)
    Tables.embeddings(spark, dir)
      .select(col("label"),
        (round(norm(col("embedding")), 4) * 10000).cast("long").as("norm_i"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), sum(col("norm_i")).as("sum_norm"))
      .orderBy("label")
  }

  /** Neighbor count for [[labelNoiseQuery]] and its suspect rule
    * (flag when ≥ NoiseK − 1 of the NoiseK neighbors disagree). */
  val NoiseK = 5

  /** Blocking configuration for the q210/q211 scale path: 4 planes →
    * 16 buckets, 2 probe flips → each anchor scans ~3/16 of the
    * corpus. Sized to the sf0.01/sf0.1 embeddings tables; at 100 TB
    * `planes` rises until buckets fit the pairwise budget (same dial
    * as q58's SemDeDup). */
  val BlockPlanes = 4
  val BlockProbeFlips = 2

  /** q203: label-noise detection by k-NN disagreement — the
    * confident-learning-style pass a labeled training set runs before
    * training: for every vector, its [[NoiseK]] nearest neighbors by
    * cosine vote on the label; a row whose neighborhood almost
    * unanimously disagrees is a mislabeling suspect. Neighbors are
    * EXACT here (the q26 discipline: the exhaustive all-pairs scoring
    * is the intentionally-verifiable baseline; q210
    * ([[labelNoiseLshQuery]]) runs the SAME voting over LSH-blocked
    * candidates — the 100 TB shape — and q212 reports its recall
    * against this baseline). Ranking uses the QUANTIZED e6
    * similarity with vec_id tie-break, so the k-th-neighbor boundary
    * is deterministic on both engines. The corpus side broadcasts
    * (embeddings are the small table of the schema); the per-vector
    * window is keyed by the anchor. */
  def labelNoiseQuery(spark: SparkSession, dir: String): DataFrame =
    labelNoise(Tables.embeddings(spark, dir))

  /** The scored all-pairs frame [[labelNoise]] and [[hardNegatives]]
    * share: (a, la, b, lb, sim) with sim the QUANTIZED e6 cosine —
    * exhaustive by design (the q26 verification-baseline discipline). */
  private def labeledPairs(emb: DataFrame): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    val anchors = Partitioning.spread(emb).select(col("vec_id").as("a"),
      col("embedding").as("ea"), col("label").cast("long").as("la"))
    val others = emb.select(col("vec_id").as("b"),
      col("embedding").as("eb"), col("label").cast("long").as("lb"))
    anchors.join(broadcast(others), col("a") =!= col("b"))
      .withColumn("sim",
        (round(VectorFunctions.cosine(col("ea"), col("eb")), 6) * 1000000)
          .cast("long"))
      .select(col("a"), col("la"), col("b"), col("lb"), col("sim"))
  }

  /** BLOCKED labeled pairs — the 100 TB candidate generator the
    * all-pairs [[labeledPairs]] verifies: the portable hyperplane-LSH
    * index (the q56/q150 bucket family, bit-identical in any engine)
    * with multi-probe. Each anchor probes its home bucket plus
    * `probeFlips` one-flip buckets; every vector whose HOME bucket is
    * probed becomes a candidate, so each (a, b) pair surfaces at most
    * once (probe buckets are distinct, b lives in one bucket). The
    * join shuffles on bucket — no corpus broadcast, no O(N²): with
    * `planes` bits the scanned fraction is (1+probeFlips)/2^planes,
    * and at 100 TB you raise planes until buckets fit the pairwise
    * budget (the SemDeDup q58 rule). Output schema matches
    * [[labeledPairs]] exactly, so [[labelNoiseFromPairs]] /
    * [[hardNegativesFromPairs]] run unchanged over either frame. */
  private[graft] def blockedLabeledPairs(emb: DataFrame, planes: Int,
      probeFlips: Int, dims: Int = 64): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    // localCheckpoint: the anchor and candidate sides would otherwise
    // each re-run the interpreted quantize+bucket HOFs (the q24/q58
    // signature-table lesson)
    val bucketed = Partitioning.spread(emb)
      .select(col("vec_id"), col("embedding"),
        col("label").cast("long").as("lbl"),
        transform(col("embedding"),
          x => round(x.cast("double") * lit(1024)).cast("long")).as("qv"))
      .select(col("vec_id"), col("embedding"), col("lbl"),
        portableBucket(col("qv"), planes, dims).as("bucket"))
      .localCheckpoint()
    val flips = lit(0L) +:
      (0 until math.min(probeFlips, math.max(planes, 0))).map(p => lit(1L << p))
    val anchors = bucketed.select(col("vec_id").as("a"),
      col("embedding").as("ea"), col("lbl").as("la"),
      explode(array(flips.map(f => col("bucket").bitwiseXOR(f)): _*))
        .as("pb"))
    val cands = bucketed.select(col("vec_id").as("b"),
      col("embedding").as("eb"), col("lbl").as("lb"),
      col("bucket").as("pb"))
    anchors.join(cands, Seq("pb"))
      .filter(col("a") =!= col("b"))
      .withColumn("sim",
        (round(VectorFunctions.cosine(col("ea"), col("eb")), 6) * 1000000)
          .cast("long"))
      .select(col("a"), col("la"), col("b"), col("lb"), col("sim"))
  }

  /** [[labelNoiseQuery]]'s core over any (vec_id, embedding, label)
    * frame — exhaustive candidates. */
  def labelNoise(emb: DataFrame, k: Int = NoiseK): DataFrame =
    labelNoiseFromPairs(labeledPairs(emb), k)

  /** q210: [[labelNoise]] at scale — identical voting over LSH-blocked
    * candidates instead of all pairs. Anchors left with zero
    * candidates vanish from the output (nothing voted); anchors with
    * fewer than k candidates vote with what they have. q212 reports
    * how faithful this approximation is vs the exact baseline. */
  def labelNoiseLshQuery(spark: SparkSession, dir: String): DataFrame =
    labelNoiseFromPairs(
      blockedLabeledPairs(Tables.embeddings(spark, dir),
        BlockPlanes, BlockProbeFlips))

  /** The k-NN disagreement vote over ANY (a, la, b, lb, sim)
    * candidate frame — the refactor that lets the q27/q35/q36
    * blocking machinery feed the same scoring the exhaustive baseline
    * uses. */
  def labelNoiseFromPairs(pairs: DataFrame, k: Int = NoiseK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("a")
      .orderBy(col("sim").desc, col("b").asc)
    pairs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(col("a"), col("la"))
      .agg(sum(when(col("lb") =!= col("la"), 1L).otherwise(0L))
        .cast("long").as("n_disagree"))
      .select(col("a").as("vec_id"), col("la").as("label"),
        col("n_disagree"),
        when(col("n_disagree") >= k - 1, 1).otherwise(0)
          .cast("int").as("suspect"))
      .orderBy("vec_id")
  }

  /** q204: hard-example mining for contrastive training — per
    * anchor: the HARDEST NEGATIVE (most-similar vector with a
    * different label — the pair a contrastive loss must push apart)
    * and the HARDEST POSITIVE (least-similar vector with the same
    * label — the pair it must pull together). The standard batch-
    * construction signal for embedding finetuning. Same exhaustive
    * scored-pairs frame as q203 ([[labeledPairs]], the q26
    * discipline), two windows over it keyed by the anchor; quantized
    * similarity + id tie-break keeps both argmins deterministic.
    * Anchors whose class has no other member emit no hard positive
    * and are dropped by the inner join (nothing to pull). */
  def hardNegativesQuery(spark: SparkSession, dir: String): DataFrame =
    hardNegatives(Tables.embeddings(spark, dir))

  /** q211: [[hardNegatives]] at scale — the same two argmins over
    * LSH-blocked candidates. An anchor's hardest negative/positive is
    * then the hardest WITHIN ITS PROBED BUCKETS — exactly the
    * approximation a production miner makes (hard examples are by
    * definition high-similarity, which is what LSH buckets preserve);
    * anchors with no same-label candidate in-block drop out via the
    * same inner join as the exact form. */
  def hardNegativesLshQuery(spark: SparkSession, dir: String): DataFrame =
    hardNegativesFromPairs(
      blockedLabeledPairs(Tables.embeddings(spark, dir),
        BlockPlanes, BlockProbeFlips))

  /** [[hardNegativesQuery]]'s core — exhaustive candidates. */
  def hardNegatives(emb: DataFrame): DataFrame =
    hardNegativesFromPairs(labeledPairs(emb))

  /** The hardest-negative / hardest-positive argmins over ANY
    * (a, la, b, lb, sim) candidate frame. */
  def hardNegativesFromPairs(candidates: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = candidates.localCheckpoint()
    val negW = Window.partitionBy("a")
      .orderBy(col("sim").desc, col("b").asc)
    val posW = Window.partitionBy("a")
      .orderBy(col("sim").asc, col("b").asc)
    val hardNeg = pairs.filter(col("lb") =!= col("la"))
      .withColumn("rk", row_number().over(negW)).filter(col("rk") === 1)
      .select(col("a"), col("la"), col("b").as("neg_id"),
        col("sim").as("neg_sim"))
    val hardPos = pairs.filter(col("lb") === col("la"))
      .withColumn("rk", row_number().over(posW)).filter(col("rk") === 1)
      .select(col("a"), col("b").as("pos_id"), col("sim").as("pos_sim"))
    hardNeg.join(hardPos, Seq("a"))
      .select(col("a").as("vec_id"), col("la").as("label"),
        col("neg_id"), col("neg_sim"), col("pos_id"), col("pos_sim"),
        // the margin a triplet loss would see (can be negative:
        // a hard negative closer than the farthest positive)
        (col("pos_sim") - col("neg_sim")).as("margin_e6"))
      .orderBy("vec_id")
  }

  /** DuckDB oracle for [[hardNegativesQuery]]. Unlike q26/q203 (where
    * sims only rank), this query OUTPUTS the quantized sims, so the
    * cast semantics must match exactly: Spark's double→long cast
    * truncates toward zero while DuckDB's CAST rounds — hence the
    * explicit trunc() around the scaled similarity. */
  def hardNegativesOracleSql: String =
    s"""WITH p AS (SELECT a.vec_id AS a, CAST(a.label AS BIGINT) AS la,
           b.vec_id AS b, CAST(b.label AS BIGINT) AS lb,
           CAST(trunc(round(list_cosine_similarity(
               CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])),
             6) * 1000000) AS BIGINT) AS sim
         FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
       hn AS (SELECT a, la, b AS neg_id, sim AS neg_sim FROM p
              WHERE lb <> la
              QUALIFY row_number() OVER (PARTITION BY a
                ORDER BY sim DESC, b) = 1),
       hp AS (SELECT a, b AS pos_id, sim AS pos_sim FROM p
              WHERE lb = la
              QUALIFY row_number() OVER (PARTITION BY a
                ORDER BY sim ASC, b) = 1)
     SELECT hn.a AS vec_id, la AS label, neg_id, neg_sim, pos_id,
       pos_sim, CAST(pos_sim - neg_sim AS BIGINT) AS margin_e6
     FROM hn JOIN hp ON hn.a = hp.a
     ORDER BY vec_id"""

  /** q205: embedding centroid drift between two snapshots — the
    * model-monitoring question "did this class's embedding
    * distribution move?": per label, the L1 distance between the two
    * snapshots' centroids (snapshots = vec_id parity, the stand-in
    * for two ingest epochs), in quantized-1024 units. All integer:
    * components quantize per element (round(x·1024), the q56 rule),
    * per-(label, snapshot, dim) sums are exact BIGINTs, and the
    * centroid difference avoids division until the end —
    * |s1·n2 − s2·n1| summed in DECIMAL(38,0) then divided once by
    * n1·n2 — so no floating centroid ever materializes and the
    * result is engine-exact. Scale shape: one posexplode scan (rows
    * × dims, narrow), ONE map-side-combinable aggregation to
    * (labels × 2 × dims) rows, everything after metadata-scale. */
  def centroidDriftQuery(spark: SparkSession, dir: String): DataFrame =
    centroidDrift(Tables.embeddings(spark, dir))

  /** [[centroidDriftQuery]]'s core. */
  def centroidDrift(emb: DataFrame): DataFrame = {
    val q = emb
      .select(col("label").cast("long").as("label"),
        pmod(col("vec_id"), lit(2L)).as("snap"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("snap"), col("dim"),
        round(col("x").cast("double") * 1024, 0).cast("long").as("qx"))
    val sums = q.groupBy("label", "snap", "dim")
      .agg(sum(col("qx")).as("s"), count(lit(1)).as("n"))
    val a = sums.filter(col("snap") === 0)
      .select(col("label"), col("dim"), col("s").as("s1"),
        col("n").as("n1"))
    val b = sums.filter(col("snap") === 1)
      .select(col("label"), col("dim"), col("s").as("s2"),
        col("n").as("n2"))
    a.join(b, Seq("label", "dim"))
      .groupBy("label")
      .agg(max(col("n1")).cast("long").as("n1"),
        max(col("n2")).cast("long").as("n2"),
        sum(expr("abs(CAST(s1 AS DECIMAL(38,0)) * n2 " +
          "- CAST(s2 AS DECIMAL(38,0)) * n1)")).as("num"))
      .select(col("label"), col("n1"), col("n2"),
        expr("CAST(num div (n1 * n2) AS BIGINT)").as("l1_drift_q"))
      .orderBy("label")
  }

  /** DuckDB oracle for [[centroidDriftQuery]] — same quantization,
    * same division-free centroid difference (HUGEINT intermediates
    * mirror the DECIMAL(38,0) path). */
  def centroidDriftOracleSql: String =
    """WITH q AS (SELECT CAST(label AS BIGINT) AS label,
           vec_id % 2 AS snap,
           unnest(range(1, len(embedding) + 1)) AS dim,
           unnest(list_transform(range(1, len(embedding) + 1),
             i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1024)
               AS BIGINT))) AS qx
         FROM embeddings),
       s AS (SELECT label, snap, dim, CAST(sum(qx) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
             FROM q GROUP BY 1, 2, 3),
       j AS (SELECT a.label, a.s AS s1, a.n AS n1, b.s AS s2,
               b.n AS n2
             FROM s a JOIN s b ON a.label = b.label AND a.dim = b.dim
               AND a.snap = 0 AND b.snap = 1)
     SELECT label, CAST(max(n1) AS BIGINT) AS n1,
       CAST(max(n2) AS BIGINT) AS n2,
       CAST(sum(abs(CAST(s1 AS HUGEINT) * n2 - CAST(s2 AS HUGEINT) * n1))
         // (max(n1) * max(n2)) AS BIGINT) AS l1_drift_q
     FROM j GROUP BY 1 ORDER BY 1"""

  /** DuckDB oracle for [[labelNoiseQuery]]. The sim only ranks here,
    * but the ranking must still be bit-identical: Spark's double→long
    * cast truncates while DuckDB's CAST rounds, and a one-unit
    * disagreement at the k-th-neighbor boundary flips the neighbor
    * set — hence trunc(), the same guard [[hardNegativesOracleSql]]
    * carries. */
  def labelNoiseOracleSql(k: Int = NoiseK): String =
    s"""WITH p AS (SELECT a.vec_id AS a, CAST(a.label AS BIGINT) AS la,
           b.vec_id AS b, CAST(b.label AS BIGINT) AS lb,
           CAST(trunc(round(list_cosine_similarity(
               CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])),
             6) * 1000000) AS BIGINT) AS sim
         FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
       r AS (SELECT a, la, lb,
           row_number() OVER (PARTITION BY a ORDER BY sim DESC, b) AS rk
         FROM p)
     SELECT a AS vec_id, la AS label,
       CAST(sum(CASE WHEN lb <> la THEN 1 ELSE 0 END) AS BIGINT)
         AS n_disagree,
       CAST(CASE WHEN sum(CASE WHEN lb <> la THEN 1 ELSE 0 END)
           >= ${k - 1} THEN 1 ELSE 0 END AS INT) AS suspect
     FROM r WHERE rk <= $k GROUP BY 1, 2 ORDER BY 1"""

  /** Blocked-pairs CTE block shared by the q210/q211/q212 oracles:
    * recomputes [[blockedLabeledPairs]] verbatim in DuckDB — same
    * quantization (round(x·1024), exact), same literal integer plane
    * family, same probe set, same trunc'd e6 similarity. Defines
    * `bkt` (bucketed corpus) and `bp` (blocked candidate pairs). */
  private def blockedPairsCtes(planes: Int, probeFlips: Int,
      dims: Int): String = {
    val bits = (0 until planes).map { p =>
      val cs = (0 until dims).map(i => portablePlaneComponent(p, i))
        .mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product(CAST(q AS DOUBLE[]), $cs) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("\n           + ")
    val nf = math.min(probeFlips, math.max(planes, 0))
    val probeBranches =
      (s"SELECT vec_id, lbl, emb, bucket AS pb FROM bkt" +:
        (0 until nf).map(p =>
          s"SELECT vec_id, lbl, emb, xor(bucket, ${1L << p}) FROM bkt"))
        .mkString("\n               UNION ALL ")
    s"""e AS (SELECT vec_id, CAST(label AS BIGINT) AS lbl,
           CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       qv AS (SELECT vec_id, lbl, emb,
           list_transform(emb, x -> CAST(round(x * 1024) AS BIGINT)) AS q
         FROM e),
       bkt AS (SELECT vec_id, lbl, emb, $bits AS bucket FROM qv),
       pr AS ($probeBranches),
       bp AS (SELECT pr.vec_id AS a, pr.lbl AS la, c.vec_id AS b,
                c.lbl AS lb,
                CAST(trunc(round(list_cosine_similarity(pr.emb, c.emb), 6)
                  * 1000000) AS BIGINT) AS sim
              FROM pr JOIN bkt c ON c.bucket = pr.pb
                AND c.vec_id <> pr.vec_id)"""
  }

  /** DuckDB oracle for [[labelNoiseLshQuery]] (q210). */
  def labelNoiseLshOracleSql(k: Int = NoiseK, planes: Int = BlockPlanes,
      probeFlips: Int = BlockProbeFlips, dims: Int = 64): String =
    s"""WITH ${blockedPairsCtes(planes, probeFlips, dims)},
       r AS (SELECT a, la, lb,
           row_number() OVER (PARTITION BY a ORDER BY sim DESC, b) AS rk
         FROM bp)
     SELECT a AS vec_id, la AS label,
       CAST(sum(CASE WHEN lb <> la THEN 1 ELSE 0 END) AS BIGINT)
         AS n_disagree,
       CAST(CASE WHEN sum(CASE WHEN lb <> la THEN 1 ELSE 0 END)
           >= ${k - 1} THEN 1 ELSE 0 END AS INT) AS suspect
     FROM r WHERE rk <= $k GROUP BY 1, 2 ORDER BY 1"""

  /** DuckDB oracle for [[hardNegativesLshQuery]] (q211) — the
    * [[hardNegativesOracleSql]] tail over the blocked pair frame. */
  def hardNegativesLshOracleSql(planes: Int = BlockPlanes,
      probeFlips: Int = BlockProbeFlips, dims: Int = 64): String =
    s"""WITH ${blockedPairsCtes(planes, probeFlips, dims)},
       hn AS (SELECT a, la, b AS neg_id, sim AS neg_sim FROM bp
              WHERE lb <> la
              QUALIFY row_number() OVER (PARTITION BY a
                ORDER BY sim DESC, b) = 1),
       hp AS (SELECT a, b AS pos_id, sim AS pos_sim FROM bp
              WHERE lb = la
              QUALIFY row_number() OVER (PARTITION BY a
                ORDER BY sim ASC, b) = 1)
     SELECT hn.a AS vec_id, la AS label, neg_id, neg_sim, pos_id,
       pos_sim, CAST(pos_sim - neg_sim AS BIGINT) AS margin_e6
     FROM hn JOIN hp ON hn.a = hp.a
     ORDER BY vec_id"""

  /** q212: the faithfulness report for the q210/q211 blocking — the
    * q150/q151 discipline applied to the kNN-voting family: how much
    * of the EXACT top-k neighborhood do the blocked candidates
    * recover (pair recall), and do the two pipelines agree on who the
    * suspects are. One row: anchors, suspect counts from each path,
    * their intersection, and candidate-pair recall against the exact
    * top-k pair set. This is the artifact that decides `planes`/
    * `probeFlips` at any corpus size — rerun it on a sample, tune,
    * then run q210/q211 at the chosen setting. */
  def knnBlockRecallQuery(spark: SparkSession, dir: String): DataFrame =
    knnBlockRecall(Tables.embeddings(spark, dir))

  /** [[knnBlockRecallQuery]]'s core. */
  def knnBlockRecall(emb: DataFrame, k: Int = NoiseK,
      planes: Int = BlockPlanes, probeFlips: Int = BlockProbeFlips,
      dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exact = labeledPairs(emb).localCheckpoint()
    val blocked = blockedLabeledPairs(emb, planes, probeFlips, dims)
      .localCheckpoint()
    val w = Window.partitionBy("a").orderBy(col("sim").desc, col("b").asc)
    val exactTop = exact.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).select("a", "b")
    val pairStats = exactTop
      .join(blocked.select("a", "b"), Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).cast("long").as("n_hit_pairs"))
      .crossJoin(broadcast(
        exactTop.agg(count(lit(1)).cast("long").as("n_true_pairs"))))
    val eSusp = labelNoiseFromPairs(exact, k)
      .select(col("vec_id"), col("suspect").as("s_e"))
    val bSusp = labelNoiseFromPairs(blocked, k)
      .select(col("vec_id"), col("suspect").as("s_b"))
    eSusp.join(bSusp, Seq("vec_id"), "left")
      .agg(count(lit(1)).cast("long").as("n_anchors"),
        sum(col("s_e")).cast("long").as("exact_suspects"),
        sum(coalesce(col("s_b"), lit(0))).cast("long")
          .as("blocked_suspects"),
        sum(when(col("s_e") === 1 && col("s_b") === 1, 1L).otherwise(0L))
          .cast("long").as("both_suspects"))
      .crossJoin(broadcast(pairStats))
      .select(col("n_anchors"), col("exact_suspects"),
        col("blocked_suspects"), col("both_suspects"),
        col("n_true_pairs"), col("n_hit_pairs"),
        expr("n_hit_pairs * 100 div n_true_pairs").as("pair_recall_pct"))
  }

  /** RRF's standard dampening constant (Cormack et al. 2009). */
  val RrfK = 60

  /** q219: RECIPROCAL RANK FUSION over the three ANN families — the
    * standard way heterogeneous retrievers combine (Cormack,
    * Clarke & Büttcher 2009): each family contributes its top-k
    * ranked list (portable hyperplane LSH in the q56 serving config,
    * anchor-centroid IVF in the q81 config, PQ's ADC scan from q216)
    * and a candidate's fused score is Σ 1/(RrfK + rank) over the
    * lists that surfaced it — kept integer as 1e6 div (RrfK + rank)
    * so both engines fuse identically. The point at 100 TB: the three
    * indexes fail differently (LSH misses across bucket boundaries,
    * IVF at cell edges, PQ by quantization), so fusion recovers
    * neighbors any single index drops, for three cheap index scans
    * and a metadata-scale merge. Output (vec_id, n_lists, rrf). */
  def rankFusionQuery(spark: SparkSession, dir: String): DataFrame =
    rankFusion(Tables.embeddings(spark, dir), queryId = 0L, k = 10)

  /** [[rankFusionQuery]]'s core. */
  def rankFusion(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lsh = portableLshTopK(emb, queryId, k, planes = 6, probeFlips = 2)
      .select(col("vec_id"), col("sim").as("score"))
    val ivf = ivfAnchorTopK(emb, queryId, k, nAnchors = 8, nprobe = 2)
      .select(col("vec_id"), col("sim").as("score"))
    val pq = ProductQuant.pqTopK(emb, queryId, k)
      .select(col("vec_id"), (-col("adist")).as("score"))
    // each list is <= k rows: the single-partition rank window is a
    // deliberate driver-scale step, not a corpus sort
    val ranked = Seq(lsh, ivf, pq).map { l =>
      val w = Window.orderBy(col("score").desc, col("vec_id").asc)
      l.withColumn("rnk", row_number().over(w))
        .select(col("vec_id"), col("rnk"))
    }
    ranked.reduce(_ unionAll _)
      .groupBy("vec_id")
      .agg(count(lit(1)).cast("long").as("n_lists"),
        sum(expr(s"1000000 div ($RrfK + rnk)")).as("rrf"))
      .orderBy(col("rrf").desc, col("vec_id").asc)
      .limit(k)
  }

  /** DuckDB oracle for [[rankFusionQuery]] (q219) — all three lists
    * re-derived (LSH buckets from the literal plane family, IVF
    * anchor assignment, PQ codes + LUT via [[ProductQuant.pqCtes]]),
    * ranked and fused with the same integer arithmetic. Similarity
    * quantizations are trunc'd (Spark's long cast) wherever a
    * quantized value decides a rank. */
  def rankFusionOracleSql(queryId: Long = 0L, k: Int = 10,
      planes: Int = 6, probeFlips: Int = 2, nAnchors: Int = 8,
      nprobe: Int = 2, dims: Int = 64): String = {
    val bits = (0 until planes).map { p =>
      val cs = (0 until dims).map(i => portablePlaneComponent(p, i))
        .mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product(CAST(qv AS DOUBLE[]), $cs) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("\n           + ")
    val probeBranches = (s"SELECT qb AS pb FROM qq" +:
      (0 until math.min(probeFlips, planes)).map(p =>
        s"SELECT xor(qb, ${1L << p}) FROM qq")).mkString(" UNION ALL ")
    s"""WITH ${ProductQuant.pqCtes(queryId)},
       emb0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                FROM embeddings),
       bb AS (SELECT e.vec_id, emb0.emb, $bits AS bucket
              FROM e JOIN emb0 ON e.vec_id = emb0.vec_id),
       qq AS (SELECT emb AS qe, bucket AS qb FROM bb
              WHERE vec_id = $queryId),
       pp AS ($probeBranches),
       lshl AS (SELECT b.vec_id,
           CAST(trunc(round(list_cosine_similarity(b.emb, qq.qe), 6)
             * 1000000) AS BIGINT) AS score
         FROM bb b, pp, qq
         WHERE b.bucket = pp.pb AND b.vec_id <> $queryId
         ORDER BY list_cosine_similarity(b.emb, qq.qe) DESC, b.vec_id
         LIMIT $k),
       anch AS (SELECT CAST(vec_id AS INT) AS cluster_id, emb AS a_emb
                FROM emb0 WHERE vec_id BETWEEN 1 AND $nAnchors),
       qv0 AS (SELECT emb AS q_emb FROM emb0 WHERE vec_id = $queryId),
       asg AS (SELECT vec_id, cluster_id, emb FROM (
           SELECT e2.vec_id, a.cluster_id, e2.emb,
             row_number() OVER (PARTITION BY e2.vec_id ORDER BY
               CAST(trunc(round(list_cosine_similarity(e2.emb, a.a_emb),
                 6) * 1000000) AS BIGINT) DESC, a.cluster_id) AS rn
           FROM emb0 e2 CROSS JOIN anch a WHERE e2.vec_id <> $queryId)
         WHERE rn = 1),
       prb AS (SELECT cluster_id FROM anch CROSS JOIN qv0
               ORDER BY CAST(trunc(round(list_cosine_similarity(a_emb,
                 q_emb), 6) * 1000000) AS BIGINT) DESC, cluster_id
               LIMIT $nprobe),
       ivfl AS (SELECT asg.vec_id,
           CAST(trunc(round(list_cosine_similarity(asg.emb, q_emb), 6)
             * 1000000) AS BIGINT) AS score
         FROM asg JOIN prb USING (cluster_id) CROSS JOIN qv0
         ORDER BY score DESC, asg.vec_id LIMIT $k),
       pql AS (SELECT vec_id, adist FROM ad
               ORDER BY adist, vec_id LIMIT $k),
       lshr AS (SELECT vec_id, row_number() OVER
                  (ORDER BY score DESC, vec_id) AS rnk FROM lshl),
       ivfr AS (SELECT vec_id, row_number() OVER
                  (ORDER BY score DESC, vec_id) AS rnk FROM ivfl),
       pqr AS (SELECT vec_id, row_number() OVER
                 (ORDER BY adist ASC, vec_id) AS rnk FROM pql),
       u AS (SELECT vec_id, rnk FROM lshr
             UNION ALL SELECT vec_id, rnk FROM ivfr
             UNION ALL SELECT vec_id, rnk FROM pqr)
     SELECT vec_id, CAST(count(*) AS BIGINT) AS n_lists,
       CAST(sum(1000000 // ($RrfK + rnk)) AS BIGINT) AS rrf
     FROM u GROUP BY 1 ORDER BY rrf DESC, vec_id LIMIT $k"""
  }

  /** q214: blocking fidelity for the ARGMIN family — q212 grades the
    * voting (set) side; this grades q211 against q204: how often the
    * blocked candidates produce the SAME hardest negative / positive
    * the exhaustive pass finds, and the total e6 error in the
    * hardest-negative similarity where they differ. One row:
    * (n_exact, n_blocked, same_neg, same_pos, neg_sim_l1). A high
    * same_neg with small l1 says the buckets keep exactly the
    * high-similarity region the miner needs — the property LSH is
    * built to preserve. */
  def hardNegativeFidelityQuery(spark: SparkSession, dir: String): DataFrame =
    hardNegativeFidelity(Tables.embeddings(spark, dir))

  /** [[hardNegativeFidelityQuery]]'s core. */
  def hardNegativeFidelity(emb: DataFrame, planes: Int = BlockPlanes,
      probeFlips: Int = BlockProbeFlips, dims: Int = 64): DataFrame = {
    val ex = hardNegatives(emb)
      .select(col("vec_id"), col("neg_id").as("e_neg"),
        col("neg_sim").as("e_negsim"), col("pos_id").as("e_pos"))
    val bl = hardNegativesFromPairs(
        blockedLabeledPairs(emb, planes, probeFlips, dims))
      .select(col("vec_id"), col("neg_id").as("b_neg"),
        col("neg_sim").as("b_negsim"), col("pos_id").as("b_pos"))
    ex.join(bl, Seq("vec_id"), "left")
      .agg(count(lit(1)).cast("long").as("n_exact"),
        sum(when(col("b_neg").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_blocked"),
        sum(when(col("b_neg") === col("e_neg"), 1L).otherwise(0L))
          .cast("long").as("same_neg"),
        sum(when(col("b_pos") === col("e_pos"), 1L).otherwise(0L))
          .cast("long").as("same_pos"),
        sum(when(col("b_negsim").isNotNull,
            abs(col("e_negsim") - col("b_negsim"))).otherwise(0L))
          .cast("long").as("neg_sim_l1"))
  }

  /** DuckDB oracle for [[hardNegativeFidelityQuery]] (q214). */
  def hardNegativeFidelityOracleSql(planes: Int = BlockPlanes,
      probeFlips: Int = BlockProbeFlips, dims: Int = 64): String =
    s"""WITH ${blockedPairsCtes(planes, probeFlips, dims)},
       ep AS (SELECT a.vec_id AS a, CAST(a.label AS BIGINT) AS la,
                b.vec_id AS b, CAST(b.label AS BIGINT) AS lb,
                CAST(trunc(round(list_cosine_similarity(
                    CAST(a.embedding AS DOUBLE[]),
                    CAST(b.embedding AS DOUBLE[])), 6)
                  * 1000000) AS BIGINT) AS sim
              FROM embeddings a JOIN embeddings b
                ON a.vec_id <> b.vec_id),
       ehn AS (SELECT a, b AS neg_id, sim AS neg_sim FROM ep
               WHERE lb <> la
               QUALIFY row_number() OVER (PARTITION BY a
                 ORDER BY sim DESC, b) = 1),
       ehp AS (SELECT a, b AS pos_id FROM ep WHERE lb = la
               QUALIFY row_number() OVER (PARTITION BY a
                 ORDER BY sim ASC, b) = 1),
       ex AS (SELECT ehn.a AS vec_id, neg_id AS e_neg,
                neg_sim AS e_negsim, pos_id AS e_pos
              FROM ehn JOIN ehp ON ehn.a = ehp.a),
       bhn AS (SELECT a, b AS neg_id, sim AS neg_sim FROM bp
               WHERE lb <> la
               QUALIFY row_number() OVER (PARTITION BY a
                 ORDER BY sim DESC, b) = 1),
       bhp AS (SELECT a, b AS pos_id FROM bp WHERE lb = la
               QUALIFY row_number() OVER (PARTITION BY a
                 ORDER BY sim ASC, b) = 1),
       bl AS (SELECT bhn.a AS vec_id, neg_id AS b_neg,
                neg_sim AS b_negsim, pos_id AS b_pos
              FROM bhn JOIN bhp ON bhn.a = bhp.a)
     SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN bl.b_neg IS NOT NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS n_blocked,
       CAST(sum(CASE WHEN bl.b_neg = ex.e_neg THEN 1 ELSE 0 END)
         AS BIGINT) AS same_neg,
       CAST(sum(CASE WHEN bl.b_pos = ex.e_pos THEN 1 ELSE 0 END)
         AS BIGINT) AS same_pos,
       CAST(sum(CASE WHEN bl.b_negsim IS NOT NULL
           THEN abs(ex.e_negsim - bl.b_negsim) ELSE 0 END)
         AS BIGINT) AS neg_sim_l1
     FROM ex LEFT JOIN bl ON bl.vec_id = ex.vec_id"""

  /** DuckDB oracle for [[knnBlockRecallQuery]] (q212) — the exact
    * pair frame, the blocked pair frame, and the same three
    * comparisons. */
  def knnBlockRecallOracleSql(k: Int = NoiseK, planes: Int = BlockPlanes,
      probeFlips: Int = BlockProbeFlips, dims: Int = 64): String =
    s"""WITH ${blockedPairsCtes(planes, probeFlips, dims)},
       ep AS (SELECT a.vec_id AS a, CAST(a.label AS BIGINT) AS la,
                b.vec_id AS b, CAST(b.label AS BIGINT) AS lb,
                CAST(trunc(round(list_cosine_similarity(
                    CAST(a.embedding AS DOUBLE[]),
                    CAST(b.embedding AS DOUBLE[])), 6)
                  * 1000000) AS BIGINT) AS sim
              FROM embeddings a JOIN embeddings b
                ON a.vec_id <> b.vec_id),
       et AS (SELECT a, b FROM (SELECT a, b,
                row_number() OVER (PARTITION BY a
                  ORDER BY sim DESC, b) AS rk FROM ep)
              WHERE rk <= $k),
       hit AS (SELECT et.a, et.b FROM et
               JOIN bp ON bp.a = et.a AND bp.b = et.b),
       ps AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM et)
                  AS n_true_pairs,
                (SELECT CAST(count(*) AS BIGINT) FROM hit)
                  AS n_hit_pairs),
       es AS (SELECT a AS vec_id,
                CASE WHEN sum(CASE WHEN lb <> la THEN 1 ELSE 0 END)
                  >= ${k - 1} THEN 1 ELSE 0 END AS s_e
              FROM (SELECT a, la, lb, row_number() OVER (PARTITION BY a
                      ORDER BY sim DESC, b) AS rk FROM ep)
              WHERE rk <= $k GROUP BY 1),
       bs AS (SELECT a AS vec_id,
                CASE WHEN sum(CASE WHEN lb <> la THEN 1 ELSE 0 END)
                  >= ${k - 1} THEN 1 ELSE 0 END AS s_b
              FROM (SELECT a, la, lb, row_number() OVER (PARTITION BY a
                      ORDER BY sim DESC, b) AS rk FROM bp)
              WHERE rk <= $k GROUP BY 1),
       sj AS (SELECT es.vec_id, es.s_e, bs.s_b
              FROM es LEFT JOIN bs ON bs.vec_id = es.vec_id)
     SELECT CAST(count(*) AS BIGINT) AS n_anchors,
       CAST(sum(s_e) AS BIGINT) AS exact_suspects,
       CAST(sum(coalesce(s_b, 0)) AS BIGINT) AS blocked_suspects,
       CAST(sum(CASE WHEN s_e = 1 AND s_b = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS both_suspects,
       max(ps.n_true_pairs) AS n_true_pairs,
       max(ps.n_hit_pairs) AS n_hit_pairs,
       CAST(max(ps.n_hit_pairs) * 100 // max(ps.n_true_pairs)
         AS BIGINT) AS pair_recall_pct
     FROM sj CROSS JOIN ps"""

  /** q228 prefix widths (the last = full width, the built-in sanity
    * row: its recall is 1.0 by definition). */
  val TruncDims: Seq[Int] = Seq(8, 16, 32, 64)
  val TruncQueries = 8
  val TruncK = 10

  /** q228: DIMENSION-TRUNCATION fidelity — recall@k of cosine top-k
    * computed on each PREFIX of the embedding (8/16/32 of 64 dims)
    * against the full-width exact ranking, over a fixed query sample.
    * The report behind Matryoshka-style representation serving
    * (Kusupati et al. 2022): if the 16-dim prefix already carries
    * recall ~0.9, the ANN index can store a quarter of the bytes and
    * rescore survivors at full width. Completes the fidelity family:
    * q150/q151 measure the LSH index, q217 the PQ codes, this the
    * truncation axis itself.
    *
    * Scale shape: the q150 sampled-query discipline — the pair frame
    * is |queries| × corpus (linear in the corpus, queries broadcast),
    * scanned ONCE with all prefix similarities computed per row and
    * unpivoted via stack, so adding a width adds arithmetic, not a
    * rescan. Rank windows are per (query, width): sample-bounded.
    * All similarities e6-quantized with the round-6/truncate pattern
    * before ranking (ties broken by id), so both engines rank
    * identical integers. */
  def truncationRecallQuery(spark: SparkSession, dir: String): DataFrame =
    truncationRecall(Tables.embeddings(spark, dir),
      TruncDims, TruncQueries, TruncK)

  /** [[truncationRecallQuery]]'s core over a (vec_id, embedding)
    * frame. */
  def truncationRecall(embeddings: DataFrame, dims: Seq[Int],
      nQueries: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    VectorFunctions.register(embeddings.sparkSession)
    val emb = embeddings.select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val pairs = Partitioning.spread(emb)
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
    val simCols = dims.map { d =>
      (round(cosine(slice(col("embedding"), 1, d),
        slice(col("qe"), 1, d)), 6) * 1000000).cast("long").as(s"sim_$d")
    }
    val stacked = pairs
      .select(col("qid") +: col("vec_id") +: simCols: _*)
      .select(col("qid"), col("vec_id"),
        expr("stack(" + dims.length + ", " +
          dims.map(d => s"$d, sim_$d").mkString(", ") +
          ") AS (dims, sim)"))
    val ranked = stacked.withColumn("rn",
        row_number().over(Window.partitionBy("qid", "dims")
          .orderBy(col("sim").desc, col("vec_id").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"), col("dims"))
      .localCheckpoint()
    val full = ranked.filter(col("dims") === dims.max)
      .select(col("qid"), col("vec_id"))
    val nq = queries.agg(count(lit(1)).as("nq"))
    // left join + sum, not a semi-join: a width with ZERO hits must
    // still report its row
    ranked.join(full.withColumn("hit", lit(1L)), Seq("qid", "vec_id"),
        "left")
      .groupBy("dims")
      .agg(sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_hits"))
      .crossJoin(broadcast(nq))
      .select(col("dims").cast("long").as("dims"), col("n_hits"),
        expr(s"n_hits * 1000000 div (nq * $k)").cast("long")
          .as("recall_e6"))
      .orderBy("dims")
  }

  /** DuckDB oracle for [[truncationRecallQuery]] — same prefixes,
    * same quantization, same tie-breaks. */
  def truncationRecallOracleSql: String = {
    val dimVals = TruncDims.map(d => s"($d)").mkString(",")
    s"""WITH e AS (SELECT vec_id,
           CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings),
       q AS (SELECT vec_id AS qid, embedding AS qe FROM e
             WHERE vec_id < $TruncQueries),
       p AS (SELECT q.qid, e.vec_id, e.embedding, q.qe
             FROM e, q WHERE e.vec_id <> q.qid),
       s AS (SELECT qid, vec_id, d.dims,
           CAST(trunc(round(list_cosine_similarity(
             embedding[1:d.dims], qe[1:d.dims]), 6) * 1000000)
             AS BIGINT) AS sim
         FROM p, (VALUES $dimVals) AS d(dims)),
       r AS (SELECT qid, vec_id, dims,
           row_number() OVER (PARTITION BY qid, dims
             ORDER BY sim DESC, vec_id ASC) AS rn
         FROM s),
       topk AS (SELECT qid, vec_id, dims FROM r WHERE rn <= $TruncK),
       full64 AS (SELECT qid, vec_id FROM topk
                  WHERE dims = ${TruncDims.max}),
       hits AS (SELECT t.dims,
                  sum(CASE WHEN f.qid IS NULL THEN 0 ELSE 1 END)
                    AS n_hits
                FROM topk t
                LEFT JOIN full64 f
                  ON f.qid = t.qid AND f.vec_id = t.vec_id
                GROUP BY 1),
       nq AS (SELECT count(*) AS n FROM q)
     SELECT CAST(dims AS BIGINT) AS dims,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(n_hits * 1000000 // (n * $TruncK) AS BIGINT) AS recall_e6
     FROM hits CROSS JOIN nq ORDER BY dims"""
  }
}
