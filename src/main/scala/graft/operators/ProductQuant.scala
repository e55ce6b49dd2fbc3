package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Product quantization (PQ) — the third ANN family beside the
  * hyperplane LSH (q27/q56) and IVF (q36/q81) paths, and the one that
  * compresses the VECTORS THEMSELVES: each embedding is cut into
  * [[SubSpaces]] sub-vectors, each sub-vector is replaced by the id of
  * its nearest codebook entry, and a query scores a candidate by
  * summing per-subspace lookup-table distances (asymmetric distance
  * computation, Jégou et al. 2011 "Product Quantization for Nearest
  * Neighbor Search"). The serving artifact is the CODES table —
  * [[SubSpaces]] small ints per vector instead of the full float
  * array — plus a codebook of [[PqK]]·[[SubSpaces]] sub-vectors; at
  * 100 TB that is the difference between scanning embeddings and
  * scanning a table ~60x narrower, with the LUT join a broadcast of
  * [[PqK]]·[[SubSpaces]] rows.
  *
  * Determinism discipline: codebooks are the sub-vectors of the
  * [[PqK]] LOWEST-id vectors (the q81 anchor-centroid rule — a real
  * deployment k-means-trains them on a sample, which
  * [[Similarity.trainIvfCentroids]] already demonstrates; anchors
  * keep the construction expressible AGAINST THE TABLE ITSELF in the
  * oracle, no float literals), vectors quantize to the integer grid
  * round(x·1024) (the q56 rule), and every distance is an exact
  * integer L2² — so encoding, LUT, and ranking are bit-identical in
  * any engine, and the recall report (q217) grades the approximation
  * against the exact ranking on the same grid.
  */
object ProductQuant {

  /** 64 dims cut into 4 sub-vectors of 16. */
  val SubSpaces = 4
  val SubDim = 16

  /** Codebook entries per subspace (the PqK lowest-id vectors). */
  val PqK = 8

  private def quantized(e: Column): Column =
    transform(e, x => round(x.cast("double") * lit(1024)).cast("long"))

  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (s, v) => s + v)

  /** Per-vector per-subspace distances to EVERY codebook entry —
    * (vec_id, s, code, d2), the one frame both the encoder (argmin
    * per (vec_id, s)) and the query LUT (the queryId's rows) read.
    * The codebook side is PqK·SubSpaces rows — broadcast. */
  private def subDistances(emb: DataFrame): DataFrame = {
    val q = emb.select(col("vec_id"), quantized(col("embedding")).as("qv"))
    val subs = array((0 until SubSpaces).map(s =>
      struct(lit(s).as("s"),
        slice(col("qv"), s * SubDim + 1, SubDim).as("vsub"))): _*)
    val perSub = q.select(col("vec_id"), explode(subs).as("sub"))
      .select(col("vec_id"), col("sub.s").as("s"), col("sub.vsub").as("vsub"))
    val books = perSub.filter(col("vec_id") < PqK)
      .select(col("s"), col("vec_id").as("code"), col("vsub").as("csub"))
    perSub.join(broadcast(books), Seq("s"))
      .select(col("vec_id"), col("s"), col("code"),
        l2sq(col("vsub"), col("csub")).as("d2"))
  }

  /** The PQ codes table — each vector's nearest codebook entry per
    * subspace by integer L2², ties to the lowest code. Map-side
    * combinable argmin (min over a (d2, code) struct), no window. */
  def codes(emb: DataFrame): DataFrame =
    subDistances(emb)
      .groupBy("vec_id", "s")
      .agg(min(struct(col("d2"), col("code"))).as("m"))
      .select(col("vec_id"), col("s"), col("m.code").as("code"))

  /** q216: PQ top-k for the query vector `queryId` — the ADC scan:
    * candidates are scored ONLY through their codes and the query's
    * per-(subspace, code) LUT; the embedding column is never touched
    * past encoding. Output (vec_id, adist) with adist the exact
    * integer ADC distance. */
  def pqTopKQuery(spark: SparkSession, dir: String): DataFrame =
    pqTopK(Tables.embeddings(spark, dir), queryId = 0L, k = 10)

  /** [[pqTopKQuery]]'s core. */
  def pqTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    // one materialization: the encoder argmin and the LUT filter are
    // two consumers of the same interpreted-HOF subtree
    val dc = subDistances(emb).localCheckpoint()
    val cds = dc.groupBy("vec_id", "s")
      .agg(min(struct(col("d2"), col("code"))).as("m"))
      .select(col("vec_id"), col("s"), col("m.code").as("code"))
    val lut = dc.filter(col("vec_id") === queryId)
      .select(col("s"), col("code"), col("d2").as("d2q"))
    cds.join(broadcast(lut), Seq("s", "code"))
      .filter(col("vec_id") =!= queryId)
      .groupBy("vec_id").agg(sum(col("d2q")).as("adist"))
      .orderBy(col("adist").asc, col("vec_id").asc)
      .limit(k)
  }

  /** q217: the PQ recall report (the q150 discipline for this
    * family): exact top-k by full-vector integer L2² on the same
    * quantized grid vs the ADC top-k — one row (n_true, n_hits,
    * recall_pct). This is the artifact that tunes [[SubSpaces]]/
    * [[PqK]] at any corpus size. */
  def pqRecallQuery(spark: SparkSession, dir: String): DataFrame =
    pqRecall(Tables.embeddings(spark, dir), queryId = 0L, k = 10)

  /** [[pqRecallQuery]]'s core. */
  def pqRecall(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = emb.select(col("vec_id"), quantized(col("embedding")).as("qv"))
    val qv = q.filter(col("vec_id") === queryId)
      .select(col("qv").as("query_qv"))
    val exact = q.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), l2sq(col("qv"), col("query_qv")).as("d2"))
      .orderBy(col("d2").asc, col("vec_id").asc)
      .limit(k)
      .select("vec_id")
    val approx = pqTopK(emb, queryId, k).select("vec_id")
    exact.join(approx, Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).cast("long").as("n_hits"))
      .crossJoin(broadcast(
        exact.agg(count(lit(1)).cast("long").as("n_true"))))
      .select(col("n_true"), col("n_hits"),
        expr("n_hits * 100 div n_true").as("recall_pct"))
  }

  /** Shared oracle CTE prefix: quantized vectors, per-subspace
    * sub-vectors, codebook, distances, codes, and the query LUT —
    * [[subDistances]]/[[codes]] re-derived verbatim in DuckDB. */
  private[operators] def pqCtes(queryId: Long): String =
    s"""e AS (SELECT vec_id,
           list_transform(CAST(embedding AS DOUBLE[]),
             x -> CAST(round(x * 1024) AS BIGINT)) AS qv
         FROM embeddings),
       sp AS (SELECT unnest(range(0, $SubSpaces)) AS s),
       subs AS (SELECT vec_id, sp.s AS s,
           list_transform(range(1, ${SubDim + 1}),
             i -> qv[sp.s * $SubDim + i]) AS vsub
         FROM e, sp),
       books AS (SELECT s, vec_id AS code, vsub AS csub FROM subs
                 WHERE vec_id < $PqK),
       dc AS (SELECT v.vec_id, v.s, b.code,
           CAST(list_sum(list_transform(range(1, ${SubDim + 1}),
             i -> (v.vsub[i] - b.csub[i]) * (v.vsub[i] - b.csub[i])))
             AS BIGINT) AS d2
         FROM subs v JOIN books b ON v.s = b.s),
       codes AS (SELECT vec_id, s, code FROM dc
                 QUALIFY row_number() OVER (PARTITION BY vec_id, s
                   ORDER BY d2, code) = 1),
       lut AS (SELECT s, code, d2 AS d2q FROM dc
               WHERE vec_id = $queryId),
       ad AS (SELECT c.vec_id, CAST(sum(l.d2q) AS BIGINT) AS adist
              FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.code
              WHERE c.vec_id <> $queryId GROUP BY 1)"""

  /** DuckDB oracle for [[pqTopKQuery]] (q216). */
  def pqTopKOracleSql(queryId: Long = 0L, k: Int = 10): String =
    s"""WITH ${pqCtes(queryId)}
     SELECT vec_id, adist FROM ad ORDER BY adist, vec_id LIMIT $k"""

  /** DuckDB oracle for [[pqRecallQuery]] (q217). */
  def pqRecallOracleSql(queryId: Long = 0L, k: Int = 10): String =
    s"""WITH ${pqCtes(queryId)},
       pq AS (SELECT vec_id FROM ad ORDER BY adist, vec_id LIMIT $k),
       ex AS (SELECT a.vec_id,
           CAST(list_sum(list_transform(range(1, ${SubSpaces * SubDim + 1}),
             i -> (a.qv[i] - q.qv[i]) * (a.qv[i] - q.qv[i])))
             AS BIGINT) AS d2
         FROM e a, (SELECT qv FROM e WHERE vec_id = $queryId) q
         WHERE a.vec_id <> $queryId),
       et AS (SELECT vec_id FROM ex ORDER BY d2, vec_id LIMIT $k),
       hits AS (SELECT CAST(count(*) AS BIGINT) AS n_hits
                FROM et JOIN pq ON et.vec_id = pq.vec_id),
       tc AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM et)
     SELECT tc.n_true, hits.n_hits,
       CAST(hits.n_hits * 100 // tc.n_true AS BIGINT) AS recall_pct
     FROM tc CROSS JOIN hits"""
}
