package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic content-hash sampling (q234) — the reproducibility
  * primitive of a production training-data pipeline: sampling
  * decisions must be a PURE FUNCTION of the document, not of RNG
  * state, partition layout, or cluster size, so that re-running the
  * pipeline (or re-running one partition after a failure) keeps
  * exactly the same documents. The standard construction: a
  * cryptographic digest of the content is read as a uniform draw in
  * [0, 2^32) and compared against a per-stratum threshold.
  *
  * q234 balances the language strata: every stratum is downsampled to
  * the size of the smallest one (rate_l = min_count / count_l), the
  * class-balancing step before training on skewed multilingual
  * corpora. q59 draws the same balanced sample from a hash of the
  * DOCUMENT ID; this one hashes the CONTENT, which survives the
  * re-crawl/re-shard reality where ids are reassigned but text is
  * not — the same document keeps the same verdict across corpus
  * versions, which is what makes longitudinal ablations comparable.
  * It also emits the full per-document verdict column rather than
  * the kept rows only, so downstream stages can audit the rejected
  * side without a second pass. The keep test compares the first 8 hex digits of
  * md5(text) LEXICOGRAPHICALLY against the threshold rendered with
  * %08x — both engines order lowercase-hex strings identically, so
  * the decision is engine-portable without parsing hex into integers
  * (which the two SQL dialects do differently).
  *
  * Scale shape: md5 + substring are scan-side codegen'd expressions;
  * the stratum-count aggregate is a handful of rows broadcast back;
  * the keep flag is one string compare per row. Linear, no shuffle of
  * the corpus itself, deterministic under any partitioning.
  */
object Sampling {

  /** 2^32 as the hash-space size; thresholds are capped at 2^32 - 1
    * because %08x of 2^32 would be 9 digits and break the
    * lexicographic compare (the min stratum then keeps everything
    * except the single hash value 'ffffffff' — deterministic on both
    * engines and vanishingly unlikely to matter). */
  val HashSpace = 4294967296L
  val HashCap = 4294967295L

  def balancedSampleQuery(spark: SparkSession, dir: String): DataFrame =
    balancedSample(Tables.documents(spark, dir))

  def balancedSample(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
    // EXACT integer threshold: decimal multiply + integral `div`,
    // never double division — long `/` is double in Spark, and
    // mn * 2^32 loses ulps past mn = 2^21 (and overflows long past
    // 2^31), which would desync the %08x boundary from DuckDB's exact
    // `//` on a large min stratum even though the fixture never
    // shows it
    val withMin = counts.crossJoin(
      broadcast(counts.agg(min(col("cnt")).as("mn"))))
      .select(col("lang"),
        format_string("%08x",
          least(expr(s"CAST((CAST(mn AS DECIMAL(38,0)) * $HashSpace)" +
              " div cnt AS BIGINT)"),
            lit(HashCap))).as("thr8"))
    docs.select(col("doc_id"), col("lang"),
        substring(md5(col("text")), 1, 8).as("h8"))
      .join(broadcast(withMin), "lang")
      .select(col("doc_id"), col("lang"), col("h8"),
        when(col("h8") < col("thr8"), 1).otherwise(0).cast("int")
          .as("is_kept"))
      .orderBy("doc_id")
  }

  /** DuckDB re-derivation: same md5 prefix, same %08x threshold
    * rendering, same string compare. Integer floor division on
    * nonnegative operands matches Spark's floor(). */
  def balancedSampleOracleSql: String =
    s"""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
       m AS (SELECT min(cnt) AS mn FROM c),
       thr AS (SELECT lang,
           printf('%08x', CAST(least(
               CAST(mn AS HUGEINT) * $HashSpace // cnt,
               $HashCap) AS BIGINT)) AS thr8
         FROM c, m)
     SELECT d.doc_id, d.lang, substr(md5(d.text), 1, 8) AS h8,
       CAST(CASE WHEN substr(md5(d.text), 1, 8) < t.thr8
            THEN 1 ELSE 0 END AS INT) AS is_kept
     FROM documents d JOIN thr t ON d.lang = t.lang
     ORDER BY d.doc_id"""

  /** q236: EXACT-BUDGET quota manifest — q200 computes temperature
    * mixing weights; this spends them: a fixed document budget
    * [[Budget]] is allocated across sources by LARGEST-REMAINDER
    * apportionment (Hamilton's method, the q104 mechanism — q104
    * apportions raw token mass per language and stops at the
    * per-stratum NUMBERS; here the weights are the α=0.5 tempered
    * masses and the output is the document MANIFEST) over
    * w_s = floor(sqrt(token_mass_s)), then each source's quota is
    * filled by the md5-rank order of its documents (q61 fills a
    * FIXED per-stratum quota by a quality score; here the quotas
    * themselves are the apportionment result). Every step is
    * integer arithmetic or a hash rank, so the manifest — the exact
    * document list a fixed-budget training mix would pull — is
    * reproducible on any engine and any partitioning.
    *
    * Apportionment in integers: seats_s = B·w_s div W; the leftover
    * B − Σ seats_s goes one each to the largest remainder NUMERATORS
    * B·w_s − seats_s·W (ties by source id) — no fractions anywhere.
    *
    * Scale shape: the weight/seat table is |sources| rows computed
    * from one tokenized aggregate and broadcast; the per-source fill
    * is a rank-and-filter (top-quota-by-hash — a keyed TopK, not a
    * global sort). */
  val Budget = 100L

  def quotaManifestQuery(spark: SparkSession, dir: String): DataFrame =
    quotaManifest(Tables.documents(spark, dir))

  /** Hamilton (largest-remainder) apportionment of `budget` seats
    * over a (source, w) weight frame — all-integer: floor quotas
    * first, the leftover seats one each to the largest remainder
    * NUMERATORS budget·w − base·W, ties by source. Each quota is
    * floor or ceil of its exact share (property-tested). */
  def apportion(weights: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = weights.agg(sum(col("w")).as("tw"))
    val seats = weights.crossJoin(broadcast(tot))
      .select(col("source"), col("w"), col("tw"),
        expr(s"CAST($budget * w AS DECIMAL(38,0)) div tw").cast("long")
          .as("base"),
        (lit(budget) * col("w")
          - expr(s"CAST($budget * w AS DECIMAL(38,0)) div tw")
            .cast("long") * col("tw")).as("rem_num"))
    val extra = seats.agg((lit(budget) - sum(col("base"))).as("extra"))
    seats.crossJoin(broadcast(extra))
      .withColumn("rr", row_number().over(
        Window.orderBy(col("rem_num").desc, col("source").asc)))
      .select(col("source"),
        (col("base") + when(col("rr") <= col("extra"), 1L).otherwise(0L))
          .as("quota"))
  }

  def quotaManifest(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = docs.select(col("source"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long")
          .as("n_toks"))
      .groupBy("source")
      .agg(sum(col("n_toks")).as("mass"))
      .withColumn("w", floor(sqrt(col("mass").cast("double"))).cast("long"))
    val quotas = apportion(per.select(col("source"), col("w")), Budget)
    val ranked = docs.select(col("doc_id"), col("source"),
        md5(col("text")).as("h"))
      .withColumn("pick_rank", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("h").asc, col("doc_id").asc)))
    ranked.join(broadcast(quotas), "source")
      .filter(col("pick_rank") <= col("quota"))
      .select(col("doc_id"), col("source"),
        col("pick_rank").cast("int").as("pick_rank"),
        col("quota").cast("long").as("quota"))
      .orderBy("doc_id")
  }

  /** DuckDB re-derivation of [[quotaManifest]] — identical integer
    * apportionment and md5 rank order. The |sources|-row window in
    * the quota CTE is driver-scale on both engines. */
  def quotaManifestOracleSql: String = {
    val ws = "\\s+"
    s"""WITH per AS (SELECT source,
           CAST(sum(len(string_split_regex(trim(lower(text)), '$ws')))
             AS BIGINT) AS mass
         FROM documents GROUP BY 1),
       w AS (SELECT source, CAST(floor(sqrt(mass)) AS BIGINT) AS w
         FROM per),
       g AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
       seats AS (SELECT source, w, tw,
           $Budget * w // tw AS base,
           $Budget * w - ($Budget * w // tw) * tw AS rem_num
         FROM w, g),
       e AS (SELECT $Budget - sum(base) AS extra FROM seats),
       q AS (SELECT source,
           base + CASE WHEN row_number() OVER
               (ORDER BY rem_num DESC, source ASC) <= extra
             THEN 1 ELSE 0 END AS quota
         FROM seats, e),
       r AS (SELECT doc_id, source,
           row_number() OVER (PARTITION BY source
             ORDER BY md5(text) ASC, doc_id ASC) AS pick_rank
         FROM documents)
     SELECT r.doc_id, r.source, CAST(r.pick_rank AS INT) AS pick_rank,
       CAST(q.quota AS BIGINT) AS quota
     FROM r JOIN q USING (source)
     WHERE r.pick_rank <= q.quota
     ORDER BY r.doc_id"""
  }

  /** q269 sample size. */
  val PriorityK = 200

  /** q269: WEIGHTED priority sampling — the deterministic integer
    * rendering of the Efraimidis–Spirakis idea (weighted random
    * sampling via per-item priority keys): every document gets
    * priority = hash(doc) div weight, the sample is the bottom-K
    * priorities. With the hash uniform on [0, 2^60), an item's chance
    * of clearing any fixed priority threshold is proportional to its
    * weight — heavier documents (here: longer, weight = n_chars) are
    * proportionally more likely in, and the whole draw is reproducible
    * from the data alone (the md5-keyed determinism every sampler in
    * this engine shares; A-ES's exponential keys would need doubles,
    * the integer quotient preserves the ∝weight property for the
    * bottom-K selection). Completes the sampler family: uniform
    * (q67), stratified (q59), balanced (q234), quota (q236) — this is
    * the importance-weighted member.
    *
    * Scale shape: one scan computing (hash div weight), then top-K by
    * the TakeOrderedAndProject path — no global sort, no shuffle
    * beyond the K-row collect. */
  def prioritySampleQuery(spark: SparkSession, dir: String): DataFrame =
    prioritySample(Tables.documents(spark, dir))

  /** [[prioritySampleQuery]]'s core over any (doc_id, text, n_chars)
    * frame. */
  def prioritySample(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.portableHash60
    docs
      .select(col("doc_id"),
        greatest(col("n_chars"), lit(1L)).cast("long").as("w"),
        portableHash60(col("text")).as("h"))
      .withColumn("priority", expr("h div w"))
      .orderBy(col("priority").asc, col("doc_id").asc)
      .limit(PriorityK)
      .select(col("doc_id"), col("w"), col("priority"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[prioritySampleQuery]] — same 60-bit md5
    * prefix, same integer quotient, same bottom-K order. */
  def prioritySampleOracleSql: String =
    s"""WITH p AS (SELECT doc_id,
           greatest(n_chars, 1) AS w,
           CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)
             // greatest(n_chars, 1) AS priority
         FROM documents
         ORDER BY priority ASC, doc_id ASC LIMIT $PriorityK)
     SELECT doc_id, CAST(w AS BIGINT) AS w,
       CAST(priority AS BIGINT) AS priority
     FROM p ORDER BY doc_id"""
}
