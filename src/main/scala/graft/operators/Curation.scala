package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{patternCount, portableHash60, rawTokens, tokens}
import graft.sources.Tables

/** Dataset-curation operators — the selection/weighting steps between a
  * deduplicated corpus and a training run:
  *
  *  - [[stratifiedSample]]: deterministic hash-based downsampling to
  *    balance strata (no RNG, no state — every engine and every re-run
  *    picks the same rows).
  *  - [[mixingWeights]]: per-stratum sampling weights to reshape the
  *    natural token distribution toward a target mixture.
  *  - [[quotaSelect]]: top-N-per-stratum selection by a quality score
  *    (curriculum / quota construction).
  *
  * All three are aggregate-then-broadcast shapes: the per-stratum state
  * is a handful of rows regardless of corpus size, so the only
  * corpus-sized pass is a scan-speed filter or a bounded-partition
  * window — nothing quadratic, nothing driver-sized.
  */
object Curation {

  /** q59: stratified downsampling to the smallest stratum — each
    * language is sampled at rate `min_count / count` so every stratum
    * contributes ~the same number of documents (the classic
    * class-balance step). Selection is deterministic: keep a doc iff
    * `portableHash60(lang:doc_id) mod 1e6 < rate_e6` — reproducible
    * across engines/runs, no RNG seed plumbing, and independent
    * per stratum. Scale shape: one tiny groupBy(lang) agg (map-side
    * combined), a broadcast join of the 5-row rate table, then a
    * scan-speed filter; no corpus-sized shuffle at all. */
  def stratifiedSample(docs: DataFrame): DataFrame = {
    // |langs|-row aggregate read by the min probe and the rate table —
    // build once, or both branches re-aggregate the corpus
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val minCnt = counts.agg(min(col("cnt")).as("min_cnt"))
    val rates = counts.crossJoin(broadcast(minCnt))
      .select(col("lang"), expr("min_cnt * 1000000 div cnt").as("rate_e6"))
    docs.join(broadcast(rates), Seq("lang"))
      .filter(portableHash60(
        concat(col("lang"), lit(":"), col("doc_id").cast("string")))
        % 1000000L < col("rate_e6"))
      .select(col("doc_id"), col("lang"), col("rate_e6"))
      .orderBy("doc_id")
  }

  /** q60: data-mixing weights — how much to up/down-sample each
    * language so the training mixture hits a UNIFORM target share,
    * from the natural per-language token mass. `share_e6` is the
    * observed token share; `weight_e6` is target/observed (1e6 =
    * leave as-is, >1e6 = oversample). Integer rational arithmetic
    * throughout (div, not doubles) so the numbers are exact on any
    * engine. Two tiny aggregations; the corpus is touched once. */
  def mixingWeights(docs: DataFrame): DataFrame = {
    val perLang = docs
      .select(col("lang"), size(tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      // |langs| rows; totals and the share projection both read it —
      // without the checkpoint the corpus is tokenized twice
      .localCheckpoint()
    val totals = perLang.agg(sum(col("n_tokens")).as("total_tokens"),
      count(lit(1)).as("n_langs"))
    perLang.crossJoin(broadcast(totals))
      // decimal(38,0) intermediate: n_tokens * 1e6 overflows BIGINT
      // once one stratum holds > ~9.2e12 tokens (real at 100 TB);
      // `div` on the decimal still returns an exact BIGINT share
      .withColumn("share_e6",
        expr("CAST(n_tokens AS DECIMAL(38,0)) * 1000000 div total_tokens"))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("share_e6"),
        expr("(1000000 div n_langs) * 1000000 div greatest(share_e6, 1)")
          .as("weight_e6"))
      .orderBy("lang")
  }

  /** q61: per-stratum quality quota — the top `perLang` documents of
    * each language by an integer Gopher-style quality score
    * (words - punctuation - digits: favors clean running text). The
    * window partitions by language, so at scale each partition is one
    * stratum's docs — bounded by stratum size, never the corpus — and
    * the quota filter prunes everything past rank N. */
  def quotaSelect(docs: DataFrame, perLang: Int = 20): DataFrame = {
    val scored = docs.select(col("doc_id"), col("lang"),
      (size(rawTokens(col("text"))).cast("long")
        - patternCount(col("text"), "[^A-Za-z0-9\\s]")
        - patternCount(col("text"), "[0-9]")).as("score"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rn") <= perLang)
      .select(col("doc_id"), col("lang"), col("score"),
        col("rn").cast("long").as("rn"))
      .orderBy("lang", "rn")
  }

  /** q67: reproducible uniform sample of EXACTLY k documents — order
    * by a content-independent portable hash of the id and take the
    * first k. The deterministic replacement for rand()-based sampling
    * (same rows on every engine, every run, any partitioning), and
    * the plan is TakeOrderedAndProject: each partition keeps its own
    * top-k candidates and only k rows per partition reach the driver-
    * side merge — no global sort of the corpus, no shuffle. The
    * rate-based sibling [[stratifiedSample]] bounds EXPECTED counts;
    * this one bounds the count exactly (fixed eval budgets). */
  def exactSample(docs: DataFrame, k: Int = 100): DataFrame =
    docs.select(col("doc_id"), col("lang"),
        portableHash60(concat(lit("sample:"), col("doc_id").cast("string")))
          .as("h"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** DuckDB oracles, sharing every constant with the Scala operators. */
  def exactSampleOracleSql(k: Int = 100): String =
    s"""SELECT doc_id, lang FROM (
         SELECT doc_id, lang,
           CAST(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))
             AS BIGINT) AS h
         FROM documents ORDER BY h, doc_id LIMIT $k)
       ORDER BY doc_id"""
  def stratifiedSampleOracleSql: String =
    """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
       r AS (SELECT lang, (SELECT min(cnt) FROM c) * 1000000 // cnt AS rate_e6
             FROM c)
     SELECT d.doc_id, d.lang, r.rate_e6
     FROM documents d JOIN r ON d.lang = r.lang
     WHERE CAST(('0x' || substr(md5(d.lang || ':' || CAST(d.doc_id AS VARCHAR)), 1, 15))
             AS BIGINT) % 1000000 < r.rate_e6
     ORDER BY d.doc_id"""

  def mixingWeightsOracleSql: String =
    """WITH t AS (SELECT lang, count(*) AS n_docs,
           CAST(sum(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT)
             AS n_tokens
         FROM documents GROUP BY 1),
       g AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               count(*) AS n_langs FROM t),
       s AS (SELECT lang, n_docs, n_tokens,
               n_tokens * 1000000 // total_tokens AS share_e6, n_langs
             FROM t, g)
     SELECT lang, n_docs, n_tokens, share_e6,
       (1000000 // n_langs) * 1000000 // greatest(share_e6, 1) AS weight_e6
     FROM s ORDER BY lang"""

  /** q200: temperature-flattened source mixing — sampling weights
    * ∝ mass^(1/2), the multilingual/multi-source temperature trick
    * (α-sampling with α = 0.5, the T5 / massively-multilingual-NMT
    * recipe): rare sources gain share, no source dominates, and the
    * ordering by mass is preserved — the middle ground between q60's
    * natural and uniform targets. floor(sqrt(n)) over BIGINT token
    * masses is exact and portable: IEEE-754 sqrt is correctly
    * rounded, so both engines floor to the same integer for any
    * mass below 2^52 (larger masses would take a decimal path as in
    * q60). One tokenized aggregation; everything downstream reads
    * the |sources|-row frame. */
  def temperatureMix(docs: DataFrame): DataFrame = {
    val per = docs
      .select(col("source"),
        size(tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .localCheckpoint()
    val weighted = per.withColumn("w",
      floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val totals = weighted.agg(sum(col("n_tokens")).as("tt"),
      sum(col("w")).as("tw"))
    weighted.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("w"),
        expr("CAST(n_tokens AS DECIMAL(38,0)) * 1000000 div tt")
          .as("nat_e6"),
        expr("CAST(w AS DECIMAL(38,0)) * 1000000 div tw").as("temp_e6"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[temperatureMix]]. */
  def temperatureMixOracleSql: String =
    """WITH t AS (SELECT source, count(*) AS n_docs,
           CAST(sum(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT)
             AS n_tokens
         FROM documents GROUP BY 1),
       w AS (SELECT source, n_docs, n_tokens,
               CAST(floor(sqrt(n_tokens)) AS BIGINT) AS w FROM t),
       g AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt,
               CAST(sum(w) AS BIGINT) AS tw FROM w)
     SELECT source, n_docs, n_tokens, w,
       n_tokens * 1000000 // tt AS nat_e6,
       w * 1000000 // tw AS temp_e6
     FROM w, g ORDER BY source"""

  /** q70: robust per-language length trim — keep documents whose token
    * count falls inside the stratum's [p5, p95] (boilerplate stubs and
    * concatenation monsters are the tails an LLM corpus trims).
    * Percentiles are exact rank selection (row_number vs ceil(p*n), as
    * in q53) over INTEGER token counts — portable by construction, no
    * interpolation, no doubles in the output. The ranking window
    * partitions by language, so each partition is stratum-bounded,
    * never corpus-wide; the cutoff table (one row per language)
    * broadcasts back and the second corpus pass is a scan-speed filter
    * feeding one map-side-combined aggregate. */
  def lengthTrim(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), col("lang"),
      size(tokens(col("text"))).cast("long").as("n_toks"))
    val byVal = Window.partitionBy("lang")
      .orderBy(col("n_toks").asc, col("doc_id").asc)
    val byLang = Window.partitionBy("lang")
    val cuts = d
      .select(col("lang"), col("n_toks"),
        row_number().over(byVal).as("rn"),
        count(lit(1)).over(byLang).as("n"))
      .groupBy("lang")
      .agg(
        // integer percentile indices: (n+19) div 20 = ceil(n/20),
        // (19n+19) div 20 = ceil(19n/20) — no IEEE multiply, so
        // engine and oracle agree by construction
        min(when(col("rn") === expr("(n + 19) div 20"), col("n_toks")))
          .as("lo"),
        min(when(col("rn") === expr("(19 * n + 19) div 20"),
          col("n_toks"))).as("hi"))
    d.join(broadcast(cuts), Seq("lang"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_toks").between(col("lo"), col("hi")), lit(1L))
          .otherwise(lit(0L))).as("n_kept"),
        min(col("lo")).as("lo"), min(col("hi")).as("hi"))
      .orderBy("lang")
  }

  def lengthTrimOracleSql: String =
    """WITH d AS (SELECT doc_id, lang,
           CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
             AS n_toks
         FROM documents),
       r AS (SELECT lang, n_toks,
           row_number() OVER (PARTITION BY lang ORDER BY n_toks, doc_id) AS rn,
           count(*) OVER (PARTITION BY lang) AS n FROM d),
       c AS (SELECT lang,
           min(CASE WHEN rn = (n + 19) // 20 THEN n_toks END) AS lo,
           min(CASE WHEN rn = (19 * n + 19) // 20 THEN n_toks END) AS hi
         FROM r GROUP BY 1)
     SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN d.n_toks BETWEEN c.lo AND c.hi
         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       min(c.lo) AS lo, min(c.hi) AS hi
     FROM d JOIN c ON d.lang = c.lang
     GROUP BY d.lang ORDER BY d.lang"""

  def quotaSelectOracleSql(perLang: Int = 20): String =
    s"""WITH s AS (SELECT doc_id, lang,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
             - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT)
             - CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS score
         FROM documents),
       r AS (SELECT doc_id, lang, score,
               CAST(row_number() OVER (PARTITION BY lang
                 ORDER BY score DESC, doc_id) AS BIGINT) AS rn
             FROM s)
     SELECT doc_id, lang, score, rn FROM r WHERE rn <= $perLang
     ORDER BY lang, rn"""

  /** q99: mixture MATERIALIZATION — q60 computed how much to up/down-
    * sample each language; this op actually emits the resampled
    * corpus: each doc repeated `weight div 1e6` times plus one extra
    * epoch with probability `weight mod 1e6`, decided by PORTABLE HASH
    * (not RNG) so the materialized mixture is bit-reproducible across
    * engines and reruns. Fractional-epoch selection by hash is how a
    * deterministic trainer repeats data without a shuffle-order
    * dependency. Repeats are clamped at [[MaxEpochs]] (the standard
    * guard: beyond a few epochs repetition hurts, and the clamp also
    * bounds the explode fan-out for a vanishing stratum whose raw
    * weight would be huge). Output is one row per (doc, epoch). */
  val MaxEpochs = 5L

  def mixtureMaterialize(docs: DataFrame): DataFrame = {
    val w = mixingWeights(docs).select(col("lang"), col("weight_e6"))
    docs.join(broadcast(w), Seq("lang"))
      .withColumn("extra",
        (portableHash60(concat(lit("mix:"), col("doc_id").cast("string")))
          % 1000000L < col("weight_e6") % 1000000L).cast("long"))
      .withColumn("n_rep",
        least(expr("weight_e6 div 1000000") + col("extra"), lit(MaxEpochs)))
      .filter(col("n_rep") > 0)
      .select(col("doc_id"), col("lang"), col("n_rep"),
        explode(sequence(lit(1L), col("n_rep"))).as("rep"))
      .orderBy("doc_id", "rep")
  }

  /** DuckDB oracle for [[mixtureMaterialize]]. */
  def mixtureMaterializeOracleSql: String =
    s"""WITH t AS (SELECT lang, count(*) AS n_docs,
           CAST(sum(len(string_split_regex(trim(lower(text)), '\\s+')))
             AS BIGINT) AS n_tokens
         FROM documents GROUP BY 1),
       g AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               count(*) AS n_langs FROM t),
       wt AS (SELECT lang,
               (1000000 // n_langs) * 1000000
                 // greatest(n_tokens * 1000000 // total_tokens, 1)
                 AS weight_e6
             FROM t, g),
       d AS (SELECT doc_id, lang, weight_e6,
               CASE WHEN CAST(('0x' || substr(md5('mix:' ||
                   CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000
                   < weight_e6 % 1000000 THEN 1 ELSE 0 END AS extra
             FROM documents JOIN wt USING (lang)),
       n AS (SELECT doc_id, lang,
               least(weight_e6 // 1000000 + extra, $MaxEpochs) AS n_rep
             FROM d)
     SELECT doc_id, lang, CAST(n_rep AS BIGINT) AS n_rep,
       CAST(unnest(generate_series(1, n_rep)) AS BIGINT) AS rep
     FROM n WHERE n_rep > 0 ORDER BY doc_id, rep"""

  /** q103: deterministic weighted sampling — k documents drawn with
    * probability proportional to length, the integer-arithmetic shape
    * of Efraimidis–Spirakis reservoir sampling: each doc gets priority
    * h60("wsam:" ++ id) div weight and the k SMALLEST priorities win
    * (a heavier doc divides its uniform hash by a larger weight, so it
    * tends toward the front, proportionally). The float E-S form keys
    * on u^(1/w); the integer u div w form preserves the
    * weighted-preference ordering while staying exactly recomputable
    * on any engine — the same determinism trade as every hash draw in
    * this engine. Plan shape is TakeOrderedAndProject: each partition
    * forwards only its own k best candidates, nothing corpus-sized
    * moves. */
  def weightedSample(docs: DataFrame, k: Int = 50): DataFrame =
    docs
      // `div`, never `/`: the 60-bit hash exceeds 2^53, so double
      // division would round and diverge from the oracle's integer //
      .selectExpr("doc_id", "lang", "n_chars",
        """CAST(conv(substring(md5(concat('wsam:',
             CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)
           div greatest(n_chars, 1L) AS priority""")
      .orderBy(col("priority").asc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")

  /** q122: per-stratum exact-K sample — exactly [[StratumK]] documents
    * per language (fewer only if the stratum is smaller), chosen by
    * portable hash order: the stratified twin of q67's global exact-K.
    * The rank window partitions by language, so each partition sorts
    * ONE stratum's hashes (stratum-bounded, never corpus-bounded) and
    * the filter prunes everything past rank K before any further work.
    * Deterministic on any engine, any partitioning, any rerun —
    * rand()-free stratified sampling for reproducible eval sets. */
  val StratumK = 5

  def stratifiedExactK(docs: DataFrame, k: Int = StratumK): DataFrame = {
    val byLang = Window.partitionBy("lang")
      .orderBy(col("h").asc, col("doc_id").asc)
    docs
      .select(col("doc_id"), col("lang"),
        portableHash60(concat(lit("sek:"), col("doc_id").cast("string")))
          .as("h"))
      .withColumn("rn", row_number().over(byLang))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rn"))
      .orderBy("lang", "rn")
  }

  /** DuckDB oracle for [[stratifiedExactK]] (k=5). */
  def stratifiedExactKOracleSql(k: Int = StratumK): String =
    s"""WITH h AS (SELECT doc_id, lang,
           CAST(('0x' || substr(md5('sek:' || CAST(doc_id AS VARCHAR)),
             1, 15)) AS BIGINT) AS h
         FROM documents),
       r AS (SELECT doc_id, lang,
               CAST(row_number() OVER (PARTITION BY lang
                 ORDER BY h, doc_id) AS BIGINT) AS rn FROM h)
     SELECT doc_id, lang, rn FROM r WHERE rn <= $k ORDER BY lang, rn"""

  /** q123: distribution drift between corpus snapshots — the
    * total-variation-distance components between the even-id and
    * odd-id halves of the corpus (standing in for yesterday's and
    * today's load), over token-length buckets: per bucket, each
    * side's share (×1e6) and the absolute share difference, whose
    * half-sum is the TVD drift score a monitoring pipeline alerts on.
    * Everything is one aggregation per side at bucket grain plus
    * arithmetic on the (tiny) bucket table; integer rationals keep it
    * exact cross-engine (the PSI's log term is the only thing
    * sacrificed for exactness — the L1 form ranks drift the same
    * way). */
  def driftTvdQuery(docs: DataFrame): DataFrame = {
    val bucketed = docs.select(col("doc_id"),
      expr("size(split(trim(lower(text)), '\\\\s+')) div 10")
        .as("bucket"),
      (col("doc_id") % 2 === 0).as("is_a"))
    val shares = bucketed.groupBy("bucket")
      .agg(count(when(col("is_a"), 1)).as("na"),
        count(when(!col("is_a"), 1)).as("nb"))
    val totals = shares.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    shares.crossJoin(broadcast(totals))
      .select(col("bucket"), col("na"), col("nb"),
        expr("na * 1000000 div ta").as("share_a_e6"),
        expr("nb * 1000000 div tb").as("share_b_e6"))
      .withColumn("abs_diff_e6",
        abs(col("share_a_e6") - col("share_b_e6")))
      .orderBy("bucket")
  }

  /** DuckDB oracle for [[driftTvdQuery]]. */
  def driftTvdOracleSql: String =
    """WITH b AS (SELECT doc_id,
           len(string_split_regex(trim(lower(text)), '\s+')) // 10
             AS bucket,
           doc_id % 2 = 0 AS is_a
         FROM documents),
       s AS (SELECT bucket,
               count(*) FILTER (WHERE is_a) AS na,
               count(*) FILTER (WHERE NOT is_a) AS nb
             FROM b GROUP BY 1),
       t AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
               CAST(sum(nb) AS BIGINT) AS tb FROM s)
     SELECT bucket, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
       CAST(na * 1000000 // ta AS BIGINT) AS share_a_e6,
       CAST(nb * 1000000 // tb AS BIGINT) AS share_b_e6,
       CAST(abs(na * 1000000 // ta - nb * 1000000 // tb) AS BIGINT)
         AS abs_diff_e6
     FROM s, t ORDER BY bucket"""

  /** q206: earth-mover (1-D Wasserstein) drift between the same two
    * snapshot halves as q123 — the transport metric the TVD misses:
    * moving mass one bucket over and moving it across the whole range
    * score the same L1 but very different EMD. On an integer line the
    * EMD is Σ |CDF_a(x) − CDF_b(x)| over x; over a sparse support
    * that is the gap-weighted sum at PRESENT buckets (between two
    * present buckets both CDFs are flat, so each |diff| multiplies by
    * the gap to the next bucket — no spine materialization needed).
    * CDFs stay integer: cum counts cross-scaled by the two totals,
    * one e6 division per row. Output per bucket: both cumulative
    * counts, the |CDF diff| (e6), the gap, and the gap-weighted
    * contribution whose sum IS the EMD in e6 bucket units. One
    * aggregation at bucket grain + windows over the tiny bucket
    * table. */
  def driftEmdQuery(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = docs.select(col("doc_id"),
      expr("size(split(trim(lower(text)), '\\\\s+')) div 10")
        .as("bucket"),
      (col("doc_id") % 2 === 0).as("is_a"))
    val shares = bucketed.groupBy("bucket")
      .agg(count(when(col("is_a"), 1)).as("na"),
        count(when(!col("is_a"), 1)).as("nb"))
    val byBucket = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seq = Window.orderBy("bucket")
    val totals = shares.agg(sum(col("na")).as("ta"),
      sum(col("nb")).as("tb"))
    // windows run over the metadata-scale bucket table (q118's
    // documented single-partition exemption)
    shares.crossJoin(broadcast(totals))
      .withColumn("cum_a", sum(col("na")).over(byBucket))
      .withColumn("cum_b", sum(col("nb")).over(byBucket))
      .withColumn("gap",
        coalesce(lead(col("bucket"), 1).over(seq) - col("bucket"),
          lit(0L)))
      .select(col("bucket"),
        col("cum_a").cast("long").as("cum_a"),
        col("cum_b").cast("long").as("cum_b"),
        expr("CAST(abs(cum_a * 1000000 div ta " +
          "- cum_b * 1000000 div tb) AS BIGINT)").as("cdf_diff_e6"),
        col("gap").cast("long").as("gap"))
      .withColumn("emd_term_e6",
        expr("CAST(cdf_diff_e6 * gap AS BIGINT)"))
      .orderBy("bucket")
  }

  /** DuckDB oracle for [[driftEmdQuery]]. */
  def driftEmdOracleSql: String =
    """WITH b AS (SELECT doc_id,
           len(string_split_regex(trim(lower(text)), '\s+')) // 10
             AS bucket,
           doc_id % 2 = 0 AS is_a
         FROM documents),
       s AS (SELECT bucket,
               count(*) FILTER (WHERE is_a) AS na,
               count(*) FILTER (WHERE NOT is_a) AS nb
             FROM b GROUP BY 1),
       t AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
               CAST(sum(nb) AS BIGINT) AS tb FROM s),
       c AS (SELECT bucket,
               CAST(sum(na) OVER (ORDER BY bucket) AS BIGINT) AS cum_a,
               CAST(sum(nb) OVER (ORDER BY bucket) AS BIGINT) AS cum_b,
               CAST(coalesce(lead(bucket) OVER (ORDER BY bucket)
                 - bucket, 0) AS BIGINT) AS gap
             FROM s)
     SELECT bucket, cum_a, cum_b,
       CAST(abs(cum_a * 1000000 // ta - cum_b * 1000000 // tb)
         AS BIGINT) AS cdf_diff_e6,
       gap,
       CAST(abs(cum_a * 1000000 // ta - cum_b * 1000000 // tb) * gap
         AS BIGINT) AS emd_term_e6
     FROM c, t ORDER BY bucket"""

  /** DuckDB oracle for [[weightedSample]] (k=50). */
  def weightedSampleOracleSql(k: Int = 50): String =
    s"""SELECT doc_id, lang, n_chars FROM (
         SELECT doc_id, lang, n_chars,
           CAST(('0x' || substr(md5('wsam:' || CAST(doc_id AS VARCHAR)),
             1, 15)) AS BIGINT) // greatest(n_chars, 1) AS priority
         FROM documents
         ORDER BY priority, doc_id LIMIT $k)
       ORDER BY doc_id"""

  /** q261: PARETO-FRONTIER (skyline) document selection — the
    * multi-objective version of every single-score quota rule above:
    * given two quality objectives to maximize (here `clean_e4`, the
    * non-punctuation rate in e4, and `n_words`), a document is on the
    * frontier iff NO other document is at least as good on both
    * objectives and strictly better on one. The frontier is the
    * defensible "no-regret" selection set a curation pipeline offers
    * when objectives trade off (longer docs tend to carry more
    * markup): anything off the frontier is dominated by a concrete
    * witness.
    *
    * Scale shape: skyline over 2 integer objectives reduces to a
    * running max — a doc is on the frontier iff its length equals the
    * MAX length at its own cleanliness level AND strictly exceeds the
    * max length over all STRICTLY CLEANER levels. Both maxima come
    * from the per-level table (`clean_e4` has a bounded e4 domain, so
    * ≤10001 rows regardless of corpus size): within-block running max
    * windows (blocked by clean_e4 div 1000 — ≤11 partitions) plus a
    * broadcast triangular join for cross-block offsets, the q241
    * pattern. The corpus-sized passes are one aggregation and one
    * broadcast-join flag attach — no single-partition window, no
    * quadratic dominance test (the ORACLE runs the quadratic NOT
    * EXISTS definition, so the hash match certifies the reduction). */
  def skylineQuery(spark: SparkSession, dir: String): DataFrame =
    skyline(Tables.documents(spark, dir))

  /** [[skylineQuery]]'s core over any (doc_id, text, n_chars) frame. */
  def skyline(docs: DataFrame): DataFrame = {
    val scored = docs
      .select(col("doc_id"), col("n_chars"),
        patternCount(col("text"), "[^A-Za-z0-9\\s]").as("n_punct"),
        size(rawTokens(col("text"))).cast("long").as("n_words"))
      .select(col("doc_id"),
        (lit(10000L) - expr("n_punct * 10000 div greatest(n_chars, 1)"))
          .as("clean_e4"),
        col("n_words"))
    // per-cleanliness-level max length: bounded-domain table
    val levels = scored.groupBy("clean_e4")
      .agg(max(col("n_words")).as("max_l"))
      .localCheckpoint() // read by offsets, blocks, and the attach
    val blk = levels.withColumn("blk", expr("clean_e4 div 1000").cast("int"))
    val inBlkW = Window.partitionBy("blk")
      .orderBy(col("clean_e4").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bm = blk.groupBy("blk").agg(max(col("max_l")).as("bm"))
    // cross-block running max via the shared triangular-join helper;
    // boff stays NULL when no cleaner block exists (coalesced to the
    // -1 sentinel below, NOT to 0 — lengths are nonneg)
    val blkOff = OlapOps.blockOffsets(bm, "blk", descending = true,
      Seq(("bm", "max", "boff")))
    val strictMax = blk
      .withColumn("loc", max(col("max_l")).over(inBlkW))
      .join(broadcast(blkOff), "blk")
      .select(col("clean_e4"), col("max_l"),
        greatest(coalesce(col("loc"), lit(-1L)),
          coalesce(col("boff"), lit(-1L))).as("m_strict"))
    scored.join(broadcast(strictMax), Seq("clean_e4"))
      .select(col("doc_id"), col("clean_e4"), col("n_words"),
        when(col("n_words") === col("max_l") &&
          col("n_words") > col("m_strict"), 1).otherwise(0)
          .cast("int").as("is_frontier"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[skylineQuery]]: the QUADRATIC textbook
    * dominance definition (NOT EXISTS a dominating witness) — fine at
    * oracle scale, and exactly what certifies the running-max
    * reduction. */
  def skylineOracleSql: String = {
    val ws = "\\s" // char-class member; the splitter adds the +
    s"""WITH s AS (SELECT doc_id,
           10000 - len(regexp_extract_all(text, '[^A-Za-z0-9$ws]'))
             * 10000 // greatest(n_chars, 1) AS clean_e4,
           CAST(len(string_split_regex(trim(text), '$ws+')) AS BIGINT)
             AS n_words
         FROM documents)
     SELECT a.doc_id, a.clean_e4, a.n_words,
       CAST(CASE WHEN NOT EXISTS (SELECT 1 FROM s b
           WHERE b.clean_e4 >= a.clean_e4 AND b.n_words >= a.n_words
             AND (b.clean_e4 > a.clean_e4 OR b.n_words > a.n_words))
         THEN 1 ELSE 0 END AS INT) AS is_frontier
     FROM s a ORDER BY a.doc_id"""
  }
}
