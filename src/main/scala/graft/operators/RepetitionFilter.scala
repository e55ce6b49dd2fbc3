package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Gopher-style REPETITION quality gate (q233) — the within-document
  * repetition signals of Rae et al., "Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher" (2021), §A1.1:
  * documents dominated by one repeated token, phrase, or copied span
  * are low-quality training data even when their character-level
  * stats (q29) look fine. The reference has no analogue; this is
  * beyond-parity LLM-pipeline surface. q48 reports two raw signals
  * of this family (duplicate-word fraction, top-bigram share); this
  * is the full GATE: the top-unigram share and duplicate-trigram
  * fraction q48 lacks, plus the thresholded keep verdict a curation
  * pipeline actually branches on.
  *
  * Word-level formulation (the testdata corpus is single-line, so the
  * paper's duplicate-line/paragraph fractions are degenerate here;
  * token n-grams are the live signals):
  *   - top1_share_e6: occurrences of the most frequent UNIGRAM over
  *     total words (ppm);
  *   - top2_share_e6: occurrences of the most frequent BIGRAM over
  *     total bigrams (ppm);
  *   - dup3_share_e6: fraction of TRIGRAM occurrences beyond each
  *     gram's first (ppm) — the "fraction of n-gram occurrences that
  *     are duplicates" form of the paper's duplicate-n-gram filter;
  *   - is_kept: 1 iff all three sit under the documented thresholds.
  *
  * Scale shape: one scan of (doc_id, text); grams are built
  * SCAN-SIDE with `transform` over the token array (no self-join for
  * adjacency), then three per-doc hash aggregations — map-side
  * partial, keyed by doc_id so there is no skew concentration — and
  * two doc_id-keyed joins of doc-sized frames. Everything is linear
  * in corpus size and embarrassingly partition-parallel; nothing is
  * collected. Integer ppm arithmetic end-to-end so the driver
  * hash-compare cannot drift on float formatting.
  */
object RepetitionFilter {

  /** Keep-gate thresholds (ppm). Centralised so the Spark query and
    * the DuckDB oracle interpolate the SAME constants — a literal in
    * either would let them silently desync (the q209 lesson). Chosen
    * against the sf0.01 corpus where top1 p90 ≈ 140k, top2 p90 ≈ 69k:
    * the gate rejects the repetitive tail, not a fixed quantile. */
  val Top1E6 = 125000L
  val Top2E6 = 60000L
  val Dup3E6 = 50000L

  /** Tokens as ONE array column; n-grams derived in-expression. The
    * sequence guard matters: Spark's `sequence(0, -1)` is a DESCENDING
    * two-element sequence, not empty, so short docs must gate on
    * size(w) before building adjacency indices. */
  private def grams(n: Int): org.apache.spark.sql.Column = {
    val joined = (0 until n).map(i => s"w[i + $i]").mkString(", ' ', ")
    when(size(col("w")) >= n,
      expr(s"transform(sequence(0, size(w) - $n), i -> concat($joined))"))
      .otherwise(expr("array()").cast("array<string>"))
  }

  /** POSITIONED n-grams — (start index, gram text) structs over the
    * token array `w`, with the same size-gate as [[grams]] (the
    * descending `sequence(0, -1)` pitfall documented there applies
    * identically). Defined once for both span-coverage operators so
    * a change to the gram unit or the guard cannot drift them. */
  private def indexedGrams(k: Int): org.apache.spark.sql.Column = {
    val joined = (0 until k).map(i => s"w[i + $i]").mkString(", ' ', ")
    when(size(col("w")) >= k,
      expr(s"transform(sequence(0, size(w) - $k), " +
        s"i -> struct(i AS i, concat($joined) AS g))"))
      .otherwise(expr("array()").cast("array<struct<i:int,g:string>>"))
  }

  def repetitionQuery(spark: SparkSession, dir: String): DataFrame =
    repetitionReport(Tables.documents(spark, dir))

  /** Core report over any (doc_id, text) frame. */
  def repetitionReport(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
    def counts(n: Int): DataFrame = toks
      .select(col("doc_id"), explode(grams(n)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val uni = counts(1).groupBy("doc_id")
      .agg(max("c").as("top1"), sum("c").as("nw"))
    val bi = counts(2).groupBy("doc_id")
      .agg(max("c").as("top2"), sum("c").as("nb"))
    val tri = counts(3).groupBy("doc_id")
      .agg(sum("c").as("n3"), count(lit(1)).as("d3"))
    // left joins: a 1-2 word doc has no bigrams/trigrams but must
    // still be scored (its shares are zero), not silently dropped
    uni.join(bi, Seq("doc_id"), "left").join(tri, Seq("doc_id"), "left")
      .na.fill(0L, Seq("top2", "nb", "n3", "d3"))
      .select(col("doc_id"),
        col("nw").cast("long").as("n_words"),
        // exact integer floor (div), matching the oracle's `//` —
        // double division re-cast to long can round a near-integer
        // quotient the wrong way at large magnitudes
        expr("top1 * 1000000 div nw").cast("long")
          .as("top1_share_e6"),
        expr("top2 * 1000000 div greatest(nb, 1)")
          .cast("long").as("top2_share_e6"),
        expr("(n3 - d3) * 1000000 div greatest(n3, 1)").cast("long")
          .as("dup3_share_e6"))
      .withColumn("is_kept",
        when(col("top1_share_e6") < Top1E6 &&
          col("top2_share_e6") < Top2E6 &&
          col("dup3_share_e6") < Dup3E6, 1).otherwise(0).cast("int"))
      .orderBy("doc_id")
  }

  /** DuckDB re-derivation: same split, list-comprehension n-grams
    * (DuckDB `range(1, n)` is empty when n <= 1, mirroring the Spark
    * size guard), same integer ppm arithmetic (`//` and Spark integer
    * `/`-on-longs both truncate toward zero on nonnegative values). */
  def repetitionOracleSql: String = {
    // literal backslash-s: the s-interpolator would mangle "\s" in
    // the template itself, so the regex is interpolated in
    val ws = "\\s+"
    s"""WITH t AS (SELECT doc_id,
           string_split_regex(trim(text), '$ws') AS w FROM documents),
       uni AS (SELECT doc_id, g, count(*) AS c
         FROM t, unnest(w) AS u(g) GROUP BY 1, 2),
       u2 AS (SELECT doc_id, max(c) AS top1, sum(c) AS nw
         FROM uni GROUP BY 1),
       bi AS (SELECT doc_id, g, count(*) AS c
         FROM t, unnest(list_transform(range(1, len(w)),
           i -> w[i] || ' ' || w[i + 1])) AS u(g) GROUP BY 1, 2),
       b2 AS (SELECT doc_id, max(c) AS top2, sum(c) AS nb
         FROM bi GROUP BY 1),
       tri AS (SELECT doc_id, g, count(*) AS c
         FROM t, unnest(list_transform(range(1, len(w) - 1),
           i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS u(g)
         GROUP BY 1, 2),
       t2 AS (SELECT doc_id, sum(c) AS n3, count(*) AS d3
         FROM tri GROUP BY 1)
     SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
       CAST(top1 * 1000000 // nw AS BIGINT) AS top1_share_e6,
       CAST(coalesce(top2, 0) * 1000000 // greatest(coalesce(nb, 0), 1)
         AS BIGINT) AS top2_share_e6,
       CAST((coalesce(n3, 0) - coalesce(d3, 0)) * 1000000
         // greatest(coalesce(n3, 0), 1) AS BIGINT) AS dup3_share_e6,
       CAST(CASE WHEN top1 * 1000000 // nw < $Top1E6
             AND coalesce(top2, 0) * 1000000
               // greatest(coalesce(nb, 0), 1) < $Top2E6
             AND (coalesce(n3, 0) - coalesce(d3, 0)) * 1000000
               // greatest(coalesce(n3, 0), 1) < $Dup3E6
            THEN 1 ELSE 0 END AS INT) AS is_kept
     FROM u2 LEFT JOIN b2 USING (doc_id) LEFT JOIN t2 USING (doc_id)
     ORDER BY doc_id"""
  }

  /** q235: CROSS-document shared-span coverage — the exact-substring
    * dedup signal of Lee et al., "Deduplicating Training Data Makes
    * Language Models Better" (2022): spans repeated verbatim across
    * documents are the memorization-risk content their suffix-array
    * dedup removes. The distributed reformulation: fixed-length token
    * K-grams (K = [[SpanK]]) keyed by content; a gram appearing in
    * ≥ 2 distinct docs marks its K token positions covered; per doc,
    * report how many positions any shared span covers and the ppm
    * coverage — the per-document signal a span-removal or
    * drop-document policy consumes. q71 charges duplicated spans per
    * INSTANCE (how much duplicated mass exists); this measures
    * POSITION coverage with overlapping spans unioned — the tokens
    * that would actually be removed, which instance counts
    * double-charge wherever duplicate windows overlap.
    *
    * Scale shape: grams are built scan-side from the token array
    * (start index carried in a struct — no position self-join), the
    * ≥2-docs test is one gram-keyed aggregation (map-side combined;
    * a K-gram key cannot be hotter than the dup family that shares
    * it), the covered-position count is one explode of K positions
    * per SHARED gram occurrence only. At 100 TB the gram key would be
    * xxhash64(gram) rather than the string itself — same plan, 8-byte
    * keys; the string form is registered because the oracle must
    * re-derive identical keys. */
  val SpanK = 5

  def sharedSpanQuery(spark: SparkSession, dir: String): DataFrame =
    sharedSpanCoverage(Tables.documents(spark, dir))

  def sharedSpanCoverage(docs: DataFrame): DataFrame = {
    val k = SpanK
    val toks = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
    val grams = toks.select(col("doc_id"), size(col("w")).as("nw"),
        explode(indexedGrams(k)).as("s"))
      .select(col("doc_id"), col("nw"), col("s.i").as("i"),
        col("s.g").as("g"))
    val shared = grams.groupBy("g")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("g")
    val covered = grams.join(shared, "g")
      .select(col("doc_id"),
        explode(expr(s"sequence(i, i + ${k - 1})")).as("p"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("covered"))
    docs.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_words"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("covered"), lit(0L)).cast("long")
          .as("covered_tokens"),
        expr("coalesce(covered, 0) * 1000000 div greatest(n_words, 1)")
          .cast("long").as("coverage_e6"))
      .orderBy("doc_id")
  }

  /** DuckDB re-derivation: 1-based list indexing, `range` for the
    * start indices, `generate_series` (inclusive) for the covered
    * positions; the position OFFSETS differ from Spark's 0-based
    * ones but only distinct-position COUNTS are output. */
  def sharedSpanOracleSql: String = {
    val ws = "\\s+"
    val k = SpanK
    val cat = (1 to k).map(i => s"w[i + ${i - 1}]").mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id,
           string_split_regex(trim(text), '$ws') AS w FROM documents),
       grams AS (SELECT doc_id, len(w) AS nw, i, $cat AS g
         FROM t, unnest(range(1, len(w) - ${k - 2})) AS r(i)),
       shared AS (SELECT g FROM grams
         GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
       cov AS (SELECT DISTINCT doc_id, p
         FROM grams JOIN shared USING (g),
           unnest(generate_series(i, i + ${k - 1})) AS s(p)),
       c2 AS (SELECT doc_id, count(*) AS covered FROM cov GROUP BY 1)
     SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_words,
       CAST(coalesce(c2.covered, 0) AS BIGINT) AS covered_tokens,
       CAST(coalesce(c2.covered, 0) * 1000000
         // greatest(len(t.w), 1) AS BIGINT) AS coverage_e6
     FROM t LEFT JOIN c2 USING (doc_id)
     ORDER BY t.doc_id"""
  }

  /** q239 gram width. Boilerplate in a web corpus is line-sized
    * (nav bars, cookie banners, license footers — the C4 "lines
    * repeated across pages" rule, Raffel et al. 2020 §2.2); this
    * corpus' synthetic docs have no line structure, so the unit is
    * the narrowest content-bearing gram. At production K would be a
    * full line hash — same plan, one key per line instead of per
    * bigram. */
  val BoilerK = 2

  /** A gram must appear in at least this many distinct docs of its
    * source to count as boilerplate... */
  val BoilerMinDocs = 3

  /** ...AND in at least this fraction (ppm) of the source's docs —
    * the fraction is what makes the rule scale-invariant: a 3-doc
    * coincidence in a million-doc source is noise, the same 3 docs
    * out of 10 is a template. */
  val BoilerFracE6 = 160000L

  /** q239: per-SOURCE boilerplate coverage — the C4-style template
    * detector. q235 flags spans shared across ANY two docs
    * (memorization risk); boilerplate is the narrower, stronger
    * signal: content repeated across a large FRACTION of one
    * source's documents (headers, footers, injected banners), which
    * a cleaning stage strips while leaving cross-source quotation
    * alone. A gram is boilerplate for source S when it occurs in
    * ≥ [[BoilerMinDocs]] distinct docs of S and in ≥ [[BoilerFracE6]]
    * ppm of S's docs; per document, reports how many token positions
    * source-boilerplate grams cover — the mass the strip would
    * remove.
    *
    * Scale shape: grams build scan-side from the token array (start
    * index carried in a struct, q235's pattern); the doc-frequency
    * test is one (source, gram)-keyed aggregation joined to a
    * source-sized doc-count frame (broadcast — one row per source);
    * coverage explodes K positions per boilerplate occurrence only.
    * Nothing quadratic, all shuffles on content keys. At 100 TB the
    * gram key becomes xxhash64; string form registered so the oracle
    * re-derives identical keys. */
  def boilerplateQuery(spark: SparkSession, dir: String): DataFrame =
    boilerplateCoverage(Tables.documents(spark, dir))

  /** [[boilerplateQuery]]'s core over any (doc_id, source, text). */
  def boilerplateCoverage(docs: DataFrame): DataFrame = {
    val k = BoilerK
    val toks = docs
      .select(col("doc_id"), col("source"),
        split(trim(col("text")), "\\s+").as("w"))
    val grams = toks.select(col("doc_id"), col("source"),
        explode(indexedGrams(k)).as("s"))
      .select(col("doc_id"), col("source"), col("s.i").as("i"),
        col("s.g").as("g"))
    val srcDocs = docs.groupBy("source")
      .agg(count(lit(1)).as("src_docs"))
    val boiler = grams.groupBy("source", "g")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .join(broadcast(srcDocs), "source")
      .filter(col("nd") >= BoilerMinDocs)
      .filter(expr(s"nd * 1000000 div src_docs >= $BoilerFracE6"))
      .select("source", "g")
    val covered = grams.join(boiler, Seq("source", "g"))
      .select(col("doc_id"),
        explode(expr(s"sequence(i, i + ${k - 1})")).as("p"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("covered"))
    docs.select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_words"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_words"),
        coalesce(col("covered"), lit(0L)).cast("long")
          .as("boiler_tokens"),
        expr("coalesce(covered, 0) * 1000000 div greatest(n_words, 1)")
          .cast("long").as("boiler_e6"))
      .orderBy("doc_id")
  }

  /** DuckDB re-derivation of [[boilerplateQuery]] — same gram unit,
    * same two-condition threshold, integer div throughout. */
  def boilerplateOracleSql: String = {
    val ws = "\\s+"
    val k = BoilerK
    val cat = (1 to k).map(i => s"w[i + ${i - 1}]").mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id, source,
           string_split_regex(trim(text), '$ws') AS w FROM documents),
       grams AS (SELECT doc_id, source, i, $cat AS g
         FROM t, unnest(range(1, len(w) - ${k - 2})) AS r(i)),
       sd AS (SELECT source, count(*) AS src_docs
         FROM documents GROUP BY 1),
       boiler AS (SELECT source, g FROM (
           SELECT source, g, count(DISTINCT doc_id) AS nd
           FROM grams GROUP BY 1, 2) b
         JOIN sd USING (source)
         WHERE nd >= $BoilerMinDocs
           AND nd * 1000000 // src_docs >= $BoilerFracE6),
       cov AS (SELECT DISTINCT doc_id, p
         FROM grams JOIN boiler USING (source, g),
           unnest(generate_series(i, i + ${k - 1})) AS s(p)),
       c2 AS (SELECT doc_id, count(*) AS covered FROM cov GROUP BY 1)
     SELECT t.doc_id, t.source, CAST(len(t.w) AS BIGINT) AS n_words,
       CAST(coalesce(c2.covered, 0) AS BIGINT) AS boiler_tokens,
       CAST(coalesce(c2.covered, 0) * 1000000
         // greatest(len(t.w), 1) AS BIGINT) AS boiler_e6
     FROM t LEFT JOIN c2 USING (doc_id)
     ORDER BY t.doc_id"""
  }
}
