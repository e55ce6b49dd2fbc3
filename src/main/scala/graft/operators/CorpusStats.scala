package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** Corpus-level text statistics beyond per-document scoring: cross-doc
  * duplicated-span mass (the signal behind exact-substring dedup, Lee
  * et al. 2022 "Deduplicating Training Data Makes Language Models
  * Better") and truncated-vocabulary coverage (what fraction of the
  * token stream a top-K vocabulary captures — the go/no-go check before
  * committing a tokenizer vocab).
  *
  * Both are explode → aggregate shapes: the corpus is touched once, the
  * shuffled keys are tokens/spans (never pairs), and every output
  * number is integer rational arithmetic so the DuckDB oracle
  * hash-checks exactly.
  */
object CorpusStats {

  /** q71: cross-document duplicated-span report. Text is cut into
    * NON-overlapping `span`-token pieces (span-aligned exact-substring
    * dedup — the scalable stand-in for suffix-array substring dedup);
    * a span is "duplicated" when it occurs in >= 2 distinct documents.
    * Per doc: span count, duplicated-span instances, and the
    * duplicated fraction (e6 integer rational).
    *
    * Scale shape: one explode pass (corpus/span rows), a span-keyed
    * aggregation whose unique-span mass is pruned by the `span_df >= 2`
    * filter BEFORE the re-join, then a doc-keyed count. Nothing
    * quadratic, no pair join — duplicated mass is charged per
    * instance, not per pair. `hashedKeys` swaps the span STRING for
    * its xxhash64 as the shuffle key (the at-scale default shape —
    * 8 bytes instead of ~50 per key); the registered oracle
    * configuration keeps strings so DuckDB recomputes them verbatim,
    * and CorpusStatsSpec asserts the two configs agree. */
  def spanDupQuery(spark: SparkSession, dir: String, span: Int = 8,
                   hashedKeys: Boolean = false): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("n_spans", floor(size(col("t")) / lit(span)).cast("long"))
    val sp = toks.filter(col("n_spans") >= 1)
      .select(col("doc_id"), explode(transform(
          sequence(lit(0L), col("n_spans") - 1),
          g => concat_ws(" ", slice(col("t"), (g * span + 1).cast("int"),
            lit(span)))))
        .as("span_text"))
      .withColumn("k",
        if (hashedKeys) xxhash64(col("span_text")) else col("span_text"))
      .select("doc_id", "k")
    // NOT checkpointed although two branches read it: the span keys
    // are full span strings in the portable config, and materializing
    // corpus-tokens/span rows of long text measured 4x slower than
    // re-running the explode — the payload-size caveat to the
    // checkpoint-reused-aggregations rule.
    val dupSpans = sp.groupBy("k")
      .agg(count_distinct(col("doc_id")).as("span_df"))
      .filter(col("span_df") >= 2)
    val perDoc = sp.join(dupSpans, Seq("k"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    toks.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        expr("coalesce(n_dup, 0) * 1000000 div greatest(n_spans, 1)")
          .as("dup_frac_e6"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[spanDupQuery]] (span = 8, string keys). */
  def spanDupOracleSql: String =
    """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
       sp0 AS (SELECT doc_id, t,
           unnest(range(CAST(len(t) // 8 AS BIGINT))) AS g FROM toks),
       sp AS (SELECT doc_id,
           array_to_string(t[(g*8+1):(g*8+8)], ' ') AS span FROM sp0),
       d AS (SELECT span, count(DISTINCT doc_id) AS span_df FROM sp
             GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
       per AS (SELECT sp.doc_id, CAST(count(*) AS BIGINT) AS n_dup
               FROM sp JOIN d USING (span) GROUP BY 1)
     SELECT t.doc_id, CAST(len(t.t) // 8 AS BIGINT) AS n_spans,
       CAST(coalesce(per.n_dup, 0) AS BIGINT) AS n_dup,
       CAST(coalesce(per.n_dup, 0) * 1000000
            // greatest(len(t.t) // 8, 1) AS BIGINT) AS dup_frac_e6
     FROM toks t LEFT JOIN per ON t.doc_id = per.doc_id
     ORDER BY t.doc_id"""

  /** q72: truncated-vocabulary coverage — per-document out-of-vocab
    * token mass against the corpus's own top-`vocabSize` vocabulary
    * (the [[TextAnalysis.vocabQuery]] construction, truncated hard so
    * the measure discriminates). The vocab is an aggregate over the
    * token stream (bounded by `vocabSize` after the top-K), broadcast
    * back to the explode pass, so the corpus is scanned once and the
    * only corpus-sized shuffle is the doc-keyed count. */
  def vocabCoverage(spark: SparkSession, dir: String, minCount: Long = 3L,
                    vocabSize: Int = 12): DataFrame = {
    val tk = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val vocab = tk.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("term").asc).limit(vocabSize)
      .select(col("term"), lit(1).as("in_vocab"))
    tk.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, 1)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        expr("n_oov * 1000000 div n_tokens").as("oov_e6"))
      .orderBy("doc_id")
  }

  /** q76: inverted-index posting lists for mid-frequency bigram terms
    * (df in [minDf, maxDf]) — the IR-side surface of the token
    * pipeline: term, document frequency, and the first `cap` doc ids
    * of the sorted posting list, comma-joined. The frequency band IS
    * the scale guard: the df aggregation runs first and only surviving
    * terms (each with <= maxDf postings) reach the collect, so no
    * posting list can exceed maxDf entries no matter how hot the term
    * — stop-word-shaped terms never materialize a list at all. */
  /** q201's search pattern — a constant so the Spark query, the
    * oracle SQL, and the spec derive the SAME trigram set. */
  val LikePattern = "batch stream"

  /** q201: index-accelerated substring search — the pg_trgm trick
    * expressed relationally: a `%pattern%` scan is rewritten as (1)
    * an equality probe of a CHARACTER-trigram inverted index (a doc
    * can contain the pattern only if it contains every one of the
    * pattern's trigrams) and (2) an exact LIKE verification over the
    * survivors only. Both stages appear in the output — candidate
    * trigram hits and the verified flag — so the result certifies
    * the accelerator's zero-false-negative contract (every true
    * match must surface as a candidate; the spec asserts it against
    * a direct scan). At 100 TB the trigram postings are a PREBUILT
    * table (the q76 posting-list shape) and stage 1 is an index probe
    * that never touches text; here the index is built in-query and
    * the pattern-trigram filter prunes the exploded postings BEFORE
    * the aggregation shuffle, so the shuffled volume is |pattern
    * trigrams| postings, not the corpus's full trigram set. */
  def trigramLikeQuery(spark: SparkSession, dir: String): DataFrame = {
    val pat = LikePattern.toLowerCase
    val patTris = pat.sliding(3).toSeq.distinct
    val docs = Tables.documents(spark, dir)
    // Stage 1 as scan-side arithmetic: presence of each PATTERN
    // trigram via instr — |pattern trigrams| substring probes per
    // row, zero array allocation, zero shuffle (an earlier explode-
    // the-doc's-trigrams formulation built and deduped a
    // length(text)-sized array per row and was 15x slower at sf0.1).
    // Same semantics as probing a trigram posting list; the prebuilt
    // index is still the 100 TB shape, this is its scan-side dual.
    val lt = lower(col("text"))
    val nHit = patTris.map(t =>
      when(instr(lt, t) > 0, 1L).otherwise(0L)).reduce(_ + _)
    docs
      .select(col("doc_id"), col("text"), nHit.as("n_hit"))
      .filter(col("n_hit") === patTris.size)
      .select(col("doc_id"), col("n_hit").cast("long").as("n_hit"),
        when(lower(col("text")).contains(pat), 1).otherwise(0)
          .cast("int").as("is_match"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[trigramLikeQuery]] — same trigram set, same
    * two stages. */
  def trigramLikeOracleSql: String = {
    val pat = LikePattern.toLowerCase
    val tris = pat.sliding(3).toSeq.distinct
      .map(t => "'" + t.replace("'", "''") + "'").mkString(", ")
    val n = pat.sliding(3).toSeq.distinct.size
    s"""WITH tg AS (SELECT doc_id, list_distinct(list_transform(
           range(1, greatest(length(lower(text)) - 2, 0) + 1),
           i -> lower(text)[i:i+2])) AS tris
         FROM documents),
       e AS (SELECT doc_id, unnest(tris) AS t FROM tg),
       c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit
             FROM e WHERE t IN ($tris)
             GROUP BY 1 HAVING count(*) = $n)
     SELECT c.doc_id, c.n_hit,
       CAST(CASE WHEN lower(d.text) LIKE '%$pat%' THEN 1 ELSE 0 END
         AS INT) AS is_match
     FROM c JOIN documents d ON c.doc_id = d.doc_id
     ORDER BY c.doc_id"""
  }

  def postingListsQuery(spark: SparkSession, dir: String, minDf: Long = 5L,
                        maxDf: Long = 50L, cap: Int = 20): DataFrame = {
    val bg = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.wordShingles(col("t"), 2))
          .as("term"))
    val d = bg.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
    bg.join(d, Seq("term"))
      .groupBy("term", "df")
      .agg(array_join(transform(
        slice(sort_array(collect_list(col("doc_id"))), 1, cap),
        x => x.cast("string")), ",").as("postings"))
      .select(col("term"), col("df"), col("postings"))
      .orderBy("term")
  }

  /** DuckDB oracle for [[postingListsQuery]] (df in [5,50], cap 20). */
  def postingListsOracleSql: String =
    """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
       bg0 AS (SELECT doc_id, t,
           unnest(range(CAST(len(t) - 1 AS BIGINT))) AS i
         FROM toks WHERE len(t) >= 2),
       bg AS (SELECT DISTINCT doc_id, t[i+1] || ' ' || t[i+2] AS term
              FROM bg0),
       d AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM bg
             GROUP BY 1 HAVING count(*) BETWEEN 5 AND 50)
     SELECT d.term, d.df,
       array_to_string(list_sort(list(bg.doc_id))[1:20], ',') AS postings
     FROM d JOIN bg ON d.term = bg.term
     GROUP BY 1, 2 ORDER BY 1"""

  /** q86: document-level co-occurrence lift (the integer-rational form
    * of pointwise mutual information): for mid-frequency term pairs,
    * lift = P(a,b) / (P(a)·P(b)) scaled to e6 — the association signal
    * behind collocation extraction and topic seeding. Probabilities
    * stay exact counts (n_ab·N·1e6 div n_a·n_b), so the oracle
    * hash-checks without any libm log.
    *
    * Scale shape: the df band — CORPUS-RELATIVE, df in [minDfPct%,
    * maxDfPct%] of documents, so the same configuration transfers
    * across corpus sizes — is applied BEFORE the pair join (the
    * q23/q76 hot-key guard): ubiquitous boilerplate terms (> maxDfPct%)
    * never form pairs and rare typos (< minDfPct%) are pruned, so
    * per-doc pair fan-out is bounded by the banded-terms-per-doc
    * square. The pair join is doc-keyed; the count shuffles distinct
    * pairs only; the band test is integer arithmetic (df·100 vs nd). */
  def pmiQuery(spark: SparkSession, dir: String, minDfPct: Long = 1L,
               maxDfPct: Long = 95L, minPair: Long = 3L,
               topN: Int = 100): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // tokenization is the corpus-scale cost here; three branches (df,
    // both self-join sides) read it — materialize once, the signature-
    // table idiom.
    val tk = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .distinct()
      .localCheckpoint()
    val nd = docs.agg(count(lit(1)).as("nd"))
    val d = tk.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nd))
      .filter(col("df") * 100 >= col("nd") * minDfPct &&
        col("df") * 100 <= col("nd") * maxDfPct)
      .select("term", "df")
    val b = tk.join(d, Seq("term")).localCheckpoint()
    val a1 = b.select(col("doc_id"), col("term").as("w1"), col("df").as("n_a"))
    val a2 = b.select(col("doc_id"), col("term").as("w2"), col("df").as("n_b"))
    a1.join(a2, Seq("doc_id"))
      .filter(col("w1") < col("w2"))
      .groupBy("w1", "w2", "n_a", "n_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPair)
      .crossJoin(broadcast(nd))
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        expr("n_ab * nd * 1000000 div (n_a * n_b)").as("lift_e6"))
      .orderBy(col("lift_e6").desc, col("w1").asc, col("w2").asc)
      .limit(topN)
  }

  /** DuckDB oracle for [[pmiQuery]] (df band [1%,95%], pairs >= 3). */
  def pmiOracleSql: String =
    """WITH tk AS (SELECT DISTINCT doc_id, term FROM (
           SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
           FROM documents)),
       d0 AS (SELECT term, count(*) AS df FROM tk GROUP BY 1),
       n AS (SELECT count(*) AS nd FROM documents),
       d AS (SELECT term, df FROM d0, n
             WHERE df * 100 >= nd AND df * 100 <= nd * 95),
       b AS (SELECT tk.doc_id, tk.term, d.df FROM tk JOIN d USING (term)),
       p AS (SELECT a.term AS w1, b2.term AS w2, a.df AS dfa, b2.df AS dfb,
               count(*) AS n_ab
             FROM b a JOIN b b2
               ON a.doc_id = b2.doc_id AND a.term < b2.term
             GROUP BY 1, 2, 3, 4 HAVING count(*) >= 3)
     SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab,
       CAST(dfa AS BIGINT) AS n_a, CAST(dfb AS BIGINT) AS n_b,
       CAST(n_ab * nd * 1000000 // (dfa * dfb) AS BIGINT) AS lift_e6
     FROM p, n ORDER BY lift_e6 DESC, w1, w2 LIMIT 100"""

  /** DuckDB oracle for [[vocabCoverage]] (minCount 3, vocabSize 12). */
  def vocabCoverageOracleSql: String =
    """WITH tk AS (SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
         FROM documents),
       c AS (SELECT term, count(*) AS cnt FROM tk GROUP BY 1
             HAVING count(*) >= 3),
       v AS (SELECT term FROM c ORDER BY cnt DESC, term LIMIT 12)
     SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (WHERE v.term IS NULL) AS BIGINT) AS n_oov,
       CAST(count(*) FILTER (WHERE v.term IS NULL) * 1000000 // count(*)
            AS BIGINT) AS oov_e6
     FROM tk LEFT JOIN v ON tk.term = v.term
     GROUP BY 1 ORDER BY 1"""

  /** q101: count-min sketch, oracle-checked — term frequencies
    * estimated from a d=3 × w=1024 counter grid addressed by the
    * portable hash family (row r's bucket = h60("r:" ++ term) mod w),
    * reported next to the exact counts for the top heavy hitters. The
    * sketch is DETERMINISTIC given the hash family, so the oracle
    * rebuilds the identical grid and the comparison is exact — and the
    * CMS guarantee (estimate ≥ truth, overestimate bounded by
    * collisions) becomes a hash-checked property instead of a unit
    * assertion. Scale shape: the token stream collapses to the
    * (term, cnt) vocabulary first; the grid is 3 × 1024 counters
    * built from vocabulary-sized fan-out (×3) and broadcast back for
    * the lookups — at 100 TB the sketch costs one token count plus
    * metadata-scale work, which is exactly why CMS exists. */
  val CmsRows = 3
  val CmsWidth = 1024L

  def cmsQuery(spark: SparkSession, dir: String,
      topN: Int = 20): DataFrame =
    cms(Tables.documents(spark, dir), topN)

  /** The d×w counter grid of a docs(text) frame — the mergeable core:
    * grids of disjoint corpus slices sum cell-wise into the corpus
    * grid (the property the streaming sketch maintenance in
    * [[graft.streaming.SketchStream]] relies on). */
  def cmsGrid(docs: DataFrame): DataFrame =
    cmsGridFromCounts(termCounts(docs))

  /** The (term, cnt) vocabulary of a docs(text) frame — the one
    * corpus-sized explode+aggregate every CMS consumer shares. */
  def termCounts(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))

  /** [[cmsGrid]] from an already-computed (term, cnt) vocabulary —
    * vocabulary-sized fan-out (×d) and a metadata-scale aggregate. */
  def cmsGridFromCounts(counts: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.portableHash60
    val rows = array((0 until CmsRows).map(lit): _*)
    counts
      .select(col("cnt"), explode(rows).as("r"), col("term"))
      .withColumn("bucket",
        portableHash60(concat(col("r").cast("string"), lit(":"),
          col("term"))) % CmsWidth)
      .groupBy("r", "bucket").agg(sum(col("cnt")).as("counter"))
  }

  /** [[cmsQuery]] over an explicit docs(text) frame. The vocabulary
    * is computed ONCE and localCheckpointed (the q100/q136 pattern):
    * both the grid and the top-N read the same materialized counts,
    * so the corpus explode+aggregate subtree executes once per run
    * instead of twice. */
  def cms(docs: DataFrame, topN: Int): DataFrame = {
    import graft.functions.TextFunctions.portableHash60
    val counts = termCounts(docs).localCheckpoint()
    val rows = array((0 until CmsRows).map(lit): _*)
    val grid = cmsGridFromCounts(counts)
    val top = counts
      .orderBy(col("cnt").desc, col("term").asc).limit(topN)
    val est = top
      .select(col("term"), col("cnt"), explode(rows).as("r"))
      .withColumn("bucket",
        portableHash60(concat(col("r").cast("string"), lit(":"),
          col("term"))) % CmsWidth)
      .join(broadcast(grid), Seq("r", "bucket"))
      .groupBy("term", "cnt")
      .agg(min(col("counter")).as("cms_est"))
    est.select(col("term"), col("cnt").as("exact_cnt"), col("cms_est"))
      .orderBy(col("exact_cnt").desc, col("term").asc)
  }

  /** q130: source similarity by vocabulary — pairwise Jaccard between
    * the top-[[SourceVocabK]] vocabularies of every corpus source (do
    * two crawls speak the same language, the duplication-risk triage
    * BEFORE any expensive pairwise doc dedup across them). Per-source
    * vocabularies are rank-capped windows over the (source, term)
    * count table (stratum-bounded), the intersection is one term-keyed
    * self-join of the capped vocabularies (≤ K² per term, K constant),
    * and Jaccard is inclusion-exclusion arithmetic. */
  val SourceVocabK = 100

  def sourceVocabOverlapQuery(spark: SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byCnt = Window.partitionBy("source")
      .orderBy(col("cnt").desc, col("term").asc)
    // tokenize + aggregate + per-source top-K runs once; the sizes
    // aggregate and both self-join sides read the materialized result
    // (per-source K rows — metadata-scale).
    val vocab = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(byCnt))
      .filter(col("rk") <= SourceVocabK)
      .select("source", "term")
      .localCheckpoint()
    val sizes = vocab.groupBy("source").agg(count(lit(1)).as("sz"))
    vocab.as("a").join(vocab.as("b"),
        col("a.term") === col("b.term") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(sizes.select(col("source").as("s1"),
        col("sz").as("sz1"))), Seq("s1"))
      .join(broadcast(sizes.select(col("source").as("s2"),
        col("sz").as("sz2"))), Seq("s2"))
      .select(col("s1"), col("s2"), col("n_both"),
        expr("n_both * 1000000 div (sz1 + sz2 - n_both)")
          .as("jaccard_e6"))
      .orderBy("s1", "s2")
  }

  /** DuckDB oracle for [[sourceVocabOverlapQuery]] (K=100). */
  def sourceVocabOverlapOracleSql: String =
    s"""WITH tk AS (SELECT source,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
         FROM documents),
       c AS (SELECT source, term, count(*) AS cnt FROM tk GROUP BY 1, 2),
       v AS (SELECT source, term FROM (
               SELECT source, term, row_number() OVER (
                 PARTITION BY source ORDER BY cnt DESC, term) AS rk
               FROM c) WHERE rk <= $SourceVocabK),
       sz AS (SELECT source, count(*) AS sz FROM v GROUP BY 1),
       i AS (SELECT a.source AS s1, b.source AS s2, count(*) AS n_both
             FROM v a JOIN v b ON a.term = b.term AND a.source < b.source
             GROUP BY 1, 2)
     SELECT i.s1, i.s2, CAST(i.n_both AS BIGINT) AS n_both,
       CAST(i.n_both * 1000000 // (z1.sz + z2.sz - i.n_both) AS BIGINT)
         AS jaccard_e6
     FROM i JOIN sz z1 ON z1.source = i.s1
       JOIN sz z2 ON z2.source = i.s2
     ORDER BY s1, s2"""

  /** q135: type-token ratio per source — distinct terms over total
    * terms (×1e6), the lexical-diversity signal that separates
    * natural text (high TTR) from boilerplate and template spam (low
    * TTR); alongside the repetition signals (q48) it is the cheap
    * first-pass quality gate. One (source, term) aggregation for the
    * types, one source aggregation for the tokens, a broadcast join
    * of two source-sized tables. */
  def typeTokenRatioQuery(spark: SparkSession, dir: String): DataFrame = {
    val tk = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("term"))
    val types = tk.select("source", "term").distinct()
      .groupBy("source").agg(count(lit(1)).as("n_types"))
    val toks = tk.groupBy("source").agg(count(lit(1)).as("n_tokens"))
    toks.join(broadcast(types), Seq("source"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        expr("n_types * 1000000 div n_tokens").as("ttr_e6"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[typeTokenRatioQuery]]. */
  def typeTokenRatioOracleSql: String =
    """WITH tk AS (SELECT source,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
         FROM documents)
     SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT term) AS BIGINT) AS n_types,
       CAST(count(DISTINCT term) * 1000000 // count(*) AS BIGINT)
         AS ttr_e6
     FROM tk GROUP BY 1 ORDER BY 1"""

  /** DuckDB oracle for [[cmsQuery]] (top 20). */
  def cmsOracleSql: String =
    s"""WITH tk AS (SELECT unnest(string_split_regex(lower(trim(text)),
           '\\s+')) AS term FROM documents),
       c AS (SELECT term, count(*) AS cnt FROM tk GROUP BY 1),
       f AS (SELECT term, cnt, unnest([0, 1, 2]) AS r FROM c),
       fb AS (SELECT term, cnt, r,
               CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || term),
                 1, 15)) AS BIGINT) % $CmsWidth AS bucket FROM f),
       grid AS (SELECT r, bucket, CAST(sum(cnt) AS BIGINT) AS counter
                FROM fb GROUP BY 1, 2),
       top AS (SELECT term, cnt FROM c
               ORDER BY cnt DESC, term LIMIT 20),
       tb AS (SELECT top.term, top.cnt, fb.r, fb.bucket FROM top
              JOIN fb ON fb.term = top.term)
     SELECT tb.term, CAST(tb.cnt AS BIGINT) AS exact_cnt,
       min(grid.counter) AS cms_est
     FROM tb JOIN grid ON grid.r = tb.r AND grid.bucket = tb.bucket
     GROUP BY 1, 2 ORDER BY exact_cnt DESC, term"""

  /** q174: bigram language-model fluency scoring — the statistical
    * quality signal the heuristic scorers (q29's length/punct ratios)
    * can't see: train add-one-smoothed bigram transition probabilities
    * P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) on the corpus itself, then
    * score every document by its average transition probability.
    * Gibberish and boilerplate-shuffled text scores low (improbable
    * transitions); natural running text scores high — the same
    * self-scoring idea behind perplexity-based corpus filtering
    * (CCNet, Wenzek et al. 2020), with mean probability standing in
    * for perplexity so every number stays an exact integer rational
    * (e6) and the cross-engine hash check is exact: ln() has no such
    * portability (libm last-ulp divergence), and mean-P ranks
    * documents the same direction.
    *
    * Scale shape: bigrams come from one array-transform pass (no
    * window, no self-join — `arrays_zip` of the two token-array
    * slices); the model is two token-keyed aggregations whose output
    * is vocabulary-sized (≪ corpus); scoring re-joins docs' bigram
    * stream to the model on the bigram key, then one doc-keyed
    * aggregation. Everything shuffles on token/bigram/doc keys —
    * nothing quadratic. At 100 TB the model tables are the classic
    * broadcast candidates (vocab² is bounded; AQE converts the join
    * when the built side is small).
    *
    * Docs with <2 tokens have no transitions and no row (the oracle's
    * inner join agrees). */
  def bigramLmQuery(spark: SparkSession, dir: String): DataFrame =
    bigramLm(Tables.documents(spark, dir))

  /** [[bigramLmQuery]]'s core over any (doc_id, text) frame. */
  def bigramLm(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
    val bigrams = toks
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
          slice(col("t"), lit(1), size(col("t")) - 1).as("w1"),
          slice(col("t"), lit(2), size(col("t")) - 1).as("w2"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val big = bigrams.groupBy("w1", "w2")
      .agg(count(lit(1)).as("c12"))
    val uni = big.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val vocab = toks.select(explode(col("t")).as("tok"))
      .agg(count_distinct(col("tok")).as("vsz"))
    bigrams
      .join(big, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("p_e6", expr("(c12 + 1) * 1000000 div (c1 + vsz)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(col("p_e6")).cast("long").as("sum_p_e6"))
      .withColumn("avg_p_e6", expr("sum_p_e6 div n_bigrams"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[bigramLmQuery]] — same tokenizer, same
    * add-one model, same integer rationals. */
  def bigramLmOracleSql: String =
    """WITH tk AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t
         FROM documents),
       bg0 AS (SELECT doc_id, t,
           unnest(range(1, CAST(len(t) AS BIGINT))) AS i FROM tk),
       bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM bg0),
       big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
       uni AS (SELECT w1, sum(c12) AS c1 FROM big GROUP BY 1),
       v AS (SELECT count(DISTINCT tok) AS vsz FROM
               (SELECT unnest(t) AS tok FROM tk)),
       sc AS (SELECT doc_id, (c12 + 1) * 1000000 // (c1 + vsz) AS p_e6
              FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1)
              CROSS JOIN v)
     SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(p_e6) AS BIGINT) AS sum_p_e6,
       CAST(sum(p_e6) // count(*) AS BIGINT) AS avg_p_e6
     FROM sc GROUP BY 1 ORDER BY doc_id"""

  /** q222 n-gram width. GPT-3's decontamination used 13-grams on
    * web-scale documents (Brown et al. 2020, App. C); 5 matches this
    * corpus' ~40-token documents while exercising the identical
    * machinery. */
  val ContamN = 5

  /** contamination_e6 at or above this flags the document. */
  val ContamFlagE6 = 100000L

  /** Which held-out residue class is "test" (doc_id mod 10). */
  val ContamTestMod = 7L

  /** q222: n-gram test-set contamination — for every held-out (test)
    * document, the fraction of its distinct [[ContamN]]-grams that
    * also occur anywhere in the train split. The decontamination
    * audit every LLM data pipeline runs before reporting eval numbers
    * (GPT-3 App. C; Dodge et al. 2021 found exact-overlap
    * contamination in C4): a test doc whose n-grams are largely
    * present in training data is measuring memorization, not
    * generalization. Complements q43/q73's embedding-level
    * decontamination with the exact lexical-overlap rule, and q183's
    * by-construction leakage-safe split with the AUDIT of an
    * arbitrary split.
    *
    * Scale shape: one array-transform pass builds distinct per-doc
    * shingles (no window, no self-join); the train side collapses to
    * DISTINCT grams (linear, map-side combined); the probe is ONE
    * left-semi join keyed on the gram plus one doc-keyed aggregation.
    * 5-gram specificity keeps the gram key's skew minimal (no
    * stopword hotkeys at n ≥ 3); at 100 TB the join key would be a
    * 64-bit gram fingerprint to cut shuffle width — kept as the full
    * string here so both engines join on identical values and the
    * hash check stays exact. Short test docs (< [[ContamN]] tokens)
    * report 0 grams / 0 contamination rather than vanishing — the
    * audit must be a total function over the test split. */
  def contaminationQuery(spark: SparkSession, dir: String): DataFrame =
    contamination(Tables.documents(spark, dir))

  /** [[contaminationQuery]]'s core over any (doc_id, text) frame. */
  def contamination(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.wordShingles
    val base = docs.select(col("doc_id"),
      wordShingles(tokens(col("text")), ContamN).as("grams"),
      (pmod(col("doc_id"), lit(10L)) === ContamTestMod).as("is_test"))
    val trainGrams = base.filter(!col("is_test"))
      .select(explode(col("grams")).as("gram")).distinct()
    val testGrams = base.filter(col("is_test"))
      .select(col("doc_id"), explode(col("grams")).as("gram"))
    val hits = testGrams.join(trainGrams, Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    base.filter(col("is_test"))
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_contaminated",
        coalesce(col("n_hit"), lit(0L)).cast("long"))
      .withColumn("contamination_e6",
        when(col("n_grams") > 0,
          expr("n_contaminated * 1000000 div n_grams"))
          .otherwise(lit(0L)).cast("long"))
      .select(col("doc_id"), col("n_grams"), col("n_contaminated"),
        col("contamination_e6"),
        when(col("contamination_e6") >= ContamFlagE6, 1).otherwise(0)
          .cast("int").as("flagged"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[contaminationQuery]] — same tokenizer, same
    * distinct shingles, same split rule and integer rationals (all
    * constants interpolated so they cannot desync). */
  def contaminationOracleSql: String =
    s"""WITH tk AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\\s+') AS t
         FROM documents),
       g0 AS (SELECT doc_id, t,
           unnest(range(1, CAST(len(t) AS BIGINT) - ${ContamN - 2})) AS i
         FROM tk WHERE len(t) >= $ContamN),
       gr AS (SELECT DISTINCT doc_id,
           array_to_string(t[i : i + ${ContamN - 1}], ' ') AS gram
         FROM g0),
       hits AS (SELECT g.doc_id, count(*) AS n FROM gr g
         WHERE g.doc_id % 10 = $ContamTestMod
           AND EXISTS (SELECT 1 FROM gr tr
             WHERE tr.doc_id % 10 <> $ContamTestMod AND tr.gram = g.gram)
         GROUP BY 1),
       tot AS (SELECT tk.doc_id,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated
         FROM tk
         LEFT JOIN (SELECT doc_id, count(*) AS n FROM gr GROUP BY 1) c
           ON c.doc_id = tk.doc_id
         LEFT JOIN hits h ON h.doc_id = tk.doc_id
         WHERE tk.doc_id % 10 = $ContamTestMod),
       sc AS (SELECT doc_id, n_grams, n_contaminated,
           CASE WHEN n_grams > 0
             THEN n_contaminated * 1000000 // n_grams
             ELSE 0 END AS contamination_e6
         FROM tot)
     SELECT doc_id, n_grams, n_contaminated,
       CAST(contamination_e6 AS BIGINT) AS contamination_e6,
       CAST(CASE WHEN contamination_e6 >= $ContamFlagE6 THEN 1 ELSE 0 END
         AS INT) AS flagged
     FROM sc ORDER BY doc_id"""

  /** q264 knobs: minimum in-source occurrences for a term to be
    * scored, and the per-source leaderboard size. */
  val KeynessMinCount = 5L
  val KeynessTopK = 5

  /** q264: per-source DISTINCTIVE TERMS by chi-square keyness — the
    * corpus-linguistics answer to "what is each source actually
    * about", and in a training mix the per-domain vocabulary report
    * that catches a mislabeled or contaminated source before it
    * trains. For term t in source s, the 2x2 contingency is
    * a = count(t in s), b = count(t elsewhere), c = tokens(s) - a,
    * d = N - a - b - c; keyness = N(ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d)),
    * floor-scaled e6 — ALL integer arithmetic in DECIMAL(38,0) (both
    * engines compute the identical integer, so rank order cannot
    * drift; at fixture scale every intermediate fits 38 digits — at
    * true 100 TB token counts the score would be computed in doubles
    * since it only RANKS, noted rather than hidden). Only
    * OVER-represented terms qualify (a(N-n1) > b*n1 — relative
    * frequency above the rest of the corpus), with a >= 5 evidence
    * floor; top-5 per source by (keyness DESC, term ASC).
    *
    * Scale shape: one tokenize+explode, one (term, source) count,
    * one term-total count, source totals broadcast, and a top-k rank
    * window PARTITIONED by source (sources are a config-scale set).
    * Nothing corpus-sized sorts globally. */
  def keynessQuery(spark: SparkSession, dir: String): DataFrame =
    keyness(Tables.documents(spark, dir))

  /** [[keynessQuery]]'s core over any (source, text) frame. */
  def keyness(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("source"),
      explode(tokens(col("text"))).as("term"))
    val st = toks.groupBy("source", "term")
      .agg(count(lit(1)).as("a")).localCheckpoint() // feeds tt + scores
    val tt = st.groupBy("term").agg(sum(col("a")).as("t_tot"))
    val srcTot = st.groupBy("source").agg(sum(col("a")).as("n1"))
    val nTot = srcTot.agg(sum(col("n1")).as("n"))
    val d38 = (c: String) => col(c).cast("decimal(38,0)")
    val scored = st
      .join(tt, "term")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(nTot))
      .filter(col("a") >= KeynessMinCount &&
        // over-representation gate, cross-multiplied (integer-exact)
        d38("a") * (d38("n") - d38("n1")) >
          (d38("t_tot") - d38("a")) * d38("n1"))
      .withColumn("__det", {
        // ad - bc, shared by numerator's square
        val a = d38("a"); val b = d38("t_tot") - d38("a")
        val c = d38("n1") - d38("a")
        val dd = d38("n") - d38("t_tot") - d38("n1") + d38("a")
        a * dd - b * c
      })
      .withColumn("__num", d38("n") * col("__det") * col("__det") *
        lit(1000000L).cast("decimal(38,0)"))
      .withColumn("__den", d38("t_tot") * (d38("n") - d38("t_tot")) *
        d38("n1") * (d38("n") - d38("n1")))
      // integral divide, NOT decimal `/`: Spark's decimal division
      // rounds HALF_UP at the result scale while DuckDB's // floors —
      // the q204 class of off-by-one; div truncates like // does on
      // these non-negative values
      .withColumn("keyness_e6", expr("__num div __den"))
    val w = Window.partitionBy("source")
      .orderBy(col("keyness_e6").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= KeynessTopK)
      .select(col("source"), col("rank").cast("int").as("rank"),
        col("term"), col("a").cast("long").as("n_in_source"),
        col("keyness_e6"))
      .orderBy("source", "rank")
  }

  /** DuckDB oracle for [[keynessQuery]] — identical HUGEINT
    * contingency arithmetic, identical floor-e6 scale and rank
    * order. */
  def keynessOracleSql: String =
    s"""WITH tok AS (SELECT source,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
         FROM documents),
       st AS (SELECT source, term, CAST(count(*) AS HUGEINT) AS a
              FROM tok GROUP BY 1, 2),
       tt AS (SELECT term, sum(a) AS t_tot FROM st GROUP BY 1),
       s1 AS (SELECT source, sum(a) AS n1 FROM st GROUP BY 1),
       n AS (SELECT sum(n1) AS n FROM s1),
       sc AS (SELECT st.source, st.term, st.a,
           (n.n * (st.a * (n.n - tt.t_tot - s1.n1 + st.a)
                   - (tt.t_tot - st.a) * (s1.n1 - st.a))
                * (st.a * (n.n - tt.t_tot - s1.n1 + st.a)
                   - (tt.t_tot - st.a) * (s1.n1 - st.a))
                * 1000000)
             // (tt.t_tot * (n.n - tt.t_tot) * s1.n1 * (n.n - s1.n1))
             AS keyness_e6
         FROM st JOIN tt USING (term) JOIN s1 USING (source), n
         WHERE st.a >= $KeynessMinCount
           AND st.a * (n.n - s1.n1) > (tt.t_tot - st.a) * s1.n1),
       r AS (SELECT source, term, a, keyness_e6, row_number() OVER
           (PARTITION BY source ORDER BY keyness_e6 DESC, term)
           AS rank FROM sc)
     SELECT source, CAST(rank AS INT) AS rank, term,
       CAST(a AS BIGINT) AS n_in_source,
       CAST(keyness_e6 AS BIGINT) AS keyness_e6
     FROM r WHERE rank <= $KeynessTopK ORDER BY source, rank"""
}
