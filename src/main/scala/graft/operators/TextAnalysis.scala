package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Text-analysis operators over the documents table: language ID,
  * quality scoring, token counting, content fingerprinting. All pure
  * narrow projections (no shuffle except the final orderBy in the
  * oracle-checked query shapes) — at 100 TB these run at scan speed. */
object TextAnalysis {

  /** Language identification via marker-word counts (n-gram heuristic).
    * Deterministic argmax with fixed precedence; portable construction
    * (length/replace counting only). */
  def langIdQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang").as("lang_declared"),
        langId(col("text")).as("lang_pred"),
        langScore(col("text"), "en").as("score_en"),
        langScore(col("text"), "fr").as("score_fr"))
      .orderBy("doc_id")

  /** Quality signals: length, word count, mean word length (scaled
    * integer), punctuation count, digit count, uppercase count.
    * Ratios are floor(x * 10000 / y) — integer outputs only. */
  def qualityQuery(spark: SparkSession, dir: String): DataFrame = {
    val toks = rawTokens(col("text"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_m"),
        size(toks).cast("long").as("n_words"),
        floor(length(replace(col("text"), lit(" "), lit("")))
          * lit(10000.0) / greatest(size(toks), lit(1)))
          .cast("long").as("avg_word_len_e4"),
        patternCount(col("text"), "[^A-Za-z0-9\\s]").as("n_punct"),
        patternCount(col("text"), "[0-9]").as("n_digits"),
        patternCount(col("text"), "[A-Z]").as("n_upper"))
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / single digits / single punctuation marks). */
  def tokenCountQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(rawTokens(col("text"))).cast("long").as("ws_tokens"),
        patternCount(col("text"), "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")
          .as("bpe_tokens"))
      .orderBy("doc_id")

  /** Content fingerprints: md5 of normalized text (portable) plus the
    * count of winnowed rolling-hash fingerprints (Spark-side sketch;
    * the count is deterministic and engine-independent… but the hashes
    * themselves are xxhash64 — kept out of the oracle-checked columns). */
  def fingerprintQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        fingerprint(col("text")).as("fp_md5"))
      .orderBy("doc_id")

  /** Winnowed sketch per doc — Spark-only (rows-only driver check).
    * Staged projections keep each interpreted HOF stage evaluated once
    * per row; repartition spreads the CPU-bound sketch over all cores
    * (a small single-file corpus is otherwise one task). */
  def winnowQuery(spark: SparkSession, dir: String): DataFrame =
    Partitioning.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), kgramHashes(col("toks"), 5).as("grams"))
      .select(col("doc_id"),
        size(winnowMin(col("grams"), 4)).cast("long").as("n_fp"))
      .orderBy("doc_id")

  /** Sliding-window document chunking — the canonical LLM
    * preprocessing step: split each document into token windows of
    * `chunkSize` advancing by `stride` (overlap = chunkSize - stride),
    * one final shorter chunk covering the tail. Emits per-chunk token
    * counts and content digests; a narrow per-row computation (no
    * shuffle before the output sort), so it runs at scan speed at any
    * corpus size. Construction is portable (split/slice/md5), so the
    * driver hash-checks every chunk boundary and digest. */
  def chunkQuery(spark: SparkSession, dir: String,
                 chunkSize: Int = 32, stride: Int = 24): DataFrame = {
    require(stride > 0 && chunkSize >= stride)
    val docs = Partitioning.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("m", when(col("n") <= chunkSize, lit(1)).otherwise(
        ceil((col("n") - chunkSize).cast("double") / stride).cast("int") + 1))
    docs
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0), col("m") - 1)).as("chunk_id"))
      .withColumn("n_tokens",
        least(lit(chunkSize), col("n") - col("chunk_id") * stride).cast("long"))
      .withColumn("chunk_md5",
        md5(concat_ws(" ",
          slice(col("toks"), col("chunk_id") * stride + 1, col("n_tokens")))))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("n_tokens"), col("chunk_md5"))
      .orderBy("doc_id", "chunk_id")
  }

  /** TF-IDF top terms per document — keyword extraction over the
    * corpus. The score is the exact integer `tf * 1e6 * N div df`
    * (document frequency from the per-doc term set): rational scoring
    * instead of a float `ln(N/df)` because `ln` is not guaranteed
    * bit-identical across engines' libm, and the ranking it induces
    * is the same. Two shuffles (term stats, per-doc top-k window) over
    * data that shrinks to distinct (doc, term) pairs after the first
    * partial aggregation; the corpus-size scalar stays in-plan as a
    * broadcast one-row aggregate, nothing is collected. */
  def tfidfQuery(spark: SparkSession, dir: String, topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    // the tokenize + per-doc aggregate feeds both the df aggregate and
    // the scoring join — materialize once instead of tokenizing the
    // corpus twice.
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val byScore = Window.partitionBy("doc_id")
      .orderBy(col("score_e6").desc, col("term").asc)
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score_e6",
        expr("(tf * 1000000 * n_docs) div df"))
      .withColumn("term_rank", row_number().over(byScore))
      .filter(col("term_rank") <= topK)
      .select(col("doc_id"), col("term"), col("score_e6"),
        col("term_rank").cast("int").as("term_rank"))
      .orderBy("doc_id", "term_rank")
  }

  /** Repetition quality signals (the Gopher-rules family): duplicate
    * word fraction and most-frequent-bigram fraction per document —
    * high values flag boilerplate/spam for the quality gate. Bigrams
    * come from zip_with over two MATERIALIZED slice columns (each
    * interpreted HOF element then evaluates one cheap concat, not a
    * re-derived subtree); ratios are exact integer `div`, so the whole
    * construction is portable. One shuffle (the per-doc bigram
    * frequency aggregation) on data pre-shrunk to (doc, bigram)
    * partial counts. */
  def repetitionQuery(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("nd", size(array_distinct(col("toks"))))
    val bigrams = base
      .withColumn("heads", slice(col("toks"), lit(1), greatest(col("n") - 1, lit(0))))
      .withColumn("tails",
        when(col("n") >= 2, slice(col("toks"), lit(2), col("n") - 1))
          .otherwise(array().cast("array<string>")))
      .select(col("doc_id"),
        explode(zip_with(col("heads"), col("tails"),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("top"), sum(col("c")).as("nbi"))
    base.join(bigrams, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        expr("((n - nd) * 1000000L) div n").as("dup_word_frac_e6"),
        expr("(coalesce(top, 0L) * 1000000L) div greatest(coalesce(nbi, 1L), 1L)")
          .as("top_bigram_frac_e6"))
      .orderBy("doc_id")
  }

  /** Winnowing in its portable (oracle-checked) configuration: rolling
    * k-gram hashes are [[portableHash60]] (cross-engine md5 prefix) and
    * the sliding-window minimum runs as window functions over
    * posexploded tokens — a formulation DuckDB evaluates identically.
    * Same semantics as [[winnowQuery]]: distinct count of per-window
    * minima when a doc has >= `window` grams, distinct count of the
    * grams themselves when it has fewer, 0 when it has none.
    *
    * Scale note: this shape shuffles the token stream by doc_id for
    * the two windows; the array formulation in [[winnowQuery]] is
    * narrow (no shuffle) and keeps the fast 64-bit hash, so IT is the
    * 100 TB path — this one exists so the sketch's machinery gets an
    * exact cross-engine check rather than a rows-only count. */
  def winnowQueryPortable(spark: SparkSession, dir: String,
                          k: Int = 5, window: Int = 4): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val perDoc = winnowFps(docs, k, window)
      .groupBy("doc_id")
      .agg(countDistinct(col("fp")).as("n_fp"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_fp"), lit(0L)).as("n_fp"))
      .orderBy("doc_id")
  }

  /** Portable winnow fingerprints as (doc_id, fp) rows — the shared
    * construction behind [[winnowQueryPortable]] (per-doc distinct
    * counts) and [[Dedup.winnowPairs]] (cross-doc overlap): per-window
    * minima of rolling k-gram [[portableHash60]]es when a doc has >=
    * `window` grams, the grams themselves when it has fewer. Rows may
    * repeat (adjacent windows often share a minimum — that is
    * winnowing's compression); callers dedupe as their semantics
    * require. Docs with zero grams emit nothing. */
  def winnowFps(docs: DataFrame, k: Int = 5, window: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val gramParts = col("w") +: (1 until k).map(j => lead(col("w"), j).over(byPos))
    val grams = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w")))
      .withColumn("gram",
        when(lead(col("w"), k - 1).over(byPos).isNotNull,
          concat_ws(" ", gramParts: _*)))
      .filter(col("gram").isNotNull)
      .select(col("doc_id"), col("pos"), portableHash60(col("gram")).as("g"))
    val winMin = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, window - 1)
    grams
      .withColumn("n_grams", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("winmin", min(col("g")).over(winMin))
      .withColumn("rn", row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
      .filter(col("n_grams") < window ||
        col("rn") <= col("n_grams") - window + 1)
      .select(col("doc_id"),
        when(col("n_grams") >= window, col("winmin"))
          .otherwise(col("g")).as("fp"))
  }

  /** Vocabulary build — the tokenizer-training step of an LLM data
    * pipeline: corpus-wide term frequencies, a minimum-count floor,
    * and contiguous ids assigned by (count DESC, term ASC). One
    * map-side-combined aggregation over the token stream is the only
    * corpus-sized work; the top-`vocabSize` selection compiles to
    * TakeOrderedAndProject (per-partition heaps, no global sort), and
    * the id-assigning window runs over at most `vocabSize` rows — a
    * constant, never corpus-scale. */
  def vocabQuery(spark: SparkSession, dir: String, minCount: Long = 3L,
                 vocabSize: Int = 300): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(vocabSize)
    top
      .withColumn("vocab_id", row_number()
        .over(Window.orderBy(col("cnt").desc, col("term").asc))
        .cast("long"))
      .select(col("vocab_id"), col("term"), col("cnt"))
      .orderBy("vocab_id")
  }

  /** q82: skip-gram co-occurrence counts — the (center, context) pair
    * table that seeds word2vec/GloVe-style embedding training: for
    * every token, each of the next `window` tokens becomes a context,
    * and pairs are counted corpus-wide.
    *
    * Scale shape: pair generation is NARROW — pairs come from slicing
    * the doc's own token array (`window`·len rows per doc via one
    * explode), never from a positions self-join (which would shuffle
    * the exploded token table twice and explode skew on long docs).
    * The only shuffle is the (w1, w2)-keyed count with map-side
    * partial combine, and the top-N is a TakeOrderedAndProject. The
    * oracle recomputes with the self-join formulation — different
    * plan, same pairs. */
  def skipgramQuery(spark: SparkSession, dir: String, window: Int = 2,
                    topN: Int = 100): DataFrame = {
    Tables.documents(spark, dir)
      .select(tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(flatten(transform(col("t"),
        (tok, i) => transform(slice(col("t"), i + lit(2), lit(window)),
          u => struct(tok.as("w1"), u.as("w2")))))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w1").asc, col("w2").asc)
      .limit(topN)
  }

  /** DuckDB oracle for [[skipgramQuery]] (window 2, top 100). */
  def skipgramOracleSql: String =
    """WITH toks AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
       p AS (SELECT doc_id, unnest(t) AS tok,
                    generate_subscripts(t, 1) AS pos FROM toks)
     SELECT a.tok AS w1, b.tok AS w2, CAST(count(*) AS BIGINT) AS n
     FROM p a JOIN p b
       ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos <= a.pos + 2
     GROUP BY 1, 2 ORDER BY n DESC, w1, w2 LIMIT 100"""

  /** q83: per-language heavy hitters — the top-`k` tokens of every
    * language stratum with rank. The count is one token-keyed
    * aggregation with map-side partial combine (the shuffle carries
    * distinct (lang, term), never the token stream); the per-group
    * top-k window then sorts only the DISTINCT-term table inside each
    * language partition. At larger vocabularies the same query drops
    * in the space-saving sketch ([[graft.functions.SketchAggregates]])
    * for the exact count — the exact form is the registered oracle
    * configuration. */
  def heavyHittersQuery(spark: SparkSession, dir: String,
                        k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLang = Window.partitionBy("lang")
      .orderBy(col("cnt").desc, col("term").asc)
    Tables.documents(spark, dir)
      .select(col("lang"), explode(tokens(col("text"))).as("term"))
      .groupBy("lang", "term").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(byLang).cast("int"))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk"), col("term"), col("cnt"))
      .orderBy("lang", "rk")
  }

  /** DuckDB oracle for [[heavyHittersQuery]] (k = 5). */
  def heavyHittersOracleSql: String =
    """WITH tk AS (SELECT lang,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
         FROM documents),
       c AS (SELECT lang, term, count(*) AS cnt FROM tk GROUP BY 1, 2)
     SELECT lang, CAST(rk AS INT) AS rk, term, CAST(cnt AS BIGINT) AS cnt
     FROM (SELECT lang, term, cnt, row_number() OVER (PARTITION BY lang
             ORDER BY cnt DESC, term) AS rk FROM c)
     WHERE rk <= 5 ORDER BY lang, rk"""

  /** q87: canonical text normalization — the pass every dedup pipeline
    * runs BEFORE fingerprinting (lowercase, strip non-alphanumerics,
    * collapse whitespace), reported as per-doc normalized fingerprint
    * plus before/after size and a changed flag, with the duplicate
    * count each canonical form collapses to. Pure codegen'd string
    * expressions (lower/regexp_replace/trim/md5) — narrow scan-side
    * work; the only shuffle is the canonical-form count, keyed on the
    * 32-char md5 instead of the normalized text. The character classes
    * are shared Java-regex/RE2 syntax, so DuckDB's regexp_replace
    * computes the identical canonical form. */
  def normalizeQuery(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
      " +", " "))
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_raw"),
        length(norm).cast("long").as("n_norm"),
        md5(norm).as("norm_fp"),
        (md5(norm) =!= md5(col("text"))).cast("int").as("changed"))
    val dupes = d.groupBy("norm_fp").agg(count(lit(1)).as("n_same"))
    d.join(dupes, Seq("norm_fp"))
      .select(col("doc_id"), col("norm_fp"), col("n_raw"), col("n_norm"),
        col("changed"), col("n_same"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[normalizeQuery]]. */
  def normalizeOracleSql: String =
    """WITH d AS (SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_raw,
           CAST(length(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS n_norm,
           md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_fp,
           CAST(md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) != md5(text)
             AS INT) AS changed
         FROM documents)
     SELECT doc_id, norm_fp, n_raw, n_norm, changed,
       CAST(count(*) OVER (PARTITION BY norm_fp) AS BIGINT) AS n_same
     FROM d ORDER BY doc_id"""

  /** q95: BPE seed statistics — the first byte-pair-encoding merge
    * iteration: corpus-weighted counts of adjacent character pairs
    * inside words, the argmax of which IS the first merge a BPE
    * tokenizer trainer would perform. The scale shape mirrors a real
    * trainer: the token stream collapses to the DISTINCT-word
    * frequency table first (one token-keyed aggregation — vocabulary-
    * sized, not corpus-sized), and the character-pair fan-out runs
    * over that vocabulary weighted by word frequency, so a 100 TB
    * corpus costs one token count plus work proportional to |vocab| ×
    * avg word length. Restricted to ^[a-z0-9]+$ words so pair
    * extraction is pure ASCII and both engines' substring semantics
    * agree byte-for-byte. */
  def bpePairsQuery(spark: SparkSession, dir: String,
      topN: Int = 20): DataFrame =
    bpePairs(Tables.documents(spark, dir), topN)

  /** [[bpePairsQuery]] over an explicit docs(text) frame — the
    * testable core. */
  def bpePairs(docs: DataFrame, topN: Int): DataFrame = {
    val vocab = docs
      .select(explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$") && length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    vocab
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substring(w, i, 2)").as("pair"), col("freq"))
      .groupBy("pair").agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(topN)
  }

  /** DuckDB oracle for [[bpePairsQuery]] (top 20). */
  def bpePairsOracleSql: String =
    """WITH w AS (SELECT unnest(string_split_regex(lower(trim(text)),
           '\s+')) AS w FROM documents),
       v AS (SELECT w, count(*) AS freq FROM w
             WHERE regexp_matches(w, '^[a-z0-9]+$') AND length(w) >= 2
             GROUP BY 1),
       e AS (SELECT w, freq,
               unnest(generate_series(1, length(w) - 1)) AS i FROM v),
       p AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, freq FROM e)
     SELECT pair, CAST(sum(freq) AS BIGINT) AS n
     FROM p GROUP BY 1 ORDER BY n DESC, pair LIMIT 20"""

  /** q146: ITERATED byte-pair-encoding training — [[bpePairsQuery]]
    * (one merge level) extended to the real trainer loop: k rounds of
    * count-pairs → pick argmax → re-segment every word, emitting the
    * ordered merge table (round, a, b, corpus-weighted count at merge
    * time) — the artifact a BPE tokenizer ships.
    *
    * Representation: each word's segmentation is a STRING of symbols
    * joined by a 2-space separator and wrapped in 2-space ends
    * (`"  a  b  c  "`). A merge of (a, b) is then ONE `replace` of
    * `" a  b "` with `" ab "`: the single-space anchors are each half
    * of a 2-space boundary, so consecutive matches share zero
    * characters and left-to-right `replace` implements exactly BPE's
    * non-overlapping scan (`a a a` merges to `aa a`, and `a b a b`
    * merges both pairs) — with IDENTICAL semantics in Spark and
    * DuckDB, which is what lets the oracle unroll the same k rounds
    * as SQL CTEs (scalar subqueries select each round's argmax).
    *
    * Scale shape (mirrors a real trainer): the corpus collapses to
    * the distinct-word frequency table once (vocabulary-sized,
    * localCheckpointed); each round is a pair-count aggregation over
    * the vocabulary plus one argmax row to the driver (the k-means /
    * convergence-probe driver-state pattern) and a map-only
    * re-segmentation, also checkpointed so round r+1 reads
    * materialized symbols instead of replaying r replaces. Nothing
    * corpus-sized moves after the initial token count. Ties break by
    * (count DESC, a ASC, b ASC) in both engines. */
  def bpeMergesQuery(spark: SparkSession, dir: String,
      rounds: Int = 4): DataFrame =
    bpeMerges(spark, Tables.documents(spark, dir), rounds)

  /** [[bpeMergesQuery]] over an explicit docs(text) frame. */
  def bpeMerges(spark: SparkSession, docs: DataFrame,
      rounds: Int): DataFrame = {
    import spark.implicits._
    bpeTrain(docs, rounds)._1
      .toDF("round", "a", "b", "n").orderBy("round")
  }

  /** The shared training loop: runs up to `rounds` merge rounds and
    * returns (merge list, final segmentation table) — [[bpeMerges]]
    * reports the former, [[bpeSegmentStats]] aggregates the latter.
    * Stops early when no pair remains (every word one symbol). */
  private[operators] def bpeTrain(docs: DataFrame, rounds: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    var cur = docs
      .select(explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$") && length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat(lit("  "), regexp_replace(col("w"), "(.)", "$1  "))
        .as("s"), col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val best = cur
        .select(split(trim(col("s")), "  ").as("arr"), col("freq"))
        .filter(size(col("arr")) >= 2)
        .select(col("arr"), col("freq"),
          explode(sequence(lit(2), size(col("arr")))).as("i"))
        .select(element_at(col("arr"), col("i") - 1).as("a"),
          element_at(col("arr"), col("i")).as("b"), col("freq"))
        .groupBy("a", "b").agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect().headOption
      best match {
        case None =>
          // every word is a single symbol — no pair left to merge.
          // The oracle mirrors this: an exhausted round's empty
          // LIMIT-1 CTE contributes no merge row, and its
          // coalesce-wrapped replace carries the segmentation forward
          // unchanged, so both the merge table and any later
          // segmentation read agree with this early stop.
          exhausted = true
        case Some(row) =>
          val (a, b, n) =
            (row.getString(0), row.getString(1), row.getLong(2))
          merges += ((r.toLong, a, b, n))
          // symbols are ^[a-z0-9]+$ so embedding them in the
          // expression text is literal-safe
          cur = cur
            .select(expr(s"replace(s, ' $a  $b ', ' $a$b ')").as("s"),
              col("freq"))
            .localCheckpoint()
      }
    }
    (merges.toSeq, cur)
  }

  /** The shared WITH-body for the BPE oracles: vocabulary build plus
    * `rounds` unrolled merge CTEs, each round's argmax injected into
    * the next round's `replace` via scalar subqueries. The `replace`
    * is wrapped in `coalesce(…, s)` so an EXHAUSTED round (empty
    * argmax → NULL pattern → NULL replace result) keeps the previous
    * segmentation instead of null-poisoning every later round —
    * exactly the engine's early-stop behavior. */
  private def bpeOracleCtes(rounds: Int): String = {
    val roundCte = (r: Int) => {
      val s = s"s$r"; val p = s"p$r"; val b = s"b$r"
      s"""x$r AS (SELECT string_split_regex(trim(s), '  ') AS arr, freq
             FROM $s),
         y$r AS (SELECT arr, freq,
               unnest(generate_series(2, len(arr))) AS i
             FROM x$r WHERE len(arr) >= 2),
         $p AS (SELECT arr[i-1] AS a, arr[i] AS b,
               CAST(sum(freq) AS BIGINT) AS n
             FROM y$r GROUP BY 1, 2),
         $b AS (SELECT a, b, n FROM $p ORDER BY n DESC, a, b LIMIT 1),
         s${r + 1} AS (SELECT coalesce(replace(s,
               ' ' || (SELECT a FROM $b) || '  ' || (SELECT b FROM $b)
                 || ' ',
               ' ' || (SELECT a FROM $b) || (SELECT b FROM $b) || ' '),
             s) AS s, freq FROM $s)"""
    }
    s"""tk AS (SELECT unnest(string_split_regex(lower(trim(text)),
           '\\s+')) AS w FROM documents),
       v AS (SELECT w, count(*) AS freq FROM tk
             WHERE regexp_matches(w, '^[a-z0-9]+$$') AND length(w) >= 2
             GROUP BY 1),
       s1 AS (SELECT '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS s,
               freq FROM v),
       ${(1 to rounds).map(roundCte).mkString(",\n       ")}"""
  }

  /** DuckDB oracle for [[bpeMergesQuery]]. */
  def bpeMergesOracleSql(rounds: Int = 4): String = {
    val unions = (1 to rounds)
      .map(r => s"SELECT $r AS round, a, b, n FROM b$r")
      .mkString(" UNION ALL ")
    s"""WITH ${bpeOracleCtes(rounds)}
     SELECT CAST(round AS BIGINT) AS round, a, b, n
     FROM ($unions) ORDER BY round"""
  }

  /** q148: the APPLY half of tokenizer training — the corpus
    * vocabulary segmented by the q146 merge table, reported as the
    * symbols-per-word distribution: for each post-merge symbol count,
    * how many distinct words land there, their corpus frequency mass,
    * and their frequency-weighted character mass (chars are invariant
    * under merging — the property PropertySpec pins — so chars_mass
    * over the distribution equals the raw corpus's alnum word chars,
    * while the symbol mass is what shrinks: the compression the
    * tokenizer buys). Scale shape: the training loop's vocabulary-
    * sized work plus ONE more vocabulary-sized aggregation — nothing
    * corpus-sized after the initial token count. */
  def bpeSegmentStatsQuery(spark: SparkSession, dir: String,
      rounds: Int = 4): DataFrame =
    bpeSegmentStats(Tables.documents(spark, dir), rounds)

  /** [[bpeSegmentStatsQuery]] over an explicit docs(text) frame. */
  def bpeSegmentStats(docs: DataFrame, rounds: Int): DataFrame = {
    val (_, segmented) = bpeTrain(docs, rounds)
    segmented
      .select(size(split(trim(col("s")), "  ")).cast("long")
          .as("n_symbols"),
        length(regexp_replace(col("s"), " ", "")).cast("long")
          .as("n_chars"),
        col("freq"))
      .groupBy("n_symbols")
      .agg(count(lit(1)).as("n_words"),
        sum(col("freq")).as("freq_mass"),
        sum(col("freq") * col("n_chars")).as("chars_mass"))
      .orderBy("n_symbols")
  }

  /** DuckDB oracle for [[bpeSegmentStatsQuery]] — the same unrolled
    * training CTEs, aggregating the final segmentation table. */
  def bpeSegmentStatsOracleSql(rounds: Int = 4): String =
    s"""WITH ${bpeOracleCtes(rounds)}
     SELECT CAST(len(string_split_regex(trim(s), '  ')) AS BIGINT)
         AS n_symbols,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(freq) AS BIGINT) AS freq_mass,
       CAST(sum(freq * length(replace(s, ' ', ''))) AS BIGINT)
         AS chars_mass
     FROM s${rounds + 1} GROUP BY 1 ORDER BY 1"""

  /** q143: packing-efficiency audit — how much context-window capacity
    * the q40 chunking scheme (size 32, stride 24) wastes as padding,
    * per source. The chunk count and fill have CLOSED FORMS (only the
    * last window is short: fill = n + 8·(m−1), capacity = 32·m), so
    * the audit is pure per-doc arithmetic + one aggregation — no
    * explode, no second pass over the chunks themselves. The number a
    * training-infra team actually watches: padding share is the GPU
    * time burned on pad tokens. Integer ceil via (x + d−1) div d. */
  def packingWasteQuery(spark: SparkSession, dir: String,
      chunkSize: Int = 32, stride: Int = 24): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("source"),
        size(tokens(col("text"))).cast("long").as("n"))
      .withColumn("m", when(col("n") <= chunkSize, lit(1L))
        .otherwise(expr(s"(n - $chunkSize + ${stride - 1}) div $stride")
          + 1L))
      .withColumn("fill", col("n") + (col("m") - 1) * (chunkSize - stride))
      .withColumn("cap", col("m") * chunkSize)
    docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("m")).as("n_chunks"),
        sum(col("cap")).as("capacity_tokens"),
        sum(col("fill")).as("fill_tokens"))
      .withColumn("padding_share_e6",
        expr("(capacity_tokens - fill_tokens) * 1000000 div capacity_tokens"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[packingWasteQuery]] (32/24). */
  def packingWasteOracleSql: String =
    """WITH d AS (SELECT source,
           CAST(len(string_split_regex(lower(trim(text)), '\s+'))
             AS BIGINT) AS n
         FROM documents),
       f AS (SELECT source, n,
               CASE WHEN n <= 32 THEN 1
                    ELSE (n - 32 + 23) // 24 + 1 END AS m FROM d),
       g AS (SELECT source, n, m, n + (m - 1) * 8 AS fill,
               m * 32 AS cap FROM f)
     SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(m) AS BIGINT) AS n_chunks,
       CAST(sum(cap) AS BIGINT) AS capacity_tokens,
       CAST(sum(fill) AS BIGINT) AS fill_tokens,
       CAST((sum(cap) - sum(fill)) * 1000000 // sum(cap) AS BIGINT)
         AS padding_share_e6
     FROM g GROUP BY 1 ORDER BY 1"""

  /** q98: deterministic negative sampling — for each of the top
    * skip-gram (center, context) training pairs, `negK` negative
    * context words drawn from the q68 vocabulary by PORTABLE HASH, not
    * RNG: neg_k = vocab[h60(w1:w2:k) mod |V|]. This is the word2vec
    * negative-sampling step made reproducible — same negatives on any
    * engine, any partitioning, any rerun — which is what a training-
    * data pipeline actually wants (resumable shards, auditable
    * samples). The vocabulary is vocabulary-sized (≤ 300 here) and
    * broadcast twice (size lookup + id→term resolve); the fan-out is
    * |pairs| × negK rows of pure hash arithmetic. A drawn negative
    * can collide with the true context (as in the original sampler);
    * the collision is deterministic and left in, documented. */
  def negativeSamplesQuery(spark: SparkSession, dir: String,
      negK: Int = 2, topPairs: Int = 50): DataFrame = {
    import graft.functions.TextFunctions.portableHash60
    // the vocabulary (corpus tokenize + count + top-K, ≤300 rows) is
    // read twice (size scalar + the negative-term lookup) — build once
    val vocab = vocabQuery(spark, dir).localCheckpoint()
    val vsize = vocab.agg(count(lit(1)).as("vsize"))
    skipgramQuery(spark, dir, window = 2, topN = topPairs)
      .crossJoin(broadcast(vsize))
      .select(col("w1"), col("w2"),
        explode(sequence(lit(1), lit(negK))).as("k"), col("vsize"))
      .withColumn("neg_vid",
        portableHash60(concat_ws(":", col("w1"), col("w2"), col("k")))
          % col("vsize") + 1)
      .join(broadcast(vocab.select(col("vocab_id").as("neg_vid"),
        col("term").as("neg_term"))), Seq("neg_vid"))
      .select(col("w1"), col("w2"), col("k").cast("int").as("k"),
        col("neg_term"))
      .orderBy("w1", "w2", "k")
  }

  /** DuckDB oracle for [[negativeSamplesQuery]] (negK=2, top 50) —
    * rebuilds the q68 vocabulary and the q82 pair table, then the
    * identical md5-hash draw. */
  def negativeSamplesOracleSql: String =
    """WITH tk AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
       tok AS (SELECT doc_id, unnest(t) AS term,
                      generate_subscripts(t, 1) AS pos FROM tk),
       vc AS (SELECT term, count(*) AS cnt FROM tok
              GROUP BY 1 HAVING count(*) >= 3),
       vt AS (SELECT term, cnt FROM vc ORDER BY cnt DESC, term LIMIT 300),
       vocab AS (SELECT row_number() OVER (ORDER BY cnt DESC, term)
                   AS vocab_id, term FROM vt),
       vs AS (SELECT count(*) AS vsize FROM vocab),
       pr AS (SELECT a.term AS w1, b.term AS w2, count(*) AS n
              FROM tok a JOIN tok b
                ON a.doc_id = b.doc_id AND b.pos > a.pos
                  AND b.pos <= a.pos + 2
              GROUP BY 1, 2 ORDER BY n DESC, w1, w2 LIMIT 50),
       e AS (SELECT w1, w2, unnest([1, 2]) AS k FROM pr),
       ne AS (SELECT w1, w2, k,
               CAST(('0x' || substr(md5(w1 || ':' || w2 || ':' ||
                 CAST(k AS VARCHAR)), 1, 15)) AS BIGINT)
                 % (SELECT vsize FROM vs) + 1 AS neg_vid
              FROM e)
     SELECT ne.w1, ne.w2, CAST(ne.k AS INT) AS k, vocab.term AS neg_term
     FROM ne JOIN vocab ON vocab.vocab_id = ne.neg_vid
     ORDER BY w1, w2, k"""

  /** q241: Zipf rank-frequency diagnostic — Zipf's law predicts
    * rank × frequency ≈ constant across the vocabulary; a corpus
    * whose curve breaks that shape (a too-flat head = boilerplate
    * flooding; a truncated tail = template text) is mis-mixed before
    * any model sees it. Terms are ranked by (count DESC, term ASC)
    * and grouped into decimal-magnitude bands (rank 1-9, 10-99, …:
    * `length(CAST(rank AS VARCHAR))` — the only log-bucketing that is
    * bit-identical in every engine, where floor(log(x)) inherits libm
    * rounding); per band, the mean rank×frequency product and the
    * band's token share. Flat mean_rank_freq across bands = Zipfian.
    *
    * Scale shape: ONE map-side-combined aggregation over the token
    * stream builds the frequency table — and NOTHING after it touches
    * per-term rows again. The band statistics depend only on the
    * (rank, cnt) MULTISET: terms tying on cnt occupy a contiguous
    * rank run (rank order is cnt DESC with term ASC breaking ties,
    * and every output is tie-order-invariant), so the whole query
    * reduces to per-COUNT group sizes. Each count-group's rank run
    * [r0+1, r0+c] is split at the ≤19 decimal band boundaries and
    * each segment contributes closed-form arithmetic-series sums —
    * sum(rank·cnt) over ranks lo..hi = cnt·(lo+hi)(hi−lo+1)/2. The
    * only windows are the prefix sums over the distinct-count table,
    * blocked by count magnitude (≤19 partitions of ≤√N_tokens rows
    * each — distinct counts are O(√N) since they sum to N). No
    * vocabulary-sized single-partition window anywhere. */
  def zipfQuery(spark: SparkSession, dir: String): DataFrame =
    zipfBands(Tables.documents(spark, dir))

  /** [[zipfQuery]]'s core over any frame with a `text` column. */
  def zipfBands(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    // collapse to count-groups: c terms share this cnt → one
    // contiguous rank run; three branches read this (offsets, total,
    // the segment expansion), so materialize once (distinct-count
    // cardinality is O(√N_tokens) — bounded)
    val grp = tf.groupBy("cnt").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // rank offset r0 of a count-group = #terms with (cnt' > cnt),
    // blocked prefix sum: block by decimal magnitude of cnt (≤19
    // blocks; larger magnitude ⇒ earlier in cnt-DESC rank order).
    // Cross-block offsets come from OlapOps.blockOffsets (the shared
    // broadcast triangular self-join over the ≤19-row block table) —
    // NO unpartitioned WindowExec anywhere in this plan (pinned by
    // PlanSpec)
    val blk = grp.withColumn("blk",
      length(col("cnt").cast("string")).cast("int"))
    val inBlkW = Window.partitionBy("blk").orderBy(col("cnt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bc = blk.groupBy("blk").agg(sum(col("c")).as("bc"))
    val blkOff = OlapOps.blockOffsets(bc, "blk", descending = true,
        Seq(("bc", "sum", "boff")))
      .select(col("blk"), coalesce(col("boff"), lit(0L)).as("boff"))
    val offs = blk
      .withColumn("loc", coalesce(sum(col("c")).over(inBlkW), lit(0L)))
      .join(broadcast(blkOff), "blk")
      .withColumn("r0", col("boff") + col("loc"))
      .select("cnt", "c", "r0")
    val tot = grp.agg(expr("sum(cnt * c)").as("t"))
    // split each rank run [r0+1, r0+c] at decimal band boundaries:
    // band b covers ranks [10^(b-1), 10^b-1]; 10^(b-1) rendered as
    // substring('1e18-as-digits', 1, b) to stay in exact integer land
    val p10 = "CAST(substring('1000000000000000000', 1, band) AS BIGINT)"
    offs.crossJoin(broadcast(tot))
      .withColumn("band", explode(expr(
        "sequence(length(CAST(r0 + 1 AS STRING)), " +
          "length(CAST(r0 + c AS STRING)))")))
      .withColumn("lo", expr(s"greatest(r0 + 1, $p10)"))
      .withColumn("hi", expr(s"least(r0 + c, $p10 * 10 - 1)"))
      .withColumn("len", col("hi") - col("lo") + lit(1L))
      // (lo+hi)·len is always even → div 2 is exact
      .withColumn("rank_sum", expr("(lo + hi) * len div 2"))
      .groupBy(col("band").cast("int").as("band"))
      .agg(sum(col("len")).cast("long").as("n_terms"),
        min(col("lo")).cast("long").as("rank_lo"),
        max(col("hi")).cast("long").as("rank_hi"),
        expr("sum(cnt * len)").cast("long").as("band_tokens"),
        expr("sum(cnt * rank_sum) div sum(len)").cast("long")
          .as("mean_rank_freq"),
        expr("sum(cnt * len) * 1000000 div first(t)").cast("long")
          .as("share_e6"))
      .orderBy("band")
  }

  /** DuckDB oracle for [[zipfQuery]] — same rank order, same decimal
    * bands, integer div throughout. */
  def zipfOracleSql: String =
    """WITH tok AS (SELECT unnest(string_split_regex(lower(trim(text)),
           '\s+')) AS term FROM documents),
       tf AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
       rk AS (SELECT term, cnt,
           row_number() OVER (ORDER BY cnt DESC, term) AS rank FROM tf),
       tot AS (SELECT sum(cnt) AS t FROM tf)
     SELECT CAST(length(CAST(rank AS VARCHAR)) AS INT) AS band,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(min(rank) AS BIGINT) AS rank_lo,
       CAST(max(rank) AS BIGINT) AS rank_hi,
       CAST(sum(cnt) AS BIGINT) AS band_tokens,
       CAST(sum(rank * cnt) // count(*) AS BIGINT) AS mean_rank_freq,
       CAST(sum(cnt) * 1000000 // t AS BIGINT) AS share_e6
     FROM rk, tot GROUP BY 1, t ORDER BY 1"""

  /** q242: Heaps-law vocabulary growth — V(n) ≈ K·n^β: how fast the
    * vocabulary grows as the corpus accumulates tells a pipeline
    * whether more data still buys new content (β holding) or the
    * crawl has saturated its sources (curve flattening early — the
    * di-minishing-returns signal a data-acquisition loop acts on).
    * Documents accumulate in doc_id order; per decile of the corpus,
    * the cumulative token count and cumulative distinct vocabulary.
    *
    * Scale shape: "first time a term appears" is min(doc_id) per term
    * — one token-keyed aggregation, no distinct-per-prefix recompute
    * (the naive form is 10 distincts over growing prefixes; this is
    * ONE pass + running sums over the per-DOC frame). The per-doc
    * frame is corpus-cardinality, so the running sums use the blocked
    * prefix-sum shape of `OlapOps.globalRankAsc`: doc_ids block into
    * ~1024 ranges, per-block totals prefix-sum over the ≤1024-row
    * block table, within-block windows (partitioned by block) finish
    * the cumulative counts — no doc-cardinality single-partition
    * window. */
  def heapsQuery(spark: SparkSession, dir: String): DataFrame =
    heapsGrowth(Tables.documents(spark, dir))

  /** [[heapsQuery]]'s core over any (doc_id, text) frame. */
  def heapsGrowth(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val perDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    val newPerDoc = toks.groupBy("term").agg(min("doc_id").as("fd"))
      .groupBy(col("fd").as("doc_id"))
      .agg(count(lit(1)).as("new_terms"))
    // three running sums (row number, cumulative tokens, cumulative
    // vocab), all ordered by doc_id — blocked: doc_ids map into ≤1024
    // contiguous ranges (order-preserving), per-block totals prefix-
    // sum over the ≤1024-row block table, within-block windows finish
    val base = perDoc.join(newPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("new_terms"), lit(0L)).as("new_terms"))
    val bounds = base.agg(min("doc_id").as("lo"), max("doc_id").as("hi"),
      count(lit(1)).as("nd"))
    val nBlocks = 1024
    val b = base.crossJoin(broadcast(bounds))
      .withColumn("blk",
        expr(s"CAST((doc_id - lo) * $nBlocks div (hi - lo + 1) AS INT)"))
    // cross-block offsets via OlapOps.blockOffsets (the shared
    // broadcast triangular self-join) over the ≤1024-row block table
    // (≤0.5M in-memory pairs) — no unpartitioned WindowExec in this
    // plan (pinned by PlanSpec)
    val bt = b.groupBy("blk").agg(count(lit(1)).as("bn"),
      sum("n_tok").as("bt"), sum("new_terms").as("bv"))
    val offs = OlapOps.blockOffsets(bt, "blk", descending = false,
        Seq(("bn", "sum", "rn_off"), ("bt", "sum", "tok_off"),
          ("bv", "sum", "voc_off")))
      .select(col("blk"),
        coalesce(col("rn_off"), lit(0L)).as("rn_off"),
        coalesce(col("tok_off"), lit(0L)).as("tok_off"),
        coalesce(col("voc_off"), lit(0L)).as("voc_off"))
    val inBlk = Window.partitionBy("blk").orderBy("doc_id")
    val inBlkCum = inBlk
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(broadcast(offs), "blk")
      .withColumn("rn",
        col("rn_off") + row_number().over(inBlk).cast("long"))
      .withColumn("tok_cum", col("tok_off") + sum("n_tok").over(inBlkCum))
      .withColumn("voc_cum",
        col("voc_off") + sum("new_terms").over(inBlkCum))
      .groupBy(expr("(rn - 1) * 10 div nd + 1").cast("int").as("decile"))
      .agg(max(col("rn")).cast("long").as("docs"),
        max(col("tok_cum")).cast("long").as("tokens_cum"),
        max(col("voc_cum")).cast("long").as("vocab_cum"))
      .orderBy("decile")
  }

  /** DuckDB oracle for [[heapsQuery]] — same first-occurrence
    * formulation, same decile arithmetic. */
  def heapsOracleSql: String =
    """WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)),
           '\s+') AS t FROM documents),
       tok AS (SELECT doc_id, unnest(t) AS term FROM tk),
       pd AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY 1),
       fd AS (SELECT term, min(doc_id) AS fdoc FROM tok GROUP BY 1),
       nw AS (SELECT fdoc AS doc_id, count(*) AS new_terms
              FROM fd GROUP BY 1),
       o AS (SELECT pd.doc_id, n_tok, coalesce(new_terms, 0) AS nt,
           row_number() OVER (ORDER BY pd.doc_id) AS rn,
           sum(n_tok) OVER (ORDER BY pd.doc_id) AS tok_cum,
           sum(coalesce(new_terms, 0)) OVER (ORDER BY pd.doc_id)
             AS voc_cum
         FROM pd LEFT JOIN nw USING (doc_id)),
       n AS (SELECT count(*) AS nd FROM pd)
     SELECT CAST((rn - 1) * 10 // nd + 1 AS INT) AS decile,
       CAST(max(rn) AS BIGINT) AS docs,
       CAST(max(tok_cum) AS BIGINT) AS tokens_cum,
       CAST(max(voc_cum) AS BIGINT) AS vocab_cum
     FROM o, n GROUP BY 1 ORDER BY 1"""

  /** q262: hashed n-gram FEATURE EXPORT — the feature-engineering
    * step in front of a classifier-based quality filter (the
    * fastText-style pipeline: hash each bigram into a fixed bucket
    * space, train a linear model on the bucket counts, filter the
    * corpus by its score). Per document: bigrams of lowercase
    * whitespace tokens hashed into [[FeatureBuckets]] buckets via the
    * portable md5-prefix hash, and the top-[[FeatureTopK]] buckets by
    * (count DESC, bucket ASC) emitted as flat (doc_id, rank, bucket,
    * cnt) rows — the sparse vector a downstream trainer consumes,
    * exploded so the driver hash-compare stays on scalars.
    *
    * Scale shape: one scan-side explode (bigrams), one map-side-
    * combined (doc, bucket) aggregation whose key space per doc is
    * min(doc bigrams, 4096), and a doc-partitioned rank window (≤4096
    * rows per partition by construction). At 100 TB the hash would be
    * xxhash64 (the sketch-family fast path); md5 is registered
    * because the oracle must re-derive identical buckets. */
  val FeatureBuckets = 4096
  val FeatureTopK = 8

  /** `portable = false` swaps the oracle-recomputable md5-prefix
    * bucket hash for one xxhash64 per bigram — the at-scale config
    * the scaladoc names; benched under `fast_hash` like the sketch
    * family. Buckets differ by design (different hash → different
    * bucket ids), so the variant is time-compared only, never
    * oracle-compared. */
  def hashedFeaturesQuery(spark: SparkSession, dir: String,
      portable: Boolean = true): DataFrame =
    hashedFeatures(Tables.documents(spark, dir), portable)

  /** [[hashedFeaturesQuery]]'s core over any (doc_id, text) frame. */
  def hashedFeatures(docs: DataFrame,
      portable: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("t"))
    // guarded: sequence(1, 0) counts DOWN, so short docs must yield
    // an empty array, not a reversed range (the wordShingles pitfall)
    val grams = toks.select(col("doc_id"),
      explode(when(size(col("t")) >= 2,
          expr("transform(sequence(1, size(t) - 1), " +
            "i -> concat(t[i-1], ' ', t[i]))"))
        .otherwise(array().cast("array<string>"))).as("g"))
    val bucketExpr =
      if (portable)
        expr(s"CAST(conv(substring(md5(g), 1, 4), 16, 10) AS BIGINT) " +
          s"% $FeatureBuckets")
      else pmod(xxhash64(col("g")), lit(FeatureBuckets.toLong))
    val feats = grams
      .withColumn("bucket", bucketExpr)
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("cnt").desc, col("bucket").asc)
    feats.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= FeatureTopK)
      .select(col("doc_id"), col("rank").cast("int").as("rank"),
        col("bucket").cast("long").as("bucket"),
        col("cnt").cast("long").as("cnt"))
      .orderBy("doc_id", "rank")
  }

  /** DuckDB oracle for [[hashedFeaturesQuery]] — same bigrams, same
    * md5-prefix buckets, same (count DESC, bucket ASC) rank. */
  def hashedFeaturesOracleSql: String =
    s"""WITH tok AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\\s+') AS t
         FROM documents),
       bg AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
         FROM tok, unnest(range(1, len(t))) AS u(i)
         WHERE len(t) >= 2),
       f AS (SELECT doc_id,
           CAST(('0x' || substr(md5(g), 1, 4)) AS BIGINT)
             % $FeatureBuckets AS bucket,
           count(*) AS cnt
         FROM bg GROUP BY 1, 2),
       r AS (SELECT doc_id, bucket, cnt, row_number() OVER
           (PARTITION BY doc_id ORDER BY cnt DESC, bucket) AS rank
         FROM f)
     SELECT doc_id, CAST(rank AS INT) AS rank,
       CAST(bucket AS BIGINT) AS bucket, CAST(cnt AS BIGINT) AS cnt
     FROM r WHERE rank <= $FeatureTopK ORDER BY doc_id, rank"""
}
