package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.TextExpressionFunctions.wordShinglesFast
import graft.sources.Tables

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash groupBy), n-gram Jaccard (inverted-index pair join),
  * MinHash+LSH (band-bucket candidate generation), SimHash (bit-sketch
  * + hamming ball), embedding-cosine near-dup.
  *
  * Scale design (100 TB posture): every method is a bounded number of
  * shuffles keyed by content hashes — no cross product ever
  * materializes. The pairwise joins are inverted-index joins: rows meet
  * only when they share a shingle / band bucket / hyperplane bucket, so
  * the join fans out proportionally to true collisions, not n².
  * Hot-shingle frequency caps (`maxDocFreq`) bound worst-case bucket
  * sizes — the standard guard against degenerate skew at web scale.
  */
object Dedup {

  // ---------------------------------------------------------------------------
  // Exact dedup
  // ---------------------------------------------------------------------------

  /** Exact-duplicate statistics per source: hash-groupBy on md5(text).
    * Map-side partial agg; one shuffle on (source). */
  def exactDupStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_unique"))
      .orderBy("source")

  /** q144: dedup savings projection — what exact (within-source)
    * dedup would save, in documents and characters, per source:
    * total mass vs the mass of one representative per identical
    * md5(text), with the savings share as an exact rational. The
    * representative is `min_by(n_chars, doc_id)` — the SAME
    * min-doc_id rule [[exactDedup]] applies — so the projection
    * reports exactly what the transform would keep even if a stored
    * n_chars ever disagreed across rows with identical text. One
    * aggregation at (source, fingerprint) grain, one rollup, no
    * window and no join: the estimate that justifies (or kills)
    * running the actual dedup at 100 TB. */
  def dedupSavingsQuery(spark: SparkSession, dir: String): DataFrame = {
    val perFp = Tables.documents(spark, dir)
      .select(col("source"), md5(col("text")).as("fp"),
        col("doc_id"), col("n_chars"))
      .groupBy("source", "fp")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
        expr("min_by(n_chars, doc_id)").as("kept_chars"))
    perFp.groupBy("source")
      .agg(sum(col("n")).as("n_docs"),
        count(lit(1)).as("n_unique"),
        sum(col("chars")).as("total_chars"),
        sum(col("kept_chars")).as("kept_chars"))
      .withColumn("savings_e6",
        expr("(total_chars - kept_chars) * 1000000 div total_chars"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[dedupSavingsQuery]]. */
  def dedupSavingsOracleSql: String =
    """WITH g AS (SELECT source, md5(text) AS fp, count(*) AS n,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           min_by(n_chars, doc_id) AS kept_chars
         FROM documents GROUP BY 1, 2)
     SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST(sum(chars) AS BIGINT) AS total_chars,
       CAST(sum(kept_chars) AS BIGINT) AS kept_chars,
       CAST((sum(chars) - sum(kept_chars)) * 1000000 // sum(chars)
         AS BIGINT) AS savings_e6
     FROM g GROUP BY 1 ORDER BY 1"""

  /** Keep one representative doc per identical md5(text) — the actual
    * dedup transform (first by doc_id for determinism). */
  def exactDedup(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    docs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  // ---------------------------------------------------------------------------
  // N-gram Jaccard (exact near-dup, inverted index)
  // ---------------------------------------------------------------------------

  /** Document pairs with word-`n`-gram Jaccard >= `threshold`.
    *
    * Inverted-index formulation: explode distinct shingles, self-join on
    * the shingle (co-occurrence count = |A∩B|), combine with per-doc
    * shingle counts for |A∪B|. `maxDocFreq` drops shingles occurring in
    * more than that many docs — stop-shingles contribute little to
    * Jaccard but dominate join fan-out at scale (0 = keep all). Output
    * jaccard is scaled to integer millionths for cross-engine hash
    * stability.
    *
    * Calibrate `maxDocFreq` ABOVE the expected duplicate-family size:
    * every shingle of a family of k near-identical docs has doc
    * frequency >= k, so a cap below k prunes the very shingles that
    * connect the family (measured: a 10x-replicated corpus under a
    * cap sized for 1x returns zero pairs). MinHash+LSH has no such
    * knob-vs-recall coupling — at high duplication rates it is the
    * safer primary, with Jaccard as the verifier. */
  /** `hashedKeys`: index and join on `xxhash64(shingle)` instead of
    * the shingle string — the at-scale default, shrinking the
    * shuffled index key from ~n-gram bytes to 8 bytes (the inverted
    * index IS this operator's dominant shuffle). Set sizes and
    * intersection counts are identical up to 64-bit hash collisions
    * (distinct-per-doc shingles hash to distinct keys with
    * probability 1 - ~k²/2^65 per doc); the oracle-checked registered
    * query keeps string keys, and the bench's `fast_hash` line
    * measures this configuration. */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double,
                        maxDocFreq: Long = 0,
                        hashedKeys: Boolean = false): DataFrame = {
    graft.functions.TextExpressionFunctions.register(docs.sparkSession)
    val sh = Partitioning.spread(docs)
      .select(col("doc_id"),
        wordShinglesFast(tokens(col("text")), n).as("shingles"))
    // Materialize the inverted index once: it feeds four plan branches
    // (both self-join sides + two size lookups). At cluster scale this
    // is where the index would be persisted to storage; locally
    // localCheckpoint pins it in the block manager.
    val exploded = sh.select(col("doc_id"), explode(col("shingles")).as("s0"))
      .select(col("doc_id"),
        (if (hashedKeys) xxhash64(col("s0")) else col("s0")).as("s"))
      .localCheckpoint()
    // shingles are distinct per doc, so set size = exploded row count —
    // the tiny per-doc counts then broadcast into the pair join.
    val sizes = exploded.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val filtered =
      if (maxDocFreq > 0) {
        // Hot-shingle prune as an anti-join against the (small by
        // construction at any cap) set of shingles in > maxDocFreq
        // docs. A `count over (partition by s)` window would
        // sort-shuffle the ENTIRE inverted index by shingle; the
        // aggregate is map-side combined and AQE broadcasts the hot
        // set into a narrow anti-join.
        val hot = exploded.groupBy("s")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDocFreq).select("s")
        exploded.join(hot, Seq("s"), "left_anti")
      } else exploded
    val inter = filtered.as("a")
      .join(filtered.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "d1")
        .withColumnRenamed("n_sh", "n1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2")
        .withColumnRenamed("n_sh", "n2"), "d2")
      .withColumn("jaccard",
        col("c") * lit(1.0) / (col("n1") + col("n2") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"),
        (round(col("jaccard"), 6) * 1000000).cast("long").as("jac"))
      .orderBy("d1", "d2")
  }

  /** q78: ASYMMETRIC containment pairs — overlap / |A's shingle set|,
    * not Jaccard. Resemblance (q23) misses the quote/excerpt case: a
    * short doc fully contained in a long one has tiny Jaccard (the
    * union is dominated by the long doc) but containment ~1. This is
    * the Broder distinction (resemblance vs containment, "On the
    * resemblance and containment of documents", 1997), and the reason
    * dedup pipelines run both: resemblance catches mirrors,
    * containment catches aggregation/quotation.
    *
    * Same capped-inverted-index shape as [[ngramJaccardPairs]] (one
    * index, hot-shingle anti-join, equi-join pair generation); the
    * score divides by the FIRST doc's set size only, so each ordered
    * pair (d1 ⊆? d2) is scored independently — integer rational
    * (e6 floor division), no float divergence. */
  def containmentPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
                       maxDocFreq: Long = 50): DataFrame = {
    graft.functions.TextExpressionFunctions.register(docs.sparkSession)
    val sh = Partitioning.spread(docs)
      .select(col("doc_id"),
        wordShinglesFast(tokens(col("text")), n).as("shingles"))
    val exploded = sh
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .localCheckpoint()
    val sizes = exploded.groupBy("doc_id").agg(count(lit(1)).as("n_d1"))
    val hot = exploded.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq).select("s")
    val filtered = exploded.join(hot, Seq("s"), "left_anti")
    val thresholdE6 = math.round(threshold * 1000000)
    filtered.as("a")
      .join(filtered.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.withColumnRenamed("doc_id", "d1"), "d1")
      .withColumn("containment_e6",
        expr("n_common * 1000000 div n_d1"))
      .filter(col("containment_e6") >= thresholdE6)
      .select(col("d1"), col("d2"), col("n_common"), col("n_d1"),
        col("containment_e6"))
      .orderBy("d1", "d2")
  }

  /** DuckDB oracle for [[containmentPairs]] (3-grams, 0.8, cap 50). */
  def containmentOracleSql: String =
    """WITH sh AS (
         SELECT doc_id, list_distinct(list_transform(
           range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 2, 0) + 1),
           i -> array_to_string(string_split_regex(lower(trim(text)), '\s+')[i:i+2], ' '))) AS shingles
         FROM documents),
       ex AS (SELECT doc_id, s
              FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
              QUALIFY count(*) OVER (PARTITION BY s) <= 50),
       sizes AS (SELECT doc_id, len(shingles) AS n_d1 FROM sh),
       inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
                   CAST(count(*) AS BIGINT) AS n_common
                 FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id != b.doc_id
                 GROUP BY 1, 2)
     SELECT d1, d2, n_common, CAST(sizes.n_d1 AS BIGINT) AS n_d1,
       n_common * 1000000 // sizes.n_d1 AS containment_e6
     FROM inter JOIN sizes ON d1 = sizes.doc_id
     WHERE n_common * 1000000 // sizes.n_d1 >= 800000
     ORDER BY d1, d2"""

  /** Winnow-fingerprint near-dup pairs — the MOSS shape: docs sharing
    * >= `minShared` winnowed fingerprints ([[TextAnalysis.winnowFps]]:
    * per-window minima of rolling k-gram hashes). The point versus
    * [[ngramJaccardPairs]] is COMPRESSION before the join: winnowing
    * keeps ~2/(window+1) of the gram stream (guaranteeing any shared
    * run of >= window+k-1 tokens still collides), so the inverted
    * index this operator shuffles is a fraction of the full shingle
    * index at identical detection power for long overlaps. Same
    * at-scale guards as q23: the fingerprint table materializes once
    * (it feeds the hot-set aggregate and both self-join sides) and a
    * hot-fingerprint cap drops boilerplate runs shared by more than
    * `maxDocFreq` docs via an agg + anti-join, never a full-index
    * window sort. */
  def winnowPairs(docs: DataFrame, k: Int = 5, window: Int = 4,
                  minShared: Long = 2L, maxDocFreq: Long = 50L): DataFrame = {
    val fps = TextAnalysis.winnowFps(docs, k, window)
      .distinct()
      .localCheckpoint()
    val hot = fps.groupBy("fp").agg(count(lit(1)).as("dfq"))
      .filter(col("dfq") > maxDocFreq).select("fp")
    val idx = fps.join(hot, Seq("fp"), "left_anti")
    idx.as("a")
      .join(idx.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("doc_a", "doc_b")
  }

  /** Benchmark decontamination: per corpus doc, the n-gram overlap
    * against a benchmark/eval set — the standard pre-training hygiene
    * step (training data sharing >= `minOverlap` shingles with an eval
    * doc leaks the benchmark). Same inverted-index shape as
    * [[ngramJaccardPairs]], but the join fans out per shingle only to
    * the BENCHMARK docs containing it, so candidate volume is bounded
    * by |benchmark| (small by definition) regardless of corpus size —
    * no frequency cap needed. Returns one row per corpus doc with any
    * shared shingle: (doc_id, max_overlap with a single bench doc,
    * n_contaminating bench docs at >= minOverlap). */
  def benchmarkOverlap(docs: DataFrame, benchSource: String, n: Int,
                       minOverlap: Long): DataFrame = {
    graft.functions.TextExpressionFunctions.register(docs.sparkSession)
    val sh = Partitioning.spread(docs)
      .select(col("doc_id"), col("source"),
        explode(wordShinglesFast(tokens(col("text")), n)).as("s"))
    val bench = sh.filter(col("source") === benchSource)
      .select(col("s"), col("doc_id").as("bench_id"))
    val corpus = sh.filter(col("source") =!= benchSource)
      .select(col("doc_id"), col("s"))
    corpus.join(bench, "s")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("c")) // shingles are distinct per doc: c = |∩|
      .groupBy("doc_id")
      .agg(max(col("c")).as("max_overlap"),
        sum(when(col("c") >= minOverlap, 1L).otherwise(0L))
          .as("n_contaminating"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------------
  // MinHash + LSH
  // ---------------------------------------------------------------------------

  /** Per-doc MinHash signatures via explode + codegen'd min-aggregates.
    *
    * Each shingle is hashed once (string hash), then the `numHashes`
    * permutations are seeded hashes OF THAT LONG computed inside a hash
    * aggregate — whole-stage codegen, map-side partial min, one shuffle
    * on doc_id. The tempting higher-order-function formulation
    * (transform over a signature sequence with a nested transform over
    * shingles) is ~100x slower: HOF lambdas are interpreted per
    * element, so 64 perms x shingles x rows all pay interpreter
    * overhead. Returns (doc_id, sig ARRAY<BIGINT>); docs with zero
    * shingles drop out (they cannot collide anyway). */
  def minHashSignatures(docsWithShingles: DataFrame, numHashes: Int,
                        portable: Boolean = false): DataFrame = {
    import graft.functions.TextFunctions.MinHashParams.{M, a, b}
    val ex = docsWithShingles
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .select(col("doc_id"),
        (if (portable) portableHash60(col("s")) % M
         else xxhash64(col("s"))).as("h"))
    if (portable) {
      // Universal-hash permutations as composed min-aggregates: every
      // arithmetic step must be expressible in the oracle SQL, so the
      // custom aggregate below is not usable here.
      val aggs = (0 until numHashes).map { i =>
        min((lit(a(i)) * col("h") + lit(b(i))) % lit(M)).as(s"m$i")
      }
      ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
        .select(col("doc_id"),
          array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
    } else {
      // At-scale path: one TypedImperativeAggregate sketch buffer
      // instead of numHashes separate min() aggregates (bit-identical
      // output, constant-size generated class — see MinHashSigAgg).
      graft.functions.SketchFunctions.register(docsWithShingles.sparkSession)
      ex.groupBy("doc_id")
        .agg(graft.functions.SketchFunctions
          .minHashSig(col("h"), numHashes).as("sig"))
    }
  }

  /** Candidate near-dup pairs via banded LSH over MinHash signatures,
    * verified with the signature-estimated Jaccard.
    *
    * bands×rowsPerBand = numHashes; docs collide when any band matches.
    * One shuffle on (band index, band hash) — bucket join, never n².
    * Output: (d1, d2, est = matching-minhash fraction in millionths). */
  def minHashLshPairs(docs: DataFrame, n: Int, numHashes: Int, bands: Int,
                      threshold: Double, portable: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // Spread CPU-bound sketching across all cores (widen-only — see
    // Partitioning.spread for why a wide input must not be touched).
    graft.functions.TextExpressionFunctions.register(docs.sparkSession)
    val spread = Partitioning.spread(docs)
    // The signature table feeds FOUR plan branches: both sides of the
    // band self-join plus the two broadcast re-attach joins (which have
    // DIFFERENT projections, so ReuseExchange cannot deduplicate them —
    // relying on it re-ran the shingle build + 64-way min aggregate up
    // to 4x, the measured source of this query's run-to-run
    // instability). The table itself is tiny (docs x numHashes longs);
    // materialize it once. At cluster scale this is the persisted
    // signature index.
    val sig = minHashSignatures(
      spread.select(col("doc_id"),
        wordShinglesFast(tokens(col("text")), n).as("shingles")),
      numHashes, portable).localCheckpoint()
    // Band bucket key: hashed to a long by default (compact shuffle
    // key); the portable configuration keeps the raw comma-joined
    // string so the oracle SQL can form the identical key.
    val bandStructs = (0 until bands).map { b =>
      val joined = concat_ws(",", transform(
        slice(col("sig"), b * r + 1, r), _.cast("string")))
      struct(lit(b).as("band"),
        (if (portable) joined else xxhash64(joined)).as("bucket"))
    }
    // The band join and pair-dedup shuffle ONLY (doc, band, bucket) —
    // never the signature arrays (carrying two 64-element arrays per
    // candidate row made the shuffle payload the dominant, unstable
    // cost). Signatures re-attach afterwards via broadcast: the
    // signature table is docs-sized, tiny relative to candidates.
    val banded = sig.select(col("doc_id"),
      explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val candPairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .dropDuplicates("d1", "d2")
    candPairs
      .join(broadcast(sig.select(col("doc_id").as("d1"),
        col("sig").as("sig1"))), "d1")
      .join(broadcast(sig.select(col("doc_id").as("d2"),
        col("sig").as("sig2"))), "d2")
      .withColumn("est",
        aggregate(zip_with(col("sig1"), col("sig2"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v)
          * lit(1.0) / lit(numHashes))
      .filter(col("est") >= threshold)
      .select(col("d1"), col("d2"),
        (round(col("est"), 6) * 1000000).cast("long").as("est_jac"))
      .orderBy("d1", "d2")
  }

  /** q65: INCREMENTAL dedup — dedup a NEW batch of documents against
    * an EXISTING corpus, the shape production pipelines actually run
    * (daily ingestion never re-pairs the whole corpus with itself).
    * Same MinHash/band machinery as [[minHashLshPairs]], but the band
    * join is asymmetric: new-batch bands probe the corpus band index,
    * so the work scales with |batch| × collision rate, not |corpus|².
    * In production `corpus`'s signature/band table is the PERSISTED
    * index (built once, appended per batch — here it is recomputed
    * because the driver harness is stateless). Join sides: the
    * new-batch signatures re-attach by broadcast (a daily batch is
    * small); the corpus-side signature re-attach stays an unhinted
    * keyed join for AQE to plan — the index is corpus-sized and must
    * never broadcast.
    *
    * Output, one row per new doc: `dup_of` (lowest-id corpus match at
    * est-Jaccard >= threshold, or itself when clean), `est_jac` (best
    * matching estimate, millionths), `is_dup`. */
  def incrementalDedup(newDocs: DataFrame, corpus: DataFrame, n: Int,
                       numHashes: Int, bands: Int, threshold: Double,
                       portable: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    graft.functions.TextExpressionFunctions.register(newDocs.sparkSession)
    def sigs(d: DataFrame) = minHashSignatures(
      Partitioning.spread(d).select(col("doc_id"),
        wordShinglesFast(tokens(col("text")), n).as("shingles")),
      numHashes, portable).localCheckpoint()
    val newSig = sigs(newDocs)
    val corpSig = sigs(corpus)
    def banded(sig: DataFrame) = {
      val bandStructs = (0 until bands).map { b =>
        val joined = concat_ws(",", transform(
          slice(col("sig"), b * r + 1, r), _.cast("string")))
        struct(lit(b).as("band"),
          (if (portable) joined else xxhash64(joined)).as("bucket"))
      }
      sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
        .select(col("doc_id"),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    }
    val cand = banded(newSig).as("a")
      .join(banded(corpSig).as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("corp_id"))
      .dropDuplicates("doc_id", "corp_id")
    val verified = cand
      .join(broadcast(newSig.select(col("doc_id"), col("sig").as("sig1"))),
        "doc_id")
      .join(corpSig.select(col("doc_id").as("corp_id"),
        col("sig").as("sig2")), "corp_id")
      .withColumn("est",
        aggregate(zip_with(col("sig1"), col("sig2"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v) * lit(1.0) / lit(numHashes))
      .filter(col("est") >= threshold)
      .groupBy("doc_id")
      .agg(min(col("corp_id")).as("matched"),
        (round(max(col("est")), 6) * 1000000).cast("long").as("best_est"))
    newDocs.select(col("doc_id"))
      .join(verified, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("matched"), col("doc_id")).as("dup_of"),
        coalesce(col("best_est"), lit(0L)).as("est_jac"),
        col("matched").isNotNull.cast("long").as("is_dup"))
      .orderBy("doc_id")
  }

  /** LSH band calibration for [[minHashLshPairs]]: with `b` bands of
    * `r` rows, a pair of true Jaccard `s` becomes a candidate with
    * probability 1 - (1 - s^r)^b — an S-curve whose inflection sits
    * near (1/b)^(1/r). Picking bands is the recall/cost contract: more
    * bands catch lower similarities but fan out more candidate pairs.
    * At 100 TB this one knob decides whether the band join produces
    * millions or trillions of candidates. */
  object MinHashTuning {

    /** P(pair becomes a candidate | true Jaccard = s). */
    def collisionProbability(s: Double, bands: Int, rowsPerBand: Int): Double =
      1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands)

    /** The similarity at the S-curve inflection for a configuration. */
    def curveThreshold(bands: Int, rowsPerBand: Int): Double =
      math.pow(1.0 / bands, 1.0 / rowsPerBand)

    /** The band count (a divisor of `numHashes`) whose S-curve
      * inflection lands closest to the requested threshold. */
    def bandsFor(numHashes: Int, threshold: Double): Int =
      (1 to numHashes).filter(numHashes % _ == 0)
        .minBy(b => math.abs(curveThreshold(b, numHashes / b) - threshold))
  }

  // ---------------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------------

  /** 64-bit SimHash from a materialized token-hash array: one aggregate
    * pass carries a 64-slot vote vector (zip_with against a literal
    * powers-of-two array; bit-test via bitwiseAND, so no per-bit
    * re-iteration of the tokens), then votes fold into the packed
    * sketch. `hashCol` must be a plain column reference — HOFs are
    * interpreted, so an inline expression would be re-evaluated per
    * vote slot. Distinct power bits sum without carries, so the final
    * addition is exactly bitwise OR (bit 63 = Long.MinValue included). */
  def simHash(hashCol: Column): Column = {
    val powers = array((0 until 64).map(b => lit(1L << b)): _*)
    val zeros = transform(sequence(lit(0), lit(63)), _ => lit(0L))
    val votes = aggregate(hashCol, zeros,
      (acc, h) => zip_with(acc, powers,
        (a, p) => a + when(h.bitwiseAND(p) =!= 0, 1L).otherwise(-1L)))
    aggregate(zip_with(votes, powers,
      (v, p) => when(v > 0, p).otherwise(lit(0L))),
      lit(0L), (s, x) => s + x)
  }

  /** Per-doc 64-bit SimHash via explode + 64 codegen'd conditional
    * sums — the distributed formulation of [[simHash]]: each exploded
    * token hash votes +1/-1 per bit inside a whole-stage-codegen hash
    * aggregate (map-side partial, one shuffle on doc_id). The HOF
    * formulation carries a 64-slot vote array through interpreted
    * lambdas per token — measured ~5x slower and the source of this
    * query's bench variance. Identical output bit-for-bit. */
  def simHashSignatures(docs: DataFrame, portable: Boolean = false): DataFrame = {
    val bits = if (portable) 60 else 64
    val ex = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"),
        (if (portable) portableHash60(col("t")) else xxhash64(col("t"))).as("h"))
    val votes = (0 until bits).map(b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0, 1L).otherwise(-1L))
        .as(s"v$b"))
    ex.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("sig"))
  }

  /** Near-dup pairs by SimHash hamming distance <= maxHamming.
    * Candidate generation: split the 64-bit sketch into `maxHamming+1`
    * 16-bit chunks — by pigeonhole, any pair within hamming<=maxHamming
    * shares at least one exact chunk (maxHamming <= 3). Bucket-join on
    * (chunk index, chunk value), then verify with bit_count(xor). */
  def simHashPairs(docs: DataFrame, maxHamming: Int,
                   portable: Boolean = false): DataFrame = {
    require(maxHamming <= 3, "chunk scheme covers hamming <= 3")
    val spread = Partitioning.spread(docs)
    // Materialized once (docs x 1 long): feeds both self-join sides.
    val sigs = simHashSignatures(spread, portable).localCheckpoint()
    // 4 pigeonhole chunks: 16 bits each over the 64-bit sketch, 15
    // bits each over the 60-bit portable sketch.
    val chunkBits = if (portable) 15 else 16
    val chunkMask = (1L << chunkBits) - 1
    val chunkStructs = (0 until 4).map { i =>
      struct(lit(i).as("ci"),
        shiftright(col("sig"), i * chunkBits).bitwiseAND(chunkMask).as("cv"))
    }
    val chunked = sigs.select(col("doc_id"), col("sig"),
      explode(array(chunkStructs: _*)).as("ch"))
      .select(col("doc_id"), col("sig"),
        col("ch.ci").as("ci"), col("ch.cv").as("cv"))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.sig").as("s1"), col("b.sig").as("s2"))
      .dropDuplicates("d1", "d2")
      .withColumn("hamming",
        bit_count(col("s1").bitwiseXOR(col("s2"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("d1", "d2", "hamming")
      .orderBy("d1", "d2")
  }

  // ---------------------------------------------------------------------------
  // Embedding cosine near-dup
  // ---------------------------------------------------------------------------

  /** Pairs of embeddings with cosine similarity >= threshold, via
    * hyperplane-LSH bucketing (see [[Similarity.hyperplaneBucket]]) then
    * exact verification inside buckets. */
  def embeddingNearDupPairs(embeddings: DataFrame, planes: Int,
                            threshold: Double): DataFrame = {
    graft.functions.VectorFunctions.register(embeddings.sparkSession)
    // Norms computed once per vector, not once per candidate pair —
    // cuts 2/3 of the per-pair arithmetic in dense buckets.
    val b = Partitioning.spread(embeddings)
      .select(col("vec_id"), col("embedding"),
        Similarity.hyperplaneBucket(col("embedding"), planes).as("bucket"),
        Similarity.norm(col("embedding")).as("nrm"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        (Similarity.dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("v1"), col("v2"),
        (round(col("cos"), 6) * 1000000).cast("long").as("sim"))
      .orderBy("v1", "v2")
  }

  // ---------------------------------------------------------------------------
  // Edit-distance near-dup (blocked record linkage)
  // ---------------------------------------------------------------------------

  /** q62: edit-distance near-duplicates via prefix blocking — the
    * classic record-linkage shape: block on the first `prefixTokens`
    * (lowercased) tokens, then verify candidate pairs with Levenshtein
    * distance over the first `prefixChars` characters. Edit distance
    * catches small in-place edits (typos, number substitutions) that
    * set-based Jaccard treats as identical-weight token swaps.
    *
    * Scale posture mirrors q23: pairs exist only within a block, and a
    * `maxBlockFreq` cap drops degenerate hot blocks (a boilerplate
    * prefix shared by millions of docs would otherwise go quadratic)
    * via an aggregate + anti-join, not a full-index window. The
    * Levenshtein verify is O(prefixChars^2) per candidate — bounded by
    * the cap, scan-parallel. Restricted to one language: both engines
    * count edits in Unicode codepoints, but cross-script text makes
    * the fixed `maxDist` threshold meaningless, not the arithmetic. */
  def editBlockedPairs(docs: DataFrame, lang: String = "en",
                       prefixTokens: Int = 3, prefixChars: Int = 80,
                       maxDist: Int = 16,
                       maxBlockFreq: Int = 50): DataFrame = {
    // blocking keys are read by the hot-block aggregate and both
    // self-join sides — tokenize/slice the corpus once, not four times
    val base = Partitioning.spread(docs)
      .filter(col("lang") === lang)
      .select(col("doc_id"),
        substring(col("text"), 1, prefixChars).as("head"),
        concat_ws(" ", slice(tokens(col("text")), 1, prefixTokens)).as("blk"))
      .localCheckpoint()
    val hot = base.groupBy("blk").agg(count(lit(1)).as("bc"))
      .filter(col("bc") > maxBlockFreq)
    val blocked = base.join(hot, Seq("blk"), "left_anti")
    blocked.as("a").join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        levenshtein(col("a.head"), col("b.head")).cast("long").as("lev"))
      .filter(col("lev") <= maxDist)
      .orderBy("d1", "d2")
  }

  /** DuckDB oracle for [[editBlockedPairs]] — same blocking key, same
    * cap (as a QUALIFY window), same verify threshold. */
  def editBlockedOracleSql(lang: String = "en", prefixTokens: Int = 3,
                           prefixChars: Int = 80, maxDist: Int = 16,
                           maxBlockFreq: Int = 50): String =
    s"""WITH p AS (SELECT doc_id, substr(text, 1, $prefixChars) AS head,
           array_to_string(list_slice(
             string_split_regex(trim(lower(text)), '\\s+'), 1, $prefixTokens),
             ' ') AS blk
         FROM documents WHERE lang = '$lang'),
       f AS (SELECT * FROM p
             QUALIFY count(*) OVER (PARTITION BY blk) <= $maxBlockFreq)
     SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(levenshtein(a.head, b.head) AS BIGINT) AS lev
     FROM f a JOIN f b ON a.blk = b.blk AND a.doc_id < b.doc_id
     WHERE levenshtein(a.head, b.head) <= $maxDist
     ORDER BY d1, d2"""

  /** q202 window width (each doc pairs with its `SnWindow - 1`
    * successors in sort order) and Jaccard floor. */
  val SnWindow = 3
  val SnThresholdE6 = 600000L

  /** q202: SORTED-NEIGHBORHOOD near-dup pairs — the third blocking
    * family beside the inverted index (q23) and LSH (q24/q25):
    * Hernández & Stolfo's method sorts the corpus by a discriminating
    * key (here the normalized text, per language) and compares each
    * record only with its w−1 successors — near-identical texts
    * collate adjacently, so candidate volume is LINEAR (w−1 pairs per
    * doc) regardless of cluster structure, the property that makes
    * the method attractive when hot shingles would flood an index.
    * Pairs are scored by distinct-token Jaccard (e6 floor) and kept
    * above [[SnThresholdE6]].
    *
    * Scale shape: the rank is a per-language keyed window (at 100 TB
    * the same total order comes from repartitionByRange + the blocked
    * rank idiom); successor pairing is an equi-join on (lang, rank +
    * offset) — consecutive ranks co-partition, so the join is local
    * after one keyed shuffle; the offset fan-out is w−1 = 2 rows per
    * doc, not a cross product. */
  def sortedNeighborhoodPairs(docs: DataFrame,
                              window: Int = SnWindow,
                              thresholdE6: Long = SnThresholdE6): DataFrame = {
    graft.functions.TextExpressionFunctions.register(docs.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val byNorm = Window.partitionBy("lang")
      .orderBy(col("norm").asc, col("doc_id").asc)
    // token sets SORTED once per doc so the window-pair verification
    // below runs the allocation-free merge-scan intersect (token
    // order is observable nowhere else — only sizes and overlap)
    val ranked = docs
      .select(col("lang"), col("doc_id"),
        lower(trim(col("text"))).as("norm"),
        sort_array(array_distinct(tokens(col("text")))).as("toks"))
      .withColumn("rn", row_number().over(byNorm))
      // the rank feeds both sides of the successor join
      .localCheckpoint()
    val left = ranked.select(col("lang"), col("rn"),
      col("doc_id").as("d1"), col("toks").as("t1"))
      .withColumn("k",
        explode(array((1 until window).map(lit(_)): _*)))
      .withColumn("rn2", col("rn") + col("k"))
    val right = ranked.select(col("lang"), col("rn").as("rn2"),
      col("doc_id").as("d2"), col("toks").as("t2"))
    left.join(right, Seq("lang", "rn2"))
      .withColumn("inter",
        graft.functions.TextExpressionFunctions
          .intersectSizeSorted(col("t1"), col("t2")))
      .withColumn("uni",
        size(col("t1")) + size(col("t2")) - col("inter"))
      .withColumn("jac_e6",
        expr("CAST(inter * 1000000 div greatest(uni, 1) AS BIGINT)"))
      .filter(col("jac_e6") >= thresholdE6)
      .select(least(col("d1"), col("d2")).as("d1"),
        greatest(col("d1"), col("d2")).as("d2"), col("jac_e6"))
      .orderBy("d1", "d2")
  }

  /** DuckDB oracle for [[sortedNeighborhoodPairs]]. */
  def sortedNeighborhoodOracleSql(window: Int = SnWindow,
      thresholdE6: Long = SnThresholdE6): String = {
    val offs = (1 until window).mkString(", ")
    s"""WITH r AS (SELECT lang, doc_id, lower(trim(text)) AS norm,
           list_distinct(string_split_regex(trim(lower(text)), '\\s+'))
             AS toks
         FROM documents),
       rk AS (SELECT lang, doc_id, toks,
           row_number() OVER (PARTITION BY lang ORDER BY norm, doc_id)
             AS rn
         FROM r),
       p AS (SELECT a.doc_id AS da, b.doc_id AS db,
           CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
           CAST(len(a.toks) + len(b.toks)
             - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS uni
         FROM rk a JOIN rk b
           ON a.lang = b.lang AND b.rn - a.rn IN ($offs))
     SELECT least(da, db) AS d1, greatest(da, db) AS d2,
       CAST(inter * 1000000 // greatest(uni, 1) AS BIGINT) AS jac_e6
     FROM p WHERE inter * 1000000 // greatest(uni, 1) >= $thresholdE6
     ORDER BY d1, d2"""
  }

  /** q225 Jaccard floor (matches q23's, so the two algorithms answer
    * the same question through different machinery). */
  val PpThresholdE6 = 600000L

  /** q225: PREFIX-FILTERED set-similarity join (the PPJoin family,
    * Chaudhuri-Ganti-Kaushik 2006 / Xiao et al. 2008, prefix filter
    * only) — the FOURTH blocking family, and the only one that is
    * provably LOSSLESS: order every document's shingles by a global
    * (df asc, shingle) total order and keep only the first
    * n − ⌈t·n⌉ + 1 as its prefix; any pair with Jaccard ≥ t must
    * share a prefix shingle, so the candidate set generated from
    * prefix postings contains every qualifying pair. The oracle for
    * this query is therefore the UNCAPPED exact threshold join
    * computed the straightforward way — the hash-match certifies the
    * losslessness theorem on real data, not just the plumbing
    * (contrast q23, whose df-cap trades exactness for hot-shingle
    * safety, and q24, whose banding is probabilistic).
    *
    * Scale shape: document frequencies are one token-keyed
    * aggregation; prefix selection is a doc-keyed window (rank within
    * the doc's own shingles — never a global rank, so no vocab-sized
    * sort); candidate generation joins prefix postings on the
    * shingle, and rare-first ordering makes prefix postings hit the
    * LOW-df end of the vocabulary — the algorithm's own skew guard
    * (hot shingles land at the back of every prefix and rarely
    * qualify). Two further LOSSLESS prunes run AT the candidate join
    * (both from Xiao et al.'s PPJoin, both provable from the same
    * global order, both certified by the uncapped oracle): the LENGTH
    * filter (Jaccard ≥ t forces t·|x| ≤ |y|) and the POSITIONAL
    * filter (a prefix match at positions (p₁, p₂) bounds the overlap
    * by min(|x|−p₁, |y|−p₂)+1, which must reach the equivalent
    * overlap ⌈t/(1+t)·(|x|+|y|)⌉) — on a low-diversity vocabulary
    * these cut the candidate set by orders of magnitude (measured
    * 300k → thousands on the 5k-doc fixture). Verification attaches
    * the two shingle arrays to the surviving candidate-pair frame by
    * doc-id equi-joins and evaluates exact Jaccard per pair —
    * pair-sized work, never all-pairs. */
  def ppjoinPairs(docs: DataFrame, n: Int = 3,
      thresholdE6: Long = PpThresholdE6): DataFrame = {
    graft.functions.TextExpressionFunctions.register(docs.sparkSession)
    import org.apache.spark.sql.expressions.Window
    // shingle table feeds postings, sizes, and both verify sides.
    // SORTED once per doc: verification then counts each candidate
    // pair's overlap with an allocation-free merge scan
    // (intersectSizeSorted) instead of a per-pair hash set — shingle
    // order is otherwise observable nowhere (postings explode it,
    // sizes ignore it).
    val sh = Partitioning.spread(docs)
      .select(col("doc_id"),
        sort_array(wordShinglesFast(tokens(col("text")), n))
          .as("shingles"))
      .filter(size(col("shingles")) > 0)
      .localCheckpoint()
    val post = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
    val dfreq = post.groupBy("s").agg(count(lit(1)).as("df"))
    // prefix size: n_d - ceil(t * n_d) + 1, all integer
    // (ceil(a*t_e6/1e6) = (a*t_e6 + 999999) div 1e6)
    val byDoc = Window.partitionBy("doc_id")
      .orderBy(col("df").asc, col("s").asc)
    val prefix = post.join(dfreq, Seq("s"))
      .withColumn("rn", row_number().over(byDoc).cast("long"))
      .join(sh.select(col("doc_id"),
        size(col("shingles")).cast("long").as("nd")), Seq("doc_id"))
      .filter(col("rn") <=
        col("nd") - expr(s"(nd * $thresholdE6 + 999999) div 1000000")
          + lit(1L))
      .select(col("doc_id"), col("s"), col("rn"), col("nd"))
    // required overlap o = ceil(t/(1+t) * (n1+n2)), integer form
    val oReq = s"(($thresholdE6 * (a.nd + b.nd)) + ${1000000L + thresholdE6} - 1) " +
      s"div ${1000000L + thresholdE6}"
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          // length filter: t|x| <= |y| in both directions
          col("b.nd") * lit(1000000L) >= col("a.nd") * lit(thresholdE6) &&
          col("a.nd") * lit(1000000L) >= col("b.nd") * lit(thresholdE6) &&
          // positional filter: best-possible overlap from here on
          // must still reach the equivalent-overlap requirement
          least(col("a.nd") - col("a.rn"), col("b.nd") - col("b.rn"))
            + lit(1L) >= expr(oReq))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("d1"), col("shingles").as("s1")),
        Seq("d1"))
      .join(sh.select(col("doc_id").as("d2"), col("shingles").as("s2")),
        Seq("d2"))
      .withColumn("inter",
        graft.functions.TextExpressionFunctions
          .intersectSizeSorted(col("s1"), col("s2")))
      .withColumn("uni",
        size(col("s1")).cast("long") + size(col("s2")) - col("inter"))
      .withColumn("jac_e6", expr("inter * 1000000 div greatest(uni, 1)"))
      .filter(col("jac_e6") >= thresholdE6)
      .select(col("d1"), col("d2"), col("jac_e6"))
      .orderBy("d1", "d2")
  }

  /** DuckDB oracle for [[ppjoinPairs]] — the UNCAPPED exact
    * threshold join (semantics, not algorithm): equality certifies
    * prefix filtering loses nothing. */
  def ppjoinOracleSql(n: Int = 3,
      thresholdE6: Long = PpThresholdE6): String =
    s"""WITH sh AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(string_split_regex(lower(trim(text)), '\\s+')) - ${n - 1}, 0) + 1),
             i -> array_to_string(string_split_regex(lower(trim(text)), '\\s+')[i:i+${n - 1}], ' '))) AS shingles
           FROM documents),
       sz AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS nd
              FROM sh WHERE len(shingles) > 0),
       ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
             CAST(count(*) AS BIGINT) AS c
           FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
       p AS (SELECT d1, d2, c, s1.nd AS n1, s2.nd AS n2
             FROM inter JOIN sz s1 ON d1 = s1.doc_id
             JOIN sz s2 ON d2 = s2.doc_id)
     SELECT d1, d2,
       CAST(c * 1000000 // greatest(n1 + n2 - c, 1) AS BIGINT) AS jac_e6
     FROM p WHERE c * 1000000 // greatest(n1 + n2 - c, 1) >= $thresholdE6
     ORDER BY d1, d2"""
}
