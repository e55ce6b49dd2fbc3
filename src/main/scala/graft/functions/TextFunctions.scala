package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the LLM-data-pipeline operators
  * (dedup, language ID, quality scoring, fingerprinting).
  *
  * Everything here is built from codegen'd Spark built-ins and
  * higher-order array functions — no UDFs — so the expressions stay
  * inside whole-stage codegen and push work to the executors at any
  * scale. Where an operator has a DuckDB oracle, the construction is
  * deliberately restricted to functions with identical cross-engine
  * semantics (split/regexp/length/md5/floor).
  */
object TextFunctions {

  /** Whitespace tokens of lowercased, trimmed text. Mirrors DuckDB's
    * `string_split_regex(lower(trim(x)), '\s+')` exactly (both return
    * [""] for empty input — harmless for shingling, which needs >= n). */
  def tokens(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** Raw (case-preserving) whitespace tokens. */
  def rawTokens(c: Column): Column = split(trim(c), "\\s+")

  /** Distinct word n-gram shingles. Guarded so short docs yield an empty
    * array (Spark's `sequence(1,0)` would count DOWN, not return empty). */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Count of non-overlapping regex matches (= DuckDB
    * `len(regexp_extract_all(...))`). */
  def patternCount(c: Column, pattern: String): Column =
    regexp_count(c, lit(pattern)).cast("long")

  /** Occurrences of a literal marker substring, via the length/replace
    * trick — the only substring-count construction with bit-identical
    * semantics in every SQL engine. */
  def markerCount(c: Column, marker: String): Column =
    ((length(c) - length(replace(c, lit(marker), lit("")))) / marker.length)
      .cast("long")

  /** Language marker words. Scores are marker-occurrence counts over
    * ' '-padded text; argmax with a fixed precedence order gives the
    * language ID (n-gram-heuristic langid, reference has none — this is
    * the beyond-parity text-analysis surface). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "fr" -> Seq(" le ", " la ", " et ", " les "),
    "es" -> Seq(" el ", " los ", " que ", " y "),
    "de" -> Seq(" der ", " und ", " die ", " ist "))

  /** Padded text so markers match at string boundaries too. */
  def padded(c: Column): Column = concat_ws("", lit(" "), lower(c), lit(" "))

  def langScore(c: Column, lang: String): Column =
    langMarkers(lang).map(m => markerCount(padded(c), m))
      .reduce(_ + _)

  /** Argmax over language scores with fixed precedence en>fr>es>de. */
  def langId(c: Column): Column = {
    val en = langScore(c, "en"); val fr = langScore(c, "fr")
    val es = langScore(c, "es"); val de = langScore(c, "de")
    when(en >= fr && en >= es && en >= de, "en")
      .when(fr >= es && fr >= de, "fr")
      .when(es >= de, "es")
      .otherwise("de")
  }

  /** Portable 60-bit string hash: the first 15 hex chars of md5 as a
    * BIGINT. Chosen because every SQL engine computes the identical
    * value (`CAST('0x'||substr(md5(s),1,15) AS BIGINT)` in DuckDB), so
    * sketches built on it are exactly oracle-checkable — unlike
    * xxhash64, which is JVM-library-specific. ~10x the cost of
    * xxhash64; the sketch operators default to xxhash64 and take this
    * only in their portable (oracle-checked) configuration. */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** The 60-bit hash in either configuration — [[portableHash60]]
    * (oracle-recomputable) or xxhash64 masked to the same 60-bit
    * domain (the at-scale default). ONE definition of the mask so the
    * sketch families (HLL registers, AGMS grids) cannot drift apart
    * on their hash domain. */
  def hash60(c: Column, portable: Boolean): Column =
    if (portable) portableHash60(c)
    else xxhash64(c).bitwiseAND(lit((1L << 60) - 1))

  /** Universal-hash MinHash permutation family over the prime
    * M = 2^31 - 1: perm_i(h) = (a_i * (h % M) + b_i) % M. All values
    * stay below 2^62, so the arithmetic is exact (and identical) in
    * any engine with 64-bit integers — no overflow, ANSI-safe. The
    * constants are deterministic odd multipliers; shared between the
    * Spark expressions and the generated oracle SQL so both engines
    * evaluate the same family. */
  object MinHashParams {
    val M: Long = 2147483647L // 2^31 - 1, prime
    def a(i: Int): Long = ((i.toLong * 2654435761L + 1013904223L) % (M - 1)) + 1
    def b(i: Int): Long = (i.toLong * 97531L * 65537L + 17L) % M
  }

  /** Canonical normalization for content fingerprinting: lowercase,
    * collapse every non-alphanumeric run to a single space, trim. */
  def normalizeForFingerprint(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Content fingerprint = md5 of the normalized text: robust to case,
    * punctuation and whitespace differences. */
  def fingerprint(c: Column): Column = md5(normalizeForFingerprint(c))

  /** Rolling k-gram hashes over tokens (stage 1 of winnowing). */
  def kgramHashes(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - lit(k - 1)),
        i => xxhash64(concat_ws(" ", slice(toks, i, lit(k))))))
      .otherwise(array().cast("array<bigint>"))

  /** Winnowing selection (stage 2): minimum hash per sliding window.
    * `grams` must be a materialized column (HOFs are interpreted; an
    * inline expression would be re-evaluated per reference). */
  def winnowMin(grams: Column, window: Int): Column =
    when(size(grams) >= window,
      array_distinct(transform(
        sequence(lit(1), size(grams) - lit(window - 1)),
        i => array_min(slice(grams, i, lit(window))))))
      .otherwise(array_distinct(grams))

  /** 64-bit rolling (winnowing-style) fingerprints over a materialized
    * token column — compact near-dup sketch. Spark-only (no SQL twin). */
  def winnowedFingerprints(toks: Column, k: Int, window: Int): Column =
    winnowMin(kgramHashes(toks, k), window)
}
