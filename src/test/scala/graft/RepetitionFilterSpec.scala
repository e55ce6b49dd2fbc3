package graft

import graft.operators.RepetitionFilter

class RepetitionFilterSpec extends SparkSpec {
  import spark.implicits._

  private def report(rows: (Long, String)*) =
    RepetitionFilter.repetitionReport(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getInt(5)))
      .toMap

  test("hand-computed shares: clean doc vs repeated-phrase doc") {
    val m = report(
      // 6 words, all distinct: top1 = 1/6, top2 = 1/5, dup3 = 0.
      // NOT kept: at 6 words even a uniform doc has top1 share 1/6 >
      // the 12.5% gate — the thresholds presume real doc lengths
      1L -> "a b c d e f",
      // "x y" * 4: 8 words, top1 = 4/8, top2 "x y" = 4/7,
      // trigrams: x y x | y x y | x y x | y x y | x y x | y x y
      //   -> 6 occurrences, 2 distinct -> dup3 = 4/6
      2L -> "x y x y x y x y")
    assert(m(1L) == ((6L, 166666L, 200000L, 0L, 0)))
    assert(m(2L) == ((8L, 500000L, 571428L, 666666L, 0)))
  }

  test("docs shorter than the gram size are scored, not dropped") {
    val m = report(1L -> "solo", 2L -> "two words")
    // 1 word: no bigrams/trigrams -> zero shares; top1 = 1/1 = 1e6
    assert(m(1L) == ((1L, 1000000L, 0L, 0L, 0)))
    // 2 distinct words: top1 = 1/2, top2 = 1/1, no trigrams
    assert(m(2L) == ((2L, 500000L, 1000000L, 0L, 0)))
  }

  test("whitespace runs and padding do not inflate the token count") {
    val m = report(1L -> "  a   b \t c  ")
    assert(m(1L)._1 == 3L)
  }

  test("shared spans: coverage counts overlapping spans once") {
    // docs 1 and 2 share "a b c d e" (positions 0-4 in both) and
    // doc 1 also shares its shifted window "b c d e f" with doc 3 —
    // doc 1's covered set is positions 0..5 (6 tokens), not 10
    val df = Seq(
      1L -> "a b c d e f x y z w",
      2L -> "a b c d e q r s t u",
      3L -> "p b c d e f g h i j")
      .toDF("doc_id", "text")
    val m = RepetitionFilter.sharedSpanCoverage(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(m(1L) == ((10L, 6L, 600000L)))
    assert(m(2L) == ((10L, 5L, 500000L)))
    assert(m(3L) == ((10L, 5L, 500000L)))
  }

  test("shared spans: doc with no cross-doc span reports zero") {
    val df = Seq(1L -> "a b c d e f", 2L -> "z z z z z z")
      .toDF("doc_id", "text")
    val m = RepetitionFilter.sharedSpanCoverage(df).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m == Map(1L -> 0L, 2L -> 0L))
  }

  test("shared spans: within-doc repeats alone do not count as shared") {
    // "a b c d e" twice in ONE doc: count(DISTINCT doc) = 1, excluded
    val df = Seq(1L -> "a b c d e a b c d e", 2L -> "q r s t u v")
      .toDF("doc_id", "text")
    val m = RepetitionFilter.sharedSpanCoverage(df).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m == Map(1L -> 0L, 2L -> 0L))
  }

  test("keep gate: thresholds separate the sf0.001 corpus non-trivially") {
    val rep = RepetitionFilter.repetitionQuery(spark, sf0001).collect()
    val kept = rep.count(_.getInt(5) == 1)
    assert(kept > 0 && kept < rep.length,
      s"gate should split the corpus, kept=$kept of ${rep.length}")
  }
}
