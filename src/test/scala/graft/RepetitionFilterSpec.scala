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

  private def boiler(rows: (Long, String, String)*) =
    RepetitionFilter.boilerplateCoverage(
        rows.toDF("doc_id", "source", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("boilerplate: a gram in 3 of 4 source docs is stripped; " +
    "2-doc overlap and other sources are not") {
    val m = boiler(
      // srcA: "hdr foo" in docs 1-3 (nd=3, 75% of 4 docs) -> boiler
      (1L, "A", "hdr foo a b"),
      (2L, "A", "hdr foo c d"),
      (3L, "A", "x hdr foo e"),
      (4L, "A", "p q r s"),
      // srcB: shared by BOTH docs but nd=2 < BoilerMinDocs -> kept
      (5L, "B", "dup pair x"),
      (6L, "B", "dup pair y"))
    assert(m(1L) == ((4L, 2L, 500000L)))
    assert(m(2L) == ((4L, 2L, 500000L)))
    assert(m(3L) == ((4L, 2L, 500000L)), "mid-doc position covered")
    assert(m(4L) == ((4L, 0L, 0L)))
    assert(m(5L)._2 == 0L && m(6L)._2 == 0L,
      "two docs do not make a template")
  }

  test("boilerplate: the fraction condition bites — 3 docs out of 19 " +
    "is under the 16% line") {
    val fillers = (10L until 26L).map(i =>
      (i, "C", s"u$i v$i w$i z$i"))
    val m = boiler((Seq(
      (7L, "C", "cc dd a1 b1"),
      (8L, "C", "cc dd a2 b2"),
      (9L, "C", "cc dd a3 b3")) ++ fillers): _*)
    // nd=3 passes min-docs but 3/19 = 157894 ppm < 160000 -> excluded
    assert(m.values.forall(_._2 == 0L), s"expected no boilerplate: $m")
  }

  test("boilerplate: overlapping gram hits union their positions") {
    // "m m m": bigram "m m" at offsets 0 and 1 in all 3 docs of the
    // source -> covered positions {0,1,2} = 3 tokens, not 4
    val m = boiler(
      (1L, "D", "m m m q"),
      (2L, "D", "m m m r"),
      (3L, "D", "m m m s"))
    assert(m(1L) == ((4L, 3L, 750000L)))
    assert(m(2L) == ((4L, 3L, 750000L)))
    assert(m(3L) == ((4L, 3L, 750000L)))
  }
}
