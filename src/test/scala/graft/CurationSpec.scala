package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation
import graft.sources.Tables

/** Curation operators: stratified sampling, mixing weights, quality
  * quotas — semantic invariants beyond the driver's oracle check. */
class CurationSpec extends SparkSpec {

  test("stratified sample keeps the smallest stratum whole, shrinks the rest") {
    val docs = Tables.documents(spark, sf0001)
    val langCounts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = langCounts.minBy(_._2)._1
    val out = Curation.stratifiedSample(docs)
    val sampled = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate for the smallest stratum is exactly 1e6 => every doc kept
    assert(sampled(minLang) == langCounts(minLang),
      s"min stratum $minLang must be kept whole: $sampled vs $langCounts")
    // every stratum is sampled, none grows
    langCounts.foreach { case (l, n) =>
      assert(sampled.getOrElse(l, 0L) <= n)
      assert(sampled.getOrElse(l, 0L) > 0, s"stratum $l sampled to zero")
    }
    // deterministic: the same rows every run
    val again = Curation.stratifiedSample(docs)
    assert(out.collect().map(_.getLong(0)).toSeq ==
      again.collect().map(_.getLong(0)).toSeq)
  }

  test("mixing weights: shares sum to ~1e6 and weights invert shares") {
    val rows = Curation.mixingWeights(Tables.documents(spark, sf0001))
      .collect()
    assert(rows.length == 5)
    val shares = rows.map(_.getLong(rows.head.fieldIndex("share_e6")))
    // integer floor division: sum within n_langs of 1e6
    assert(shares.sum <= 1000000L && shares.sum > 1000000L - rows.length * 2)
    val byShare = rows.sortBy(_.getLong(rows.head.fieldIndex("share_e6")))
    val weights = byShare.map(_.getLong(rows.head.fieldIndex("weight_e6")))
    // smaller observed share => larger upsampling weight
    assert(weights.zip(weights.tail).forall { case (a, b) => a >= b },
      s"weights must be non-increasing in share: ${weights.toSeq}")
  }

  test("length trim: exact [p5,p95] bounds per language, tails dropped") {
    import spark.implicits._
    val docs = ((1 to 20).map(i =>
        (i.toLong, "en", Seq.fill(i)("w").mkString(" "))) :+
        (100L, "fr", "a b c"))
      .toDF("doc_id", "lang", "text")
    val out = Curation.lengthTrim(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // en: lengths 1..20 -> lo = value at rank ceil(20*.05)=1 -> 1,
    // hi = rank ceil(20*.95)=19 -> 19, so exactly length-20 is dropped
    assert(out("en") == ((20L, 19L, 1L, 19L)), s"en: ${out("en")}")
    // a single-doc stratum keeps its doc (both cutoffs land on it)
    assert(out("fr") == ((1L, 1L, 3L, 3L)), s"fr: ${out("fr")}")
  }

  test("quota select: per-language quota, ranked by score, bounded") {
    val out = Curation.quotaSelect(Tables.documents(spark, sf0001), perLang = 7)
      .collect()
    val byLang = out.groupBy(_.getString(1))
    assert(byLang.size == 5)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length <= 7, s"$lang quota exceeded: ${rows.length}")
      val rns = rows.map(_.getLong(3)).sorted.toSeq
      assert(rns == (1L to rows.length).toSeq, s"$lang ranks not dense: $rns")
      val scoresByRn = rows.sortBy(_.getLong(3)).map(_.getLong(2)).toSeq
      assert(scoresByRn.zip(scoresByRn.tail).forall { case (a, b) => a >= b },
        s"$lang scores must be non-increasing by rank: $scoresByRn")
    }
  }

  test("emd drift: a two-bucket shift scores exactly double a " +
    "one-bucket shift (the distance-sensitivity TVD lacks)") {
    import spark.implicits._
    def corpus(oddWords: Int) = {
      def words(n: Int) = Seq.fill(n)("w").mkString(" ")
      Seq(0L, 1L, 2L, 3L).map(i =>
        (i, if (i % 2 == 0) words(10) else words(oddWords)))
        .toDF("doc_id", "text")
    }
    def emd(oddWords: Int): Long =
      Curation.driftEmdQuery(corpus(oddWords)).collect()
        .map(_.getLong(5)).sum
    // even half at bucket 1; odd half at bucket 3 vs bucket 2
    assert(emd(30) == 2000000L)
    assert(emd(20) == 1000000L)
    // TVD is blind to the distance: q123 scores both shifts equally
    def tvd(oddWords: Int): Long =
      Curation.driftTvdQuery(corpus(oddWords)).collect()
        .map(_.getLong(5)).sum
    assert(tvd(30) == tvd(20))
  }

  test("temperature mix flattens without reordering: rare sources " +
    "gain share, heavy sources lose it, ranking preserved") {
    val out = Curation.temperatureMix(
      graft.sources.Tables.documents(spark, sf0001)).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(4),
        r.getLong(5)))
    assert(out.length > 1)
    val byMass = out.sortBy(_._2)
    // ordering by mass is preserved in the temperature shares
    val temps = byMass.map(_._4)
    assert(temps.zip(temps.tail).forall { case (a, b) => a <= b })
    // the lightest source's share rises, the heaviest's falls
    assert(byMass.head._4 >= byMass.head._3,
      "rare source must gain share under temperature")
    assert(byMass.last._4 <= byMass.last._3,
      "dominant source must lose share under temperature")
  }
}
