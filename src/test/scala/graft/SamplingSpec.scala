package graft

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("balanced sample: min stratum kept whole, others downsampled " +
    "deterministically") {
    val docs = ((1 to 90).map(i => (i.toLong, s"doc number $i words", "en"))
      ++ (91 to 100).map(i => (i.toLong, s"doc number $i words", "fr")))
      .toDF("doc_id", "text", "lang")
    val r1 = Sampling.balancedSample(docs).collect()
    val kept = r1.filter(_.getInt(3) == 1)
    val byLang = kept.groupBy(_.getString(1)).map { case (l, rs) => l -> rs.length }
    // fr is the min stratum (10 docs): threshold 0xffffffff keeps all
    // (up to the single excluded hash value, absent here)
    assert(byLang("fr") == 10)
    // en is downsampled: strictly fewer than its 90, more than none
    assert(byLang.getOrElse("en", 0) > 0 && byLang("en") < 90)
    // pure function of content: a second run is byte-identical
    val r2 = Sampling.balancedSample(docs).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
  }

  test("quota manifest: budget spent exactly, ranks are 1..quota " +
    "prefixes, apportionment is largest-remainder") {
    // masses 676 / 100 / 49 -> w = 26 / 10 / 7, W = 43, budget 100:
    // exact shares 60.465 / 23.256 / 16.279 -> bases 60/23/16
    // (sum 99), one leftover seat to the largest remainder numerator:
    // rem_num = 100w - base*43 -> 20 / 11 / 12 -> srcA gets it: 61.
    def doc(id: Long, src: String, n: Int) =
      (id, Seq.fill(n)("tok").mkString(" "), src)
    val docs = (
      (1 to 169).map(i => doc(i.toLong, "srcA", 4))          // 169*4 = 676
        ++ (170 to 219).map(i => doc(i.toLong, "srcB", 2))   // 50*2 = 100
        ++ (220 to 268).map(i => doc(i.toLong, "srcC", 1))) // 49*1 = 49
      .toDF("doc_id", "text", "source")
    val rep = Sampling.quotaManifest(docs).collect()
    assert(rep.length == Sampling.Budget,
      s"manifest must spend the whole budget, got ${rep.length}")
    val bySrc = rep.groupBy(_.getString(1))
    assert(bySrc.view.mapValues(_.length).toMap ==
      Map("srcA" -> 61, "srcB" -> 23, "srcC" -> 16))
    bySrc.foreach { case (src, rows) =>
      assert(rows.head.getLong(3) == rows.length)
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to rows.length),
        s"$src: pick ranks must be the exact 1..quota prefix")
    }
  }

  test("balanced sample: keep decision depends only on text and stratum") {
    // same text in both runs -> same h8 -> same verdict even when the
    // rest of the corpus changes (the re-runnability property)
    val a = Sampling.balancedSample(
      Seq((1L, "alpha beta", "en"), (2L, "gamma delta", "en"))
        .toDF("doc_id", "text", "lang")).collect()
    val b = Sampling.balancedSample(
      Seq((1L, "alpha beta", "en"), (3L, "other text", "en"),
        (4L, "more text", "en"))
        .toDF("doc_id", "text", "lang")).collect()
    val h1a = a.find(_.getLong(0) == 1L).get.getString(2)
    val h1b = b.find(_.getLong(0) == 1L).get.getString(2)
    assert(h1a == h1b, "hash draw is content-determined")
  }

  test("priority sample: bottom-K of the exact quotient, weight-biased") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val got = graft.operators.Sampling.prioritySample(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got.size == graft.operators.Sampling.PriorityK)
    // reference: full sort of the same quotient
    val ref = docs.select(col("doc_id"),
        greatest(col("n_chars"), lit(1L)).cast("long").as("w"),
        expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)" +
          " div greatest(n_chars, 1)").as("priority"))
      .orderBy(col("priority").asc, col("doc_id").asc)
      .limit(graft.operators.Sampling.PriorityK)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == ref)
    // the weighting works: sampled docs skew long (mean weight of the
    // sample comfortably above the corpus mean)
    val sampleMeanW = got.map(_._2).sum.toDouble / got.size
    val corpusMeanW = docs.agg(avg(greatest(col("n_chars"), lit(1L))))
      .head.getDouble(0)
    assert(sampleMeanW > corpusMeanW,
      f"weighted sample must skew heavy: $sampleMeanW%.1f vs corpus $corpusMeanW%.1f")
  }
}
