package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusStats

/** Corpus-statistics operators: span-aligned duplicate mass and
  * truncated-vocabulary coverage. */
class CorpusStatsSpec extends SparkSpec {

  test("span dedup: planted duplicate spans are found, unique text is clean") {
    import spark.implicits._
    // docs 1 and 2 share their first 8 tokens exactly; doc 3 is unique;
    // doc 4 is too short to produce any span.
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " alpha beta gamma delta epsilon zeta eta theta"),
      (2L, shared + " one two three four five six seven eight"),
      (3L, (21 to 36).map(i => s"u$i").mkString(" ")),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val dir = tmpDir("spandup")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusStats.spanDupQuery(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((2L, 1L, 500000L)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((2L, 1L, 500000L)), s"doc2: ${out(2L)}")
    assert(out(3L) == ((2L, 0L, 0L)), s"doc3: ${out(3L)}")
    assert(out(4L) == ((0L, 0L, 0L)), s"doc4 has no spans: ${out(4L)}")
  }

  test("span dedup: hashed-key config returns identical rows") {
    val a = CorpusStats.spanDupQuery(spark, sf0001, hashedKeys = false)
      .collect().toSeq
    val b = CorpusStats.spanDupQuery(spark, sf0001, hashedKeys = true)
      .collect().toSeq
    assert(a == b)
  }

  test("vocab coverage: OOV mass is the complement of top-K vocab mass") {
    val out = CorpusStats.vocabCoverage(spark, sf0001)
    val rows = out.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (n, oov, e6) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(oov <= n && n > 0)
      assert(e6 == oov * 1000000L / n)
    }
    // the truncated vocab is discriminative on the fixture corpus
    assert(rows.count(_.getLong(2) > 0) > 400)
  }

  test("posting lists: df band enforced, lists sorted and capped") {
    val rows = CorpusStats.postingListsQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      assert(df >= 5L && df <= 50L, s"df out of band: $df")
      val ids = r.getString(2).split(",").map(_.toLong)
      assert(ids.length == math.min(df, 20L))
      assert(ids.sameElements(ids.sorted), s"unsorted postings: ${r.getString(2)}")
    }
  }

  test("vocab coverage: a full-size vocab covers every in-floor token") {
    // vocabSize >= distinct terms -> only sub-minCount terms are OOV
    val full = CorpusStats.vocabCoverage(spark, sf0001, minCount = 1L,
      vocabSize = 100000)
    assert(full.filter(col("n_oov") > 0).count() == 0)
  }

  test("trigram LIKE accelerator: zero false negatives vs a direct " +
    "scan, and candidates carry the full trigram hit count") {
    val out = CorpusStats.trigramLikeQuery(spark, sf0001).collect()
    val nTris = CorpusStats.LikePattern.toLowerCase
      .sliding(3).toSeq.distinct.size
    out.foreach(r => assert(r.getLong(1) == nTris))
    val candidateMatches = out.filter(_.getInt(2) == 1)
      .map(_.getLong(0)).toSet
    // every doc a direct LIKE scan finds must be a verified candidate
    val direct = graft.sources.Tables.documents(spark, sf0001)
      .filter(lower(col("text"))
        .contains(CorpusStats.LikePattern.toLowerCase))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(candidateMatches == direct,
      "index probe + verify must equal the direct scan")
  }

  test("contamination: shared 5-grams flag a test doc, clean and " +
    "short test docs report zero (total function over the split)") {
    import spark.implicits._
    // ids ending in 7 are the test split (ContamTestMod)
    val docs = Seq(
      (1L, "a b c d e f"),          // train: grams "a b c d e", "b c d e f"
      (7L, "a b c d e z"),          // test: 1 of 2 grams in train
      (17L, "p q r s t u"),         // test: clean
      (27L, "short text")           // test: < 5 tokens, 0 grams
    ).toDF("doc_id", "text")
    val out = CorpusStats.contamination(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(out.keySet == Set(7L, 17L, 27L), "only the test split")
    assert(out(7L) == ((2L, 1L, 500000L, 1)), s"doc7: ${out(7L)}")
    assert(out(17L) == ((2L, 0L, 0L, 0)), s"doc17: ${out(17L)}")
    assert(out(27L) == ((0L, 0L, 0L, 0)), s"doc27: ${out(27L)}")
  }

  test("contamination: repeated grams inside one doc count once " +
    "(distinct-shingle semantics on both sides)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),
      // 10 tokens, 6 gram positions but "a b c d e" appears twice ->
      // 5 distinct grams, 1 contaminated
      (7L, "a b c d e a b c d e")).toDF("doc_id", "text")
    val out = CorpusStats.contamination(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toList
    assert(out == List((7L, 5L, 1L, 200000L, 1)), out.toString)
  }

  test("keyness: a term concentrated in one source tops that source") {
    import spark.implicits._
    // source A is about llamas, source B about ledgers; 'the' is
    // common background in both and must not be distinctive anywhere
    val docs = Seq(
      ("A", "the llama llama llama grazes on the hill"),
      ("A", "the llama llama herd naps and the llama hums"),
      ("B", "the ledger ledger ledger balances the account book"),
      ("B", "the ledger ledger audit logs the account entries"))
      .toDF("source", "text")
    val out = graft.operators.CorpusStats.keyness(docs).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toList
    // rank 1 per source is the concentrated term (a >= 5 floor)
    assert(out.filter(_._2 == 1) ==
      List(("A", 1, "llama"), ("B", 1, "ledger")), out.toString)
    // background terms never qualify: over-representation gate
    assert(!out.exists(_._3 == "the"), out.toString)
    // keyness is nonnegative and ranks are contiguous per source
    val ranks = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    assert(ranks.values.forall(rs => rs == (1 to rs.size).toList))
  }
}
