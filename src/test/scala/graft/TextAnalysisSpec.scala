package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.{Analytics, Multimodal, TextAnalysis}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("wordShingles handles short and empty docs") {
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, "")).toDF("id", "t")
      .select($"id", wordShingles(tokens($"t"), 3).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L) == Seq("a b c", "b c d"))
    assert(m(2L).isEmpty)
    assert(m(3L).isEmpty)
  }

  test("markerCount counts non-overlapping literal occurrences") {
    val df = Seq(Tuple1("x the y the z")).toDF("t")
      .select(markerCount(padded($"t"), " the ").as("n"))
    assert(df.collect().head.getLong(0) == 2)
  }

  test("langId picks marker-dominant language with fixed precedence") {
    val df = Seq(
      (1L, "the cat and the dog of the house is here"),
      (2L, "le chat et la maison et les amis"),
      (3L, "el gato y los perros que viven"),
      (4L, "der hund und die katze ist hier")).toDF("id", "t")
      .select($"id", langId($"t").as("lang"))
    val m = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "en", 2L -> "fr", 3L -> "es", 4L -> "de"))
  }

  test("fingerprint is invariant to case, punctuation and spacing") {
    val df = Seq(("Hello,   World!", "hello world"), ("a-b", "a b"))
      .toDF("x", "y")
      .select((fingerprint($"x") === fingerprint($"y")).as("eq"))
    assert(df.collect().forall(_.getBoolean(0)))
  }

  test("chunking covers every token with the declared stride/overlap") {
    val chunks = TextAnalysis.chunkQuery(spark, sf0001,
      chunkSize = 32, stride = 24).collect()
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select($"doc_id", size(tokens($"text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet, "every doc must chunk")
    byDoc.foreach { case (id, cs) =>
      val n = docs(id)
      val sorted = cs.sortBy(_.getLong(1))
      // chunk ids contiguous from 0
      assert(sorted.map(_.getLong(1)).toSeq == (0L until cs.length))
      // all but last are full; last ends exactly at the token count
      sorted.init.foreach(c => assert(c.getLong(2) == 32L))
      val last = sorted.last
      assert(last.getLong(1) * 24 + last.getLong(2) == n,
        s"doc $id: tail must end at $n")
      // stride coverage: next chunk starts inside the previous one
      if (cs.length > 1) assert(24 < 32)
    }
  }

  test("portable winnow matches array-formulation counts per doc") {
    // Same hash family makes the two formulations directly comparable:
    // rebuild the array formulation on portableHash60 and check equal
    // n_fp per doc against the window formulation.
    val arr = graft.sources.Tables.documents(spark, sf0001)
      .select($"doc_id", tokens($"text").as("toks"))
      .select($"doc_id",
        when(size($"toks") >= 5,
          transform(sequence(lit(1), size($"toks") - lit(4)),
            i => concat_ws(" ", slice($"toks", i, lit(5)))))
          .otherwise(array().cast("array<string>")).as("gs"))
      .select($"doc_id",
        transform($"gs", g => portableHash60(g)).as("grams"))
      .select($"doc_id",
        size(winnowMin($"grams", 4)).cast("long").as("n_fp"))
    val win = TextAnalysis.winnowQueryPortable(spark, sf0001)
    assert(win.exceptAll(arr).union(arr.exceptAll(win)).count() == 0)
    assert(win.count() ==
      graft.sources.Tables.documents(spark, sf0001).count())
  }

  test("iterated BPE merges follow the hand-computed training trace") {
    // vocab: abab freq 2, abac freq 1
    val docs = Seq(Tuple1("abab abab abac")).toDF("text")
    val out = TextAnalysis.bpeMerges(spark, docs, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // r1: (a,b) 2*2+1=5; r2: (ab,ab) 2; r3 tie at 1 -> (a,c) wins the
    // (a ASC) tie-break over (ab,a); r4: (ab,ac) 1
    assert(out.toSeq == Seq(
      (1L, "a", "b", 5L),
      (2L, "ab", "ab", 2L),
      (3L, "a", "c", 1L),
      (4L, "ab", "ac", 1L)), s"got ${out.toSeq}")
  }

  test("BPE re-segmentation merges non-overlapping left-to-right") {
    // 'aaa' must become [aa, a], both pairs of 'abab' must merge
    val docs = Seq(Tuple1("aaa")).toDF("text")
    val one = TextAnalysis.bpeMerges(spark, docs, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(one.toSeq == Seq((1L, "a", "a", 2L), (2L, "aa", "a", 1L)),
      s"got ${one.toSeq}")
  }

  test("BPE segment stats: hand-computed distribution, char mass invariant") {
    // vocab after 2 rounds on 'abab abab abac': abab -> [abab] (1
    // symbol), abac -> [ab, a, c] (3 symbols)
    val docs = Seq(Tuple1("abab abab abac")).toDF("text")
    val out = TextAnalysis.bpeSegmentStats(docs, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 1L, 2L, 8L), (3L, 1L, 1L, 4L)),
      s"got ${out.toSeq}")
    // merging never changes character content: chars_mass across the
    // distribution is invariant in the round count (rounds=0 is the
    // raw character-level segmentation)
    def charsMass(rounds: Int): Long =
      TextAnalysis.bpeSegmentStats(docs, rounds).agg(sum("chars_mass"))
        .collect().head.getLong(0)
    assert(charsMass(0) == charsMass(2) && charsMass(2) == charsMass(5))
    // symbol mass is what compression shrinks, monotonically
    def symMass(rounds: Int): Long =
      TextAnalysis.bpeSegmentStats(docs, rounds)
        .agg(sum(expr("n_symbols * freq_mass"))).collect().head.getLong(0)
    assert(symMass(0) > symMass(1) && symMass(1) > symMass(2))
  }

  test("BPE stops when the vocabulary is fully merged, like the oracle") {
    // 'aaa' exhausts after 2 merges; rounds=5 must emit exactly the 2
    // merge rows (the oracle's empty LIMIT-1 CTEs contribute no rows
    // past exhaustion), not throw on the empty argmax
    val docs = Seq(Tuple1("aaa")).toDF("text")
    val out = TextAnalysis.bpeMerges(spark, docs, rounds = 5).collect()
    assert(out.length == 2, s"expected 2 merge rows, got ${out.length}")
  }

  test("quality and token queries produce full per-doc coverage") {
    val q = TextAnalysis.qualityQuery(spark, sf0001)
    val t = TextAnalysis.tokenCountQuery(spark, sf0001)
    val docs = graft.sources.Tables.documents(spark, sf0001).count()
    assert(q.count() == docs && t.count() == docs)
    assert(q.filter($"n_words" <= 0).count() == 0)
  }

  test("multimodal decode is deterministic and preserves rows") {
    val a = Multimodal.decodeFeatures(spark, sf0001).collect()
    val b = Multimodal.decodeFeatures(spark, sf0001).collect()
    assert(a.length == graft.sources.Tables.documents(spark, sf0001).count())
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq)
    assert(a.forall(r => r.features.length == 8 && r.width >= 64))
  }

  test("multimodal byte slices have requested shape") {
    val s = Multimodal.sampleSlices(spark, sf0001, sliceLen = 16, nSlices = 4)
    val row = s.collect().head
    assert(row.getSeq[Array[Byte]](1).length == 4)
  }

  test("multimodal resize emits bounded deterministic thumbs per doc") {
    val t1 = Multimodal.resizeThumbs(spark, sf0001, 128, 96).collect()
    val t2 = Multimodal.resizeThumbs(spark, sf0001, 128, 96).collect()
    val docs = graft.sources.Tables.documents(spark, sf0001).count()
    assert(t1.length == docs)
    assert(t1.forall(r => r.width == 128 && r.height == 96 &&
      r.thumb.nonEmpty && r.thumb.length <= 64))
    val m1 = t1.map(r => r.doc_id -> r.thumb.toSeq).toMap
    val m2 = t2.map(r => r.doc_id -> r.thumb.toSeq).toMap
    assert(m1 == m2, "resize stub must be deterministic")
  }

  test("split assignment: content-keyed, leak-free for duplicate texts") {
    val d = Seq((1L, "same text"), (2L, "same text"), (3L, "other words"))
      .toDF("doc_id", "text")
    val out = graft.operators.PrepPipeline.splitAssignment(d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // identical content -> identical bucket and split (no leakage)
    assert(out(1L) == out(2L))
    assert(out.values.forall { case (b, s) =>
      b >= 0 && b < 100 &&
        ((b < 90) == (s == "train")) && ((b >= 95) == (s == "test"))
    })
    // full corpus coverage with roughly-proportional buckets
    val full = graft.operators.PrepPipeline.splitAssignment(
      graft.sources.Tables.documents(spark, sf0001))
    val n = full.count()
    val train = full.filter($"split" === "train").count()
    assert(n == graft.sources.Tables.documents(spark, sf0001).count())
    assert(train > n * 7 / 10 && train < n, s"train=$train of $n")
  }

  test("vocab build: contiguous ids, ordered counts, min-count floor") {
    val out = graft.operators.TextAnalysis
      .vocabQuery(spark, sf0001, minCount = 3L, vocabSize = 50).collect()
    assert(out.nonEmpty && out.length <= 50)
    assert(out.map(_.getLong(0)).toSeq == (1L to out.length.toLong),
      "vocab ids must be contiguous from 1")
    val ranked = out.map(r => (r.getLong(2), r.getString(1)))
    assert(ranked.forall(_._1 >= 3L), "min-count floor violated")
    assert(ranked.sliding(2).forall {
      case Array((c1, t1), (c2, t2)) => c1 > c2 || (c1 == c2 && t1 < t2)
      case _ => true
    }, "vocab order must be (count DESC, term ASC)")
  }

  test("skipgram pairs: ordered windows, no self-pairs, exact counts") {
    // "a b c a" with window 2 -> (a,b) (a,c) (b,c) (b,a) (c,a)
    val out = TextAnalysis.skipgramQuery(spark, sf0001, window = 2,
      topN = 1000000)
    val docs = graft.sources.Tables.documents(spark, sf0001)
    // reference: per-doc sliding windows in plain Scala
    val expected = docs.select(col("text")).collect()
      .map(_.getString(0).toLowerCase.trim.split("\\s+").toSeq)
      .flatMap(t => t.indices.flatMap(i =>
        (i + 1 to math.min(i + 2, t.length - 1)).map(j => (t(i), t(j)))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = out.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected, "skipgram counts must match sliding reference")
  }

  test("heavy hitters: k per group, rank follows (count desc, term)") {
    val out = TextAnalysis.heavyHittersQuery(spark, sf0001, k = 3).collect()
    val byLang = out.groupBy(_.getString(0))
    byLang.foreach { case (_, rows) =>
      assert(rows.length <= 3)
      assert(rows.map(_.getInt(1)).toSeq.sorted == (1 to rows.length))
      val cnts = rows.sortBy(_.getInt(1)).map(_.getLong(3)).toSeq
      assert(cnts == cnts.sorted.reverse, "rank must follow count desc")
    }
  }

  test("normalization: idempotent, case/punct-insensitive, counts dups") {
    val docs = Seq(
      (1L, "Hello,  World!"), (2L, "hello world"), (3L, "HELLO-world"),
      (4L, "unrelated")).toDF("doc_id", "text")
    val norm = trim(regexp_replace(regexp_replace(lower(col("text")),
      "[^a-z0-9 ]", " "), " +", " "))
    val normed = docs.select(col("doc_id"), norm.as("n1"))
    // idempotence: normalizing a normalized string is the identity
    val twice = normed.select(col("doc_id"),
      trim(regexp_replace(regexp_replace(lower(col("n1")),
        "[^a-z0-9 ]", " "), " +", " ")).as("n2"),
      col("n1"))
    assert(twice.filter(col("n1") =!= col("n2")).count() == 0)
    val vals = normed.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(vals(1L) == "hello world" && vals(2L) == "hello world" &&
      vals(3L) == "hello world")
    // the query surface: all three variants collapse to n_same = 3
    val q = TextAnalysis.normalizeQuery(spark, sf0001)
    val head = q.limit(5).collect()
    assert(head.nonEmpty && head.forall(_.getLong(5) >= 1))
  }

  test("analytics topK + membership filter compose") {
    val li = graft.sources.Tables.lineitem(spark, sf0001)
    val top = Analytics.topKByAggregate(li, "l_suppkey", "l_extendedprice", 5)
    assert(top.count() == 5)
    val filtered = Analytics.filterToTopK(li, "l_suppkey", "l_extendedprice", 5)
    assert(filtered.select("l_suppkey").distinct().count() == 5)
    val (hi, lo) = Analytics.topAndBottomK(li, "l_extendedprice", "l_orderkey", 3)
    assert(hi.count() == 3 && lo.count() == 3)
  }

  test("zipf bands: hand-computed ranks, bands, and products") {
    // a(3) + t1..t11 once each: rank 1 = a, ranks 2-12 = t-terms in
    // STRING order (t1, t10, t11, t2, ..., t9) — band 1 holds ranks
    // 1-9, band 2 ranks 10-12
    val text = "a a a " + (1 to 11).map(i => s"t$i").mkString(" ")
    val out = TextAnalysis.zipfBands(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // band 1: 9 terms, tokens 3+8, mean = (1*3 + 2+..+9) div 9 = 5
    assert(out(1) == ((9L, 1L, 9L, 11L, 5L, 785714L)))
    // band 2: ranks 10-12, mean = 33 div 3 = 11
    assert(out(2) == ((3L, 10L, 12L, 3L, 11L, 214285L)))
  }

  test("heaps growth: cumulative vocab counts new terms once") {
    val docs = Seq(
      (1L, "a b"), (2L, "b c"), (3L, "c a"), (4L, "d d"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.heapsGrowth(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 4 docs land in deciles 1, 3, 6, 8; vocab grows 2, 3, 3, 4
    assert(rows.toSeq == Seq(
      (1, 1L, 2L, 2L), (3, 2L, 4L, 3L), (6, 3L, 6L, 3L), (8, 4L, 8L, 4L)))
  }
}
