package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{CorpusStats, Curation, GraphRank, TextAnalysis}

/** Specs for the round-5 sampling/graph/sketch batch: deterministic
  * negative sampling, mixture materialization, integer fixed-point
  * PageRank, and the oracle-checked count-min sketch (q98-q101). */
class SamplingGraphSpec extends SparkSpec {
  import spark.implicits._

  test("negative samples are deterministic and drawn from the vocab") {
    val a = TextAnalysis.negativeSamplesQuery(spark, sf0001).collect()
    val b = TextAnalysis.negativeSamplesQuery(spark, sf0001).collect()
    assert(a.nonEmpty && a.sameElements(b), "hash draw must be stable")
    val vocabTerms = TextAnalysis.vocabQuery(spark, sf0001)
      .select("term").collect().map(_.getString(0)).toSet
    assert(a.forall(r => vocabTerms.contains(r.getString(3))))
    assert(a.forall(r => Set(1, 2).contains(r.getInt(2))))
  }

  test("mixture clamps a vanishing stratum at MaxEpochs") {
    // 'rare' holds 1 of 101 tokens -> raw weight ~50 epochs -> clamp 5;
    // 'big' weight < 1e6 -> 0 or 1 epoch per doc, hash-decided
    val big = (1 to 10).map(i =>
      (100L + i, Seq.fill(10)("w").mkString(" "), "big"))
    val docs = (big :+ ((1L, "rare", "rare")))
      .toDF("doc_id", "text", "lang")
    val out = Curation.mixtureMaterialize(docs)
      .groupBy("lang", "doc_id").agg(count(lit(1)).as("n"),
        max("n_rep").as("n_rep"))
      .collect()
    val rare = out.filter(_.getString(0) == "rare")
    assert(rare.length == 1 && rare.head.getLong(2) == Curation.MaxEpochs,
      "rare stratum must be clamped to exactly MaxEpochs rows")
    out.filter(_.getString(0) == "big").foreach { r =>
      assert(r.getLong(2) == 1L && r.getLong(3) == 1L,
        "sub-1e6 weight must yield at most one hash-decided epoch")
    }
  }

  test("coActivityEdges links same-cell users and prunes hub cells") {
    def ts(h: Int) = Timestamp.valueOf(f"2024-03-01 $h%02d:30:00")
    // cell h=1: users 1,2 -> one edge; cell h=2: 31 users -> pruned
    val quiet = Seq((1L, ts(1), "click"), (2L, ts(1), "click"))
    val crowd = (1L to 31L).map(u => (u, ts(2), "view"))
    val ev = (quiet ++ crowd).toDF("user_id", "ts", "event_type")
    val edges = GraphRank.coActivityEdges(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.toSeq == Seq((1L, 2L)),
      s"expected only the quiet-cell edge, got ${edges.toSeq}")
  }

  test("pageRank integer arithmetic matches the hand-unrolled path graph") {
    // path 1-2-3: ranks after 3 damped integer iterations
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val out = GraphRank.pageRank(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 629187L, 2L -> 1741625L, 3L -> 629187L))
  }

  test("converged pageRank is an exact fixed point agreeing with fixed rounds") {
    // triangle + disjoint edge: non-regular graph whose uniform start
    // IS the integer fixed point — delta hits exactly 0
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L)).toDF("u", "v")
    val (ranks, rounds, converged) =
      GraphRank.pageRankConverged(edges, maxRounds = 40)
    assert(converged, s"must reach the integer fixed point, ran $rounds")
    val conv = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // once delta = 0, fixed-iteration runs of >= `rounds` rounds land
    // on the SAME ranks (further supersteps are bit-identical)
    val atRounds = GraphRank.pageRank(edges, rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val beyond = GraphRank.pageRank(edges, rounds + 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(atRounds == conv, s"converged $conv != fixed($rounds) $atRounds")
    assert(beyond == conv, "a fixed point must be stable under extra rounds")
  }

  test("personalized pageRank concentrates mass around the seed") {
    // path 1-2-3 seeded at 1, hand-unrolled 3 damped integer rounds:
    // r0=(150000,0,0); r1=(150000,127500,0);
    // r2=(204187,127500,54187); r3=(204187,219617,54187)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val s1 = Seq(Tuple1(1L)).toDF("u")
    val out = GraphRank.personalizedPageRank(edges, s1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 204187L, 2L -> 219617L, 3L -> 54187L))
    // personalization is real: seeding the other end mirrors the ranks
    val s3 = Seq(Tuple1(3L)).toDF("u")
    val mirrored = GraphRank.personalizedPageRank(edges, s3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mirrored == Map(3L -> 204187L, 2L -> 219617L, 1L -> 54187L))
    // a seed outside the graph contributes nothing
    val sOut = Seq(Tuple1(99L)).toDF("u")
    val zero = GraphRank.personalizedPageRank(edges, sOut).collect()
      .map(_.getLong(1))
    assert(zero.forall(_ == 0L))
  }

  test("converged pageRank on an empty edge frame is empty, not a crash") {
    // a filtered/sparse events slice can prune every co-activity cell
    // as a hub, leaving zero edges; the L1 delta probe's sum over the
    // empty join is NULL and must coalesce to 0 (trivially converged)
    val edges = Seq.empty[(Long, Long)].toDF("u", "v")
    val (ranks, rounds, converged) =
      GraphRank.pageRankConverged(edges, maxRounds = 5)
    assert(ranks.count() == 0L)
    assert(converged && rounds == 1,
      s"empty graph must converge on the first probe, got ($rounds, $converged)")
  }

  test("non-converging graph is bounded by maxRounds and matches fixed run") {
    // floor rounding makes this branchy graph oscillate instead of
    // hitting exact delta = 0: the probe must stop at the bound and
    // the result must equal the fixed-iteration run of that length
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L)).toDF("u", "v")
    val (ranks, rounds, converged) =
      GraphRank.pageRankConverged(edges, maxRounds = 6)
    assert(rounds == 6)
    val got = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixed = GraphRank.pageRank(edges, 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == fixed,
      s"bounded run must equal fixed(6): $got vs $fixed")
    assert(!converged || got == GraphRank.pageRank(edges, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("cms estimates dominate exact counts (the CMS guarantee)") {
    val out = CorpusStats.cmsQuery(spark, sf0001).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS must never underestimate: ${r.getString(0)}")
    }
  }

  test("weighted pageRank: hand-unrolled star with asymmetric tie " +
    "strengths; strong tie outranks weak") {
    // center 1, leaf 2 at weight 10, leaf 3 at weight 1
    val e = Seq((1L, 2L, 10L), (1L, 3L, 1L)).toDF("u", "v", "w")
    val out = GraphRank.weightedPageRank(e, 1)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1850000L, 2L -> 922726L, 3L -> 227272L),
      out.toString)
  }

  test("weighted pageRank with uniform weights reduces exactly to " +
    "the unweighted ranks") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L))
      .toDF("u", "v")
    val w = edges.withColumn("w", lit(1L))
    val a = GraphRank.pageRank(edges).as[(Long, Long)].collect().toMap
    val b = GraphRank.weightedPageRank(w, GraphRank.Iterations)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
