package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusStats, Extensions, OlapOps, Sessionize}

/** q172 grouping sets, q173 session-pattern matching, q174 bigram-LM
  * scoring, q175 TSV roundtrip: semantics on hand-built frames plus
  * the plan shapes the 100 TB posture depends on. */
class SequencePatternLmSpec extends SparkSpec {
  import spark.implicits._

  // ---- q172 grouping sets ----

  test("q172 emits exactly the two requested sets — no grand total, no cross") {
    val out = OlapOps.groupingSetsQuery(spark, sf0001).collect()
    val levels = out.map(_.getString(0)).distinct.sorted
    assert(levels.sameElements(Array("by_month", "by_status")))
    // every row has exactly ONE concrete dimension: the other is 'ALL'
    assert(out.forall(r =>
      (r.getString(1) == "ALL") != (r.getString(2) == "ALL")))
    // neither a grand-total row (both ALL) nor a cross row (neither ALL)
    assert(!out.exists(r =>
      r.getString(1) == "ALL" && r.getString(2) == "ALL"))
  }

  test("q172 per-set results equal the equivalent plain groupBys") {
    val out = OlapOps.groupingSetsQuery(spark, sf0001)
    val byStatus = out.filter($"level" === "by_status")
      .select($"o_orderstatus", $"n_orders").as[(String, Long)]
      .collect().toMap
    val direct = graft.sources.Tables.orders(spark, sf0001)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(byStatus == direct)
  }

  test("q172 plans one Expand over a single scan (not two groupBys)") {
    val p = OlapOps.groupingSetsQuery(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("Expand"), "grouping sets must plan via Expand:\n" + p.take(800))
    val scans = "Scan parquet".r.findAllIn(p).toSeq
    assert(scans.length == 1, "both summaries must come from one scan:\n" + p.take(800))
  }

  // ---- q173 session patterns ----

  /** One user, one session, a known event-type string. */
  private def sessFrame(seq: String) =
    seq.zipWithIndex.map { case (c, i) =>
      val t = Map('c' -> "click", 'e' -> "error", 'p' -> "purchase",
        's' -> "signup", 'v' -> "view")(c)
      (1L, 1L, i.toLong, i.toLong * 1000, t)
    }.toDF("user_id", "session_seq", "event_id", "t", "event_type")

  test("q173 conversions count non-overlapping v[^p]*p matches") {
    // vcvp|vp: leftmost match consumes through the FIRST p, then restarts
    val r = Sessionize.sessionPatterns(sessFrame("vcvpvp")).collect().head
    assert(r.getAs[String]("seq") == "vcvpvp")
    assert(r.getAs[Long]("conversions") == 2)
    // a view with no later purchase never matches
    val r2 = Sessionize.sessionPatterns(sessFrame("vcvcv")).collect().head
    assert(r2.getAs[Long]("conversions") == 0)
  }

  test("q173 click_runs are maximal cc+ runs") {
    val r = Sessionize.sessionPatterns(sessFrame("cccvccvc")).collect().head
    assert(r.getAs[Long]("click_runs") == 2) // ccc + cc; lone c no
  }

  test("q173 string order is (t, event_id), not arrival order") {
    // same rows, reversed insertion order — seq must be identical
    val rows = Seq((1L, 1L, 1L, 2000L, "purchase"),
      (1L, 1L, 0L, 1000L, "view"))
    val fwd = Sessionize.sessionPatterns(rows.toDF(
      "user_id", "session_seq", "event_id", "t", "event_type"))
    val rev = Sessionize.sessionPatterns(rows.reverse.toDF(
      "user_id", "session_seq", "event_id", "t", "event_type"))
    assert(fwd.collect().head.getAs[String]("seq") == "vp")
    assert(rev.collect().head.getAs[String]("seq") == "vp")
  }

  test("q173 full query shares the one user_id exchange (sessionize shape)") {
    val p = Sessionize.sessionPatternQuery(spark, sf0001)
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).toSeq
    assert(hashEx.length == 1,
      s"expected 1 hash exchange (windows + agg co-partition):\n${p.take(1200)}")
  }

  // ---- q174 bigram LM ----

  test("q174 add-one model scores a hand-computed corpus exactly") {
    // corpus: "a b a b" and "a b"; V = 2 (a, b)
    // bigrams: d1: (a,b),(b,a),(a,b); d2: (a,b)
    // c(a,b)=4? no: c(a,b)=3, c(b,a)=1; c1(a)=3, c1(b)=1
    // P(b|a) = (3+1)/(3+2) = 4/5 -> 800000
    // P(a|b) = (1+1)/(1+2) = 2/3 -> 666666
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = CorpusStats.bigramLm(docs).collect()
    val d1 = out.find(_.getLong(0) == 1L).get
    assert(d1.getAs[Long]("n_bigrams") == 3)
    assert(d1.getAs[Long]("sum_p_e6") == 800000L + 666666L + 800000L)
    assert(d1.getAs[Long]("avg_p_e6") == (800000L + 666666L + 800000L) / 3)
    val d2 = out.find(_.getLong(0) == 2L).get
    assert(d2.getAs[Long]("n_bigrams") == 1)
    assert(d2.getAs[Long]("avg_p_e6") == 800000L)
  }

  test("q174 docs with fewer than two tokens produce no row") {
    val docs = Seq((1L, "only"), (2L, ""), (3L, "two words"))
      .toDF("doc_id", "text")
    val ids = CorpusStats.bigramLm(docs).select("doc_id")
      .as[Long].collect().toSet
    assert(ids == Set(3L))
  }

  test("q174 vocab scalar broadcasts — no cartesian on data") {
    val p = CorpusStats.bigramLmQuery(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "1-row vocab join must broadcast:\n" + p.take(1000))
  }

  // ---- q175 TSV roundtrip ----

  test("q175 roundtrip aggregate equals the direct aggregate (by-name remap live)") {
    val rt = Extensions.q175TsvRoundtrip(spark, sf0001).collect()
    val direct = graft.sources.Tables.lineitem(spark, sf0001)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).cast("long").as("n"),
        sum($"l_orderkey").cast("long").as("key_sum"),
        (round(sum($"l_quantity".cast("decimal(38,10)")), 2) * 100)
          .cast("long").as("qty_cents"),
        (round(sum($"l_extendedprice".cast("decimal(38,10)")), 2) * 100)
          .cast("long").as("price_cents"))
      .orderBy("l_returnflag").collect()
    assert(rt.toSeq == direct.toSeq)
    graft.sources.Scratch.sweep(spark)
  }
}
