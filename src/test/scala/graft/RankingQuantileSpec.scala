package graft

import org.apache.spark.sql.functions._
import graft.operators.{ModelEval, PrepPipeline, QuantileSketch}

/** Specs for the q182-q185 batch: hash-sample quantile sketch,
  * cluster-atomic leakage-safe split, and the histogram-derived
  * ranking metrics (AUC / ROC). */
class RankingQuantileSpec extends SparkSpec {
  import spark.implicits._

  // ---- AUC (q184) ----

  private def emb(rows: (Long, Float)*) =
    rows.toDF("label", "s").select(col("label"),
      array(col("s")).as("embedding"))

  private def aucE6(rows: (Long, Float)*): Long =
    ModelEval.auc(emb(rows: _*)).collect().head.getLong(3)

  test("auc: perfect separation scores 1e6, inverted scores 0") {
    // positives (label >= 5) all score above every negative
    assert(aucE6((9L, 1.0f), (7L, 0.9f), (1L, 0.1f), (0L, 0.0f)) == 1000000L)
    assert(aucE6((9L, 0.0f), (7L, 0.1f), (1L, 0.9f), (0L, 1.0f)) == 0L)
  }

  test("auc: all-tied scores give exactly 1/2 via midranks") {
    assert(aucE6((9L, 0.5f), (7L, 0.5f), (1L, 0.5f), (0L, 0.5f)) == 500000L)
  }

  test("auc: hand-computed mixed case with a pos/neg tie") {
    // scores (quantized): neg 0, pos 1024, {pos, neg} tied at 2048
    // 2U = 1*(2*1+0) + 1*(2*1+1) = 5; auc = 5/8
    assert(aucE6((9L, 2.0f), (7L, 1.0f), (1L, 2.0f), (0L, 0.0f)) == 625000L)
  }

  test("auc: degenerate one-class input reports 0, not a crash") {
    val r = ModelEval.auc(emb((9L, 1.0f), (8L, 0.5f))).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.getLong(3) == 0L)
  }

  // ---- ROC (q185) ----

  test("roc: cumulative counts are monotone and end at the totals") {
    val rows = Seq((9L, 0.9f), (8L, 0.7f), (6L, 0.7f), (2L, 0.8f),
      (1L, 0.3f), (0L, 0.1f))
    val out = ModelEval.rocCurve(emb(rows: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // ordered by score ascending; tp/fp are cumulative from the TOP,
    // so the lowest threshold row holds the totals
    assert(out.head._2 == 3L && out.head._3 == 3L)
    val tps = out.map(_._2); val fps = out.map(_._3)
    assert(tps.zip(tps.tail).forall { case (a, b) => a >= b })
    assert(fps.zip(fps.tail).forall { case (a, b) => a >= b })
    // the top-score threshold admits only the best-scored doc (a pos)
    assert(out.last._2 == 1L && out.last._3 == 0L)
  }

  // ---- PR / AP / calibration (q186-q188) ----

  test("pr curve: precision and recall verified by hand") {
    // descending scores: pos(2048), neg(1024), pos(0)
    val out = ModelEval.prCurve(emb((9L, 2.0f), (0L, 1.0f), (8L, 0.0f)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // rows ascend by score; at threshold 0 everything is predicted
    assert(out(0) == ((0L, 2L, 1L, 666666L, 1000000L)))
    assert(out(1) == ((1024L, 1L, 1L, 500000L, 500000L)))
    assert(out(2) == ((2048L, 1L, 0L, 1000000L, 500000L)))
  }

  test("avg precision: perfect ranking gives 1e6; hand case matches") {
    val perfect = ModelEval.avgPrecision(
      emb((9L, 1.0f), (8L, 0.9f), (1L, 0.1f))).collect().head
    assert(perfect.getLong(2) == 1000000L)
    // pos@2048 (prec 1e6, Δtp 1), neg@1024, pos@0 (prec 666666, Δtp 1)
    // ap = (1*1e6 + 1*666666) / 2 = 833333
    val hand = ModelEval.avgPrecision(
      emb((9L, 2.0f), (0L, 1.0f), (8L, 0.0f))).collect().head
    assert(hand.getLong(0) == 2L && hand.getLong(2) == 833333L)
  }

  test("calibration: bins partition the population and rates are e6 floors") {
    // width 64: scores 0 and 32 share bin 64 (lo 0); 1024 → bin 80
    val out = ModelEval.calibration(
      emb((9L, 0.0f), (0L, 0.03125f), (8L, 1.0f))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq((64L, 0L, 2L, 1L, 500000L),
      (80L, 1024L, 1L, 1L, 1000000L)))
  }

  // ---- quantile sketch (q182) ----

  private def events(n: Int) =
    (1 to n).map(i => ("t", i.toLong, (i * 7 % n).toDouble))
      .toDF("event_type", "event_id", "value")

  test("quantile sketch: sampleMod=1 degenerates to exact quantiles") {
    val out = QuantileSketch.quantileSketch(events(100), sampleMod = 1L)
      .collect()
    assert(out.length == QuantileSketch.Probes.length)
    out.foreach { r =>
      assert(r.getLong(2) == 100L)        // n
      assert(r.getLong(3) == 100L)        // n_sample
      assert(r.getLong(7) == 0L,          // rank_err
        s"probe ${r.getInt(1)} err ${r.getLong(7)}")
    }
  }

  test("quantile sketch: subsampled estimate carries a true rank " +
    "consistent with the full data") {
    val out = QuantileSketch.quantileSketch(events(400), sampleMod = 4L)
      .collect()
    out.foreach { r =>
      val (n, ns) = (r.getLong(2), r.getLong(3))
      assert(n == 400L && ns > 0L && ns < 400L)
      // est_rank is a genuine rank: within [1, n]
      assert(r.getLong(5) >= 1L && r.getLong(5) <= n)
      // rank_err = |est_rank - target_rank| by construction
      assert(r.getLong(7) == math.abs(r.getLong(5) - r.getLong(6)))
    }
  }

  test("quantile sketch: samples nest — the mod-16 sample is a subset " +
    "of the mod-4 sample (consistent rate expansion)") {
    // h % 16 == 0 implies h % 4 == 0, so REFINING the rate keeps every
    // previously sampled row: a stored coarse sketch can be grown by
    // sampling only the complement, never resampled from scratch
    import graft.functions.TextFunctions.portableHash60
    val e = events(500)
    def ids(mod: Long) = e.filter(
        pmod(portableHash60(col("event_id").cast("string")), lit(mod)) === 0)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val coarse = ids(16L); val fine = ids(4L)
    assert(coarse.nonEmpty && coarse.subsetOf(fine))
  }

  test("quantile sketch: sample is mergeable — union of partition " +
    "samples equals the whole-data sample") {
    val all = events(200)
    val left = all.filter(col("event_id") <= 100)
    val right = all.filter(col("event_id") > 100)
    val whole = QuantileSketch.quantileSketch(all, sampleMod = 4L)
    val merged = QuantileSketch.quantileSketch(
      left.unionByName(right), sampleMod = 4L)
    assert(whole.collect().toSeq == merged.collect().toSeq)
  }

  // ---- leakage-safe split (q183) ----

  test("leakage split: every near-dup cluster lands atomically in " +
    "one split, singletons keep their own id") {
    val docs = (1L to 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("d1", "d2")
    val out = PrepPipeline.leakageSafeSplit(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.length == 10)
    val byDoc = out.map(r => r._1 -> r).toMap
    // transitive family {1,2,3} labels to 1; {7,8} to 7
    assert(Seq(1L, 2L, 3L).map(byDoc(_)._2).distinct == Seq(1L))
    assert(Seq(7L, 8L).map(byDoc(_)._2).distinct == Seq(7L))
    assert(byDoc(5L)._2 == 5L)
    // atomicity: one split per cluster
    out.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(_._4).distinct.length == 1)
      assert(members.map(_._3).distinct.length == 1)
    }
    // the bucket is the portable hash of the CLUSTER id, not the doc's
    val expected = PrepPipeline.splitAssignment(
      Seq((1L, "1")).toDF("doc_id", "text")).collect().head.getLong(1)
    assert(byDoc(2L)._3 == expected)
  }

  test("q192 manifest partitions exactly the q39 survivor set and " +
    "conserves its token mass") {
    val manifest = PrepPipeline.curationManifestQuery(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val survivors = PrepPipeline.prepQuery(spark, sf0001)
      .agg(count(lit(1)), sum(col("n_words"))).collect().head
    assert(manifest.values.map(_._1).sum == survivors.getLong(0))
    assert(manifest.values.map(_._3).sum == survivors.getLong(1))
    // clusters are split-atomic, so per-split cluster counts sum to
    // the global cluster count (no cluster is double-counted)
    manifest.values.foreach { case (n, c, w) =>
      assert(c <= n && w > 0)
    }
  }
}
