package graft

import graft.operators.GraphTopology

/** Triangle census and bounded BFS on hand-built graphs, plus the
  * plan shapes that keep them Pregel-priced at scale. */
class GraphTopologySpec extends SparkSpec {
  import spark.implicits._

  private def edges(es: (Long, Long)*) = es.toDF("u", "v")

  test("triangles: one closed wedge plus a pendant — exact census") {
    // 1-2, 1-3, 2-3 close a triangle; 3-4 is a pendant
    val out = GraphTopology.triangles(edges((1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L))).collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toList
    assert(out == List(
      (1L, 2L, 1L, 1000000L),  // 2*1/(2*1)
      (2L, 2L, 1L, 1000000L),
      (3L, 3L, 1L, 333333L),   // 2*1/(3*2)
      (4L, 1L, 0L, 0L)))       // degree 1: coefficient undefined -> 0
  }

  test("triangles: K4 — every node in 3 triangles, clustering 1.0") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val out = GraphTopology.triangles(k4).collect()
    assert(out.length == 4)
    assert(out.forall(r => r.getLong(1) == 3 && r.getLong(2) == 3 &&
      r.getLong(3) == 1000000L))
  }

  test("triangles: a star hub has wedges but zero closures") {
    val star = edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val out = GraphTopology.triangles(star).collect()
    assert(out.forall(_.getLong(2) == 0L))
  }

  test("bfs: path graph depths, horizon cutoff, unreachable component") {
    // 1-2-3-4-5 path + disconnected 6-7; seed {1}, 3 hops
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
    val out = GraphTopology.bfsDepth(g, Seq(1L).toDF("u"), 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> -1L, 6L -> -1L, 7L -> -1L))
  }

  test("bfs: a seed outside the edge set still reports depth 0") {
    val g = edges((1L, 2L))
    val out = GraphTopology.bfsDepth(g, Seq(99L).toDF("u"), 2)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> -1L, 2L -> -1L, 99L -> 0L))
  }

  test("bfs: multi-source takes the minimum hop distance") {
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L))
    val out = GraphTopology.bfsDepth(g, Seq(1L, 4L).toDF("u"), 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("q176/q177 full plans: equi-joins only, nothing cartesian") {
    for (df <- Seq(GraphTopology.triangleQuery(spark, sf0001),
        GraphTopology.bfsQuery(spark, sf0001))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), p.take(1000))
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1000))
    }
  }

  test("kcore: a tailed triangle peels to the triangle at k=2") {
    // triangle 1-2-3 with tail 3-4-5: nodes 4,5 peel away (degree <
    // 2 cascades down the tail), the triangle survives with deg 2
    val g = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val out = GraphTopology.kcore(g, k = 2, rounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kcore: a pure path has an empty 2-core; a 4-clique is its " +
    "own 3-core") {
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L))
    assert(GraphTopology.kcore(path, 2, 10).count() == 0)
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val out = GraphTopology.kcore(k4, 3, 10)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("link prediction: path endpoints predicted, adjacent pairs " +
    "and closed triangles excluded") {
    // path 1-2-3: (1,3) shares center 2 (deg 2) -> ra 500000, cn 1
    val path = edges((1L, 2L), (2L, 3L))
    val out = GraphTopology.linkPrediction(path, 10)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(out == List((1L, 3L, 1L, 500000L)))
    // triangle: every common-neighbor pair is already adjacent
    val tri = edges((1L, 2L), (2L, 3L), (1L, 3L))
    assert(GraphTopology.linkPrediction(tri, 10).count() == 0)
  }

  test("link prediction: square diagonals tie on two 2-degree " +
    "centers each; order breaks by id") {
    val sq = edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val out = GraphTopology.linkPrediction(sq, 10)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(out == List((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
  }

  test("link prediction: centers above the degree cap contribute " +
    "no wedges (the hub guard is part of the score definition)") {
    // star hub 1 with leaves 2..5 (deg 4): under cap 3 the hub is
    // excluded, so no leaf pair is predicted
    val star = edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(GraphTopology.linkPrediction(star, 10, centerCap = 3).count() == 0)
    // at cap 4 the hub qualifies: C(4,2) = 6 leaf pairs, ra = 250000
    val out = GraphTopology.linkPrediction(star, 10, centerCap = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 6 && out.forall(r => r._3 == 1L && r._4 == 250000L))
  }

  test("q221 full plan: equi-joins only, nothing cartesian") {
    val p = GraphTopology.linkPredictionQuery(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1000))
  }

  private def tedges(es: (Long, Long, Long)*) = es.toDF("u", "v", "t")

  test("temporal reach: paths must respect time — a static path " +
    "with a backwards edge is NOT causally reachable") {
    // 1-2 at hour 5, 2-3 at hour 3: statically connected, but the
    // 2-3 edge happened before anything could arrive at 2
    val g = tedges((1L, 2L, 5L), (2L, 3L, 3L))
    val out = GraphTopology.temporalReach(g, Seq(1L).toDF("u"), 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 5L, 3L -> -1L))
  }

  test("temporal reach: a later re-occurrence of the edge rescues " +
    "the path; arrival is the earliest valid hour") {
    val g = tedges((1L, 2L, 5L), (2L, 3L, 3L), (2L, 3L, 7L))
    val out = GraphTopology.temporalReach(g, Seq(1L).toDF("u"), 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 5L, 3L -> 7L))
  }

  test("temporal reach: min arrival over competing causal paths, " +
    "found across rounds") {
    // direct 1-2 at hour 2; indirect 1-3 (h1) then 3-2 (h1) lands at 1
    val g = tedges((1L, 2L, 2L), (1L, 3L, 1L), (3L, 2L, 1L))
    val out = GraphTopology.temporalReach(g, Seq(1L).toDF("u"), 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("lpa: two triangles with one bridge resolve to two " +
    "communities (connectivity alone would merge them)") {
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val out = GraphTopology.labelPropagation(g, 4)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), out.toString)
    assert(out.values.toSet.size == 2)
  }

  test("feature propagation: neighbor floor-means on a path; " +
    "original features ride along") {
    val g = edges((1L, 2L), (2L, 3L))
    val feats = Seq((1L, 1L, 1L), (2L, 2L, 2L), (3L, 4L, 4L))
      .toDF("user_id", "f_cnt", "f_val")
    val out = GraphTopology.featurePropagation(g, feats, rounds = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toList
    // node 2 averages (1 + 4) / 2 = 2 (floor); endpoints copy node 2
    assert(out == List(
      (1L, 1L, 1L, 2L, 2L),
      (2L, 2L, 2L, 2L, 2L),
      (3L, 4L, 4L, 2L, 2L)), out.toString)
  }

  test("q226/q227/q230 full plans: equi-joins only, nothing cartesian") {
    for (df <- Seq(GraphTopology.temporalReachQuery(spark, sf0001),
        GraphTopology.labelPropagationQuery(spark, sf0001),
        GraphTopology.featurePropagationQuery(spark, sf0001))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), p.take(1000))
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1000))
    }
  }

  test("kcore: an unconverged round cap still yields the exact " +
    "cap-round state (the bounded-unrolling contract)") {
    // long tail 1-2-...-7 + triangle at the end: each round peels
    // exactly one tail node, so the state after 2 rounds is the
    // 5-node remnant — what a 2-round oracle must see
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (8L, 9L), (7L, 9L))
    val capped = GraphTopology.kcore(g, 2, rounds = 2)
      .as[(Long, Long)].collect().toMap
    // rounds peel leaf 1 then leaf 2 (each round removes the current
    // degree-1 frontier): remaining chain 3..7 + triangle
    assert(capped.keySet == Set(3L, 4L, 5L, 6L, 7L, 8L, 9L))
  }
}
