package graft

import org.apache.spark.sql.functions._

/** q268: the HRW minimal-movement property, asserted structurally —
  * on an 8 -> 9 expansion a key either keeps its shard or moves to
  * the NEW shard; nothing may move between two old shards. */
class ShardingSpec extends SparkSpec {
  import graft.operators.Sharding

  test("HRW expansion: keys stay put or move to the new shard only") {
    import spark.implicits._
    val keys = (1L to 3000L).toDF("doc_id")
    val rows = Sharding.rendezvousReport(keys).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val total = rows.map(_._3).sum
    assert(total == 3000L)
    // every off-diagonal transition must land on the NEW shard (8)
    val illegal = rows.filter { case (b, a, _) =>
      b != a && a != Sharding.ShardsBefore }
    assert(illegal.isEmpty, s"old->old movement is an HRW violation: " +
      illegal.mkString(", "))
    // moved mass ~ 1/9 of keys (generous band: hash variance on 3k)
    val moved = rows.collect {
      case (b, a, n) if b != a => n }.sum.toDouble / total
    assert(moved > 0.05 && moved < 0.20,
      f"expected ~1/9 movement, saw $moved%.3f")
    // old shards all present and roughly balanced before expansion
    val before = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    assert(before.keySet == (0 until Sharding.ShardsBefore).toSet)
    assert(before.values.forall(n => n > total / 20),
      s"severely unbalanced pre-expansion shards: $before")
  }
}
