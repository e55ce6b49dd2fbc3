package graft

import org.apache.spark.sql.functions._
import graft.streaming.TtlStream

/** The two-arm proof that q275's zeros come from TTL EVICTION and not
  * from a processor that never carries: the identical three-wave
  * schedule drained through the identical processor with
  * `TTLConfig.NONE` must (a) remove nothing via TTL, (b) carry state
  * across every batch boundary, and (c) accumulate exactly — per
  * user, the largest (carried + n) slice equals the user's total
  * event count. The TTL'd arm then re-asserts the query's own claims
  * at spec level: zero carry, positive `numValuesRemovedDueToTTLExpiry`.
  */
class TtlStreamSpec extends SparkSpec {

  test("TTL-free contrast arm: the cache carries and accumulates exactly") {
    val drop = TtlStream.stageTypedWaves3(spark, sf0001)
    val sunk = tmpDir("ttl_none_sunk")
    val ck = tmpDir("ttl_none_ck")
    val stats = TtlStream.drainTtl(spark, drop, sunk, ck, ttlMs = 0L)
    assert(stats.removed == 0L, "NONE-TTL arm must not count TTL removals")
    // without TTL the store retains every live key to the end
    assert(stats.finalStateRows == stats.peakStateRows,
      s"NONE-TTL state must not shrink: $stats")
    val slices = spark.read.parquet(sunk)
    val carried = slices.agg(sum("carried").cast("long"))
      .head.getLong(0)
    assert(carried > 0L,
      "without TTL the cache must carry state across batches — if this " +
        "is 0 the q275 oracle's zeros prove nothing")
    // exact accumulation: max(carried + n) per user == the user's
    // total staged events (the last slice has seen everything)
    val bad = slices.groupBy("user_id")
      .agg(max(col("carried") + col("n")).as("final_cum"),
        sum(col("n")).as("total"))
      .filter(col("final_cum") =!= col("total"))
      .count()
    assert(bad == 0L, s"$bad users accumulated wrong under NONE-TTL")
  }

  test("TTL'd arm: zero carry, physical evictions counted, state shrinks") {
    val drop = TtlStream.stageTypedWaves3(spark, sf0001)
    val sunk = tmpDir("ttl_on_sunk")
    val ck = tmpDir("ttl_on_ck")
    val stats = TtlStream.drainTtl(spark, drop, sunk, ck,
      TtlStream.TtlMs)
    assert(stats.removed > 0L,
      "TTL'd arm must report numValuesRemovedDueToTTLExpiry > 0")
    // the store must physically DROP rows between batches once the
    // cleanup pass runs — the eviction the state-hygiene claim is
    assert(stats.finalStateRows < stats.peakStateRows,
      s"TTL'd state never shrank: $stats")
    val carried = spark.read.parquet(sunk)
      .agg(sum("carried").cast("long")).head.getLong(0)
    assert(carried == 0L,
      s"TTL'd cache carried $carried across batches — eviction failed")
  }
}
