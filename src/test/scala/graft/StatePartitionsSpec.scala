package graft

import graft.streaming.StatePartitions

/** The [[StatePartitions]] loan contract: the drain-scoped shuffle
  * width applies inside the scope and the prior session width is
  * restored on BOTH exits — normal return and throw. A leak here
  * would silently re-plan every later batch query at drain width. */
class StatePartitionsSpec extends SparkSpec {

  private val Key = "spark.sql.shuffle.partitions"

  test("scoped applies the drain width inside and restores after") {
    val prior = spark.conf.get(Key)
    val inside = StatePartitions.scoped(spark) { spark.conf.get(Key) }
    assert(inside == StatePartitions.DrainPartitions.toString)
    assert(spark.conf.get(Key) == prior)
  }

  test("scoped restores the prior width when the body throws") {
    val prior = spark.conf.get(Key)
    intercept[IllegalStateException] {
      StatePartitions.scoped(spark, 4) {
        assert(spark.conf.get(Key) == "4")
        throw new IllegalStateException("drain failed")
      }
    }
    assert(spark.conf.get(Key) == prior)
  }

  test("scoped nests: inner loan wins, each level restores its prior") {
    val prior = spark.conf.get(Key)
    StatePartitions.scoped(spark, 8) {
      StatePartitions.scoped(spark, 4) {
        assert(spark.conf.get(Key) == "4")
      }
      assert(spark.conf.get(Key) == "8")
    }
    assert(spark.conf.get(Key) == prior)
  }
}
