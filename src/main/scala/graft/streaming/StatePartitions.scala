package graft.streaming

import org.apache.spark.sql.SparkSession

/** Drain-scoped state-partition sizing — the knob a deployment tunes
  * per volume, factored out of q273's inline loan (StreamJoin).
  *
  * A stateful streaming operator maintains `spark.sql.shuffle
  * .partitions` state-store instances and re-loads + re-commits every
  * one of them EVERY micro-batch, whether or not a partition holds any
  * state; a stream-stream join maintains four stores per partition.
  * At fixture scale that fixed per-store cost dominates the drains'
  * wall time (measured on q273: a 6-batch join drain at 32 partitions
  * spent ~30 s in 6×4×32 load/commit cycles at sf0.001 — pure
  * overhead; 8 partitions cut the drain to ~1/3). At 100 TB the same
  * knob turns the other way: size partitions UP so each store's state
  * fits in executor memory. The partition count is pinned into the
  * checkpoint at batch 0, so the loan below only ever scopes a NEW
  * query over a fresh checkpoint — which is what every oracle drain
  * creates per run.
  *
  * Results are partition-count independent (the hash-compared output
  * is the same relation at any width); only the store-commit overhead
  * and the sink's file count change. Restores the prior setting even
  * on failure so the loan never leaks into the batch read-backs or a
  * later query.
  */
object StatePartitions {

  /** Fixture-scale drain width: carries every oracle drain's state
    * comfortably while paying 1/4th of the session default's
    * per-batch store-commit overhead. */
  val DrainPartitions = 8

  /** Run `body` (stage + start + await one streaming drain) with
    * `spark.sql.shuffle.partitions` loaned down to `n`. */
  def scoped[T](spark: SparkSession, n: Int = DrainPartitions)(
      body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prior = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body
    finally spark.conf.set(key, prior)
  }
}
