package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition-width helpers shared by the CPU-bound sketch entry
  * points (shingling, MinHash, SimHash, hyperplane hashing). */
private[graft] object Partitioning {

  /** Widen-only repartition: spread a NARROW input across the default
    * parallelism, and leave an already-wide input untouched.
    *
    * The narrow case is real at test scale — a small corpus read from
    * one parquet file is ONE partition, which serializes the whole
    * CPU-bound sketch computation onto a single core. But at cluster
    * scale the input typically has far MORE partitions than cores, and
    * an unconditional `repartition(defaultParallelism)` there forces a
    * full extra round-robin shuffle of the corpus — or worse, coalesces
    * thousands of scan partitions down to the core count. Widening only
    * when `numPartitions < defaultParallelism` keeps the local-speedup
    * behavior without ever adding a shuffle to a wide input (asserted
    * in PlanSpec).
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
