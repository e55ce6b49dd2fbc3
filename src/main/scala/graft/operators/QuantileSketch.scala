package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Mergeable quantile estimation by deterministic hash-sampling — the
  * quantile member of the sketch family (CMS = frequency, HLL =
  * distinct, AGMS = join size, KMV = bottom-k/Jaccard, Bloom =
  * membership; this = rank/quantile).
  *
  * The sketch is a Bernoulli-by-hash sample: a row is IN the sample
  * iff `hash(event_id) % sampleMod == 0`. That single membership rule
  * gives the three properties a distributed sketch needs:
  *
  *   - **Mergeable.** Sample(A ∪ B) = Sample(A) ∪ Sample(B) — the
  *     predicate is per-row, so partial samples from any partitioning
  *     of the data union into exactly the sample of the whole. No
  *     compactor state, no merge-order sensitivity (the property KLL
  *     needs careful engineering for, a hash-sample gets for free).
  *   - **Deterministic.** The same rows sample on every run and on
  *     every engine — which is what lets the DuckDB oracle recompute
  *     the sketch exactly, where a random sample or a KLL compactor
  *     could only be tolerance-checked.
  *   - **Tunable.** `sampleMod` is the accuracy/cost knob: expected
  *     sample fraction is 1/sampleMod and the quantile estimate's rank
  *     error concentrates around n/sqrt(n_sample) (standard Bernoulli
  *     order-statistic bound). At 100 TB one would run sampleMod ≈
  *     2^20 (a ~100 MB sample) for ~0.1% rank error; the sf-scale
  *     default of 16 keeps the sf0.01 per-type sample ≈ 125 rows so
  *     the report exercises visible-but-bounded error.
  *
  * The query reports, per (event_type, probe quantile): the estimate
  * selected from the sample, the estimate's TRUE rank in the full
  * data, the target rank, and the absolute rank error — the same
  * self-adjudicating shape as the ANN recall report (q150): the
  * output certifies the sketch's accuracy against exact truth rather
  * than asserting it.
  *
  * Scale shape: two passes over events. Pass 1 builds the sample —
  * the only window runs PER event_type over the sampled rows only
  * (keyed, and 1/sampleMod of the data). Pass 2 joins the full scan
  * to the BROADCAST estimate table (|types| × |probes| rows) and
  * computes true ranks as one map-side-combinable conditional-count
  * aggregation; the total row count rides the same aggregation, so
  * nothing scans events a third time. Estimates are SELECTED corpus
  * values (never interpolated), so doubles pass through
  * bit-identically on both engines — the q53 discipline.
  */
object QuantileSketch {

  /** Probe quantiles (percent). */
  val Probes: Seq[Int] = Seq(25, 50, 90, 99)

  /** Default sample modulus (sample fraction 1/16 at sf scale). */
  val SampleMod: Long = 16L

  /** q182: the quantile-sketch accuracy report over events.value. */
  def quantileSketchQuery(spark: SparkSession, dir: String): DataFrame =
    quantileSketch(Tables.events(spark, dir))

  /** [[quantileSketchQuery]]'s core over any (event_type, event_id,
    * value) frame. */
  def quantileSketch(events: DataFrame, probes: Seq[Int] = Probes,
                     sampleMod: Long = SampleMod,
                     portable: Boolean = true): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // Non-finite values sort engine-specifically (q53) — exclude.
    val e = events
      .filter(!isnan(col("value")) &&
        col("value") =!= Double.PositiveInfinity &&
        col("value") =!= Double.NegativeInfinity)
      .select(col("event_type"), col("event_id"), col("value"))
    // portable=false swaps the md5-prefix membership hash for masked
    // xxhash64 (the at-scale config, benched as a fast-hash variant)
    val sample = e.filter(pmod(graft.functions.TextFunctions.hash60(
      col("event_id").cast("string"), portable), lit(sampleMod)) === 0)
    val byValue = Window.partitionBy("event_type")
      .orderBy(col("value").asc, col("event_id").asc)
    val byType = Window.partitionBy("event_type")
    val ranked = sample.select(col("event_type"), col("event_id"), col("value"),
      row_number().over(byValue).as("rn"),
      count(lit(1)).over(byType).as("ns"))
    val probesDf = probes.toDF("q_pct")
    // Discrete selection at rank ceil(q·ns/100) = (q·ns + 99) div 100,
    // clamped to >= 1 — the q53 rank formula generalized to any probe.
    val est = ranked.join(broadcast(probesDf),
        col("rn") === expr("greatest((q_pct * ns + 99) div 100, 1)"))
      .select(col("event_type"), col("q_pct"),
        col("ns").as("n_sample"),
        col("value").as("est_value"), col("event_id").as("est_id"))
    // True rank of the estimate in the FULL data, under the same
    // (value, event_id) total order the sample was ranked by.
    val report = e.join(broadcast(est), Seq("event_type"))
      .groupBy(col("event_type"), col("q_pct"))
      .agg(
        count(lit(1)).cast("long").as("n"),
        min(col("n_sample")).cast("long").as("n_sample"),
        min(col("est_value")).as("est_value"),
        sum(when(col("value") < col("est_value") ||
            (col("value") === col("est_value") &&
             col("event_id") <= col("est_id")), 1L).otherwise(0L))
          .cast("long").as("est_rank"))
    report
      .withColumn("target_rank",
        expr("CAST(greatest((q_pct * n + 99) div 100, 1) AS BIGINT)"))
      .withColumn("rank_err",
        expr("CAST(abs(est_rank - target_rank) AS BIGINT)"))
      .orderBy("event_type", "q_pct")
  }

  /** DuckDB oracle for [[quantileSketchQuery]] — the sketch is
    * deterministic, so the oracle recomputes it end-to-end: same hash
    * membership, same rank selection, same true-rank count. */
  def quantileSketchOracleSql(probes: Seq[Int] = Probes,
                              sampleMod: Long = SampleMod): String = {
    val probeRows = probes.map(p => s"($p)").mkString(", ")
    s"""WITH e AS (SELECT event_type, event_id, value FROM events
           WHERE NOT isnan(value) AND isfinite(value)),
       s AS (SELECT event_type, event_id, value,
           row_number() OVER (PARTITION BY event_type
             ORDER BY value, event_id) AS rn,
           count(*) OVER (PARTITION BY event_type) AS ns
         FROM e
         WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
             AS BIGINT) % $sampleMod = 0),
       probes(q_pct) AS (VALUES $probeRows),
       est AS (SELECT event_type, q_pct, ns AS n_sample,
           value AS est_value, event_id AS est_id
         FROM s JOIN probes
           ON rn = greatest((q_pct * ns + 99) // 100, 1)),
       r AS (SELECT e.event_type, q_pct,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(n_sample) AS BIGINT) AS n_sample,
           min(est_value) AS est_value,
           CAST(sum(CASE WHEN e.value < est_value
               OR (e.value = est_value AND e.event_id <= est_id)
             THEN 1 ELSE 0 END) AS BIGINT) AS est_rank
         FROM e JOIN est ON e.event_type = est.event_type
         GROUP BY 1, 2)
     SELECT event_type, CAST(q_pct AS INT) AS q_pct, n, n_sample,
       est_value, est_rank,
       CAST(greatest((q_pct * n + 99) // 100, 1) AS BIGINT) AS target_rank,
       CAST(abs(est_rank - greatest((q_pct * n + 99) // 100, 1)) AS BIGINT)
         AS rank_err
     FROM r ORDER BY event_type, q_pct"""
  }
}
