package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Z-order (Morton) data layout — the multi-dimensional clustering
  * technique behind Delta/Iceberg OPTIMIZE ZORDER: interleaving the
  * bits of two dimension keys produces a 1-D sort order in which rows
  * close in EITHER dimension land in the same file, so min/max file
  * statistics prune scans for predicates on either column (a plain
  * sort only prunes its leading column).
  *
  * The interleave is built from unrolled shift/mask/add terms over
  * `functions` built-ins — whole-stage-codegen'd, and the identical
  * arithmetic is emitted as SQL for the oracle (the same
  * shared-construction trick as the MinHash permutation family), so
  * the key computation is verified bit-for-bit cross-engine.
  *
  * At scale the layout write is `repartitionByRange(zkey)` +
  * `sortWithinPartitions(zkey)`: one range shuffle, then each output
  * file covers a compact z-curve segment. The range partitioner
  * samples key quantiles, so skewed dimensions still produce
  * balanced files.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative
    * longs: x occupies even bit positions, y odd. */
  def zkey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _).cast("long")
  }

  /** The same interleave as [[zkey]], rendered as engine-portable SQL
    * over column expressions `x` and `y` (shift = division/multiply by
    * powers of two, mask = % 2 — exact in any 64-bit integer engine). */
  def zkeySql(x: String, y: String, bits: Int = 16): String = {
    val terms = (0 until bits).flatMap { i =>
      Seq(
        s"((($x // ${1L << i}) % 2) * ${1L << (2 * i)})",
        s"((($y // ${1L << i}) % 2) * ${1L << (2 * i + 1)})")
    }
    terms.mkString("(", " + ", ")")
  }

  /** Re-layout a frame along the z-curve of two dimension columns:
    * range-partition by z-key (balanced via quantile sampling), sort
    * within partitions so every output file is a contiguous z-range. */
  def zorderLayout(df: DataFrame, colX: String, colY: String,
                   partitions: Int, bits: Int = 16): DataFrame =
    df.withColumn("__z", zkey(col(colX), col(colY), bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** q54: the z-key computation over the event stream (user dimension
    * × coarse time dimension), oracle-checked bit-for-bit, plus the
    * per-key-range file-statistics view a pruning engine would
    * consult (min/max of both dimensions per z-bucket — the proof
    * that z-clustering keeps BOTH dimensions' ranges tight). */
  def zorderQuery(spark: SparkSession, dir: String): DataFrame = {
    val bits = 10
    // Clamp the epoch to non-negative BEFORE the division: Spark's
    // `div` truncates toward zero while DuckDB's `//` floors, and the
    // two only agree for non-negative operands — without the clamp a
    // pre-1970 timestamp would silently diverge cross-engine.
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("greatest(unix_millis(ts), 0L) div 60000").as("tmin"))
      // confine both dims to the key width (exact, portable)
      .withColumn("xd", col("user_id") % (1L << bits))
      .withColumn("yd", col("tmin") % (1L << bits))
    ev.withColumn("z", zkey(col("xd"), col("yd"), bits))
      .withColumn("z_bucket", expr("z div 4096"))
      .groupBy("z_bucket")
      .agg(count(lit(1)).as("n"),
        min(col("xd")).as("min_x"), max(col("xd")).as("max_x"),
        min(col("yd")).as("min_y"), max(col("yd")).as("max_y"))
      .select(col("z_bucket"), col("n").cast("long").as("n"),
        col("min_x"), col("max_x"), col("min_y"), col("max_y"))
      .orderBy("z_bucket")
  }

  /** The DuckDB oracle for [[zorderQuery]] — generated from the same
    * constants so both engines provably compute the same key. */
  def zorderOracleSql: String = {
    val bits = 10
    val z = zkeySql("xd", "yd", bits)
    s"""WITH e AS (SELECT event_id,
           user_id % ${1L << bits} AS xd,
           (greatest(CAST(epoch_ms(ts) AS BIGINT), 0) // 60000) % ${1L << bits} AS yd
         FROM events),
       k AS (SELECT event_id, xd, yd, $z AS z FROM e)
       SELECT (z // 4096) AS z_bucket, CAST(count(*) AS BIGINT) AS n,
         min(xd) AS min_x, max(xd) AS max_x,
         min(yd) AS min_y, max(yd) AS max_y
       FROM k GROUP BY 1 ORDER BY z_bucket"""
  }

  /** Hilbert index of the low `bits`-bit cell (x, y) — the canonical
    * xy2d recurrence via the custom codegen expression
    * [[graft.functions.HilbertIndexExpr]] (the recurrence carries
    * rotation state bit-to-bit, so a composed-`when` formulation
    * grows ~5^bits expression nodes — the one case in the layout
    * toolkit where built-ins can't express the computation; see the
    * expression's notes). Versus the Morton [[zkey]], Hilbert removes
    * the long diagonal jumps between quadrant boundaries, so
    * UNALIGNED key ranges (a scan's file split rarely lands on a 4^k
    * boundary) stay spatially tighter; aligned 4^k ranges are exact
    * quadrants for both curves (ZOrderSpec pins the bijection, the
    * unit-step adjacency, and the quadrant bound). Requires
    * `CurveFunctions.register` on the session. */
  def hkey(x0: Column, y0: Column, bits: Int = 16): Column =
    graft.functions.CurveFunctions.hilbert(
      x0.cast("long"), y0.cast("long"), bits)

  /** Re-layout a frame along the Hilbert curve of two dimension
    * columns — [[zorderLayout]]'s twin, preferable when scans slice
    * the table at arbitrary (unaligned) key offsets. */
  def hilbertLayout(df: DataFrame, colX: String, colY: String,
                    partitions: Int, bits: Int = 16): DataFrame = {
    graft.functions.CurveFunctions.register(df.sparkSession)
    df.withColumn("__h", hkey(col(colX), col(colY), bits))
      .repartitionByRange(partitions, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
  }

  /** q193: the Hilbert twin of q54 — same dimensions, same bucket
    * width, per-bucket min/max stats. Because 4096 = 4^6, every
    * bucket is one aligned curve segment = one 64×64 quadrant, so
    * per-bucket ranges are BOUNDED BY CONSTRUCTION (≤ 63 on both
    * dims) — the locality guarantee a file-skipping layout wants,
    * here visible in the output itself. */
  def hilbertQuery(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CurveFunctions.register(spark)
    val bits = 10
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("greatest(unix_millis(ts), 0L) div 60000").as("tmin"))
      .withColumn("xd", col("user_id") % (1L << bits))
      .withColumn("yd", col("tmin") % (1L << bits))
    ev.withColumn("h", hkey(col("xd"), col("yd"), bits))
      .withColumn("h_bucket", expr("h div 4096"))
      .groupBy("h_bucket")
      .agg(count(lit(1)).as("n"),
        min(col("xd")).as("min_x"), max(col("xd")).as("max_x"),
        min(col("yd")).as("min_y"), max(col("yd")).as("max_y"))
      .select(col("h_bucket"), col("n").cast("long").as("n"),
        col("min_x"), col("max_x"), col("min_y"), col("max_y"))
      .orderBy("h_bucket")
  }

  /** DuckDB oracle for [[hilbertQuery]] — the same recurrence run as
    * a per-level RECURSIVE CTE (state (x, y, d) threaded down the
    * `bits` levels), from the same constants. */
  def hilbertOracleSql: String = {
    val bits = 10
    val n1 = (1L << bits) - 1L
    s"""WITH RECURSIVE e AS (SELECT event_id,
           user_id % ${1L << bits} AS xd,
           (greatest(CAST(epoch_ms(ts) AS BIGINT), 0) // 60000) % ${1L << bits} AS yd
         FROM events),
       hil AS (
         SELECT event_id, xd, yd, CAST(xd AS BIGINT) AS x,
           CAST(yd AS BIGINT) AS y, CAST(0 AS BIGINT) AS d,
           ${bits - 1} AS i
         FROM e
         UNION ALL
         SELECT event_id, xd, yd,
           CASE WHEN ((y >> i) & 1) = 0 THEN
             CASE WHEN ((x >> i) & 1) = 1 THEN $n1 - y ELSE y END
           ELSE x END,
           CASE WHEN ((y >> i) & 1) = 0 THEN
             CASE WHEN ((x >> i) & 1) = 1 THEN $n1 - x ELSE x END
           ELSE y END,
           d + (CAST(1 AS BIGINT) << (2 * i))
             * xor(3 * ((x >> i) & 1), (y >> i) & 1),
           i - 1
         FROM hil WHERE i >= 0),
       k AS (SELECT event_id, xd, yd, d AS h FROM hil WHERE i = -1)
     SELECT (h // 4096) AS h_bucket, CAST(count(*) AS BIGINT) AS n,
       min(xd) AS min_x, max(xd) AS max_x,
       min(yd) AS min_y, max(yd) AS max_y
     FROM k GROUP BY 1 ORDER BY h_bucket"""
  }
}
