package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (backward) join — the time-series operator Spark lacks
  * natively: for each probe row, attach the build row with the
  * greatest `time` <= the probe's `time` within the same `key`
  * (inclusive on ties), null when no build row precedes.
  *
  * Per the custom-operator preference order, this COMPOSES built-ins
  * rather than adding a plan node: tag both sides, `unionByName`,
  * then `last(attached, ignoreNulls)` over a
  * (key, time, side) ordered window with an unbounded-preceding
  * frame; probe rows carry null attach values, so `last` skips them
  * and each probe row reads the latest preceding build value.
  *
  * All attach columns ride in ONE struct column filled by a single
  * `last(struct, ignoreNulls)`: a build row whose individual attach
  * value is null still produces a non-null struct, so the matched
  * row's nulls are attached as-is (DuckDB ASOF JOIN semantics) rather
  * than each column independently falling back to an older row.
  *
  * Scale shape: ONE shuffle+sort of probe+build on `key` — the same
  * cost as a sort-merge join — where the naive theta-join
  * (`p.key = b.key AND b.t <= p.t` + max-per-probe) fans out every
  * probe row against EVERY earlier build row first (quadratic per
  * key). Build rows must be unique per (key, time); pre-dedup
  * otherwise.
  *
  * Attached columns come back as `asof_<name>` appended to the probe
  * schema.
  */
object AsOfJoin {

  def asOfJoin(probe: DataFrame, build: DataFrame, key: String,
               time: String, attach: Seq[String]): DataFrame = {
    require(attach.nonEmpty, "attach at least one build column")
    val packType = StructType(attach.map(a =>
      StructField(a, build.schema(a).dataType, nullable = true)))
    val pTagged = probe.withColumn("__side", lit(1))
      .withColumn("__asof", lit(null).cast(packType))
    val bTagged = build.select(
      col(key), col(time), lit(0).as("__side"),
      struct(attach.map(col): _*).as("__asof"))
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = pTagged.unionByName(bTagged, allowMissingColumns = true)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
    val out = filled.filter(col("__side") === 1).drop("__side")
    attach.foldLeft(out)((df, a) =>
      df.withColumn(s"asof_$a", col("__asof")(a)))
      .drop("__asof")
  }
}
