package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * Scale shape: ONE shuffle+sort of probe+build on `key` — the same
  * cost as a sort-merge join — where the naive theta-join
  * (`p.key = b.key AND b.t <= p.t` + max-per-probe) fans out every
  * probe row against EVERY earlier build row first (quadratic per
  * key). Build rows must be unique per (key, time); pre-dedup
  * otherwise (a genuinely-null attach value is treated as absent —
  * `last` skips nulls).
  *
  * Attached columns come back as `asof_<name>` appended to the probe
  * schema.
  */
object AsOfJoin {

  def asOfJoin(probe: DataFrame, build: DataFrame, key: String,
               time: String, attach: Seq[String]): DataFrame = {
    require(attach.nonEmpty, "attach at least one build column")
    val pTagged = attach.foldLeft(probe.withColumn("__side", lit(1))) {
      (df, a) =>
        df.withColumn(s"__asof_$a",
          lit(null).cast(build.schema(a).dataType))
    }
    val bTagged = build.select(
      col(key) +: col(time) +: lit(0).as("__side") +:
        attach.map(a => col(a).as(s"__asof_$a")): _*)
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = attach.foldLeft(
      pTagged.unionByName(bTagged, allowMissingColumns = true)) {
      (df, a) =>
        df.withColumn(s"__asof_$a",
          last(col(s"__asof_$a"), ignoreNulls = true).over(w))
    }
    val out = filled.filter(col("__side") === 1).drop("__side")
    attach.foldLeft(out)((df, a) =>
      df.withColumnRenamed(s"__asof_$a", s"asof_$a"))
  }
}
