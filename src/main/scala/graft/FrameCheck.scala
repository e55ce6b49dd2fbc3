package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The identity-check primitive the maintenance/IVM queries assert
  * with: row-for-row agreement of two keyed frames, computed as a
  * full-outer join so a key missing from EITHER side counts as a
  * disagreement (its value columns are null on the other side). The
  * value comparison is deliberately null-hostile — `isNull` on either
  * side counts — which is the safe default for these checks: every
  * compared column is non-null by construction, so a null can only
  * mean a dropped or extra key. One definition here keeps the
  * null-handling subtlety derived once instead of re-derived at every
  * call site. */
object FrameCheck {

  /** Number of keys on which `left` and `right` disagree: present on
    * only one side, or differing in any of `vals`. Both frames must
    * carry `keys` and `vals` under the same names (rename before
    * calling). Zero iff the frames agree row-for-row. */
  def disagreements(left: DataFrame, right: DataFrame,
      keys: Seq[String], vals: Seq[String]): Long = {
    val renamed = vals.foldLeft(
      right.select((keys ++ vals).map(col): _*))(
      (d, v) => d.withColumnRenamed(v, s"__r_$v"))
    left.select((keys ++ vals).map(col): _*)
      .join(renamed, keys, "full")
      .filter(vals.map(v => col(v).isNull || col(s"__r_$v").isNull ||
        col(v) =!= col(s"__r_$v")).reduce(_ || _))
      .count()
  }

  /** [[disagreements]] for frames whose value columns are LEGITIMATELY
    * nullable (e.g. a skipping index's min/max, null when a file's
    * column chunk carries no statistics): values compare null-safely
    * (`<=>` — two nulls agree), and key presence is tracked with
    * explicit marker columns so a key missing from one side still
    * counts even when every value column is null. */
  def disagreementsNullSafe(left: DataFrame, right: DataFrame,
      keys: Seq[String], vals: Seq[String]): Long = {
    val l = left.select((keys ++ vals).map(col): _*)
      .withColumn("__l_present", lit(true))
    val r = vals.foldLeft(
      right.select((keys ++ vals).map(col): _*))(
      (d, v) => d.withColumnRenamed(v, s"__r_$v"))
      .withColumn("__r_present", lit(true))
    l.join(r, keys, "full")
      .filter(col("__l_present").isNull || col("__r_present").isNull ||
        vals.map(v => !(col(v) <=> col(s"__r_$v"))).reduce(_ || _))
      .count()
  }
}
