package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Streamlit client-side analytics (reference streamlit_app.py:
  * 263-303) as engine-side transforms — the second, in-process pandas
  * "engine" of the reference collapses into the main query plan, so
  * the driver never holds the full result set.
  */
object Analytics {

  /** A4: grouped sum for charting (streamlit_app.py:275,301). */
  def groupedSum(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(keyCol).agg(sum(col(valueCol)).as("total"))

  /** O3: top-K groups by aggregate — nlargest(10) (streamlit_app.py:278).
    * Compiles to TakeOrderedAndProject: no global sort at scale. */
  def topKByAggregate(df: DataFrame, keyCol: String, valueCol: String,
                      k: Int): DataFrame =
    groupedSum(df, keyCol, valueCol)
      .orderBy(col("total").desc, col(keyCol).asc)
      .limit(k)

  /** P6: membership filter against the top-K set (streamlit_app.py:281)
    * — a left-semi join, not a collected list, so it composes at scale. */
  def filterToTopK(df: DataFrame, keyCol: String, valueCol: String,
                   k: Int): DataFrame =
    df.join(topKByAggregate(df, keyCol, valueCol, k).select(keyCol),
      Seq(keyCol), "left_semi")

  /** O4: top and bottom K rows by a value column
    * (streamlit_app.py:285-287 sort_values.head/tail). */
  def topAndBottomK(df: DataFrame, valueCol: String, tieBreak: String,
                    k: Int): (DataFrame, DataFrame) =
    (df.orderBy(col(valueCol).desc, col(tieBreak).asc).limit(k),
      df.orderBy(col(valueCol).asc, col(tieBreak).asc).limit(k))
}
