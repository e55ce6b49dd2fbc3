package graft

import org.apache.spark.sql.functions._
import graft.quality.ObservedMetrics

class ObservedMetricsSpec extends SparkSpec {

  test("observed metrics equal a dedicated aggregation pass") {
    val row = ObservedMetrics.observedWriteQuery(spark, sf0001)
      .collect().head
    val direct = graft.sources.Tables.documents(spark, sf0001)
      .filter(col("n_chars") >= ObservedMetrics.MinChars &&
        col("n_chars") <= ObservedMetrics.MaxChars &&
        col("lang").isin("en", "de"))
      .agg(count(lit(1)), sum(length(col("text"))),
        min(col("doc_id")), max(col("doc_id")),
        sum(length(col("text")) -
          length(translate(col("text"), " ", ""))))
      .collect().head
    assert(row.getAs[Long]("n_docs") == direct.getLong(0))
    assert(row.getAs[Long]("n_chars_total") == direct.getLong(1))
    assert(row.getAs[Long]("n_empty") == 0L)
    assert(row.getAs[Long]("min_doc_id") == direct.getLong(2))
    assert(row.getAs[Long]("max_doc_id") == direct.getLong(3))
    assert(row.getAs[Long]("n_spaces") == direct.getLong(4))
  }

  test("observed write is repeatable — fresh Observation per call") {
    val a = ObservedMetrics.observedWriteQuery(spark, sf0001).collect()
    val b = ObservedMetrics.observedWriteQuery(spark, sf0001).collect()
    assert(a.sameElements(b))
  }
}
