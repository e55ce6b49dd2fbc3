package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** Ranked keyword retrieval over the documents corpus — the search
  * counterpart to [[graft.operators.TextAnalysis]]'s TF-IDF corpus
  * statistics: BM25 scoring (Robertson & Walker 1994; the Okapi
  * formulation with Lucene's ln(1 + ·) idf so scores never go
  * negative at high document frequency).
  *
  * Arithmetic discipline: the tf-saturation / length-normalization
  * part of BM25 is an exact integer rational here — with k1 = 1.2 and
  * b = 0.75, the denominator tf + k1(1-b) + k1·b·dl/avgdl scales by
  * 1000 into `tf*1000 + 300 + (900*dl*1000) div avgdl_e3`, so both
  * engines truncate identically and the hash check is exact. Only the
  * per-TERM idf touches doubles (ln has no integer form), and it is
  * quantized with the repo's proven round-6/truncate pattern on a
  * term-count-sized frame — the same cross-engine exposure the cosine
  * family already carries.
  */
object Retrieval {

  /** Fixed probe query for q223 — terms present in the synthetic
    * corpus vocabulary; the machinery is query-agnostic. */
  val QueryTerms: Seq[String] = Seq("spark", "join", "window")

  /** Rows q223 returns. */
  val TopK = 50

  /** q223: BM25 top-[[TopK]] documents for [[QueryTerms]].
    *
    * Scale shape: one tokenize pass; the term-frequency frame is
    * filtered to the QUERY terms at the explode (so the shuffled
    * frame is |matching postings|, not |corpus tokens|); document
    * frequencies and idf live on a term-count-sized frame that
    * broadcasts; corpus length stats are one aggregated row crossed
    * back by broadcast. Final ranking is a TakeOrdered top-k, never a
    * global sort. At 100 TB the posting construction is the classic
    * inverted-index build (compare `CorpusStats.postingLists`), and
    * the only full-corpus pass is the linear tokenize+filter. */
  def bm25Query(spark: SparkSession, dir: String): DataFrame =
    bm25(Tables.documents(spark, dir), QueryTerms, TopK)

  /** [[bm25Query]]'s core over any (doc_id, text) frame. */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val d = docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        size(col("t")).cast("long").as("dl"))
    // one-row corpus stats: N and total token count -> avgdl_e3
    val stats = d.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_len"))
      .withColumn("avgdl_e3", expr("total_len * 1000 div n_docs"))
    val tf = d.select(col("doc_id"), col("dl"), explode(col("t")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
    // df and idf on a |terms|-sized frame; ln is the one double op,
    // quantized with the proven round-6/truncate pattern
    val idf = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats.select("n_docs")))
      .withColumn("idf_e6",
        (round(expr("ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"), 6)
          * 1000000).cast("long"))
      .select("tok", "idf_e6")
    tf.join(broadcast(idf), Seq("tok"))
      .crossJoin(broadcast(stats.select("avgdl_e3")))
      .withColumn("d_e3",
        expr("tf * 1000 + 300 + (900 * dl * 1000) div avgdl_e3"))
      .withColumn("s_e6",
        expr("idf_e6 * ((2200 * tf * 1000000) div d_e3) div 1000000"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum(col("s_e6")).cast("long").as("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id").asc)
      .limit(k)
  }

  /** DuckDB oracle for [[bm25Query]] — same tokenizer, same integer
    * rationals, same idf quantization (constants interpolated). */
  def bm25OracleSql: String = {
    val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH tk AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\\s+') AS t
         FROM documents),
       d AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS dl FROM tk),
       st AS (SELECT count(*) AS n_docs, sum(dl) AS total_len,
                sum(dl) * 1000 // count(*) AS avgdl_e3 FROM d),
       tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM
                (SELECT doc_id, dl, unnest(t) AS tok FROM d)
              WHERE tok IN ($termList) GROUP BY 1, 2, 3),
       idf AS (SELECT tok,
           CAST(trunc(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6)
             * 1000000) AS BIGINT) AS idf_e6
         FROM (SELECT tok, count(*) AS df FROM tf GROUP BY 1)
         CROSS JOIN st),
       ts AS (SELECT tf.doc_id,
           idf_e6 * ((2200 * tf * 1000000)
             // (tf * 1000 + 300 + (900 * dl * 1000) // avgdl_e3))
             // 1000000 AS s_e6
         FROM tf JOIN idf USING (tok) CROSS JOIN st)
     SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(s_e6) AS BIGINT) AS score_e6
     FROM ts GROUP BY 1 ORDER BY score_e6 DESC, doc_id LIMIT $TopK"""
  }
}
