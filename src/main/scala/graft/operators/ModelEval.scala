package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Model-evaluation metrics — the reporting layer every training-data
  * pipeline ends in: given (true label, predicted label) pairs, the
  * confusion structure and the per-class precision / recall / F1
  * derived from it. The predictions under test come from a
  * DETERMINISTIC stand-in classifier (argmax over the first
  * [[EvalDims]] embedding dimensions — first occurrence on ties, the
  * same rule both engines' position-of-max primitives apply to the
  * same parquet floats), because what is being certified is the METRIC
  * arithmetic, not the model: swap in real predictions and the
  * operators are unchanged.
  *
  * Scale shape: predictions are a narrow projection (no shuffle); the
  * confusion matrix is ONE (label, pred) aggregation whose output is
  * classes² rows — metadata-scale, like the Markov transition build —
  * and every derived metric is arithmetic over that tiny frame. All
  * rationals are e6 integers (floor division), so the DuckDB oracle
  * hash-checks exactly.
  */
object ModelEval {

  /** Leading embedding dimensions the stand-in classifier scores. */
  val EvalDims = 10

  /** (label, pred) pairs from the argmax stand-in classifier. */
  private def predictions(emb: DataFrame): DataFrame =
    emb.select(col("label").cast("long").as("label"),
      (array_position(slice(col("embedding"), 1, EvalDims),
        array_max(slice(col("embedding"), 1, EvalDims))) - 1)
        .cast("long").as("pred"))

  /** q179: per-class evaluation report — support, predicted count,
    * true positives, precision / recall / F1 (e6). Classes missing
    * from either side of the confusion matrix still report (zeroes),
    * so the output is total over observed classes. */
  def classifierEvalQuery(spark: SparkSession, dir: String): DataFrame =
    classifierEval(predictions(Tables.embeddings(spark, dir)))

  /** [[classifierEvalQuery]]'s core over any (label, pred) frame. */
  def classifierEval(pairs: DataFrame): DataFrame = {
    val conf = pairs.groupBy("label", "pred")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // classes² rows feed four derivations
    val classes = conf.select(col("label").as("c"))
      .union(conf.select(col("pred").as("c"))).distinct()
    val tr = conf.groupBy(col("label").as("c")).agg(sum("n").as("n_true"))
    val pr = conf.groupBy(col("pred").as("c")).agg(sum("n").as("n_pred"))
    val tp = conf.filter(col("label") === col("pred"))
      .select(col("label").as("c"), col("n").as("tp"))
    classes
      .join(tr, Seq("c"), "left").join(pr, Seq("c"), "left")
      .join(tp, Seq("c"), "left")
      .select(col("c").as("label"),
        coalesce(col("n_true"), lit(0L)).cast("long").as("n_true"),
        coalesce(col("n_pred"), lit(0L)).cast("long").as("n_pred"),
        coalesce(col("tp"), lit(0L)).cast("long").as("tp"))
      .withColumn("precision_e6",
        expr("CASE WHEN n_pred > 0 THEN tp * 1000000 div n_pred ELSE 0 END"))
      .withColumn("recall_e6",
        expr("CASE WHEN n_true > 0 THEN tp * 1000000 div n_true ELSE 0 END"))
      .withColumn("f1_e6",
        expr("""CASE WHEN precision_e6 + recall_e6 > 0
               THEN 2 * precision_e6 * recall_e6 div (precision_e6 + recall_e6)
               ELSE 0 END"""))
      .orderBy("label")
  }

  /** DuckDB oracle for [[classifierEvalQuery]] — same argmax rule
    * (list_position takes the first occurrence, as array_position
    * does), same confusion derivations, same e6 floors. */
  def classifierEvalOracleSql: String =
    s"""WITH p AS (SELECT CAST(label AS BIGINT) AS label,
           CAST(list_position(embedding[1:$EvalDims],
             list_max(embedding[1:$EvalDims])) - 1 AS BIGINT) AS pred
         FROM embeddings),
       conf AS (SELECT label, pred, count(*) AS n FROM p GROUP BY 1, 2),
       cl AS (SELECT label AS c FROM conf UNION SELECT pred FROM conf),
       tr AS (SELECT label AS c, sum(n) AS n_true FROM conf GROUP BY 1),
       pr AS (SELECT pred AS c, sum(n) AS n_pred FROM conf GROUP BY 1),
       tp AS (SELECT label AS c, n AS tp FROM conf WHERE label = pred),
       base AS (SELECT cl.c AS label,
           coalesce(tr.n_true, 0) AS n_true,
           coalesce(pr.n_pred, 0) AS n_pred,
           coalesce(tp.tp, 0) AS tp
         FROM cl LEFT JOIN tr ON tr.c = cl.c
           LEFT JOIN pr ON pr.c = cl.c LEFT JOIN tp ON tp.c = cl.c),
       m AS (SELECT *,
           CASE WHEN n_pred > 0 THEN tp * 1000000 // n_pred ELSE 0 END
             AS precision_e6,
           CASE WHEN n_true > 0 THEN tp * 1000000 // n_true ELSE 0 END
             AS recall_e6
         FROM base)
     SELECT CAST(label AS BIGINT) AS label,
       CAST(n_true AS BIGINT) AS n_true, CAST(n_pred AS BIGINT) AS n_pred,
       CAST(tp AS BIGINT) AS tp,
       CAST(precision_e6 AS BIGINT) AS precision_e6,
       CAST(recall_e6 AS BIGINT) AS recall_e6,
       CAST(CASE WHEN precision_e6 + recall_e6 > 0
         THEN 2 * precision_e6 * recall_e6 // (precision_e6 + recall_e6)
         ELSE 0 END AS BIGINT) AS f1_e6
     FROM m ORDER BY label"""

  /** Stand-in binary scorer for the ranking metrics: outcome =
    * (label >= 5), score = the first embedding dimension quantized to
    * an integer by round(double(x) · 1024) — float→double is exact
    * and 1024 a power of two, so both engines round identical doubles
    * (the q56 quantization rule). The score is intentionally a WEAK
    * predictor (the embedding dims don't encode the label strongly),
    * which is what makes the AUC/ROC output informative: a
    * degenerate always-1.0 metric would certify nothing about the
    * tie and midrank arithmetic. */
  private def scored(emb: DataFrame): DataFrame =
    emb.select(
      when(col("label").cast("long") >= 5, 1L).otherwise(0L).as("pos"),
      round(element_at(col("embedding"), 1).cast("double") * 1024, 0)
        .cast("long").as("score"))

  /** Per-distinct-score class histogram — the ONE aggregation over
    * the corpus that both ranking metrics derive from. Quantization
    * bounds distinct scores (≈ ±4·1024 for unit-scale dims), so the
    * histogram is metadata-scale regardless of corpus size, and the
    * windows/totals downstream run over THAT frame, never the data. */
  private def scoreHist(emb: DataFrame): DataFrame =
    scored(emb).groupBy("score")
      .agg(sum(col("pos")).as("np"),
        (count(lit(1)) - sum(col("pos"))).as("nn"))

  /** q184: tie-corrected Mann-Whitney AUC from the score histogram —
    * one row: positive/negative counts, 2U (the doubled rank-sum
    * statistic, exactly integral even with midrank tie handling:
    * 2U = Σ_s np(s)·(2·cum_nn_below(s) + nn(s))), and
    * auc_e6 = 2U·10^6 div (2·npos·nneg). Computing AUC from the
    * histogram instead of a global row rank is the scale move: no
    * global sort, no unbounded window — one groupBy(score) with
    * map-side combine, then arithmetic over ~thousands of rows. */
  def aucQuery(spark: SparkSession, dir: String): DataFrame =
    auc(Tables.embeddings(spark, dir))

  /** [[aucQuery]]'s core over any embeddings frame. */
  def auc(emb: DataFrame): DataFrame = {
    val w = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    // The unpartitioned window runs over the metadata-scale histogram
    // (the documented blocked-rank exemption), not the corpus.
    val cum = scoreHist(emb)
      .withColumn("cum_nn", coalesce(sum(col("nn")).over(w), lit(0L)))
    cum.agg(
        sum(col("np")).cast("long").as("npos"),
        sum(col("nn")).cast("long").as("nneg"),
        sum(col("np") * (lit(2L) * col("cum_nn") + col("nn")))
          .cast("long").as("u2"))
      .withColumn("auc_e6",
        expr("CAST(CASE WHEN npos > 0 AND nneg > 0 " +
          "THEN u2 * 1000000 div (2 * npos * nneg) ELSE 0 END AS BIGINT)"))
  }

  /** q185: the ROC curve at every distinct score threshold — for the
    * rule "predict positive when score >= s": true/false positives
    * and tpr/fpr as e6 integers. Same histogram, one descending
    * cumulative window over it; |rows| = |distinct scores|, bounded
    * by the quantization. */
  def rocCurveQuery(spark: SparkSession, dir: String): DataFrame =
    rocCurve(Tables.embeddings(spark, dir))

  /** [[rocCurveQuery]]'s core over any embeddings frame. */
  def rocCurve(emb: DataFrame): DataFrame = {
    val desc = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    scoreHist(emb)
      .select(col("score"),
        sum(col("np")).over(desc).cast("long").as("tp"),
        sum(col("nn")).over(desc).cast("long").as("fp"),
        sum(col("np")).over(tot).cast("long").as("npos"),
        sum(col("nn")).over(tot).cast("long").as("nneg"))
      .withColumn("tpr_e6",
        expr("CAST(CASE WHEN npos > 0 THEN tp * 1000000 div npos " +
          "ELSE 0 END AS BIGINT)"))
      .withColumn("fpr_e6",
        expr("CAST(CASE WHEN nneg > 0 THEN fp * 1000000 div nneg " +
          "ELSE 0 END AS BIGINT)"))
      .select(col("score"), col("tp"), col("fp"), col("tpr_e6"),
        col("fpr_e6"))
      .orderBy("score")
  }

  /** q186: the precision-recall curve at every distinct score
    * threshold — same descending cumulative pass as the ROC, with
    * precision over the predicted-positive count instead of fpr.
    * All divisions are non-negative e6 floors. */
  def prCurveQuery(spark: SparkSession, dir: String): DataFrame =
    prCurve(Tables.embeddings(spark, dir))

  /** [[prCurveQuery]]'s core over any embeddings frame. */
  def prCurve(emb: DataFrame): DataFrame = {
    val desc = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    scoreHist(emb)
      .select(col("score"),
        sum(col("np")).over(desc).cast("long").as("tp"),
        sum(col("nn")).over(desc).cast("long").as("fp"),
        sum(col("np")).over(tot).cast("long").as("npos"))
      .withColumn("precision_e6",
        expr("CAST(CASE WHEN tp + fp > 0 THEN tp * 1000000 div (tp + fp) " +
          "ELSE 0 END AS BIGINT)"))
      .withColumn("recall_e6",
        expr("CAST(CASE WHEN npos > 0 THEN tp * 1000000 div npos " +
          "ELSE 0 END AS BIGINT)"))
      .select(col("score"), col("tp"), col("fp"), col("precision_e6"),
        col("recall_e6"))
      .orderBy("score")
  }

  /** q187: average precision — the PR curve summarized to one number
    * by the step-wise IR definition AP = Σ_k Δrecall_k · precision_k,
    * in exact integer arithmetic: Δrecall_k = Δtp_k / npos, so
    * ap_e6 = (Σ_k Δtp_k · precision_e6_k) div npos with each term
    * integral. Thresholds descend (the sum visits high scores first),
    * and Δtp at a threshold is that score's own np — no lag window
    * needed, the histogram already holds it. */
  def avgPrecisionQuery(spark: SparkSession, dir: String): DataFrame =
    avgPrecision(Tables.embeddings(spark, dir))

  /** [[avgPrecisionQuery]]'s core over any embeddings frame. */
  def avgPrecision(emb: DataFrame): DataFrame = {
    val desc = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val terms = scoreHist(emb)
      .select(col("np"),
        sum(col("np")).over(desc).as("tp"),
        sum(col("np") + col("nn")).over(desc).as("pred"))
      .withColumn("prec_e6",
        expr("CASE WHEN pred > 0 THEN tp * 1000000 div pred ELSE 0 END"))
    terms.agg(
        sum(col("np")).cast("long").as("npos"),
        sum(col("np") * col("prec_e6")).cast("long").as("term_sum"))
      .withColumn("ap_e6",
        expr("CAST(CASE WHEN npos > 0 THEN term_sum div npos " +
          "ELSE 0 END AS BIGINT)"))
  }

  /** Calibration bin width in quantized-score units (64 = 1/16 of a
    * unit of the underlying dimension — sized so unit-normalized
    * embedding dims spread over ~a dozen bins). */
  val CalibrationBinWidth = 64L

  /** q188: the reliability table — scores bucketed into fixed-width
    * bins, each bin reporting its population, positives, and the
    * empirical positive rate (e6). With a probabilistic scorer this
    * is the reliability diagram's data; with the stand-in scorer it
    * certifies the binning + rate arithmetic. Bin ids use a
    * non-negative shifted dividend so floor-vs-truncate division
    * semantics can never diverge between engines. */
  def calibrationQuery(spark: SparkSession, dir: String): DataFrame =
    calibration(Tables.embeddings(spark, dir))

  /** [[calibrationQuery]]'s core over any embeddings frame. */
  def calibration(emb: DataFrame): DataFrame = {
    val w = CalibrationBinWidth
    scored(emb)
      .select(col("pos"), expr(s"(score + 4096) div $w").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("pos")).cast("long").as("n_pos"))
      .select(col("bin").cast("long").as("bin"),
        expr(s"CAST(bin * $w - 4096 AS BIGINT)").as("bin_lo"),
        col("n"), col("n_pos"),
        expr("CAST(n_pos * 1000000 div n AS BIGINT)").as("pos_rate_e6"))
      .orderBy("bin")
  }

  /** Shared oracle CTE: the stand-in scorer + score histogram. */
  private def scoreHistSql: String =
    """WITH p AS (SELECT
           CASE WHEN CAST(label AS BIGINT) >= 5 THEN 1 ELSE 0 END AS pos,
           CAST(round(CAST(embedding[1] AS DOUBLE) * 1024) AS BIGINT)
             AS score
         FROM embeddings),
       h AS (SELECT score, sum(pos) AS np, count(*) - sum(pos) AS nn
             FROM p GROUP BY 1)"""

  /** DuckDB oracle for [[aucQuery]]. */
  def aucOracleSql: String =
    s"""$scoreHistSql,
       c AS (SELECT np, nn,
           coalesce(sum(nn) OVER (ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS cum_nn
         FROM h)
     SELECT CAST(sum(np) AS BIGINT) AS npos,
       CAST(sum(nn) AS BIGINT) AS nneg,
       CAST(sum(np * (2 * cum_nn + nn)) AS BIGINT) AS u2,
       CAST(CASE WHEN sum(np) > 0 AND sum(nn) > 0
         THEN sum(np * (2 * cum_nn + nn)) * 1000000
           // (2 * sum(np) * sum(nn))
         ELSE 0 END AS BIGINT) AS auc_e6
     FROM c"""

  /** DuckDB oracle for [[rocCurveQuery]]. */
  def rocCurveOracleSql: String =
    s"""$scoreHistSql,
       c AS (SELECT score,
           sum(np) OVER (ORDER BY score DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
           sum(nn) OVER (ORDER BY score DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
           sum(np) OVER () AS npos, sum(nn) OVER () AS nneg
         FROM h)
     SELECT score, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(CASE WHEN npos > 0 THEN tp * 1000000 // npos ELSE 0 END
         AS BIGINT) AS tpr_e6,
       CAST(CASE WHEN nneg > 0 THEN fp * 1000000 // nneg ELSE 0 END
         AS BIGINT) AS fpr_e6
     FROM c ORDER BY score"""

  /** DuckDB oracle for [[prCurveQuery]]. */
  def prCurveOracleSql: String =
    s"""$scoreHistSql,
       c AS (SELECT score,
           sum(np) OVER (ORDER BY score DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
           sum(nn) OVER (ORDER BY score DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
           sum(np) OVER () AS npos
         FROM h)
     SELECT score, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp)
         ELSE 0 END AS BIGINT) AS precision_e6,
       CAST(CASE WHEN npos > 0 THEN tp * 1000000 // npos ELSE 0 END
         AS BIGINT) AS recall_e6
     FROM c ORDER BY score"""

  /** DuckDB oracle for [[avgPrecisionQuery]]. */
  def avgPrecisionOracleSql: String =
    s"""$scoreHistSql,
       c AS (SELECT np,
           sum(np) OVER (ORDER BY score DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
           sum(np + nn) OVER (ORDER BY score DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pred
         FROM h),
       t AS (SELECT np,
           CASE WHEN pred > 0 THEN tp * 1000000 // pred ELSE 0 END
             AS prec_e6
         FROM c)
     SELECT CAST(sum(np) AS BIGINT) AS npos,
       CAST(sum(np * prec_e6) AS BIGINT) AS term_sum,
       CAST(CASE WHEN sum(np) > 0 THEN sum(np * prec_e6) // sum(np)
         ELSE 0 END AS BIGINT) AS ap_e6
     FROM t"""

  /** DuckDB oracle for [[calibrationQuery]]. */
  def calibrationOracleSql: String =
    s"""WITH p AS (SELECT
           CASE WHEN CAST(label AS BIGINT) >= 5 THEN 1 ELSE 0 END AS pos,
           CAST(round(CAST(embedding[1] AS DOUBLE) * 1024) AS BIGINT)
             AS score
         FROM embeddings),
       b AS (SELECT (score + 4096) // $CalibrationBinWidth AS bin,
           count(*) AS n, sum(pos) AS n_pos
         FROM p GROUP BY 1)
     SELECT CAST(bin AS BIGINT) AS bin,
       CAST(bin * $CalibrationBinWidth - 4096 AS BIGINT) AS bin_lo,
       CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_pos * 1000000 // n AS BIGINT) AS pos_rate_e6
     FROM b ORDER BY bin"""
}
