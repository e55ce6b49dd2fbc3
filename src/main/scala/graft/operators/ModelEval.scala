package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
