package graft

import graft.operators.ModelEval

/** q179 metric arithmetic on hand-built (label, pred) pairs. */
class ModelEvalSpec extends SparkSpec {
  import spark.implicits._

  private def eval(pairs: (Long, Long)*) =
    ModelEval.classifierEval(pairs.toDF("label", "pred"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap

  test("perfect classifier: all three metrics at 1e6 for every class") {
    val m = eval((0L, 0L), (1L, 1L), (1L, 1L))
    assert(m(0L) == ((1L, 1L, 1L, 1000000L, 1000000L, 1000000L)))
    assert(m(1L) == ((2L, 2L, 2L, 1000000L, 1000000L, 1000000L)))
  }

  test("known confusion: floors verified by hand") {
    // labels 0,0,1,1 / preds 0,1,1,1
    val m = eval((0L, 0L), (0L, 1L), (1L, 1L), (1L, 1L))
    // class 0: tp=1, n_pred=1, n_true=2 -> p=1e6, r=5e5, f1=666666
    assert(m(0L) == ((2L, 1L, 1L, 1000000L, 500000L, 666666L)))
    // class 1: tp=2, n_pred=3, n_true=2 -> p=666666, r=1e6, f1=799999
    assert(m(1L) == ((2L, 3L, 2L, 666666L, 1000000L, 799999L)))
  }

  test("never-predicted and predicted-only classes report zeroed metrics") {
    val m = eval((0L, 5L), (0L, 5L))
    // class 0 exists only as a truth: no predictions, no tp
    assert(m(0L) == ((2L, 0L, 0L, 0L, 0L, 0L)))
    // class 5 exists only as a prediction: present, recall zero
    assert(m(5L) == ((0L, 2L, 0L, 0L, 0L, 0L)))
  }

  test("q179 full query: supports sum to the table size, metrics bounded") {
    val rows = ModelEval.classifierEvalQuery(spark, sf0001).collect()
    val total = graft.sources.Tables.embeddings(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.map(_.getLong(2)).sum == total)
    assert(rows.forall(r => (4 to 6).forall(i =>
      r.getLong(i) >= 0L && r.getLong(i) <= 1000000L)))
  }
}
