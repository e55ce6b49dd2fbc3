package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Similarity

class VectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("codegen'd graft_dot is bit-identical to the HOF formulation") {
    VectorFunctions.register(spark)
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
    val both = emb.crossJoin(broadcast(q))
      .select(
        VectorFunctions.dot($"embedding", $"q_emb").as("cg"),
        Similarity.dotHof($"embedding", $"q_emb").as("hof"))
    assert(both.filter($"cg" =!= $"hof").count() == 0)
  }

  test("graft_dot null and edge semantics") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])))
      .toDF("a", "b")
      .select(VectorFunctions.dot($"a", $"b").as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("graft_dot is usable from pure SQL after registration") {
    VectorFunctions.register(spark)
    graft.sources.Tables.embeddings(spark, sf0001)
      .createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      """SELECT vec_id, graft_dot(embedding, embedding) AS sq
         FROM emb_sql ORDER BY vec_id LIMIT 1""").collect()
    assert(math.abs(r.head.getDouble(1) - 1.0) < 1e-3) // unit-norm testdata
  }

  test("extension class wires every custom-function builder") {
    // `spark.sql.extensions` is a STATIC conf read from the
    // SparkContext at FIRST context creation — it cannot apply inside
    // this shared-context JVM (a builder against the live context
    // logs 'some configuration may not take effect' and skips it), so
    // the end-to-end path is: apply() must accept a fresh
    // SparkSessionExtensions without throwing (wiring smoke)...
    new graft.plans.GraftSparkExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("per-session registration: a newSession starts clean and the " +
    "register() calls make both function families resolvable") {
    // ...and the library path every entry point actually uses —
    // register() on the session — must work on a genuinely clean
    // SessionState, which newSession() provides
    val s2 = spark.newSession()
    intercept[org.apache.spark.sql.AnalysisException] {
      s2.sql("SELECT graft_hilbert(CAST(1 AS BIGINT), CAST(0 AS BIGINT), 1)")
        .collect()
    }
    graft.functions.VectorFunctions.register(s2)
    graft.functions.CurveFunctions.register(s2)
    val r = s2.sql("SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").collect()
    assert(r.head.getDouble(0) == 11.0)
    // d(1,0) = 3 on the 2x2 curve
    val h = s2.sql(
      "SELECT graft_hilbert(CAST(1 AS BIGINT), CAST(0 AS BIGINT), 1) AS h")
      .collect()
    assert(h.head.getLong(0) == 3L)
  }
}
