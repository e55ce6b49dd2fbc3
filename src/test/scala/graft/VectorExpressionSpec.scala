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

  test("extension class injects the function into a fresh session") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("ext-test")
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s2.sql("SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").collect()
      assert(r.head.getDouble(0) == 11.0)
    } finally {
      // keep the shared session; the builder returns the active one if
      // configs are compatible — only stop if it is a distinct session
      if (s2 ne spark) () // same JVM-wide context; do not stop
    }
  }
}
