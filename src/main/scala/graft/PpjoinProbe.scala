package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextExpressionFunctions.wordShinglesFast
import graft.operators.{Dedup, Partitioning}

/** Phase-level timing of the PPJoin pipeline (diagnostic): shingle
  * table, prefix build, candidate join, verification — each timed on
  * its own action over the same checkpointed inputs, twice (second
  * pass reuses compiled codegen). Args: sfDir. */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = BenchSession.build()
    BenchSession.warmUp(spark, sfDir)
    graft.functions.TextExpressionFunctions.register(spark)
    val n = 3
    val thresholdE6 = Dedup.PpThresholdE6
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pp] $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (pass <- 1 to 2) {
      println(s"== pass $pass")
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val sh = t("shingles+ckpt") {
        val x = Partitioning.spread(docs)
          .select(col("doc_id"),
            wordShinglesFast(graft.functions.TextFunctions.tokens(col("text")), n).as("shingles"))
          .filter(size(col("shingles")) > 0)
          .localCheckpoint()
        x.count(); x
      }
      val post = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
      val dfreq = post.groupBy("s").agg(count(lit(1)).as("df"))
      val byDoc = Window.partitionBy("doc_id")
        .orderBy(col("df").asc, col("s").asc)
      val prefix = t("prefix+ckpt") {
        val x = post.join(dfreq, Seq("s"))
          .withColumn("rn", row_number().over(byDoc).cast("long"))
          .join(sh.select(col("doc_id"),
            size(col("shingles")).cast("long").as("nd")), Seq("doc_id"))
          .filter(col("rn") <=
            col("nd") - expr(s"(nd * $thresholdE6 + 999999) div 1000000")
              + lit(1L))
          .select(col("doc_id"), col("s"), col("rn"), col("nd"))
          .localCheckpoint()
        x.count(); x
      }
      val oReq = s"(($thresholdE6 * (a.nd + b.nd)) + ${1000000L + thresholdE6} - 1) " +
        s"div ${1000000L + thresholdE6}"
      val cand = t("cand-join+ckpt") {
        val x = prefix.as("a").join(prefix.as("b"),
            col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
              col("b.nd") * lit(1000000L) >= col("a.nd") * lit(thresholdE6) &&
              col("a.nd") * lit(1000000L) >= col("b.nd") * lit(thresholdE6) &&
              least(col("a.nd") - col("a.rn"), col("b.nd") - col("b.rn"))
                + lit(1L) >= expr(oReq))
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .distinct()
          .localCheckpoint()
        println(s"[pp] candidates=${x.count()}")
        x
      }
      t("verify") {
        cand
          .join(sh.select(col("doc_id").as("d1"), col("shingles").as("s1")),
            Seq("d1"))
          .join(sh.select(col("doc_id").as("d2"), col("shingles").as("s2")),
            Seq("d2"))
          .withColumn("inter",
            size(array_intersect(col("s1"), col("s2"))).cast("long"))
          .withColumn("uni",
            size(col("s1")).cast("long") + size(col("s2")) - col("inter"))
          .withColumn("jac_e6", expr("inter * 1000000 div greatest(uni, 1)"))
          .filter(col("jac_e6") >= thresholdE6)
          .select(col("d1"), col("d2"), col("jac_e6"))
          .orderBy("d1", "d2").count()
      }
      BenchSession.dropPinnedBlocks(spark)
    }
    spark.stop()
  }
}
