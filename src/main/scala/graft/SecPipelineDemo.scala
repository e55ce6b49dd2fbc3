package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.sources.{SecIngest, SecSchemas}
import graft.operators.{SecFactTables, SecJsonDocs, SecServing}
import graft.quality.DataQuality

/** End-to-end usage example of the SEC pipeline surface: TSV ingest →
  * partitioned parquet → fact tables → JSON docs + views → serving
  * queries + SQL passthrough → data-quality report. Run with
  * `sbt "runMain graft.SecPipelineDemo"`. Writes only under java.io.tmpdir.
  */
object SecPipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("sec-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Files.createTempDirectory("sec_demo").toString
    def write(name: String, lines: Seq[String]): String = {
      val p = Paths.get(dir, name)
      Files.write(p, lines.mkString("\n").getBytes("UTF-8")); p.toString
    }
    val subP = write("sub.txt", Seq(
      SecSchemas.sub.fieldNames.mkString("\t"),
      "f1\t100\tAcme Corp\t3711\tUS\tCA\tPaloAlto\t94301\t\t\t\tUS\tCA\tPaloAlto\t94301\t\t\tUS\tCA\t123456789\t\t\t1-LAF\t1\t1231\t10-K\t20230930\t2023\tQ3\t20231101\t2023-11-01 12:00:00.0\t0\t1\tinst1\t1\t"))
    val numP = write("num.txt", Seq(
      SecSchemas.num.fieldNames.mkString("\t"),
      "f1\tRevenue\tus-gaap/2023\t20230930\t1\tUSD\t\t\t1000.5\t",
      "f1\tAssets\tus-gaap/2023\t20230930\t0\tUSD\t\t\t5000\t"))
    val preP = write("pre.txt", Seq(
      SecSchemas.pre.fieldNames.mkString("\t"),
      "f1\t1\t1\tIS\t0\tH\tRevenue\tus-gaap/2023\tTotal revenue\t0",
      "f1\t1\t2\tBS\t0\tH\tAssets\tus-gaap/2023\tTotal assets\t0"))
    val tagP = write("tag.txt", Seq(
      SecSchemas.tag.fieldNames.mkString("\t"),
      "Revenue\tus-gaap/2023\t0\t0\tmonetary\tD\tC\tRevenue\tRevenue doc",
      "Assets\tus-gaap/2023\t0\t0\tmonetary\tI\tD\tAssets\tAssets doc"))
    val tickP = write("ticker.txt", Seq("acme\t100"))

    val sub = SecIngest.ingestQuarter(spark, subP, SecSchemas.sub, "2023Q4")
    val num = SecIngest.ingestQuarter(spark, numP, SecSchemas.num, "2023Q4")
    val pre = SecIngest.ingestQuarter(spark, preP, SecSchemas.pre, "2023Q4")
    val tag = SecIngest.ingestQuarter(spark, tagP, SecSchemas.tag, "2023Q4")
    val ticker = SecIngest.readTicker(spark, tickP)

    SecIngest.writePartitioned(num, s"$dir/num_parquet")
    println(s"[demo] availability 2023Q4 = ${SecServing.availability(sub, "2023Q4")}")

    val bs = SecFactTables.balanceSheet(num, sub, pre)
    println("[demo] balance sheet fact:"); bs.show(truncate = false)

    val docs = SecJsonDocs.buildDocs(num, sub, pre, tag, ticker)
    println("[demo] company docs:"); docs.show(truncate = false)
    println("[demo] bs view:")
    SecJsonDocs.statementView(docs, "bs").show(truncate = false)

    SecServing.registerQuarterViews(spark, "2023Q4",
      Map("sub" -> sub, "num" -> num, "pre" -> pre, "tag" -> tag))
    println("[demo] SQL passthrough:")
    SecServing.executeSql(spark,
      "SELECT n.tag, sum(n.value) AS total FROM sec_num_2023Q4 n GROUP BY 1 ORDER BY 1")
      .show()

    println("[demo] data quality report (check -> violations):")
    DataQuality.report(DataQuality.secSuite(sub, num, pre, tag))
      .foreach { case (k, v) => if (v > 0) println(s"  $k -> $v") }
    println("[demo] done")
    spark.stop()
  }
}
