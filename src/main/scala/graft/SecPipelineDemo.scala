package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.sources.{SecIngest, SecSchemas, WebScrape, ZipIngest}
import graft.operators.{SecFactTables, SecJsonDocs, SecServing}
import graft.quality.DataQuality

/** End-to-end usage example of the FULL SEC pipeline surface, starting
  * from acquisition: S1 scrape (index page → quarterly ZIP links →
  * distributed staging; the fetch seam is file-backed here because this
  * environment has no egress — swap [[WebScrape.httpFetch]] in for the
  * real site) → S2 ZIP extraction → S3/P1 typed TSV ingest →
  * partitioned parquet → fact tables → JSON docs + views → serving
  * queries + SQL passthrough → data-quality report. Run with
  * `sbt "runMain graft.SecPipelineDemo"`. Writes only under java.io.tmpdir.
  */
object SecPipelineDemo {
  /** File-backed stand-in for HTTP: resolves a URL to a file in `dir`
    * by its last path segment. Top-level (not a lambda capturing the
    * session) so the staging tasks can serialize it. */
  def fetchFromDir(dir: String)(url: String): Array[Byte] = {
    val name = url.substring(url.lastIndexOf('/') + 1)
    Files.readAllBytes(Paths.get(dir, name))
  }

  def main(args: Array[String]): Unit = {
    val spark = SessionTuning.tuned(SparkSession.builder()
      .master("local[4]")
      .appName("sec-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
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

    // --- S1 acquisition: scrape the index page for the quarter's ZIP,
    // stage it distributed (atomic temp+rename per archive) ---
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/2023q4.zip"))
    try Seq("sub.txt" -> subP, "num.txt" -> numP,
        "pre.txt" -> preP, "tag.txt" -> tagP).foreach { case (name, p) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(Files.readAllBytes(Paths.get(p)))
      zos.closeEntry()
    } finally zos.close()
    val indexHtml =
      """<html><body><a href="/files/dera/2023q4.zip">2023 Q4</a></body></html>"""
    val links = WebScrape.linkTable(spark,
      "https://www.example.org/data/financial-sets", indexHtml)
    val targets = WebScrape.quarterlyZipLinks(links, 2023, quarter = Some(4))
    val staged = WebScrape.stage(targets, s"$dir/landing", fetchFromDir(dir) _)
    require(WebScrape.allStaged(staged), "staging must land every archive")
    println(s"[demo] staged: " + staged.collect()
      .map(r => s"${r.dest} (${r.bytes} bytes)").mkString(", "))

    // --- S2→P1: extract the four TSV entries from every staged ZIP,
    // apply the declared schemas with permissive casts ---
    val quarter = ZipIngest.ingestQuarterZips(spark, s"$dir/landing/raw/*.zip")
    val (sub, num, pre, tag) =
      (quarter("sub"), quarter("num"), quarter("pre"), quarter("tag"))
    val ticker = SecIngest.readTicker(spark, tickP)

    SecIngest.writePartitioned(num, s"$dir/num_parquet")
    // lineage from the staged archive follows the reference's dest-key
    // convention raw/{year}_{quarter}.zip → source_file "2023_Q4"
    println(s"[demo] availability 2023_Q4 = ${SecServing.availability(sub, "2023_Q4")}")

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
