package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import graft.sources.{WebScrape, ZipIngest}

/** S1 scrape source: anchor parsing, the reference's link-selection
  * semantics (web_scrapper.py:48-62), distributed staging with
  * failure-as-data, and the hand-off into the S2 ZIP ingest. The fetch
  * seam is file-backed — this environment has no egress, and the specs
  * prove the Spark-side plumbing regardless of transport.
  */
class WebScrapeSpec extends SparkSpec {

  private val base = "https://www.example.org/data/financial-sets"

  private val indexHtml =
    """<html><body><table>
      |<a href="/files/dera/2023q4.zip"><b>2023</b> Q4 </a>
      |<a href="2023q3.zip">2023&nbsp;Q3</a>
      |<a href='/files/dera/2022q1.zip'>2022 Q1</a>
      |<a href="/files/notes2023.pdf">2023 Q2</a>
      |<a href=https://mirror.example.net/2023q1.zip>2023 Q1 (full)</a>
      |<a href="/files/dera/lone.zip">2023only</a>
      |<a href="/about">About &amp; contact</a>
      |</table></body></html>""".stripMargin

  test("anchor table: nested tags, entities, quote styles, url resolution") {
    val links = WebScrape.linkTable(spark, base, indexHtml)
    val byText = links.collect().map(r => r.getString(2) -> r.getString(1)).toMap
    assert(byText.size == 7)
    // nested <b> stripped, &nbsp; decoded, whitespace collapsed
    assert(byText.contains("2023 Q4") && byText.contains("2023 Q3"))
    assert(byText("About & contact") == "https://www.example.org/about")
    // relative resolution against the page url (sibling + absolute path)
    assert(byText("2023 Q3") == "https://www.example.org/data/2023q3.zip")
    assert(byText("2023 Q4") == "https://www.example.org/files/dera/2023q4.zip")
    // unquoted href + absolute url preserved
    assert(byText("2023 Q1 (full)") == "https://mirror.example.net/2023q1.zip")
  }

  test("double-escaped entities decode exactly once") {
    // '&amp;lt;' is the ESCAPED text '&lt;' — a single-pass decoder
    // (BeautifulSoup in the reference) yields the literal '&lt;', never
    // a second round-trip to '<'
    val html = """<a href="/x.zip">A &amp;lt;tag&amp;gt; &amp;amp; &lt;real&gt;</a>"""
    val text = WebScrape.linkTable(spark, base, html)
      .collect().map(_.getString(2)).head
    assert(text == "A &lt;tag&gt; &amp; <real>")
  }

  test("selection semantics match the reference scraper") {
    val links = WebScrape.linkTable(spark, base, indexHtml)
    val all23 = WebScrape.quarterlyZipLinks(links, 2023)
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    // .pdf excluded, 2022 excluded, one-token text excluded;
    // quarter = second text token, dest key = raw/{year}_{quarter}.zip
    assert(all23 == Set(
      ("Q4", "raw/2023_Q4.zip"),
      ("Q3", "raw/2023_Q3.zip"),
      ("Q1", "raw/2023_Q1.zip")))
    val onlyQ3 = WebScrape.quarterlyZipLinks(links, 2023, quarter = Some(3))
      .collect().map(_.getString(2)).toSeq
    assert(onlyQ3 == Seq("raw/2023_Q3.zip"))
    assert(WebScrape.quarterlyZipLinks(links, 2021).count() == 0)
  }

  test("staging distributes, writes atomically, and records failures as rows") {
    val srcDir = tmpDir("scrape_src")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(srcDir, "2023q4.zip"), "Q4BYTES".getBytes)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(srcDir, "2023q3.zip"), "Q3".getBytes)
    val outDir = tmpDir("scrape_out")
    import spark.implicits._
    val targets = Seq(
      ("https://www.example.org/files/2023q4.zip", "raw/2023_Q4.zip"),
      ("https://www.example.org/files/2023q3.zip", "raw/2023_Q3.zip"),
      ("https://www.example.org/files/missing.zip", "raw/2023_Q2.zip"))
      .toDF("url", "dest_key")
    val fileFetch = WebScrapeSpec.fetchFromDir(srcDir) _
    val results = WebScrape.stage(targets, outDir, fileFetch)
    val byKey = results.collect().map(r => r.dest -> r).toMap
    assert(byKey.size == 3)
    assert(byKey(s"$outDir/raw/2023_Q4.zip").ok &&
      byKey(s"$outDir/raw/2023_Q4.zip").bytes == 7L)
    val failed = byKey(s"$outDir/raw/2023_Q2.zip")
    assert(!failed.ok && failed.error != null && failed.bytes == 0L)
    assert(!WebScrape.allStaged(results))
    // bytes landed exactly; no in-progress temp left behind
    val q4 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(outDir, "raw", "2023_Q4.zip"))
    assert(new String(q4) == "Q4BYTES")
    val leftovers = new java.io.File(s"$outDir/raw").listFiles()
      .map(_.getName).filter(_.contains("inprogress"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
    // re-run overwrites in place (idempotent acquisition)
    val again = WebScrape.stage(targets.filter(col("dest_key") =!= "raw/2023_Q2.zip"),
      outDir, fileFetch)
    assert(WebScrape.allStaged(again))
  }

  test("a failure AFTER the temp write sweeps the in-progress file") {
    // force the failure between temp write and rename: the destination
    // key already exists as a NON-EMPTY DIRECTORY, so the pre-rename
    // delete(dest, recursive=false) throws once the temp is on disk —
    // the failure row must not strand the .inprogress-* temp
    val srcDir = tmpDir("scrape_fail_src")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(srcDir, "ok.zip"), "OK".getBytes)
    val outDir = tmpDir("scrape_fail_out")
    val blocked = java.nio.file.Paths.get(outDir, "raw", "blocked.zip")
    java.nio.file.Files.createDirectories(blocked)
    java.nio.file.Files.write(blocked.resolve("keep"), "x".getBytes)
    import spark.implicits._
    val targets = Seq(("https://www.example.org/files/ok.zip", "raw/blocked.zip"))
      .toDF("url", "dest_key")
    val results = WebScrape.stage(targets, outDir,
      WebScrapeSpec.fetchFromDir(srcDir) _).collect()
    assert(results.length == 1 && !results.head.ok && results.head.error != null)
    val leftovers = new java.io.File(s"$outDir/raw").listFiles()
      .map(_.getName).filter(_.contains("inprogress"))
    assert(leftovers.isEmpty, s"stranded temps: ${leftovers.mkString(",")}")
  }

  test("scrape-to-ingest: staged quarter ZIP flows into the S2 TSV reader") {
    val srcDir = tmpDir("scrape_zip_src")
    val zipBytes = WebScrapeSpec.zipOf(
      "sub.txt" -> "adsh\tcik\tname\nA-1\t7\tACME\nB-2\t8\tBOLT\n")
    val fos = new FileOutputStream(s"$srcDir/2023q4.zip")
    try fos.write(zipBytes) finally fos.close()
    val outDir = tmpDir("scrape_zip_out")
    val html = """<a href="2023q4.zip">2023 Q4</a>"""
    val targets = WebScrape.quarterlyZipLinks(
      WebScrape.linkTable(spark, "https://www.example.org/idx", html), 2023)
    val results = WebScrape.stage(targets, outDir,
      WebScrapeSpec.fetchFromDir(srcDir) _)
    assert(WebScrape.allStaged(results))
    val sub = ZipIngest.readZipTsv(spark, s"$outDir/raw/*.zip", "sub.txt",
      Seq("adsh", "cik", "name"))
    assert(sub.select("adsh", "name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("A-1", "ACME"), ("B-2", "BOLT")))
  }
}

/** Companion holds the executor-side helpers so spec closures serialize
  * without dragging the suite (and its SparkSession) along. */
object WebScrapeSpec {
  def fetchFromDir(dir: String)(url: String): Array[Byte] = {
    val name = url.substring(url.lastIndexOf('/') + 1)
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, name))
  }

  def zipOf(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }
}
