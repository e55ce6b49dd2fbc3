package graft.sources

import java.net.URI

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S1: the HTTP scrape source (reference airflow/dags/web_scrapper.py:
  * 33-89) — the one acquisition step upstream of the quarter-ZIP ingest.
  * The reference GETs one index page, BeautifulSoup-parses its anchors,
  * keeps links whose href ends `.zip` and whose text mentions the year
  * (the quarter is literally the SECOND whitespace token of the link
  * text), optionally filters to one quarter, then streams each archive
  * into object storage under `raw/{year}_{quarter}.zip`.
  *
  * Spark-first formulation, in three declarative stages:
  *   1. [[linkTable]] — a frame of fetched pages `(page_url, html)`
  *      flat-maps to one row per anchor `(page_url, url, text)`; parsing
  *      distributes (one task per page), so scraping a thousand index
  *      pages is the same plan as scraping one.
  *   2. [[quarterlyZipLinks]] — the reference's selection semantics as
  *      pure Column expressions (filter/selection stays declarative and
  *      Catalyst-optimizable).
  *   3. [[stage]] — per-target fetch + atomic sink, distributed one
  *      fetch per task via the injected `fetch` function. The network
  *      call is genuine per-row imperative I/O — the sanctioned use of
  *      a typed map over built-in operators. Failures are DATA, not
  *      exceptions: each target yields a row with `ok`/`error`, so one
  *      dead link cannot kill a thousand-archive acquisition (the
  *      reference likewise logs and continues, web_scrapper.py:78-83).
  *
  * This container has zero egress, so the default [[httpFetch]] is
  * exercised only for its request construction; specs inject a
  * file-backed fetcher. The seam is exactly the reference's: swap
  * `requests.get` for anything that maps URL → bytes.
  */
object WebScrape {

  /** One staged archive: where it came from, where it landed, whether
    * the fetch succeeded, and how many bytes were written. */
  case class StageResult(url: String, dest: String, ok: Boolean,
                         bytes: Long, error: String)

  /** Polite request headers. The reference sends a contact UA per SEC
    * guidelines (web_scrapper.py:18-23); callers should override with
    * their own contact address. No Accept-Encoding: the JDK client is
    * not asked to negotiate compression, so bytes land as-is. */
  val DefaultHeaders: Map[String, String] = Map(
    "User-Agent" -> "graft-sec-ingest admin@example.org")

  private val AnchorRe =
    """(?is)<a\b[^>]*?\bhref\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))[^>]*>(.*?)</a>""".r
  private val TagRe = "(?s)<[^>]*>".r

  /** BeautifulSoup `get_text().strip()` equivalent for one anchor body:
    * drop nested tags, decode the entities that occur in practice,
    * collapse whitespace. `&amp;` decodes LAST: a single left-to-right
    * pass then unescapes each sequence exactly once, so double-escaped
    * text like `&amp;lt;` yields the literal `&lt;` — decoding `&amp;`
    * first would turn it into `&lt;` and then a later pass into `<`,
    * which single-pass HTML parsers never do. */
  private[sources] def anchorText(inner: String): String =
    TagRe.replaceAllIn(inner, " ")
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
      .replace("&amp;", "&")
      .trim.replaceAll("\\s+", " ")

  /** `urljoin(base, href)` equivalent; malformed URLs resolve to the
    * href verbatim (the fetch stage will then record the failure as a
    * row rather than dying here). */
  private[sources] def resolveUrl(base: String, href: String): String =
    try new URI(base).resolve(href).toString
    catch { case _: Exception => href }

  /** Stage 1: `(page_url, html)` pages → `(page_url, url, text)` links.
    * One task per page; no driver-side parsing. */
  def linkTable(pages: Dataset[(String, String)]): DataFrame = {
    import pages.sparkSession.implicits._
    pages.flatMap { case (pageUrl, html) =>
      AnchorRe.findAllMatchIn(Option(html).getOrElse("")).map { m =>
        val href = Seq(2, 3, 4).iterator.map(m.group)
          .collectFirst { case h if h != null => h }.getOrElse("")
        (pageUrl, resolveUrl(pageUrl, href), anchorText(m.group(5)))
      }
    }.toDF("page_url", "url", "text")
  }

  /** Convenience for the reference's single-index-page shape. */
  def linkTable(spark: SparkSession, pageUrl: String, html: String): DataFrame = {
    import spark.implicits._
    linkTable(spark.createDataset(Seq((pageUrl, html))))
  }

  /** Stage 2: the reference's selection (web_scrapper.py:48-62) as pure
    * Column expressions over a [[linkTable]] frame:
    *   - href ends `.zip` AND the year appears anywhere in the text;
    *   - `quarter` is literally the second whitespace token of the text
    *     (`link_text.split()[1]`) — faithful to the point of keeping
    *     whatever that token is; a one-token text, which would
    *     IndexError in the reference, drops out here (sane divergence);
    *   - an optional requested quarter keeps only `Q<n>`;
    *   - `dest_key` follows the reference's `raw/{year}_{quarter}.zip`.
    */
  def quarterlyZipLinks(links: DataFrame, year: Int,
                        quarter: Option[Int] = None,
                        prefix: String = "raw/"): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val base = links
      .filter(col("url").endsWith(".zip") &&
        col("text").contains(year.toString))
      .withColumn("quarter", try_element_at(toks, lit(2)))
      .filter(col("quarter").isNotNull)
    quarter.fold(base)(q => base.filter(col("quarter") === s"Q$q"))
      .select(col("url"),
        col("quarter"),
        concat(lit(prefix), lit(year.toString), lit("_"), col("quarter"),
          lit(".zip")).as("dest_key"))
  }

  /** Stage 3: fetch every target and land it under `outDir/dest_key`,
    * one fetch per task (targets are repartitioned by url so a
    * thousand-archive pull spreads over the cluster instead of
    * serializing through one task). Writes go through the Hadoop
    * FileSystem API (local, HDFS, or object store by URI) with a
    * task-unique temp + rename, so a re-run or a mid-write failure
    * never leaves a half archive at the destination key. Returns one
    * [[StageResult]] row per target — inspect `ok` instead of catching.
    */
  def stage(targets: DataFrame, outDir: String,
            fetch: String => Array[Byte]): Dataset[StageResult] = {
    val spark = targets.sparkSession
    import spark.implicits._
    targets.select(col("url"), col("dest_key")).as[(String, String)]
      .repartition(col("url"))
      .map { case (url, destKey) =>
        val dest = s"$outDir/$destKey"
        // tracked outside the try so the failure path can sweep the
        // temp — a failed write/rename must not strand an
        // `.inprogress-*` file that re-runs would accumulate
        var cleanup: Option[(org.apache.hadoop.fs.FileSystem,
          org.apache.hadoop.fs.Path)] = None
        try {
          val bytes = fetch(url)
          val conf = new org.apache.hadoop.conf.Configuration()
          val destPath = new org.apache.hadoop.fs.Path(dest)
          val fs = destPath.getFileSystem(conf)
          val tc = org.apache.spark.TaskContext.get()
          val tmp = new org.apache.hadoop.fs.Path(
            dest + s".inprogress-${tc.stageId}-${tc.taskAttemptId}")
          cleanup = Some((fs, tmp))
          val out = fs.create(tmp, true)
          try out.write(bytes) finally out.close()
          fs.mkdirs(destPath.getParent)
          fs.delete(destPath, false)
          if (!fs.rename(tmp, destPath))
            throw new java.io.IOException(s"rename to $dest failed")
          StageResult(url, dest, ok = true, bytes.length.toLong, null)
        } catch {
          case e: Exception =>
            cleanup.foreach { case (fs, tmp) =>
              try fs.delete(tmp, false)
              catch { case _: Exception => () }
            }
            StageResult(url, dest, ok = false, 0L,
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
  }

  /** The reference's bottom-line return (web_scrapper.py:85-89): false
    * when nothing staged or any fetch failed. */
  def allStaged(results: Dataset[StageResult]): Boolean = {
    val agg = results.agg(
      count(lit(1)).as("n"),
      sum(when(col("ok"), 0L).otherwise(1L)).as("bad")).head()
    agg.getLong(0) > 0 && agg.getLong(1) == 0
  }

  /** Default fetcher: JDK HttpClient GET with [[DefaultHeaders]]-style
    * headers, following redirects, failing on non-2xx — the
    * `requests.get(...).raise_for_status()` of web_scrapper.py:66-67.
    * Unused in tests (this environment has no egress); injectable
    * everywhere it matters.
    */
  def httpFetch(headers: Map[String, String] = DefaultHeaders)
               (url: String): Array[Byte] = {
    val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    val b = java.net.http.HttpRequest.newBuilder(URI.create(url))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"HTTP ${resp.statusCode()} for $url")
    resp.body()
  }
}
