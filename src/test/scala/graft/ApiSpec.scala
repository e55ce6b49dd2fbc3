package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.serving.Api
import graft.sources.{SecIngest, SecSchemas}
import graft.operators.{SecJsonDocs, SecServing}

/** Live round-trip of the serving shell: real HTTP server on an
  * ephemeral port, real JDK HttpClient, responses parsed with Jackson.
  * Covers all five reference endpoints (backend/main.py:43-252) plus
  * the NaN-sanitize contract and the error shapes.
  */
class ApiSpec extends SparkSpec {

  private def writeFixture(dir: String, name: String, lines: Seq[String]): String = {
    val p = Paths.get(dir, name)
    Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  private lazy val dir = tmpDir("api_fixture")
  private lazy val sub = SecIngest.ingestQuarter(spark,
    writeFixture(dir, "sub.txt", Seq(
      SecSchemas.sub.fieldNames.mkString("\t"),
      "f1\t100\tAcme Corp\t3711\tUS\tCA\tPaloAlto\t94301\t\t\t\tUS\tCA\tPaloAlto\t94301\t\t\tUS\tCA\t123456789\t\t\t1-LAF\t1\t1231\t10-K\t20230930\t2023\tQ3\t20231101\t2023-11-01 12:00:00.0\t0\t1\tinst1\t1\t")),
    SecSchemas.sub, "2023Q4")
  private lazy val num = SecIngest.ingestQuarter(spark,
    writeFixture(dir, "num.txt", Seq(
      SecSchemas.num.fieldNames.mkString("\t"),
      "f1\tRevenue\tus-gaap/2023\t20230930\t1\tUSD\t\t\t1000.5\t",
      "f1\tAssets\tus-gaap/2023\t20230930\t0\tUSD\t\t\t5000\t")),
    SecSchemas.num, "2023Q4")
  private lazy val pre = SecIngest.ingestQuarter(spark,
    writeFixture(dir, "pre.txt", Seq(
      SecSchemas.pre.fieldNames.mkString("\t"),
      "f1\t1\t1\tIS\t0\tH\tRevenue\tus-gaap/2023\tTotal revenue\t0",
      "f1\t1\t2\tBS\t0\tH\tAssets\tus-gaap/2023\tTotal assets\t0")),
    SecSchemas.pre, "2023Q4")
  private lazy val tag = SecIngest.ingestQuarter(spark,
    writeFixture(dir, "tag.txt", Seq(
      SecSchemas.tag.fieldNames.mkString("\t"),
      "Revenue\tus-gaap/2023\t0\t0\tmonetary\tD\tC\tRevenue\tRevenue doc",
      "Assets\tus-gaap/2023\t0\t0\tmonetary\tI\tD\tAssets\tAssets doc")),
    SecSchemas.tag, "2023Q4")

  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  private var api: Option[Api] = None
  private lazy val port: Int = {
    SecServing.registerQuarterViews(spark, "2023Q4",
      Map("sub" -> sub, "num" -> num, "pre" -> pre, "tag" -> tag))
    val ticker = SecIngest.readTicker(spark,
      writeFixture(dir, "ticker.txt", Seq("acme\t100")))
    SecJsonDocs.buildDocs(num, sub, pre, tag, ticker)
      .createOrReplaceTempView("sec_data_2023Q4")
    val a = new Api(spark)
    api = Some(a)
    a.start(0)
  }

  private def get(path: String): (Int, JsonNode) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), mapper.readTree(r.body()))
  }

  private def post(path: String, body: String): (Int, JsonNode) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), mapper.readTree(r.body()))
  }

  test("check-availability: present quarter true, absent quarter false") {
    val (c1, b1) = get("/check-availability?year=2023&quarter=Q4")
    assert(c1 == 200 && b1.get("available").asBoolean)
    val (c2, b2) = get("/check-availability?year=2021&quarter=Q1")
    assert(c2 == 200 && !b2.get("available").asBoolean)
  }

  test("get-table-info: RAW lists the four quarter tables with schema + sample") {
    val (code, body) = get("/get-table-info?data_source=RAW&year=2023&quarter=Q4")
    assert(code == 200 && body.size == 4)
    val names = (0 until body.size).map(body.get(_).get("name").asText).toSet
    assert(names == Set("sec_num_2023Q4", "sec_pre_2023Q4",
      "sec_sub_2023Q4", "sec_tag_2023Q4"))
    val numInfo = (0 until body.size).map(body.get)
      .find(_.get("name").asText == "sec_num_2023Q4").get
    val cols = (0 until numInfo.get("columns").size)
      .map(numInfo.get("columns").get(_).get("name").asText)
    assert(cols.contains("adsh") && cols.contains("value"))
    assert(numInfo.get("sample_data").size == 2)
    val (bad, badBody) = get("/get-table-info?data_source=Nope&year=2023&quarter=Q4")
    assert(bad == 400 && badBody.get("detail").asText.contains("Invalid data source"))
  }

  test("execute-custom-query: POST body SQL over the registered views") {
    val (code, body) = post("/execute-custom-query",
      """{"query":"SELECT adsh, count(*) AS n FROM sec_num_2023Q4 GROUP BY 1"}""")
    assert(code == 200)
    assert(body.get("data").get(0).get("adsh").asText == "f1")
    assert(body.get("data").get(0).get("n").asLong == 2L)
    val (bad, _) = post("/execute-custom-query", """{"nope":1}""")
    assert(bad == 400)
    val (err, errBody) = post("/execute-custom-query",
      """{"query":"SELECT * FROM not_a_table"}""")
    assert(err == 500 && errBody.has("detail"))
  }

  test("get-financial-data: RAW statement join and JSON view both serve") {
    val (code, body) =
      get("/get-financial-data?year=2023&quarter=Q4&data_type=Balance%20Sheet&source=RAW")
    assert(code == 200 && body.has("execution_time"))
    val row = body.get("data").get(0)
    assert(row.get("adsh").asText == "f1" &&
      row.get("plabel").asText == "Total assets")
    // the fixture writes the income statement as SEC-real "IS"; the
    // RAW path must match the IC|IS family, not replicate the
    // reference's data:is/data:ic drift
    val (ic, ib) =
      get("/get-financial-data?year=2023&quarter=Q4&data_type=Income%20Statement&source=RAW")
    assert(ic == 200 && ib.get("data").size == 1 &&
      ib.get("data").get(0).get("plabel").asText == "Total revenue")
    val (jc, jb) =
      get("/get-financial-data?year=2023&quarter=Q4&data_type=Income%20Statement&source=JSON")
    assert(jc == 200 && jb.get("data").get(0).get("concept").asText == "Revenue")
    val (bad, _) =
      get("/get-financial-data?year=2023&quarter=Q4&data_type=Nope&source=RAW")
    assert(bad == 400)
  }

  test("source tokens dispatch case-insensitively") {
    val (code, body) = get("/get-table-info?data_source=raw&year=2023&quarter=Q4")
    assert(code == 200 && body.size == 4)
  }

  test("availability matches the scrape-path's underscore lineage stamp too") {
    import org.apache.spark.sql.functions.lit
    sub.withColumn("source_file", lit("2024_Q1"))
      .createOrReplaceTempView("sec_sub_2024Q1")
    val (code, body) = get("/check-availability?year=2024&quarter=Q1")
    assert(code == 200 && body.get("available").asBoolean)
  }

  test("duplicate output column names serve instead of 500ing") {
    val (code, body) = post("/execute-custom-query",
      """{"query":"SELECT cast(1.5 as double) AS v, cast('NaN' as double) AS v"}""")
    assert(code == 200 && body.get("data").size == 1)
  }

  test("query-data: GET SQL; NaN and Infinity sanitize to null") {
    import spark.implicits._
    Seq(("ok", 1.5), ("nan", Double.NaN), ("inf", Double.PositiveInfinity))
      .toDF("k", "v").createOrReplaceTempView("api_nan_probe")
    val (code, body) =
      get("/query-data?query=SELECT%20k%2C%20v%20FROM%20api_nan_probe%20ORDER%20BY%20k")
    assert(code == 200)
    val byK = (0 until body.get("data").size).map(body.get("data").get)
      .map(n => n.get("k").asText -> n).toMap
    assert(byK("ok").get("v").asDouble == 1.5)
    // Spark's JSON writer omits null fields — sanitized values are
    // either absent or an explicit JSON null, never NaN/Infinity
    assert(byK("nan").get("v") == null || byK("nan").get("v").isNull)
    assert(byK("inf").get("v") == null || byK("inf").get("v").isNull)
    val (bad, _) = get("/query-data")
    assert(bad == 400)
  }

  test("concurrent mixed-route requests share one SparkSession " +
    "without interference") {
    // 32 in-flight requests across all routes against the 8-thread
    // server pool. Each custom query carries a request-unique constant
    // that must come back in ITS OWN response — the cross-talk probe:
    // any request served another's result fails the equality, not
    // just a count.
    val t0 = System.nanoTime()
    val futures = (0 until 32).map { i =>
      i % 4 match {
        case 0 => client.sendAsync(
          HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$port/execute-custom-query"))
            .POST(HttpRequest.BodyPublishers.ofString(
              s"""{"query": "SELECT $i AS probe, count(*) AS n FROM sec_num_2023Q4"}"""))
            .build(),
          HttpResponse.BodyHandlers.ofString())
        case 1 => client.sendAsync(
          HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$port/query-data?query=SELECT%20${i}%20AS%20probe"))
            .GET().build(),
          HttpResponse.BodyHandlers.ofString())
        case 2 => client.sendAsync(
          HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$port/check-availability?year=2023&quarter=Q4"))
            .GET().build(),
          HttpResponse.BodyHandlers.ofString())
        case _ => client.sendAsync(
          HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$port/get-table-info?data_source=RAW&year=2023&quarter=Q4"))
            .GET().build(),
          HttpResponse.BodyHandlers.ofString())
      }
    }
    val responses = futures.map(_.join())
    val elapsed = (System.nanoTime() - t0) / 1e9
    responses.zipWithIndex.foreach { case (r, i) =>
      assert(r.statusCode() == 200, s"request $i: ${r.body().take(200)}")
      val body = mapper.readTree(r.body())
      i % 4 match {
        case 0 | 1 =>
          assert(body.get("data").get(0).get("probe").asInt == i,
            s"request $i got another request's result: ${r.body().take(200)}")
        case 2 => assert(body.get("available").asBoolean)
        case _ => assert(body.size > 0)
      }
    }
    // sanity, not a microbenchmark: 32 requests through an 8-thread
    // pool on a warm session must not serialize into minutes
    assert(elapsed < 60.0, f"32 concurrent requests took $elapsed%.1fs")
  }

  test("free-form SQL: cartesian products are rejected before running") {
    // unconditioned comma join -> CartesianProduct or condition-less
    // BroadcastNestedLoopJoin; must 400 from the EXPLAIN check, never
    // execute
    val (code, body) = post("/execute-custom-query",
      """{"query":"SELECT * FROM sec_num_2023Q4 a, sec_tag_2023Q4 b"}""")
    assert(code == 400, s"expected rejection, got $code: $body")
    assert(body.get("detail").asText.toLowerCase.contains("cartesian"))
    val (c2, b2) = get("/query-data?query=" + java.net.URLEncoder.encode(
      "SELECT * FROM sec_num_2023Q4 CROSS JOIN sec_tag_2023Q4", "UTF-8"))
    assert(c2 == 400 && b2.get("detail").asText.toLowerCase.contains("cartesian"))
    // a cartesian hiding INSIDE a scalar subquery plan must be caught
    // too — SparkPlan.collect stops at expression boundaries, so this
    // is the bypass the subquery walk exists to close
    val (c4, b4) = post("/execute-custom-query",
      """{"query":"SELECT count(*) AS n FROM sec_num_2023Q4 WHERE value > (SELECT max(a.value + b.custom) FROM sec_num_2023Q4 a, sec_tag_2023Q4 b)"}""")
    assert(c4 == 400, s"expected subquery-cartesian rejection, got $c4: $b4")
    assert(b4.get("detail").asText.toLowerCase.contains("cartesian"))
    // the policy boundary: a CONDITIONED non-equi join (broadcast
    // nested loop WITH a condition) stays allowed — bounded by the
    // broadcast side, it is how legitimate small-dim theta joins plan
    val (c3, b3) = post("/execute-custom-query",
      """{"query":"SELECT count(*) AS n FROM sec_num_2023Q4 a JOIN sec_tag_2023Q4 b ON a.value >= b.custom"}""")
    assert(c3 == 200, s"conditioned non-equi join must serve: $b3")
    assert(b3.get("data").get(0).get("n").asLong > 0L)
  }

  test("free-form SQL: a query past the deadline is cancelled with 504 " +
    "and the server stays serviceable") {
    // dedicated instance with a tight deadline so the shared Api's
    // generous default keeps serving the other cases
    val strict = new Api(spark, maxRows = 100, sqlTimeoutMs = 400)
    val strictPort = strict.start(0)
    try {
      val t0 = System.nanoTime()
      val r = client.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:$strictPort/query-data?query=" +
            java.net.URLEncoder.encode(
              // max, not sum: ANSI mode overflows a sum of xxhash64s
              // instantly, which would 500 before the deadline fires
              "SELECT max(xxhash64(cast(id AS string))) AS s " +
                "FROM range(2000000000)", "UTF-8"))).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      val elapsed = (System.nanoTime() - t0) / 1e9
      assert(r.statusCode() == 504,
        s"expected 504, got ${r.statusCode()}: ${r.body().take(200)}")
      assert(mapper.readTree(r.body()).get("detail").asText
        .contains("cancelled"))
      // cancellation must cut the job short, not wait it out (the
      // 2e9-row scan runs tens of seconds uncancelled; generous bound
      // because this host documents CPU-steal bursts)
      assert(elapsed < 30.0, f"cancel took $elapsed%.1fs")
      // the session survives the cancel: a cheap follow-up serves
      val (okCode, okBody) = {
        val r2 = client.send(
          HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$strictPort/query-data?query=" +
              java.net.URLEncoder.encode("SELECT 1 AS one", "UTF-8")))
            .GET().build(),
          HttpResponse.BodyHandlers.ofString())
        (r2.statusCode(), mapper.readTree(r2.body()))
      }
      assert(okCode == 200 && okBody.get("data").get(0).get("one").asInt == 1)
    } finally strict.stop()
  }

  test("table-snapshot: current and as-of reads of a drained upsert table, 404 past retention") {
    // a real drained table: the q253 three-wave drain at sf0.001
    // leaves {v1, v2} live (retention) with v2 current
    val drop = graft.streaming.UpsertStream.stageUpsertWaves(spark, sf0001)
    val root = tmpDir("api_upsert_root")
    val ck = tmpDir("api_upsert_ck")
    assert(graft.streaming.UpsertStream.drainUpsertWaves(
      spark, drop, root, ck) == graft.streaming.UpsertStream.Waves)
    val enc = java.net.URLEncoder.encode(root, "UTF-8")
    // current read: version == current == 2, data == the live table
    val (c1, b1) = get(s"/table-snapshot?root=$enc")
    assert(c1 == 200 && b1.get("version").asLong == 2L &&
      b1.get("current").asLong == 2L)
    val expected = spark.read.parquet(s"$root/v2").count()
    assert(b1.get("data").size.toLong == expected,
      s"current snapshot served ${b1.get("data").size} of $expected rows")
    // as-of read one step back: version 1 under current 2
    val (c2, b2) = get(s"/table-snapshot?root=$enc&version=v1")
    assert(c2 == 200 && b2.get("version").asLong == 1L &&
      b2.get("current").asLong == 2L)
    assert(b2.get("data").size.toLong ==
      spark.read.parquet(s"$root/v1").count())
    // bare-number version syntax serves too
    val (c3, b3) = get(s"/table-snapshot?root=$enc&version=1")
    assert(c3 == 200 && b3.get("version").asLong == 1L)
    // past the retention window: v0 was vacuumed — 404, not a read of
    // deleted files
    val (c4, b4) = get(s"/table-snapshot?root=$enc&version=0")
    assert(c4 == 404 &&
      b4.get("detail").asText.contains("retention window"))
    // error shapes: missing root, unknown root, junk version
    val (c5, _) = get("/table-snapshot")
    assert(c5 == 400)
    val (c6, _) = get(s"/table-snapshot?root=${enc}_nope")
    assert(c6 == 404)
    val (c7, b7) = get(s"/table-snapshot?root=$enc&version=abc")
    assert(c7 == 400 && b7.get("detail").asText.contains("invalid version"))
  }

  test("table-snapshot: retention vacuum racing the read — as-of 404s on both branches, current read retries onto the new current") {
    import graft.streaming.UpsertStream
    val drop = UpsertStream.stageUpsertWaves(spark, sf0001)
    def freshTable(tag: String): String = {
      val root = tmpDir(s"api_race_root_$tag")
      val ck = tmpDir(s"api_race_ck_$tag")
      assert(UpsertStream.drainUpsertWaves(spark, drop, root, ck) ==
        UpsertStream.Waves)
      root // {v1, v2} live, v2 current
    }
    val a = api.get
    val fs = new org.apache.hadoop.fs.Path("/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // arm a one-shot hook in the TOCTOU window (after the route
    // resolves its snapshot, before the scan) and self-disarm — the
    // deterministic stand-in for a racing drain's vacuum
    def arm(f: => Unit): Unit =
      a.snapshotReadRaceHook = () => {
        a.snapshotReadRaceHook = () => ()
        f
      }
    try {
      // BRANCH 1 — scan throws on vanished files: the hook vacuums the
      // as-of version whole (marker first, then the recursive delete),
      // so the read lands on a missing path; the catch-side recheck
      // classifies it as vacuumed -> 404, not 500
      val r1 = freshTable("throw")
      arm { UpsertStream.vacuumSnapshots(spark, r1, keepFrom = 2L) }
      val (c1, b1) = get("/table-snapshot?root=" +
        java.net.URLEncoder.encode(r1, "UTF-8") + "&version=1")
      assert(c1 == 404 && b1.get("detail").asText
        .contains("left the retention window during the read"),
        s"got $c1: $b1")
      // BRANCH 2 — scan succeeds but the version was un-committed
      // mid-read (the truncated-listing shape: vacuum's marker delete
      // landed, data deletes hadn't): the post-read marker recheck
      // refuses the 200. The hook deletes ONLY the marker — the data
      // files all survive, so only the recheck (never a scan error)
      // can catch this
      val r2 = freshTable("subset")
      arm { fs.delete(new org.apache.hadoop.fs.Path(
        s"$r2/v1/_GRAFT_COMMIT"), false) }
      val (c2, b2) = get("/table-snapshot?root=" +
        java.net.URLEncoder.encode(r2, "UTF-8") + "&version=1")
      assert(c2 == 404 && b2.get("detail").asText
        .contains("left the retention window during the read"),
        s"got $c2: $b2")
      // BRANCH 3 — implicit CURRENT read raced: the hook commits v3
      // and vacuums {v1, v2}, so the resolved v2 vanishes mid-read;
      // the route must re-resolve and serve the NEW current (ADVICE
      // r16: a current read must not 404 while the table exists)
      val r3 = freshTable("retry")
      arm {
        spark.read.parquet(s"$r3/v2").write.parquet(s"$r3/v3")
        fs.create(new org.apache.hadoop.fs.Path(
          s"$r3/v3/_GRAFT_COMMIT"), true).close()
        UpsertStream.vacuumSnapshots(spark, r3, keepFrom = 3L)
      }
      val (c3, b3) = get("/table-snapshot?root=" +
        java.net.URLEncoder.encode(r3, "UTF-8"))
      assert(c3 == 200, s"current read must retry, got $c3: $b3")
      assert(b3.get("version").asLong == 3L &&
        b3.get("current").asLong == 3L,
        s"retry must land on the new current: $b3")
      assert(b3.get("data").size.toLong ==
        spark.read.parquet(s"$r3/v3").count())
    } finally a.snapshotReadRaceHook = () => ()
  }

  test("table-lookup: indexed point read opens few files, unindexed falls back, races retry") {
    import graft.streaming.UpsertStream
    val drop = UpsertStream.stageUpsertWaves(spark, sf0001)
    val root = tmpDir("api_lookup_root")
    val ck = tmpDir("api_lookup_ck")
    assert(UpsertStream.drainUpsertWaves(spark, drop, root, ck) ==
      UpsertStream.Waves) // {v1, v2} live, v2 current
    val enc = java.net.URLEncoder.encode(root, "UTF-8")
    val probe = spark.read.parquet(s"$root/v2")
      .agg(org.apache.spark.sql.functions.min("doc_id")).head.getLong(0)
    // UNINDEXED: the plain-scan fallback serves, opened == total
    val (c1, b1) = get(s"/table-lookup?root=$enc&key=doc_id&value=$probe")
    assert(c1 == 200 && b1.get("version").asLong == 2L, s"$c1: $b1")
    assert(b1.get("files_opened").asLong == b1.get("files_total").asLong)
    assert(b1.get("data").size == 1 &&
      b1.get("data").get(0).get("doc_id").asLong == probe)
    // INDEXED: cluster the snapshot's layout is whatever the drain
    // wrote; the index still prunes to the files that admit the probe
    graft.operators.Maintenance.writeSkipIndex(spark, s"$root/v2",
      Seq("doc_id"))
    val (c2, b2) = get(s"/table-lookup?root=$enc&key=doc_id&value=$probe")
    assert(c2 == 200, s"$c2: $b2")
    assert(b2.get("files_opened").asLong <= b2.get("files_total").asLong)
    assert(b2.get("data").size == 1 &&
      b2.get("data").get(0).get("doc_id").asLong == probe)
    // a key that admits no file: empty data, zero or few files opened
    val (c3, b3) = get(s"/table-lookup?root=$enc&key=doc_id&value=-5")
    assert(c3 == 200 && b3.get("data").size == 0, s"$c3: $b3")
    // error shapes
    val (c4, _) = get(s"/table-lookup?root=$enc&key=nope&value=1")
    assert(c4 == 400)
    val (c5, _) = get(s"/table-lookup?root=$enc&key=doc_id&value=abc")
    assert(c5 == 400)
    val (c6, _) = get(s"/table-lookup?root=${enc}_nope&key=doc_id&value=1")
    assert(c6 == 404)
    // a TORN index (dir exists, no readable parquet — a crashed
    // writeSkipIndex) must fall back to the plain scan, never 500:
    // the index is an accelerator, not a correctness dependency
    val fsT = new org.apache.hadoop.fs.Path("/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsT.delete(new org.apache.hadoop.fs.Path(s"$root/v2/_skipindex"), true)
    fsT.mkdirs(new org.apache.hadoop.fs.Path(s"$root/v2/_skipindex"))
    val (c3b, b3b) = get(s"/table-lookup?root=$enc&key=doc_id&value=$probe")
    assert(c3b == 200 && b3b.get("data").size == 1, s"$c3b: $b3b")
    assert(b3b.get("files_opened").asLong ==
      b3b.get("files_total").asLong, "torn index must serve unindexed")
    // vacuum racing the lookup: the resolved v2 vanishes mid-read
    // after a v3 commit — the route re-resolves and serves v3
    val a = api.get
    val fs = new org.apache.hadoop.fs.Path("/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    a.snapshotReadRaceHook = () => {
      a.snapshotReadRaceHook = () => ()
      spark.read.parquet(s"$root/v2").write.parquet(s"$root/v3")
      fs.create(new org.apache.hadoop.fs.Path(
        s"$root/v3/_GRAFT_COMMIT"), true).close()
      UpsertStream.vacuumSnapshots(spark, root, keepFrom = 3L)
    }
    try {
      val (c7, b7) = get(s"/table-lookup?root=$enc&key=doc_id&value=$probe")
      assert(c7 == 200 && b7.get("version").asLong == 3L, s"$c7: $b7")
      assert(b7.get("data").size == 1)
    } finally a.snapshotReadRaceHook = () => ()
  }

  override def afterAll(): Unit = {
    api.foreach(_.stop())
    super.afterAll()
  }
}
