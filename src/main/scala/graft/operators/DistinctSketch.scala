package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distinct-count sketching (HyperLogLog registers) — the missing
  * member of the sketch family beside the count-min sketch (q101) and
  * heavy hitters (q83). At 100 TB "how many distinct users" is never
  * answered exactly per slice: each partition folds its rows into m
  * fixed registers, registers merge by elementwise MAX (associative,
  * commutative, idempotent — safe under retries and re-partitioning),
  * and only m small integers ever travel. The register table IS the
  * sketch: persisting it per day/source gives mergeable distinct
  * counts over any slice union without re-scanning raw data.
  *
  * Everything here is exact integer arithmetic so the DuckDB oracle
  * reproduces the registers bit-for-bit:
  *  - hash: [[portableHash60]] (md5 prefix, 60 uniform bits),
  *  - register index: low `p` bits,
  *  - rho: position of the lowest set bit of the remaining 56 bits
  *    (1-based; 57 caps the all-zero word). Trailing bits are as
  *    uniform as leading ones, and `length(bin(w & -w))` computes the
  *    position exactly in BOTH engines — no float log2 anywhere.
  * The float estimate alpha·m²/Σ2^-M_j is deliberately NOT part of
  * the query output (it is derived, not data); DistinctSketchSpec
  * computes it from the registers and bounds its error against the
  * exact counts carried alongside.
  */
object DistinctSketch {

  /** Register-index bits: m = 2^p registers. p = 4 keeps the q152
    * output readable (16 registers/group); production distinct counts
    * would use p = 11..14 — nothing below depends on p beyond the
    * masks. */
  val P = 4
  val M: Int = 1 << P
  /** rho cap: 1 + the 56 hash bits left after the register index. */
  val RhoCap: Int = 60 - P + 1

  /** Per-group HLL registers of `keyCol` — the reusable, mergeable
    * core shared by q152 and the streaming maintenance path
    * ([[graft.streaming.SketchStream]]): one scan computes
    * (group, register, rho) and a map-side-combinable max collapses
    * it to groups × [[M]] rows. Partials over disjoint (or even
    * overlapping — max is idempotent) slices combine by per-register
    * MAX. `portable = false` swaps the md5-prefix hash for xxhash64
    * masked to the same 60 bits — the at-scale default the oracle
    * cannot recompute; both configs are benched (the q23/q24 tax
    * discipline). */
  def registers(df: DataFrame, groupCol: String, keyCol: String,
                portable: Boolean = true): DataFrame =
    registers(df, Seq(groupCol), keyCol, portable)

  /** [[registers]] over a COMPOSITE group key — the finest-grain form
    * q215's grouping-set rollup stores (one register set per
    * (day, type) cell; every coarser grain merges from it). */
  def registers(df: DataFrame, groupCols: Seq[String], keyCol: String,
                portable: Boolean): DataFrame = {
    val g = groupCols.map(col)
    df.select(g :+ graft.functions.TextFunctions
          .hash60(col(keyCol).cast("string"), portable).as("h"): _*)
      .select(g :+ col("h").bitwiseAND(lit((M - 1).toLong)).as("register")
        :+ shiftright(col("h"), P).as("w"): _*)
      .select(g :+ col("register") :+
        when(col("w") === 0L, lit(RhoCap.toLong))
          .otherwise(length(bin(expr("w & -w"))).cast("long")).as("rho"): _*)
      .groupBy(g :+ col("register"): _*)
      .agg(max(col("rho")).as("max_rho"))
  }

  /** q152: per-event-type HLL registers with the exact distinct user
    * count alongside, plus a merged `__all__` row set that is computed
    * ONLY from the per-type registers (merge = elementwise max) while
    * the oracle recomputes it from the raw rows — so the hash match
    * certifies register mergeability, not just register construction.
    *
    * Scale shape: the register build is [[registers]] (one hashed
    * scan, map-side combined); the exact distincts (the verification
    * baseline, not part of the sketch) are the only user-keyed
    * shuffles. The merged registers touch per-type registers only —
    * groups × m rows, never the corpus. */
  def hllRegistersQuery(spark: SparkSession, dir: String,
                        portable: Boolean = true): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"))
    val perType = registers(ev, "event_type", "user_id", portable)
      .localCheckpoint()
    val exact = ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n_exact"))
    val typed = perType.join(exact, Seq("event_type"))
    val mergedRegisters = perType.groupBy("register")
      .agg(max(col("max_rho")).as("max_rho"))
    val globalExact = ev
      .agg(count_distinct(col("user_id")).as("n_exact"))
    val merged = mergedRegisters.crossJoin(globalExact)
      .select(lit("__all__").as("event_type"), col("register"),
        col("max_rho"), col("n_exact"))
    typed.select("event_type", "register", "max_rho", "n_exact")
      .unionAll(merged)
      .orderBy("event_type", "register")
  }

  /** DuckDB oracle for [[hllRegistersQuery]]. The `__all__` rows are
    * recomputed from the RAW hashed rows (group by register over
    * everything), which is what makes the engine's register-merge
    * construction a checked claim. */
  def hllRegistersOracleSql: String =
    s"""WITH h AS (SELECT event_type, user_id,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS h
         FROM events),
       r AS (SELECT event_type, user_id,
           h & ${M - 1} AS register,
           CASE WHEN (h >> $P) = 0 THEN $RhoCap
                ELSE length(bin((h >> $P) & -(h >> $P))) END AS rho
         FROM h),
       pt AS (SELECT event_type, register,
           CAST(max(rho) AS BIGINT) AS max_rho
         FROM r GROUP BY 1, 2),
       ex AS (SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
         FROM r GROUP BY 1),
       typed AS (SELECT pt.event_type, pt.register, pt.max_rho,
           ex.n_exact
         FROM pt JOIN ex ON pt.event_type = ex.event_type),
       all_r AS (SELECT '__all__' AS event_type, register,
           CAST(max(rho) AS BIGINT) AS max_rho,
           (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM r)
             AS n_exact
         FROM r GROUP BY 2)
     SELECT * FROM (SELECT * FROM typed UNION ALL SELECT * FROM all_r)
     ORDER BY event_type, register"""

  /** q160: the PERSISTED-SKETCH serving pattern over time slices —
    * what a register table is actually FOR in production: one
    * register set per day (the partials a nightly job would append),
    * and the first week's distinct-user registers computed ONLY by
    * max-merging those daily partials — while the oracle recomputes
    * the window from the raw rows. The hash match is the proof that
    * "distinct users over any date range" is answerable from the
    * daily register table alone, no rescan of history; exact daily
    * and window distincts ride along as the verification baseline.
    * Same construction as q152's `__all__` rows with GROUP slices
    * swapped for TIME slices — the two axes a 100 TB corpus is
    * actually cut along. */
  def dailyRegistersQuery(spark: SparkSession, dir: String): DataFrame = {
    // three cheap columnar scans of events (registers, daily exact,
    // window exact), never a corpus-sized checkpoint; everything
    // derived past them — including the window's day list — reads
    // the METADATA-SCALE daily register table
    val ev = Tables.events(spark, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("d"),
        col("ts").cast("date").as("dd"), col("user_id"))
    val daily = registers(ev, "d", "user_id").localCheckpoint()
    val dailyExact = ev.groupBy("d")
      .agg(count_distinct(col("user_id")).as("n_exact"))
    // window bound from the daily table's min day (ISO strings sort
    // chronologically), not another corpus scan
    val lim = daily.agg(date_add(to_date(min(col("d"))), 6).as("dmax"))
    val winDays = daily.select(col("d")).distinct()
      .crossJoin(broadcast(lim))
      .filter(to_date(col("d")) <= col("dmax"))
      .select(col("d"))
    // window registers: max-merge of the DAILY PARTIALS, never raw rows
    val winRegs = daily.join(broadcast(winDays), Seq("d"))
      .groupBy("register").agg(max(col("max_rho")).as("max_rho"))
    val winExact = ev.crossJoin(broadcast(lim))
      .filter(col("dd") <= col("dmax"))
      .agg(count_distinct(col("user_id")).as("n_exact"))
    daily.join(dailyExact, Seq("d"))
      .select(col("d"), col("register"), col("max_rho"), col("n_exact"))
      .unionAll(winRegs.crossJoin(winExact)
        .select(lit("__week1__").as("d"), col("register"),
          col("max_rho"), col("n_exact")))
      .orderBy("d", "register")
  }

  /** DuckDB oracle for [[dailyRegistersQuery]] — the `__week1__` rows
    * recomputed from RAW rows in the window, which is what makes the
    * engine's partial-merge serving a checked claim. */
  def dailyRegistersOracleSql: String =
    s"""WITH ev AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d,
           CAST(ts AS DATE) AS dd, user_id,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS h
         FROM events),
       r AS (SELECT d, dd, user_id, h & ${M - 1} AS register,
           CASE WHEN (h >> $P) = 0 THEN $RhoCap
                ELSE length(bin((h >> $P) & -(h >> $P))) END AS rho
         FROM ev),
       lim AS (SELECT min(dd) AS d0 FROM ev),
       daily AS (SELECT d, register, CAST(max(rho) AS BIGINT) AS max_rho
                 FROM r GROUP BY 1, 2),
       dex AS (SELECT d, CAST(count(DISTINCT user_id) AS BIGINT)
                 AS n_exact FROM ev GROUP BY 1),
       win AS (SELECT register, CAST(max(rho) AS BIGINT) AS max_rho
               FROM r, lim WHERE dd <= d0 + 6 GROUP BY 1),
       wex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
               FROM ev, lim WHERE dd <= d0 + 6)
     SELECT * FROM (
       SELECT daily.d, daily.register, daily.max_rho, dex.n_exact
       FROM daily JOIN dex ON daily.d = dex.d
       UNION ALL
       SELECT '__week1__' AS d, win.register, win.max_rho, wex.n_exact
       FROM win, wex)
     ORDER BY d, register"""

  /** Trailing-window width (days) for [[slidingRegistersQuery]]. */
  val SlideDays = 7

  /** q195: SLIDING trailing-7-day distinct registers for EVERY day —
    * the windowed-serving payoff of a mergeable sketch: q160 proves
    * one week's register merge; this derives the whole per-day
    * trailing series from the DAILY PARTIALS alone. Each daily
    * register row fans out to the ≤ 7 window-ending days it serves
    * (an explode over literal offsets on the METADATA-SCALE register
    * table — days × m × 7 rows, never the corpus), then max-merges
    * per (window day, register). The raw data is never rescanned per
    * window — the O(days × window) work a naive recompute would do
    * collapses to O(register-table). Exact trailing distincts ride
    * along as the checked baseline, derived from the distinct
    * (day, user) pair table (corpus-sized input, one shuffle; the
    * pair fan-out is 7× pairs, not 7× events). Window days are
    * restricted to OBSERVED days, so the series has no phantom tail.
    */
  def slidingRegistersQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("d"),
        col("ts").cast("date").as("dd"), col("user_id"))
    val daily = registers(ev, "d", "user_id").localCheckpoint()
    val winRegs = slidingFromDaily(daily)
    val offsets = array((0 until SlideDays).map(k => lit(k)): _*)
    val days = daily.select(col("d")).distinct()
    val pairs = ev.select(col("dd"), col("user_id")).distinct()
    val exact = pairs
      .select(explode(offsets).as("k"), col("dd"), col("user_id"))
      .withColumn("wd",
        expr("date_format(date_add(dd, k), 'yyyy-MM-dd')"))
      .join(broadcast(days.select(col("d").as("wd"))), Seq("wd"))
      .groupBy("wd")
      .agg(count_distinct(col("user_id")).as("n_exact"))
    winRegs.join(exact, Seq("wd"))
      .select(col("wd").as("d"), col("register"),
        col("max_rho").cast("long").as("max_rho"),
        col("n_exact").cast("long").as("n_exact"))
      .orderBy("d", "register")
  }

  /** The window-merge core of [[slidingRegistersQuery]] over ANY
    * daily register table (d, register, max_rho) — shared by the
    * batch query and the streaming-maintenance equivalence test: the
    * serving layer does not care whether the partials came from a
    * batch scan or a foreachBatch maintenance loop, which is the
    * point of a mergeable sketch. Returns (wd, register, max_rho). */
  def slidingFromDaily(daily: DataFrame): DataFrame = {
    val offsets = array((0 until SlideDays).map(k => lit(k)): _*)
    val days = daily.select(col("d")).distinct()
    daily
      .select(explode(offsets).as("k"), col("d"), col("register"),
        col("max_rho"))
      .withColumn("wd",
        expr("date_format(date_add(to_date(d), k), 'yyyy-MM-dd')"))
      .join(broadcast(days.select(col("d").as("wd"))), Seq("wd"))
      .groupBy("wd", "register").agg(max(col("max_rho")).as("max_rho"))
  }

  /** DuckDB oracle for [[slidingRegistersQuery]] — same daily
    * partials, same fan-out merge, exact windows from raw pairs. */
  def slidingRegistersOracleSql: String = {
    val ks = (0 until SlideDays).map(k => s"($k)").mkString(", ")
    s"""WITH ev AS (SELECT CAST(ts AS DATE) AS dd, user_id,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS h
         FROM events),
       r AS (SELECT dd, h & ${M - 1} AS register,
           CASE WHEN (h >> $P) = 0 THEN $RhoCap
                ELSE length(bin((h >> $P) & -(h >> $P))) END AS rho
         FROM ev),
       daily AS (SELECT dd, register, CAST(max(rho) AS BIGINT)
           AS max_rho FROM r GROUP BY 1, 2),
       days AS (SELECT DISTINCT dd FROM ev),
       ks(k) AS (VALUES $ks),
       winr AS (SELECT strftime(daily.dd + ks.k, '%Y-%m-%d') AS d,
           register, max(max_rho) AS max_rho
         FROM daily CROSS JOIN ks
         JOIN days ON daily.dd + ks.k = days.dd
         GROUP BY 1, 2),
       pairs AS (SELECT DISTINCT dd, user_id FROM ev),
       ex AS (SELECT strftime(pairs.dd + ks.k, '%Y-%m-%d') AS d,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
         FROM pairs CROSS JOIN ks
         JOIN days ON pairs.dd + ks.k = days.dd
         GROUP BY 1)
     SELECT winr.d AS d, register, CAST(max_rho AS BIGINT) AS max_rho,
       n_exact
     FROM winr JOIN ex ON winr.d = ex.d
     ORDER BY winr.d, register"""
  }

  /** KMV sketch size for [[kmvJaccardQuery]]: large enough that the
    * bottom-k Jaccard estimate is meaningful on the test corpus,
    * small enough to read; production audience sketches would use
    * k = 1024..4096 — nothing below depends on the value. */
  val KmvK = 64

  /** q181: KMV (bottom-k) audience-overlap sketches — the set-algebra
    * member of the sketch family. Per event type, the k smallest
    * distinct [[graft.functions.TextFunctions.hash60]] values of
    * `user_id` ([[graft.functions.KmvSketchAgg]]: bounded buffer,
    * map-side combined, mergeable); then for every type pair the
    * union's bottom-k is derived FROM THE TWO SKETCHES ALONE
    * (array_union + sort + slice — never the raw rows) and
    * `inter_k / k_used`, the fraction of it present in both sketches,
    * is the bottom-k Jaccard estimate (Beyer et al., SIGMOD'07).
    * Exact intersection/union cardinalities ride along as the
    * verification baseline, so the hash match certifies BOTH sketch
    * construction (n/kth per type) and sketch-only set algebra
    * (k_used/inter_k per pair) against an oracle that re-derives
    * them relationally.
    *
    * Scale shape: one hashed scan feeds the sketch build (ObjectHash
    * aggregate, partial-combined — the shuffle carries ≤ k longs per
    * type per map partition, never distinct keys); the pair frame is
    * #types² sketch rows (metadata-scale, broadcast nested-loop by
    * construction); the exact baselines are the only user-keyed
    * shuffles and exist solely to be checked against.
    */
  def kmvJaccardQuery(spark: SparkSession, dir: String,
                      portable: Boolean = true): DataFrame = {
    graft.functions.SketchFunctions.register(spark)
    val k = KmvK
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"))
    val hashed = ev.select(col("event_type"),
      graft.functions.TextFunctions
        .hash60(col("user_id").cast("string"), portable).as("h"))
    val sk = hashed.groupBy("event_type")
      .agg(graft.functions.SketchFunctions.kmvSketch(col("h"), k).as("kmv"))
      .localCheckpoint() // reused by both pair sides + per-type stats
    val pairs = sk.select(col("event_type").as("t1"), col("kmv").as("kmv1"))
      .join(sk.select(col("event_type").as("t2"), col("kmv").as("kmv2")),
        col("t1") < col("t2"))
    val unionK = slice(array_sort(array_union(col("kmv1"), col("kmv2"))),
      1, k)
    val sketchPairs = pairs.select(col("t1"), col("t2"),
      size(col("kmv1")).cast("long").as("n1"),
      size(col("kmv2")).cast("long").as("n2"),
      element_at(col("kmv1"), size(col("kmv1"))).as("kth1"),
      element_at(col("kmv2"), size(col("kmv2"))).as("kth2"),
      size(unionK).cast("long").as("k_used"),
      size(array_intersect(array_intersect(unionK, col("kmv1")),
        col("kmv2"))).cast("long").as("inter_k"))
    // exact baselines: distinct (type,user) once, then counts + a
    // user-keyed self-join for pairwise intersections
    val d = ev.distinct().localCheckpoint()
    val cnt = d.groupBy("event_type").agg(count(lit(1)).as("c"))
    val xin = d.select(col("event_type").as("t1"), col("user_id"))
      .join(d.select(col("event_type").as("t2"), col("user_id")), "user_id")
      .filter(col("t1") < col("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("exact_inter"))
    sketchPairs
      .join(broadcast(cnt.select(col("event_type").as("t1"),
        col("c").as("c1"))), Seq("t1"))
      .join(broadcast(cnt.select(col("event_type").as("t2"),
        col("c").as("c2"))), Seq("t2"))
      .join(broadcast(xin), Seq("t1", "t2"), "left")
      .select(col("t1"), col("t2"), col("n1"), col("n2"),
        col("kth1"), col("kth2"), col("k_used"), col("inter_k"),
        coalesce(col("exact_inter"), lit(0L)).cast("long")
          .as("exact_inter"),
        (col("c1") + col("c2") -
          coalesce(col("exact_inter"), lit(0L))).cast("long")
          .as("exact_union"))
      .orderBy("t1", "t2")
  }

  /** DuckDB oracle for [[kmvJaccardQuery]] — re-derives the bottom-k
    * sets relationally (rank over distinct hashed keys) and the
    * union's bottom-k from the two per-type rankings, so a Spark-side
    * buffer bug (lost dedup, broken merge, off-by-one at the cap)
    * cannot hash-match. */
  def kmvJaccardOracleSql: String =
    s"""WITH h AS (SELECT DISTINCT event_type,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS h
         FROM events),
       sk AS (SELECT event_type, h FROM (
           SELECT event_type, h, row_number() OVER
             (PARTITION BY event_type ORDER BY h) AS rn FROM h)
         WHERE rn <= $KmvK),
       agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(max(h) AS BIGINT) AS kth FROM sk GROUP BY 1),
       prs AS (SELECT a.event_type AS t1, b.event_type AS t2
         FROM agg a JOIN agg b ON a.event_type < b.event_type),
       u AS (SELECT p.t1, p.t2, s.h FROM prs p JOIN sk s
           ON s.event_type = p.t1 OR s.event_type = p.t2
         GROUP BY 1, 2, 3),
       uk AS (SELECT t1, t2, h FROM (
           SELECT t1, t2, h, row_number() OVER
             (PARTITION BY t1, t2 ORDER BY h) AS rn FROM u)
         WHERE rn <= $KmvK),
       ik AS (SELECT uk.t1, uk.t2, CAST(count(*) AS BIGINT) AS k_used,
           CAST(count(*) FILTER (WHERE s1.h IS NOT NULL
             AND s2.h IS NOT NULL) AS BIGINT) AS inter_k
         FROM uk
         LEFT JOIN sk s1 ON s1.event_type = uk.t1 AND s1.h = uk.h
         LEFT JOIN sk s2 ON s2.event_type = uk.t2 AND s2.h = uk.h
         GROUP BY 1, 2),
       dx AS (SELECT DISTINCT event_type, user_id FROM events),
       cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c
         FROM dx GROUP BY 1),
       xin AS (SELECT a.event_type AS t1, b.event_type AS t2,
           CAST(count(*) AS BIGINT) AS exact_inter
         FROM dx a JOIN dx b ON a.user_id = b.user_id
           AND a.event_type < b.event_type
         GROUP BY 1, 2)
     SELECT p.t1, p.t2, ga.n AS n1, gb.n AS n2,
       ga.kth AS kth1, gb.kth AS kth2, ik.k_used, ik.inter_k,
       CAST(COALESCE(x.exact_inter, 0) AS BIGINT) AS exact_inter,
       CAST(ca.c + cb.c - COALESCE(x.exact_inter, 0) AS BIGINT)
         AS exact_union
     FROM prs p
     JOIN agg ga ON ga.event_type = p.t1
     JOIN agg gb ON gb.event_type = p.t2
     JOIN ik ON ik.t1 = p.t1 AND ik.t2 = p.t2
     JOIN cnt ca ON ca.event_type = p.t1
     JOIN cnt cb ON cb.event_type = p.t2
     LEFT JOIN xin x ON x.t1 = p.t1 AND x.t2 = p.t2
     ORDER BY p.t1, p.t2"""

  /** The classic HLL estimate computed FROM a register map — driver
    * side, for specs and register-table consumers (the registers are
    * the persisted artifact; the estimate is derived on read).
    * Small-range correction (linear counting) applies below 5m/2 with
    * zero registers, and alpha is derived from [[M]] (Flajolet et
    * al. 2007), so changing [[P]] keeps the estimate calibrated. */
  def estimate(registers: Map[Long, Long]): Double = {
    val m = M.toDouble
    val alpha = M match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    val zSum = (0 until M)
      .map(j => math.pow(2.0, -registers.getOrElse(j.toLong, 0L).toDouble))
      .sum
    val raw = alpha * m * m / zSum
    val zeros = (0 until M).count(j => registers.getOrElse(j.toLong, 0L) == 0L)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
  }

  /** q215: the SKETCH CUBE — distinct-user registers for the whole
    * grouping-set lattice {(day, type), (day), (type), ()} where
    * every coarse grain is computed ONLY by max-merging the finest
    * (day × type) register table, while the oracle recomputes each
    * grain from raw rows. q64/q172 answer grouping sets with exact
    * counts by grouping the corpus per set; at 100 TB the sketch cube
    * is how this is actually served — ONE hashed scan builds the
    * finest partials, and every rollup (including axes the fine scan
    * never grouped by alone) is a metadata-scale register merge.
    * q152 certified one merge axis (type→all) and q160 the time axis;
    * this certifies the full lattice from one stored table. Exact
    * distincts per cell ride along as the verification baseline. */
  def rollupRegistersQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("d"),
        col("event_type").as("et"), col("user_id"))
    val fine = registers(ev, Seq("d", "et"), "user_id", portable = true)
      .localCheckpoint()
    val cellEx = ev.groupBy("d", "et")
      .agg(count_distinct(col("user_id")).as("n_exact"))
    val dayEx = ev.groupBy("d")
      .agg(count_distinct(col("user_id")).as("n_exact"))
    val typeEx = ev.groupBy("et")
      .agg(count_distinct(col("user_id")).as("n_exact"))
    val allEx = ev.agg(count_distinct(col("user_id")).as("n_exact"))
    val cells = fine.join(cellEx, Seq("d", "et"))
      .select(lit("d_et").as("grain"), col("d"), col("et"),
        col("register"), col("max_rho"), col("n_exact"))
    val byDay = fine.groupBy("d", "register")
      .agg(max(col("max_rho")).as("max_rho"))
      .join(dayEx, Seq("d"))
      .select(lit("d").as("grain"), col("d"), lit("__all__").as("et"),
        col("register"), col("max_rho"), col("n_exact"))
    val byType = fine.groupBy("et", "register")
      .agg(max(col("max_rho")).as("max_rho"))
      .join(typeEx, Seq("et"))
      .select(lit("et").as("grain"), lit("__all__").as("d"), col("et"),
        col("register"), col("max_rho"), col("n_exact"))
    val total = fine.groupBy("register")
      .agg(max(col("max_rho")).as("max_rho"))
      .crossJoin(broadcast(allEx))
      .select(lit("all").as("grain"), lit("__all__").as("d"),
        lit("__all__").as("et"), col("register"), col("max_rho"),
        col("n_exact"))
    cells.unionAll(byDay).unionAll(byType).unionAll(total)
      .orderBy("grain", "d", "et", "register")
  }

  /** DuckDB oracle for [[rollupRegistersQuery]] — every grain's
    * registers recomputed from the RAW hashed rows, so the hash match
    * certifies that the engine's fine-grain merges equal direct
    * computation at every lattice point. */
  def rollupRegistersOracleSql: String =
    s"""WITH ev AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d,
           event_type AS et, user_id,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS h
         FROM events),
       r AS (SELECT d, et, user_id, h & ${M - 1} AS register,
           CASE WHEN (h >> $P) = 0 THEN $RhoCap
                ELSE length(bin((h >> $P) & -(h >> $P))) END AS rho
         FROM ev),
       cells AS (SELECT 'd_et' AS grain, d, et, register,
           CAST(max(rho) AS BIGINT) AS max_rho
         FROM r GROUP BY 2, 3, 4),
       cex AS (SELECT d, et, CAST(count(DISTINCT user_id) AS BIGINT)
           AS n_exact FROM ev GROUP BY 1, 2),
       byday AS (SELECT 'd' AS grain, d, '__all__' AS et, register,
           CAST(max(rho) AS BIGINT) AS max_rho
         FROM r GROUP BY 2, 4),
       dex AS (SELECT d, CAST(count(DISTINCT user_id) AS BIGINT)
           AS n_exact FROM ev GROUP BY 1),
       bytype AS (SELECT 'et' AS grain, '__all__' AS d, et, register,
           CAST(max(rho) AS BIGINT) AS max_rho
         FROM r GROUP BY 3, 4),
       tex AS (SELECT et, CAST(count(DISTINCT user_id) AS BIGINT)
           AS n_exact FROM ev GROUP BY 1),
       tot AS (SELECT 'all' AS grain, '__all__' AS d, '__all__' AS et,
           register, CAST(max(rho) AS BIGINT) AS max_rho
         FROM r GROUP BY 4),
       aex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
               FROM ev)
     SELECT * FROM (
       SELECT c.grain, c.d, c.et, c.register, c.max_rho, cex.n_exact
       FROM cells c JOIN cex ON c.d = cex.d AND c.et = cex.et
       UNION ALL
       SELECT b.grain, b.d, b.et, b.register, b.max_rho, dex.n_exact
       FROM byday b JOIN dex ON b.d = dex.d
       UNION ALL
       SELECT b.grain, b.d, b.et, b.register, b.max_rho, tex.n_exact
       FROM bytype b JOIN tex ON b.et = tex.et
       UNION ALL
       SELECT t.grain, t.d, t.et, t.register, t.max_rho, aex.n_exact
       FROM tot t CROSS JOIN aex)
     ORDER BY grain, d, et, register"""
}
