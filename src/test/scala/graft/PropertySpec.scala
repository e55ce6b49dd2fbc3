package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.sources.{SecIngest, SecSchemas}

/** Property-based coverage for the edge cases the reference's
  * validation notes document (malformed numerics, arbitrary text):
  * ingest casts must never throw, and shingling must hold its size
  * invariant for any token count. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic property driver: scalatestplus is not on the
    * offline classpath, so sample the generator across fixed seeds. */
  private def forAll[A](gen: Gen[A], trials: Int = 20)(body: A => Unit): Unit =
    (0 until trials).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  test("typed ingest never throws: any string either casts or nulls") {
    val weird = Gen.oneOf(
      Gen.alphaNumStr, Gen.numStr,
      Gen.oneOf("", " ", "NaN", "null", "1e999", "-", "0x1F", "12.34.56",
        "999999999999999999999999999999999999999999", "2023093", "①②③"))
    forAll(Gen.listOfN(20, weird)) { values =>
      val raw = values.map(Tuple1(_)).toDF("ddate")
      val typed = SecIngest.typed(raw, new org.apache.spark.sql.types.StructType()
        .add("ddate", org.apache.spark.sql.types.IntegerType))
      // must evaluate without exception; every row survives
      assert(typed.count() == values.length)
      // parseable ints round-trip, everything else is null
      val out = typed.collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getInt(0)))
      values.zip(out).foreach { case (in, res) =>
        val expected = scala.util.Try(in.trim.toInt).toOption
        if (expected.isDefined && expected.get.toString == in.trim)
          assert(res == expected, s"'$in' should cast")
      }
    }
  }

  test("wordShingles size invariant: max(0, tokens - n + 1) before dedup") {
    val words = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dd", "e"))
    forAll(words) { ws =>
      val text = ws.mkString(" ")
      val df = Seq(Tuple1(text)).toDF("t")
        .select(TextFunctions.wordShingles(
          TextFunctions.tokens($"t"), 3).as("sh"))
      val n = df.collect().head.getSeq[String](0).length
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
        .filter(_ => text.trim.nonEmpty) match {
        case s if s.isEmpty && text.trim.isEmpty => Seq("")
        case s => s
      }
      val expectedMax = math.max(0, toks.length - 2)
      assert(n <= expectedMax, s"'$text': $n > $expectedMax")
      if (toks.length >= 3 && toks.distinct.length == toks.length)
        assert(n == expectedMax)
    }
  }

  test("connected components equal a union-find reference on random graphs") {
    // reference: path-compressing union-find with min-id labels
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    val edgeGen = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(1, 30)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
      } yield (a.toLong, b.toLong))
    } yield (n, es)
    forAll(edgeGen, trials = 8) { case (n, es) =>
      if (es.nonEmpty) {
        val spark2 = spark
        import spark2.implicits._
        val cc = graft.operators.DupClusters
          .connectedComponents(es.toDF("d1", "d2"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val ref = unionFind(n, es)
        // only nodes that appear in edges are labeled by the operator
        val touched = es.flatMap(e => Seq(e._1, e._2)).toSet
        touched.foreach { v =>
          assert(cc(v) == ref(v), s"node $v: got ${cc(v)}, want ${ref(v)}")
        }
      }
    }
  }

  test("triangle census equals a brute-force closure count on random graphs") {
    val edgeGen = for {
      n <- Gen.choose(3, 16)
      m <- Gen.choose(1, 40)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
    } yield es.distinct
    forAll(edgeGen, trials = 8) { es =>
      if (es.nonEmpty) {
        val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val nodes = adj.keys.toSeq.sorted
        // brute force: for each node, closed neighbor pairs
        val refTri = nodes.map { v =>
          val nb = adj(v).toSeq
          v -> nb.combinations(2).count(p => adj(p(0)).contains(p(1)))
        }.toMap
        val spark2 = spark
        import spark2.implicits._
        val got = graft.operators.GraphTopology
          .triangles(es.toDF("u", "v"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
        nodes.foreach { v =>
          assert(got(v)._1 == adj(v).size, s"degree of $v")
          assert(got(v)._2 == refTri(v).toLong,
            s"triangles at $v: got ${got(v)._2}, want ${refTri(v)} (edges $es)")
        }
      }
    }
  }

  test("bfs depths equal a queue-based reference on random graphs") {
    val genCase = for {
      n <- Gen.choose(3, 16)
      m <- Gen.choose(1, 30)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
      nSeeds <- Gen.choose(1, 3)
      seeds <- Gen.listOfN(nSeeds, Gen.choose(0, n - 1))
      hops <- Gen.choose(1, 4)
    } yield (es.distinct, seeds.map(_.toLong).distinct, hops)
    forAll(genCase, trials = 8) { case (es, seeds, hops) =>
      if (es.nonEmpty) {
        val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
          .withDefaultValue(Seq.empty)
        // reference: standard frontier BFS to the hop bound
        val ref = collection.mutable.Map(seeds.map(_ -> 0L): _*)
        var frontier = seeds
        for (k <- 1 to hops) {
          frontier = frontier.flatMap(adj).distinct
            .filterNot(ref.contains)
          frontier.foreach(v => ref(v) = k.toLong)
        }
        val spark2 = spark
        import spark2.implicits._
        val got = graft.operators.GraphTopology
          .bfsDepth(es.toDF("u", "v"), seeds.toDF("u"), hops)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val nodes = es.flatMap(e => Seq(e._1, e._2)).toSet ++ seeds
        nodes.foreach { v =>
          assert(got(v) == ref.getOrElse(v, -1L),
            s"depth of $v: got ${got(v)}, want ${ref.getOrElse(v, -1L)}")
        }
      }
    }
  }

  test("concurrency two-phase prefix sum equals a global sweep on random events") {
    val evGen = for {
      nUsers <- Gen.choose(1, 6)
      nEv <- Gen.choose(1, 60)
      es <- Gen.listOfN(nEv, for {
        u <- Gen.choose(1, nUsers)
        // spread across ~5 hours so points land in multiple blocks
        t <- Gen.choose(0L, 5L * 3600000L)
      } yield (u.toLong, t))
    } yield es.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
    forAll(evGen, trials = 6) { es =>
      val gap = 1800000L
      val df = es.toDF("event_id", "user_id", "t")
        .select(col("event_id"), col("user_id"),
          timestamp_micros(col("t") * 1000).as("ts"))
      val got = graft.operators.Sessionize.concurrencyCurve(df, gap)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      // reference: sequential global sweep
      val sessions = es.groupBy(_._2).values.flatMap { rows =>
        rows.map(r => (r._3, r._1)).sorted.map(_._1)
          .foldLeft(List.empty[(Long, Long)]) {
            case (Nil, t) => List((t, t))
            case ((s, e) :: rest, t) =>
              if (t - e > gap) (t, t) :: (s, e) :: rest else (s, t) :: rest
          }
      }.toSeq
      val pts = (sessions.map(s => (s._1, 1L)) ++
        sessions.map(s => (s._2 + 1, -1L)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      var open = 0L
      val expected = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      pts.foreach { case (t, d) =>
        open += d
        val h = t / 3600000L
        val (mo, np) = expected.getOrElse(h, (Long.MinValue, 0L))
        expected(h) = (math.max(mo, open), np + 1)
      }
      assert(got == expected.toMap,
        s"two-phase sweep diverged on ${es.length} events")
    }
  }

  test("blocked decile rank equals a global sort reference on random values") {
    val gen = for {
      n <- Gen.choose(1, 80)
      vs <- Gen.listOfN(n, Gen.choose(0L, 40000000L))
    } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    forAll(gen, trials = 8) { rows =>
      val df = rows.toDF("o_orderkey", "cents")
      val got = graft.operators.OlapOps.decileSummary(df).collect()
        .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))).toMap
      // reference: single-process global sort + floor-division deciles
      val n = rows.length
      val expected = rows.map { case (k, c) => (c, k) }
        .sortBy { case (c, k) => (-c, k) }.zipWithIndex
        .map { case ((c, _), i) => ((i.toLong * 10) / n).toInt + 1 -> c }
        .groupBy(_._1).view.mapValues { cs =>
          val v = cs.map(_._2)
          (v.length.toLong, v.min, v.max, v.sum)
        }.toMap
      assert(got == expected, s"decile mismatch on $n rows")
    }
  }

  test("containment pairs equal a brute-force set reference on random docs") {
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docGen = for {
      nDocs <- Gen.choose(2, 8)
      docs <- Gen.listOfN(nDocs, Gen.choose(3, 15).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAll(docGen, trials = 6) { docs =>
      val cap = 50L
      val got = graft.operators.Dedup.containmentPairs(
          docs.toDF("doc_id", "text"), n = 3, threshold = 0.8,
          maxDocFreq = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4))
        .toMap
      // reference: distinct 3-gram sets, df cap, integer containment
      val sets = docs.map { case (id, t) =>
        val toks = t.trim.toLowerCase.split("\\s+").toSeq
        id -> toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.toMap
      val df = sets.values.flatten.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val kept = sets.view.mapValues(_.filter(s => df(s) <= cap)).toMap
      val expected = (for {
        (a, sa) <- sets.toSeq; (b, _) <- sets.toSeq
        if a != b && sa.nonEmpty
        common = (kept(a) intersect kept(b)).size.toLong
        if common > 0
        e6 = common * 1000000L / sa.size
        if e6 >= 800000L
      } yield (a, b) -> e6).toMap
      assert(got == expected, s"containment diverged: got $got want $expected")
    }
  }

  test("graft_shingles kernel equals a naive sliding-window reference") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val words = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dd", "e", "a"))
    for (n <- Seq(1, 2, 3, 5)) forAll(words) { ws =>
      val arr = new GenericArrayData(
        ws.map(w => UTF8String.fromString(w)).toArray[Any])
      val got = graft.functions.ShingleUtil.shingles(arr, n)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      val expected = ws.sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSeq.distinct
      assert(got == expected, s"n=$n ws=$ws")
    }
  }

  test("portable hash60 matches md5 prefix and stays in [0, 2^60)") {
    val strs = Gen.oneOf(Gen.alphaNumStr, Gen.oneOf("", " ", "héllo", "a b"))
    forAll(Gen.listOfN(10, strs)) { values =>
      val out = values.map(Tuple1(_)).toDF("s")
        .select(TextFunctions.portableHash60($"s").as("h"),
          substring(md5($"s"), 1, 15).as("hex"))
        .collect()
      out.foreach { r =>
        val h = r.getLong(0)
        assert(h >= 0L && h < (1L << 60))
        assert(h == java.lang.Long.parseLong(r.getString(1), 16),
          s"hash/hex mismatch: $h vs ${r.getString(1)}")
      }
    }
  }

  test("as-of join attaches a matched build row's nulls as-is") {
    import graft.operators.AsOfJoin
    // Planted distinguishing case for the struct-packed attach: the
    // matched build row (t=5) carries a NULL value while an OLDER
    // build row (t=1) has a non-null one. Per-column last(ignoreNulls)
    // would fall back to 7.0; correct ASOF semantics attach the null.
    val p = Seq((0L, 1L, 10L)).toDF("pid", "k", "t")
    val b = Seq((1L, 1L, Some(7.0)), (1L, 5L, None)).toDF("k", "t", "v")
    val planted = AsOfJoin.asOfJoin(p, b, "k", "t", attach = Seq("v"))
      .collect().head
    assert(planted.isNullAt(planted.fieldIndex("asof_v")),
      "matched build row's NULL must attach as-is, not fall back")
    // Randomized: compare against a direct per-probe reference.
    val genCase = for {
      nKeys <- Gen.choose(1, 3)
      probes <- Gen.listOfN(12, for {
        k <- Gen.choose(1, nKeys); t <- Gen.choose(0, 20)
      } yield (k.toLong, t.toLong))
      builds <- Gen.listOfN(8, for {
        k <- Gen.choose(1, nKeys); t <- Gen.choose(0, 20)
        v <- Gen.option(Gen.choose(1, 99))
      } yield (k.toLong, t.toLong, v.map(_.toDouble)))
    } yield (probes, builds.distinctBy(x => (x._1, x._2)))
    forAll(genCase, trials = 8) { case (probes, builds) =>
      val probeDf = probes.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("pid", "k", "t")
      val buildDf = builds.toDF("k", "t", "v")
      val out = AsOfJoin.asOfJoin(probeDf, buildDf, "k", "t", Seq("v"))
        .collect().map { r =>
          r.getLong(0) ->
            (if (r.isNullAt(r.fieldIndex("asof_v"))) None
             else Some(r.getDouble(r.fieldIndex("asof_v"))))
        }.toMap
      probes.zipWithIndex.foreach { case ((k, t), i) =>
        val expected = builds.filter(x => x._1 == k && x._2 <= t)
          .sortBy(_._2).lastOption.flatMap(_._3)
        assert(out(i.toLong) == expected,
          s"probe (k=$k,t=$t): got ${out(i.toLong)}, want $expected")
      }
    }
  }

  test("fingerprint invariance: any whitespace/punct layout hashes equal") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    forAll(Gen.listOfN(5, word)) { ws =>
      val clean = ws.mkString(" ")
      val noisy = ws.mkString("  ,, ", " .. ", " !")
      val df = Seq((clean, noisy)).toDF("a", "b")
        .select((TextFunctions.fingerprint($"a") ===
          TextFunctions.fingerprint($"b")).as("eq"))
      assert(df.collect().head.getBoolean(0), s"'$clean' vs '$noisy'")
    }
  }

  test("globalRankAsc matches the reference sort for any values and width") {
    import graft.operators.OlapOps
    val genCase = for {
      n <- Gen.choose(1, 30)
      cents <- Gen.listOfN(n, Gen.choose(-500L, 500L))
      width <- Gen.oneOf(1L, 7L, 100L, 1000000L)
    } yield (cents, width)
    forAll(genCase, trials = 12) { case (cents, width) =>
      val df = cents.zipWithIndex
        .map { case (c, i) => (i.toLong, c) }.toDF("id", "cents")
      val got = OlapOps.globalRankAsc(df, width)
        .select("id", "rn").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = cents.zipWithIndex
        .map { case (c, i) => (c, i.toLong) }
        .sortBy { case (c, i) => (c, i) }
        .zipWithIndex
        .map { case ((_, id), rank) => id -> (rank + 1L) }.toMap
      assert(got == expected, s"width=$width cents=$cents")
    }
  }

  test("snapshotDiff agrees with a per-key reference classification") {
    import graft.operators.ChangeCapture
    val genSnap = Gen.listOf(for {
      k <- Gen.choose(0L, 15L)
      v <- Gen.option(Gen.choose(0L, 3L))
    } yield (k, v)).map(_.distinctBy(_._1))
    forAll(Gen.zip(genSnap, genSnap), trials = 12) { case (oldS, newS) =>
      val vOld = oldS.toDF("k", "cents")
      val vNew = newS.toDF("k", "cents")
      val got = ChangeCapture.snapshotDiff(vOld, vNew, "k", Seq("cents"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val om = oldS.toMap; val nm = newS.toMap
      val expected = (om.keySet ++ nm.keySet).flatMap { k =>
        (om.get(k), nm.get(k)) match {
          case (None, Some(_)) => Some(k -> "added")
          case (Some(_), None) => Some(k -> "removed")
          case (Some(a), Some(b)) if a != b => Some(k -> "changed")
          case _ => None
        }
      }.toMap
      assert(got == expected, s"old=$oldS new=$newS")
    }
  }

  test("iso weekday arithmetic matches java.time for random dates") {
    // the q133/q141 dow rule: (epochDay + 3) % 7 + 1 == ISO dow
    val days = Gen.choose(0L, 40000L) // 1970..2079
    forAll(days, trials = 30) { epochDay =>
      val expected = java.time.LocalDate.ofEpochDay(epochDay)
        .getDayOfWeek.getValue // ISO: Mon=1..Sun=7
      val got = ((epochDay + 3) % 7 + 1).toInt
      assert(got == expected, s"epochDay=$epochDay")
    }
  }

  test("weighted median matches a scan reference on random masses") {
    import graft.operators.Curation
    val genDocs = Gen.nonEmptyListOf(for {
      chars <- Gen.choose(1L, 5000L)
      toks <- Gen.choose(1, 12)
    } yield (chars, toks))
    forAll(genDocs, trials = 8) { docs =>
      val df = docs.zipWithIndex.map { case ((chars, toks), i) =>
        (i.toLong, Seq.fill(toks)("w").mkString(" "), "L", chars)
      }.toDF("doc_id", "text", "lang", "n_chars")
      val dir = java.nio.file.Files
        .createTempDirectory("wmed_prop").toString
      df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = graft.operators.OlapOps
        .weightedMedianQuery(spark, dir).collect().head.getLong(2)
      // reference: smallest v whose cumulative weight doubles >= total
      val sorted = docs.zipWithIndex
        .map { case ((c, t), i) => (c, i.toLong, t.toLong) }
        .sortBy { case (c, i, _) => (c, i) }
      val total = sorted.map(_._3).sum
      var cum = 0L
      val expected = sorted.find { case (_, _, w) =>
        cum += w; 2 * cum >= total }.get._1
      assert(got == expected, s"docs=$docs")
    }
  }

  test("budgetAlloc is exhaustive and proportional for random masses") {
    import graft.operators.OlapOps
    val genCase = for {
      n <- Gen.choose(1, 8)
      masses <- Gen.listOfN(n, Gen.choose(1L, 1000L))
      budget <- Gen.choose(10L, 100000L)
    } yield (masses, budget)
    forAll(genCase, trials = 10) { case (masses, budget) =>
      val mass = masses.zipWithIndex
        .map { case (m, i) => (f"l$i%02d", m) }.toDF("lang", "mass")
      val out = OlapOps.budgetAlloc(mass, budget).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(out.values.sum == budget,
        s"masses=$masses budget=$budget got $out")
      // Hamilton quota property: every allocation is within 1 of its
      // exact proportional share's floor
      val total = masses.sum
      masses.zipWithIndex.foreach { case (m, i) =>
        val floor = m * budget / total
        val a = out(f"l$i%02d")
        assert(a == floor || a == floor + 1,
          s"lang $i alloc $a vs floor $floor")
      }
    }
  }

  test("histogram conserves mass and spans the range on random cents") {
    import graft.operators.OlapOps
    val genCase = for {
      vals <- Gen.nonEmptyListOf(Gen.choose(0L, 900L))
      width <- Gen.oneOf(7L, 10L, 100L)
    } yield (vals, width)
    forAll(genCase, trials = 10) { case (vals, width) =>
      val out = OlapOps.histogram(vals.toDF("cents"), width).collect()
      assert(out.map(_.getLong(3)).sum == vals.length)
      val bins = out.map(_.getLong(0))
      assert(bins.head == vals.min / width && bins.last == vals.max / width)
      assert(bins.zip(bins.tail).forall { case (a, b) => b == a + 1 },
        "spine must be contiguous")
    }
  }

  test("BPE training matches an independent list-based reference on random corpora") {
    import graft.operators.TextAnalysis
    // Independent reference: symbol LISTS and an explicit left-to-right
    // merge scan — no string encoding — so the engine's 2-space
    // separator replace trick is validated against a different
    // formulation of the same algorithm on arbitrary inputs.
    def mergeScan(syms: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    def refBpe(words: Seq[String], rounds: Int)
        : (Seq[(Long, String, String, Long)], Seq[(List[String], Long)]) = {
      var segs = words
        .filter(w => w.matches("^[a-z0-9]+$") && w.length >= 2)
        .groupBy(identity).toSeq
        .map { case (w, ws) => (w.map(_.toString).toList, ws.size.toLong) }
      val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
      var r = 1
      var done = false
      while (r <= rounds && !done) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
          .withDefaultValue(0L)
        for ((syms, f) <- segs; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) += f
        if (counts.isEmpty) done = true
        else {
          val ((a, b), n) = counts.toSeq
            .sortBy { case ((a, b), n) => (-n, a, b) }.head
          merges += ((r.toLong, a, b, n))
          segs = segs.map { case (syms, f) => (mergeScan(syms, a, b), f) }
        }
        r += 1
      }
      (merges.toSeq, segs)
    }
    val genWords = Gen.nonEmptyListOf(
      Gen.oneOf("ab", "abc", "aab", "bba", "abab", "ba", "cab", "aa",
        "x", "abcabc", "baba"))
    forAll(genWords, trials = 6) { words =>
      val docs = Seq(Tuple1(words.mkString(" "))).toDF("text")
      val rounds = 3
      val (refMerges, refSegs) = refBpe(words, rounds)
      val gotMerges = TextAnalysis.bpeMerges(spark, docs, rounds).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      assert(gotMerges.toSeq == refMerges, s"words=$words")
      val gotStats = TextAnalysis.bpeSegmentStats(docs, rounds).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val refStats = refSegs.groupBy(_._1.length).toSeq
        .map { case (ns, g) =>
          (ns.toLong, g.size.toLong, g.map(_._2).sum,
            g.map { case (syms, f) => f * syms.map(_.length).sum }.sum)
        }.sortBy(_._1)
      assert(gotStats.toSeq == refStats, s"words=$words")
    }
  }

  test("rollingActive matches per-day brute force on random activity") {
    import graft.operators.Sessionize
    val genAct = Gen.nonEmptyListOf(for {
      u <- Gen.choose(1L, 6L)
      d <- Gen.choose(1, 25) // day-of-month in 2024-01
    } yield (u, d))
    forAll(genAct, trials = 10) { acts =>
      val ev = acts.map { case (u, d) =>
        (u, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 09:00:00"))
      }.toDF("user_id", "ts")
      val got = Sessionize.rollingActive(ev, windowDays = 7)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = acts.map(_._2).distinct.sorted.map { d =>
        val users = acts.filter { case (_, ad) => ad >= d - 6 && ad <= d }
          .map(_._1).distinct
        f"2024-01-$d%02d" -> users.length.toLong
      }.toMap
      assert(got == expected, s"acts=$acts")
    }
  }

  /** Independent md5-prefix hash — the reference twin of
    * TextFunctions.portableHash60, reimplemented via MessageDigest so
    * the property checks engine arithmetic against a second
    * implementation, not itself. */
  private def refH60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("HLL registers match an independent reference on random key sets") {
    import graft.operators.DistinctSketch
    val genKeys = Gen.listOfN(80, Gen.chooseNum(0L, 5000L)).map(_.distinct)
    forAll(genKeys, trials = 10) { keys =>
      val ref = keys.map { k =>
        val h = refH60(k.toString)
        val w = h >> DistinctSketch.P
        val rho = if (w == 0L) DistinctSketch.RhoCap.toLong
          else java.lang.Long.numberOfTrailingZeros(w) + 1L
        (h & (DistinctSketch.M - 1), rho)
      }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val got = DistinctSketch.registers(
        keys.map(k => ("g", k)).toDF("g", "k"), "g", "k")
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(got == ref, s"keys=${keys.take(10)}...")
      // merge property: registers of any split max-merge to the whole
      val (a, b) = keys.partition(_ % 2 == 0)
      def regs(ks: Seq[Long]) =
        if (ks.isEmpty) Map.empty[Long, Long]
        else DistinctSketch.registers(ks.map(k => ("g", k)).toDF("g", "k"),
          "g", "k").collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      val merged = (regs(a).toSeq ++ regs(b).toSeq)
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(merged == got, "split registers must max-merge to the whole")
    }
  }

  test("AGMS estimates match an independent reference on random counts") {
    import graft.operators.JoinStrategies
    val genCounts = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 999L),
      Gen.chooseNum(1L, 40L))).map(_.distinctBy(_._1))
    forAll(genCounts, trials = 10) { cs =>
      val ref = (0 until JoinStrategies.AgmsRows).map { r =>
        val cells = new scala.collection.mutable.HashMap[Long, Long]()
          .withDefaultValue(0L)
        for ((k, cnt) <- cs) {
          val b = refH60(s"b:$r:k$k") % JoinStrategies.AgmsWidth
          val sign = (refH60(s"s:$r:k$k") & 1L) * 2L - 1L
          cells(b) += cnt * sign
        }
        r -> cells.values.map(c => c * c).sum
      }.toMap
      val got = JoinStrategies.agmsEstimates(JoinStrategies.agmsCells(
        cs.map { case (k, cnt) => (s"k$k", cnt) }.toDF("k", "cnt")))
        .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
      assert(got == ref.map { case (r, v) => r.toLong -> v },
        s"counts=${cs.take(5)}...")
    }
  }

  test("kcore equals a reference peeler on random graphs") {
    // reference: repeatedly drop nodes with degree < k to fixpoint
    def refKcore(es: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
      var edges = es.map(e =>
        (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      var changed = true
      while (changed) {
        val deg = edges.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        val alive = deg.filter(_._2 >= k).keySet
        val next = edges.filter(e => alive(e._1) && alive(e._2))
        changed = next.size != edges.size
        edges = next
      }
      edges.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
    }
    val edgeGen = for {
      n <- Gen.choose(3, 20)
      m <- Gen.choose(2, 40)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
    } yield es.distinct
    forAll(edgeGen, trials = 8) { es =>
      if (es.nonEmpty) {
        val spark2 = spark
        import spark2.implicits._
        for (k <- Seq(2, 3)) {
          val got = graft.operators.GraphTopology
            .kcore(es.toDF("u", "v"), k, rounds = 30)
            .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
          assert(got == refKcore(es, k),
            s"k=$k edges=${es.take(8)}...")
        }
      }
    }
  }

  test("largest-remainder apportionment: quotas sum to the budget and " +
    "each is floor/ceil of its exact share, for random weights") {
    val gen = for {
      n <- Gen.choose(2, 9)
      ws <- Gen.listOfN(n, Gen.choose(1L, 500L))
      budget <- Gen.choose(1L, 300L)
    } yield (ws, budget)
    forAll(gen, trials = 10) { case (ws, budget) =>
      val spark2 = spark
      import spark2.implicits._
      val weights = ws.zipWithIndex
        .map { case (w, i) => (f"s$i%02d", w) }.toDF("source", "w")
      val q = graft.operators.Sampling.apportion(weights, budget)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(q.values.sum == budget, s"ws=$ws budget=$budget got=$q")
      val tw = ws.sum
      ws.zipWithIndex.foreach { case (w, i) =>
        val exactFloor = budget * w / tw
        val quota = q(f"s$i%02d")
        assert(quota == exactFloor || quota == exactFloor + 1,
          s"quota $quota outside [floor, ceil] of ${budget.toDouble * w / tw}")
      }
    }
  }

  test("context windows agree with a sequential per-source fold for " +
    "random doc lengths") {
    val gen = for {
      n <- Gen.choose(1, 25)
      lens <- Gen.listOfN(n, Gen.choose(1, 300))
      srcs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield lens.zip(srcs)
    forAll(gen, trials = 8) { docsSpec =>
      val spark2 = spark
      import spark2.implicits._
      val rows = docsSpec.zipWithIndex.map { case ((len, src), i) =>
        (i.toLong, Seq.fill(len)("t").mkString(" "), src)
      }
      val got = graft.operators.Packing
        .contextWindows(rows.toDF("doc_id", "text", "source"))
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6)))
        .toMap
      val c = graft.operators.Packing.ContextLen
      val cums = collection.mutable.Map.empty[String, Long]
      rows.foreach { case (id, text, src) =>
        val n = text.split(" ").length.toLong
        val cum = cums.getOrElse(src, 0L)
        val first = cum / c
        val last = (cum + n - 1) / c
        assert(got(id) == ((first, cum % c, last - first + 1,
          if (first != last) 1 else 0)),
          s"doc $id (src=$src, n=$n, cum=$cum): got ${got(id)}")
        cums(src) = cum + n
      }
    }
  }
}
