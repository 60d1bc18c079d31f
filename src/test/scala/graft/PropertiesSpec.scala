package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Airline, Dedup, SkewJoin, TextAnalysis}

/** Property-based checks (SURVEY.md §5): algebraic invariants of the
  * ranking/aggregation operators on generated inputs. Uses seeded
  * ScalaCheck generators directly (deterministic; the
  * scalatest-scalacheck bridge artifact is not in the offline cache).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val airports = Gen.oneOf("AAA", "BBB", "CCC", "DDD", "EEE")
  private val carriers = Gen.oneOf("XX", "YY", "ZZ")
  private val flightGen = for {
    o <- airports; d <- airports; c <- carriers
    delay <- Gen.choose(-20.0, 120.0)
  } yield (o, d, c, delay)

  private def cases(n: Int): Seq[List[(String, String, String, Double)]] =
    (1 to n).flatMap { i =>
      Gen.listOfN(20 + i * 17, flightGen)
        .apply(Gen.Parameters.default, Seed(42L + i))
    }

  test("explode-count == origin-count + dest-count per airport") {
    for (rows <- cases(5)) {
      val df = rows.toDF("Origin", "Dest", "UniqueCarrier", "ArrDelay")
      val got = Airline.airportTraffic(df).as[(String, Long)].collect().toMap
      val expect = (rows.map(_._1) ++ rows.map(_._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got === expect)
    }
  }

  test("global top-k == sort-take-k of the full aggregate") {
    for (rows <- cases(5)) {
      val df = rows.toDF("Origin", "Dest", "UniqueCarrier", "ArrDelay")
      val topk = Airline.top10Airports(df).as[(String, Long)].collect().toSeq
      val full = Airline.airportTraffic(df).as[(String, Long)].collect().toSeq
        .sortBy { case (a, c) => (-c, a) }.take(10)
      assert(topk === full)
    }
  }

  test("avg is invariant under row permutation") {
    for (rows <- cases(3)) {
      val a = rows.toDF("Origin", "Dest", "UniqueCarrier", "ArrDelay")
      val b = new scala.util.Random(7).shuffle(rows)
        .toDF("Origin", "Dest", "UniqueCarrier", "ArrDelay")
      def avgs(df: org.apache.spark.sql.DataFrame) =
        Airline.top10AirlinesOnTime(df).as[(String, Double)].collect().toMap
      val (ma, mb) = (avgs(a), avgs(b))
      assert(ma.keySet === mb.keySet)
      // tolerance: double summation order may legitimately differ
      ma.foreach { case (k, v) => assert(math.abs(v - mb(k)) < 1e-9) }
    }
  }

  test("per-group top-k rows are ranked 1..n ascending by value") {
    for (rows <- cases(3)) {
      val df = rows.toDF("Origin", "Dest", "UniqueCarrier", "DepDelay")
      val ranked = Airline.top10CarriersPerAirport(df, k = 3)
        .select("Origin", "avg_dep_delay", "rank")
        .as[(String, Double, Int)].collect()
      ranked.groupBy(_._1).foreach { case (_, rs) =>
        val sorted = rs.sortBy(_._3)
        assert(sorted.map(_._3).toSeq === (1 to rs.length))
        assert(sorted.map(_._2).toSeq === sorted.map(_._2).sorted.toSeq)
      }
    }
  }

  test("jaccard pairs: symmetric ids, bounded score, exact dup == 1.0") {
    val textGen = Gen.listOfN(25,
      Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta"))
      .map(_.mkString(" "))
    for {
      i <- 1 to 3
      texts <- Gen.listOfN(8, textGen).apply(Gen.Parameters.default, Seed(90L + i))
    } {
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) } ++
        Seq((1000L, texts.head)) // planted exact dup of doc 0
      val df = docs.toDF("doc_id", "text")
      val pairs = Dedup.minhashDupPairs(df, threshold = 0.0)
        .as[(Long, Long, Double)].collect()
      pairs.foreach { case (a, b, j) =>
        assert(a < b); assert(j >= 0.0 && j <= 1.0)
      }
      assert(pairs.find(p => p._1 == 0L && p._2 == 1000L).exists(_._3 === 1.0))
    }
  }

  test("novelty conservation: sum of n_novel == distinct shingle types") {
    // every distinct shingle's first occurrence belongs to EXACTLY one
    // doc, so Σ n_novel over the corpus must equal the corpus-wide
    // distinct-shingle count — a global invariant no per-doc fixture
    // can check. Also: the min-doc_id doc is all-novel by definition.
    val textGen = Gen.listOfN(20,
      Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta"))
      .map(_.mkString(" "))
    for {
      i <- 1 to 3
      texts <- Gen.listOfN(10, textGen).apply(Gen.Parameters.default, Seed(400L + i))
    } {
      val df = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val nov = Dedup.novelty(df)
        .as[(Long, Long, Long, Double)].collect()
      val distinctShingles = Dedup.shingles(df).select("shingle")
        .distinct().count()
      assert(nov.map(_._3).sum === distinctShingles)
      val first = nov.minBy(_._1)
      assert(first._3 === first._2 && first._4 === 1.0)
      nov.foreach { case (_, n, nv, f) =>
        assert(nv >= 0 && nv <= n); assert(f >= 0.0 && f <= 1.0)
      }
    }
  }

  test("sourceVocabOverlap invariants on generated corpora") {
    val textGen = Gen.listOfN(12,
      Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
        "eta", "theta")).map(_.mkString(" "))
    for {
      i <- 1 to 3
      texts <- Gen.listOfN(9, textGen).apply(Gen.Parameters.default, Seed(500L + i))
    } {
      val docs = texts.zipWithIndex.map { case (t, j) =>
        (j.toLong, t, s"src${j % 3}") }.toDF("doc_id", "text", "source")
      val rows = Dedup.sourceVocabOverlap(docs)
        .as[(String, String, Long, Long, Long, Double)].collect()
      rows.foreach { case (s1, s2, v1, v2, common, j) =>
        assert(s1 < s2)                       // unordered pair, once
        assert(common >= 1 && common <= math.min(v1, v2))
        assert(j === common.toDouble / (v1 + v2 - common)) // formula
        assert(j > 0.0 && j <= 1.0)
      }
    }
  }

  test("keySkewProfile invariants: shares bounded, counts ranked, sum <= total") {
    val keyGen = Gen.frequency((5, Gen.const(1L)), (3, Gen.choose(2L, 5L)))
    for {
      i <- 1 to 3
      keys <- Gen.listOfN(60, keyGen).apply(Gen.Parameters.default, Seed(600L + i))
    } {
      val df = keys.toDF("k")
      val rows = SkewJoin.keySkewProfile(df, "k", topK = 3)
        .as[(Long, String, Long, Long)].collect().sortBy(_._1)
      // ranks are 1..n, counts nonincreasing, micro shares consistent
      assert(rows.map(_._1).toList === (1L to rows.length).toList)
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3); case _ => ()
      }
      val total = keys.length
      rows.foreach { case (_, _, n, micro) =>
        assert(micro === n * 1000000L / total)
      }
      assert(rows.map(_._3).sum <= total)
    }
  }

  test("batched BPE == sequential greedy on random corpora") {
    // the batch-acceptance proof (disjoint prefix + new-pair bound +
    // product-alias close) is subtle; this drives it over seeded
    // random corpora engineered to stress the conditions — tiny
    // alphabets force shared symbols, repeats force self-pairs and
    // product aliases (merging (a,b) after "ab"-producing histories)
    import graft.operators.Bpe
    val word = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val doc = Gen.choose(3, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    for (i <- 1 to 6) {
      val texts = Gen.listOfN(8, doc)
        .apply(Gen.Parameters.default, Seed(1000L + i)).get
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val seqn = Bpe.bpeTrain(docs, merges = 10, batchM = 1)
        .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
      val bat = Bpe.bpeTrain(docs, merges = 10, batchM = 8)
        .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
      assert(bat === seqn,
        s"case $i diverged on corpus ${texts.take(3)}...: seq=$seqn bat=$bat")
    }
  }

  test("nbClassifierScores == in-memory reference on random corpora") {
    // integer micro-nat NB over seeded random corpora: empty docs,
    // single-class tokens, OOV-only docs, unlabeled sources — the
    // edge shapes the fixed fixture can't cover
    val word = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val docGen = Gen.choose(0, 9).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val srcGen = Gen.oneOf("posA", "posB", "negA", "other")
    for (i <- 1 to 5) {
      val rows = Gen.listOfN(20, Gen.zip(docGen, srcGen))
        .apply(Gen.Parameters.default, Seed(500L + i)).get
      // plant one non-empty doc per class (both priors must be > 0)
      val all = Seq(("aa bb", "posA"), ("cc dd", "negA")) ++ rows
      val docs = all.zipWithIndex.map { case ((t, s), j) =>
        (j.toLong, t, "en", s) }
      val got = TextAnalysis.nbClassifierScores(
          docs.toDF("doc_id", "text", "lang", "source"),
          Seq("posA", "posB"), Seq("negA"))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got === nbReference(docs, Set("posA", "posB"), Set("negA")),
        s"case $i diverged on ${all.take(5)}...")
    }
  }

  /** In-memory reference NB: same micro-nat floors, integer sums. */
  private def nbReference(docs: Seq[(Long, String, String, String)],
      pos: Set[String], neg: Set[String]): Map[Long, (Long, Long, Long)] = {
    def toks(s: String): Seq[String] =
      s.toLowerCase.replaceAll("\\s+", " ").trim
        .split(" ").filter(_.nonEmpty).toSeq
    def lnp(num: Long, den: Long): Long =
      math.floor(1e6 * math.log(num.toDouble / den.toDouble)).toLong
    val labeled = docs.filter(d => pos(d._4) || neg(d._4))
    val labTok = labeled.flatMap(d => toks(d._2).map(w => (w, pos(d._4))))
    val tf = labTok.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2).toLong, g.count(!_._2).toLong) }.toMap
    val t1 = tf.values.map(_._1).sum
    val t0 = tf.values.map(_._2).sum
    val v = tf.size.toLong
    val n1 = labeled.count(d => pos(d._4)).toLong
    val n0 = labeled.count(d => neg(d._4)).toLong
    val priorDiff = lnp(n1, n1 + n0) - lnp(n0, n1 + n0)
    val (oov1, oov0) = (lnp(1, t1 + v + 1), lnp(1, t0 + v + 1))
    docs.flatMap { case (id, text, _, _) =>
      val ts = toks(text)
      if (ts.isEmpty) None
      else {
        val llr = priorDiff + ts.map { w =>
          tf.get(w).map { case (a, b) =>
            lnp(a + 1, t1 + v + 1) - lnp(b + 1, t0 + v + 1)
          }.getOrElse(oov1 - oov0)
        }.sum
        Some(id -> ((ts.size.toLong, llr, if (llr > 0) 1L else 0L)))
      }
    }.toMap
  }

  test("componentsOf == union-find on random edge lists") {
    val edgeGen = for {
      a <- Gen.choose(0L, 30L); b <- Gen.choose(0L, 30L) if a != b
    } yield if (a < b) (a, b) else (b, a)
    for {
      i <- 1 to 4
      edges <- Gen.listOfN(12 + i * 5, edgeGen)
        .apply(Gen.Parameters.default, Seed(7L + i))
    } {
      val got = Dedup.componentsOf(edges.distinct.toDF("id1", "id2"))
        .as[(Long, Long, Long)].collect()
      // reference: in-memory union-find with min-relabeling
      val parent = collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(n => n -> find(n)).toMap
      val sizes = want.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      assert(got.length === want.size)
      got.foreach { case (node, comp, sz) =>
        assert(comp === want(node), s"node $node")
        assert(sz === sizes(comp), s"size of comp $comp")
      }
      // differential: the independent hash-to-min formulation must
      // produce the identical labeling
      val htm = Dedup.componentsHashToMin(edges.distinct.toDF("id1", "id2"))
        .as[(Long, Long, Long)].collect()
      assert(htm.sorted.toSeq === got.sorted.toSeq)
    }
  }

  test("componentsOf collapses a planted 1000-node chain in O(log n) rounds") {
    // diameter-999 path: the adversarial case for plain min-label
    // propagation (would need 999 rounds); large-star/small-star must
    // converge within the default maxRounds budget
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got = Dedup.componentsOf(chain)
      .as[(Long, Long, Long)].collect()
    assert(got.length === 1000)
    got.foreach { case (node, comp, sz) =>
      assert(comp === 0L, s"node $node")
      assert(sz === 1000L)
    }
  }

  test("components algorithms THROW on non-convergence instead of returning partial labels") {
    val chain = (0L until 50L).map(i => (i, i + 1)).toDF("id1", "id2")
    // diameter 50 with a 3-round budget: hash-to-min cannot converge
    intercept[IllegalStateException] {
      Dedup.componentsHashToMin(chain, maxRounds = 3)
    }
    intercept[IllegalStateException] {
      Dedup.componentsOf(chain, maxRounds = 1)
    }
  }

  test("clickAttribution == in-memory as-of reference on random event logs") {
    import java.sql.Timestamp
    val evGen = for {
      user <- Gen.choose(1L, 6L)
      tsSec <- Gen.choose(0L, 3600L)
      isClick <- Gen.oneOf(true, false)
    } yield (user, tsSec, isClick)
    for {
      i <- 1 to 3
      evs <- Gen.listOfN(60, evGen).apply(Gen.Parameters.default, Seed(31L + i))
    } {
      val rows = evs.zipWithIndex.map { case ((u, sec, click), id) =>
        (id.toLong, new Timestamp(1704067200000L + sec * 1000L), u,
          if (click) "click" else "purchase")
      }
      val df = rows.toDF("event_id", "ts", "user_id", "event_type")
      val got = graft.operators.Events.clickAttribution(df)
        .select("event_id", "click_id").as[(Long, Long)].collect().toMap
      // reference: for each purchase, the click with max (ts, id)
      // strictly before it, same user
      val want = (for {
        (pid, pts, pu, pk) <- rows if pk == "purchase"
        prior = rows.filter { case (_, cts, cu, ck) =>
          ck == "click" && cu == pu && cts.getTime < pts.getTime }
        if prior.nonEmpty
      } yield {
        val best = prior.maxBy(c => (c._2.getTime, c._1))
        pid -> best._1
      }).toMap
      assert(got === want)
    }
  }

  test("chunks reassemble to the normalized text (overlap stripped)") {
    val textGen = Gen.choose(0, 900).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    for {
      i <- 1 to 3
      texts <- Gen.listOfN(6, textGen).apply(Gen.Parameters.default, Seed(55L + i))
    } {
      val df = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val size = 256; val stride = 192
      val got = TextAnalysis.chunks(df, size, stride)
        .select("doc_id", "chunk_idx", "off", "chunk_len")
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      texts.zipWithIndex.foreach { case (t, j) =>
        val cs = got(j.toLong)
        // offsets advance by exactly stride from 1; every char of the
        // normalized text is covered; lengths reconstruct the total
        cs.zipWithIndex.foreach { case ((_, idx, off, _), k) =>
          assert(idx === k.toLong); assert(off === 1L + k * stride)
        }
        val norm = t.toLowerCase.replaceAll("\\s+", " ").trim
        val covered = cs.map { case (_, _, off, len) => off - 1 + len }.max
        assert(covered === norm.length || (norm.isEmpty && cs.length === 1))
        assert(cs.forall(_._4 <= size))
      }
    }
  }

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "the",
    "a", "zz", "longishword", "epsilon", "mu")
  private def randomTexts(n: Int, seed: Long): Seq[String] =
    (1 to n).flatMap { i =>
      Gen.listOfN(3 + i % 40, wordGen).apply(Gen.Parameters.default,
        Seed(seed + i)).map(_.mkString(" "))
    }

  test("char entropy: bounded by log2(alphabet) and permutation-invariant") {
    val texts = randomTexts(30, 901L)
    val shuffled = texts.map(t => new scala.util.Random(7)
      .shuffle(t.toList).mkString)
    val df = texts.zip(shuffled).zipWithIndex
      .map { case ((t, s), i) => (i.toLong, t, s) }
      .toDF("doc_id", "text", "shuf")
    import graft.plans.CharEntropyExpression.charEntropyMilli
    val got = df.select($"doc_id", charEntropyMilli($"text").as("e"),
        charEntropyMilli($"shuf").as("es"), $"text")
      .as[(Long, Long, Long, String)].collect()
    got.foreach { case (id, e, es, t) =>
      // entropy is a bag-of-chars statistic: reordering cannot move it
      assert(e === es, s"doc $id")
      val distinct = t.toSet.size.toDouble
      assert(e >= 0L, s"doc $id")
      // per-term rounding can add at most 0.5 milli per distinct char
      val bound = math.ceil(1e3 * math.log(math.max(distinct, 1.0)) /
        math.log(2.0)).toLong + t.toSet.size
      assert(e <= bound, s"doc $id: $e > $bound for $t")
    }
  }

  test("gopher rule stats are invariant under token permutation") {
    val texts = randomTexts(25, 1711L)
    val perm = texts.map(t => new scala.util.Random(13)
      .shuffle(t.split(" ").toList).mkString(" "))
    def stats(ts: Seq[String]) = {
      TextAnalysis.gopherRules(
        ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"))
        .select($"doc_id", $"n_words", $"mean_word_len_micro",
          $"uniq_frac_micro", $"stop_count")
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    }
    assert(stats(texts) === stats(perm))
  }

  test("pmi pairs: every emitted pair is a real bigram above minCount") {
    val texts = randomTexts(40, 3301L)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.pmiPairs(docs, minCount = 3, topK = 100)
      .as[(String, String, Long, Long)].collect()
    // independent bigram census in plain Scala
    val census = texts.flatMap { t =>
      val toks = t.split(" ").filter(_.nonEmpty)
      toks.zip(toks.drop(1))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    got.foreach { case (w1, w2, c, _) =>
      assert(census((w1, w2)) === c, s"($w1,$w2)")
      assert(c >= 3L)
    }
    // and nothing above the cut was silently dropped (topK not binding)
    val expected = census.filter(_._2 >= 3L)
    if (expected.size <= 100) assert(got.length === expected.size)
  }

  test("rolling-hash window keys: adversarial token streams produce no false spans") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{count, countDistinct, lit}
    import graft.operators.SubstringDedup
    // the rolling default is oracle-gated on real + planted corpora;
    // this hunts the soft spot those can't reach — collision-driven
    // false spans on degenerate inputs: long runs of one token,
    // maximal-period repeats of short patterns, and near-identical
    // low-alphabet noise, all of which maximize window-text overlap
    // (and polynomial-hash stress) without making texts identical
    val token = Gen.oneOf("a", "b", "ab", "ba", "aab")
    val runDoc = for {
      t <- token; n <- Gen.choose(8, 150)
    } yield Seq.fill(n)(t).mkString(" ")
    val periodicDoc = for {
      p <- Gen.choose(1, 6); reps <- Gen.choose(2, 40)
      pat <- Gen.listOfN(p, token)
    } yield Seq.fill(reps)(pat).flatten.mkString(" ")
    val noiseDoc = for {
      n <- Gen.choose(8, 100); ts <- Gen.listOfN(n, token)
    } yield ts.mkString(" ")
    val docGen = Gen.frequency(1 -> runDoc, 2 -> periodicDoc, 1 -> noiseDoc)
    val texts = (1 to 80).flatMap(i =>
      docGen(Gen.Parameters.default, Seed(191L + i)))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val k = 8
    val md5W = SubstringDedup.windowOccurrences(docs, k)
      .withColumnRenamed("fp", "md5fp")
    val rolW = SubstringDedup.windowOccurrencesRolling(docs, k)
      .withColumnRenamed("fp", "rfp")
    // fingerprint equivalence classes must be IDENTICAL: per window
    // position, rolling neither merges two distinct window texts
    // (a false span) nor splits one text into two keys (a missed span)
    val joined = md5W.join(rolW, Seq("doc_id", "pos"))
    assert(joined.count() === md5W.count(), "window universes diverge")
    val merged = joined.groupBy("rfp")
      .agg(countDistinct($"md5fp").as("n")).filter($"n" > 1).count()
    assert(merged === 0L,
      "rolling-hash collision: distinct window texts share a rolling key")
    val split = joined.groupBy("md5fp")
      .agg(countDistinct($"rfp").as("n")).filter($"n" > 1).count()
    assert(split === 0L,
      "rolling hash split one window text across keys")
    // and therefore the flagged duplicated-window sets agree exactly
    def dupSet(w: org.apache.spark.sql.DataFrame, fp: String): Set[(Long, Long)] =
      w.withColumn("n", count(lit(1)).over(Window.partitionBy(fp)))
        .filter($"n" >= 2).select($"doc_id", $"pos")
        .as[(Long, Long)].collect().toSet
    val rolDups = dupSet(rolW, "rfp")
    assert(rolDups === dupSet(md5W, "md5fp"))
    assert(rolDups.nonEmpty, "fixture produced no duplicated windows — not adversarial")
  }
}
