package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.{length, lit}

import graft.operators.{Curation, Dedup, Events, TextAnalysis}

/** Semantic tests for the round-5 pipeline operators: dup-cluster
  * connected components, length quantiles, as-of join, range join,
  * chunking, TF-IDF, PII redaction. (The DuckDB oracle gates engine
  * parity; these pin the intended behavior on planted fixtures.)
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------------
  // connected components
  // -------------------------------------------------------------

  test("componentsOf collapses a transitive chain needing several rounds") {
    // path 1-2-3-4-5 (diameter 4: exercises the propagation loop) plus
    // a separate pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id1", "id2")
    val got = Dedup.componentsOf(pairs)
      .as[(Long, Long, Long)].collect()
      .map { case (id, comp, sz) => id -> ((comp, sz)) }.toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L, 10L, 11L))
    Seq(1L, 2L, 3L, 4L, 5L).foreach(id => assert(got(id) === ((1L, 5L))))
    Seq(10L, 11L).foreach(id => assert(got(id) === ((10L, 2L))))
  }

  test("componentsOf reliable-checkpoint branch: same labels, superseded rounds deleted") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    def rddDirs(): Set[String] =
      spark.sparkContext.getCheckpointDir.toSet.flatMap { (d: String) =>
        val f = new java.io.File(new java.net.URI(d).getPath)
        Option(f.list()).map(_.toSet).getOrElse(Set.empty[String])
      }
    val before = rddDirs()
    // diameter-4 chain: several rounds, so superseded checkpoints exist
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id1", "id2")
    val got = Dedup.componentsOf(pairs, checkpointDir = Some(dir))
      .as[(Long, Long, Long)].collect()
      .map { case (id, comp, sz) => id -> ((comp, sz)) }.toMap
    Seq(1L, 2L, 3L, 4L, 5L).foreach(id => assert(got(id) === ((1L, 5L))))
    Seq(10L, 11L).foreach(id => assert(got(id) === ((10L, 2L))))
    // hygiene: only the plan-backing checkpoints (final edges + nodes)
    // survive the call — every superseded round's rdd-* dir is gone
    val remained = rddDirs() -- before
    assert(remained.size <= 2,
      s"superseded checkpoints not cleaned: $remained")
  }

  test("componentsFold: merge across old components, carry untouched, admit new") {
    // old store: comps {1,2} and {5,6}; {3,4} untouched
    val oldPairs = Seq((1L, 2L), (5L, 6L), (3L, 4L)).toDF("id1", "id2")
    val labels = Dedup.componentsOf(oldPairs).localCheckpoint(true)
    // delivery: a bridge 2-5 (merges two old comps) and a brand-new
    // pair 8-9 (no old labels at all)
    val np = Seq((2L, 5L), (8L, 9L)).toDF("id1", "id2")
    val got = Dedup.componentsFold(labels, np)
      .as[(Long, Long, Long)].collect()
      .map { case (id, comp, sz) => id -> ((comp, sz)) }.toMap
    val scratch = Dedup.componentsOf(oldPairs.union(np))
      .as[(Long, Long, Long)].collect()
      .map { case (id, comp, sz) => id -> ((comp, sz)) }.toMap
    assert(got === scratch, "fold must equal components from scratch")
    Seq(1L, 2L, 5L, 6L).foreach(id => assert(got(id) === ((1L, 4L)),
      s"merged family wrong at $id"))
    Seq(3L, 4L).foreach(id => assert(got(id) === ((3L, 2L)),
      "untouched component must carry over verbatim"))
    Seq(8L, 9L).foreach(id => assert(got(id) === ((8L, 2L))))
    // empty delivery is the identity
    val idem = Dedup.componentsFold(labels,
        Seq.empty[(Long, Long)].toDF("id1", "id2"))
      .as[(Long, Long, Long)].collect().toSet
    assert(idem === labels.as[(Long, Long, Long)].collect().toSet)
  }

  test("componentsRetract: split, full-dissolve, and re-admitted bridge") {
    // prior store: chain 1-2-3-4 (one comp), pair {7,8}, pair {10,11}
    val prior = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L), (10L, 11L))
      .toDF("id1", "id2")
    val labels = Dedup.componentsOf(prior).localCheckpoint(true)
    // remove 2 (splits the chain: 1 dissolves, {3,4} survives) and 7
    // (dissolves {7,8} entirely); the maintained store also RE-ADMITS
    // 8-10 — a pair between a touched comp's survivor and an
    // UNTOUCHED comp, the case star edges alone cannot see
    val surviving = Seq((3L, 4L), (10L, 11L), (8L, 10L)).toDF("id1", "id2")
    val removed = Seq(2L, 7L).toDF("doc_id")
    val got = Dedup.componentsRetract(labels, prior, surviving, removed)
      .as[(Long, Long, Long)].collect()
      .map { case (id, comp, sz) => id -> ((comp, sz)) }.toMap
    val scratch = Dedup.componentsOf(surviving)
      .as[(Long, Long, Long)].collect()
      .map { case (id, comp, sz) => id -> ((comp, sz)) }.toMap
    assert(got === scratch, "retract must equal components over survivors")
    assert(!got.contains(1L), "a survivor losing its last pair drops out")
    assert(!got.contains(2L) && !got.contains(7L), "removed ids gone")
    Seq(3L, 4L).foreach(id => assert(got(id) === ((3L, 2L))))
    Seq(8L, 10L, 11L).foreach(id => assert(got(id) === ((8L, 3L)),
      s"re-admitted bridge family wrong at $id"))
    // removing a doc that never had a label row is a legal no-op
    val noop = Dedup.componentsRetract(labels, prior, prior,
        Seq(99L).toDF("doc_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(noop === labels.as[(Long, Long, Long)].collect().toSet)
  }

  test("componentsRetract survives a drifted label store (id2-only pair kept)") {
    // labels deliberately OUT OF SYNC with the pair store: built from
    // only (1,2) while the store also holds (3,2) — under the drifted
    // labels, prior pair (3,2)'s only affected endpoint is id2. An
    // id1-only semi-join would silently drop it from the recompute and
    // dissolve {2,3}; the either-endpoint slice must keep it.
    val prior = Seq((1L, 2L), (3L, 2L)).toDF("id1", "id2")
    val labels = Dedup.componentsOf(Seq((1L, 2L)).toDF("id1", "id2"))
      .localCheckpoint(true)
    val surviving = Seq((3L, 2L)).toDF("id1", "id2")
    val removed = Seq(1L).toDF("doc_id")
    val got = Dedup.componentsRetract(labels, prior, surviving, removed)
      .as[(Long, Long, Long)].collect()
      .map { case (id, comp, sz) => id -> ((comp, sz)) }.toMap
    assert(got === Map(2L -> ((2L, 2L)), 3L -> ((2L, 2L))),
      "the id2-only-affected prior pair must reach the recompute")
  }

  test("clusterKeepsByScore: highest score wins, ties to smallest id, unscored drop") {
    val labels = Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), // family {1,2,3}
      (10L, 10L, 2L), (11L, 10L, 2L) // tied family {10,11}
    ).toDF("doc_id", "component", "cluster_size")
    // doc 3 has no score row (the scorer's domain rule) — it must
    // drop; doc 2 outscores doc 1 despite the larger id
    val scores = Seq((1L, 5L), (2L, 9L), (10L, 7L), (11L, 7L))
      .toDF("doc_id", "score")
    val got = Dedup.clusterKeepsByScore(labels, scores)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set(1L, 2L, 10L, 11L), "unscored member must drop")
    assert(!got(1L)._5 && got(2L)._5, "higher score must win the family")
    assert(got(10L)._5 && !got(11L)._5, "score tie breaks to the smaller id")
    assert(got(2L)._4 === 9L, "the winner carries its score")
  }

  test("dupClusters groups the planted exact+near dups into one cluster") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and runs far away home"),
      (2L, "The quick brown fox jumps over the lazy dog and runs far away home"),
      (3L, "The quick brown fox jumps over the lazy dog and runs far away house"),
      (4L, "Completely different content about distributed query engines in the cloud")
    ).toDF("doc_id", "text")
    val got = Dedup.dupClusters(docs, threshold = 0.7)
      .as[(Long, Long, Long)].collect()
      .map { case (id, comp, sz) => id -> ((comp, sz)) }.toMap
    // 1~2 (exact) and 1~3 or 2~3 (near) must land in ONE component
    // labeled by the smallest member; doc 4 never appears
    assert(got.keySet === Set(1L, 2L, 3L))
    got.values.foreach(v => assert(v === ((1L, 3L))))
  }

  test("clusterKeeps keeps the longest member, ties to the smallest id") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and runs far away home"),
      (2L, "The quick brown fox jumps over the lazy dog and runs far away house and then some"),
      (3L, "The quick brown fox jumps over the lazy dog and runs far away home"),
      (4L, "Completely different content about distributed query engines in the cloud")
    ).toDF("doc_id", "text")
      .withColumn("n_chars", length($"text").cast("long"))
    val got = Dedup.clusterKeeps(docs, threshold = 0.7)
      .as[(Long, Long, Long, Boolean)].collect()
      .map { case (id, comp, sz, keep) => id -> ((comp, sz, keep)) }.toMap
    // one cluster {1,2,3}; doc 2 is strictly longest -> the keeper
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(2L) === ((1L, 3L, true)))
    assert(got(1L) === ((1L, 3L, false)))
    assert(got(3L) === ((1L, 3L, false)))

    // equal lengths -> smallest doc_id wins
    val tied = Dedup.clusterKeeps(
      docs.withColumn("n_chars", lit(10L)), threshold = 0.7)
      .as[(Long, Long, Long, Boolean)].collect()
      .map { case (id, _, _, keep) => id -> keep }.toMap
    assert(tied === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("sourceOverlap counts dup pairs per unordered source pair") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and runs far away home", "A"),
      (2L, "The quick brown fox jumps over the lazy dog and runs far away home", "B"),
      (3L, "The quick brown fox jumps over the lazy dog and runs far away house", "A"),
      (4L, "Completely different content about distributed query engines in the cloud", "C")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlap(docs, threshold = 0.7)
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    // pairs (1,2):A-B, (1,3):A-A, (2,3):B-A -> (A,A)=1, (A,B)=2; no C
    assert(got === Map(("A", "A") -> 1L, ("A", "B") -> 2L))
  }

  test("boilerplate: duplicated text scores 1.0, unique text 0.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact copy
      (3L, "qxv jwz pfm rbk ytd hcn lsg wqe mvo uai zpx dkr")           // unique
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplate(docs, n = 8)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, ns, sh, f) => id -> ((ns, sh, f)) }.toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    // every shingle of the copied docs is shared; the unique doc
    // shares none
    assert(got(1L)._3 === 1.0 && got(2L)._3 === 1.0)
    assert(got(3L)._3 === 0.0 && got(3L)._2 === 0L)
    assert(got(1L) === got(2L))
    assert(got(1L)._1 > 0 && got(1L)._1 === got(1L)._2)
  }

  // -------------------------------------------------------------
  // length quantiles
  // -------------------------------------------------------------

  test("lengthQuantiles picks exact order statistics per source") {
    val docs = Seq(
      (1L, "s", "a"), (2L, "s", "a b"), (3L, "s", "a b c"), (4L, "s", "a b c d")
    ).toDF("doc_id", "source", "text")
    val got = Curation.lengthQuantiles(docs, Seq(25, 50, 75, 90))
      .select("pct", "value").as[(Long, Long)].collect().toMap
    // ranks over n=4: ceil(.25*4)=1, ceil(.5*4)=2, ceil(.75*4)=3, ceil(.9*4)=4
    assert(got === Map(25L -> 1L, 50L -> 2L, 75L -> 3L, 90L -> 4L))
  }

  // -------------------------------------------------------------
  // as-of join
  // -------------------------------------------------------------

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("clickAttribution attaches the latest STRICTLY-prior click") {
    val events = Seq(
      // user 1: click, click, purchase AT the second click's ts, later purchase
      (10L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (11L, ts("2024-01-01 11:00:00"), 1L, "click"),
      (20L, ts("2024-01-01 11:00:00"), 1L, "purchase"), // equal ts: strict < excludes click 11
      (21L, ts("2024-01-01 12:00:00"), 1L, "purchase"),
      // user 2: purchase with no prior click -> dropped
      (22L, ts("2024-01-01 09:00:00"), 2L, "purchase"),
      // user 3: two clicks at the SAME ts -> deterministic max event_id
      (30L, ts("2024-01-01 08:00:00"), 3L, "click"),
      (31L, ts("2024-01-01 08:00:00"), 3L, "click"),
      (23L, ts("2024-01-01 09:00:00"), 3L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.clickAttribution(events)
      .select("event_id", "click_id").as[(Long, Long)].collect().toMap
    assert(got === Map(20L -> 10L, 21L -> 11L, 23L -> 31L))
  }

  test("AsOf.join generalizes beyond events: sensor readings to calibrations") {
    import graft.operators.AsOf
    val readings = Seq(
      (1L, "s1", ts("2024-03-01 10:00:00"), 21.5),
      (2L, "s1", ts("2024-03-01 12:00:00"), 22.0),
      (3L, "s2", ts("2024-03-01 11:00:00"), 19.0)
    ).toDF("reading_id", "sensor", "rts", "temp")
    val calibrations = Seq(
      ("s1", ts("2024-03-01 09:00:00"), 0.1, 100L),
      ("s1", ts("2024-03-01 11:00:00"), 0.2, 101L),
      ("s2", ts("2024-03-01 11:00:00"), 0.3, 102L) // equal ts: strict < drops it
    ).toDF("sensor", "cts", "offset", "cal_id")
    val got = AsOf.join(readings, calibrations, key = "sensor",
        leftTs = "rts", rightTs = "cts", tieBreak = "cal_id")
      .select("reading_id", "right_cal_id", "right_offset")
      .as[(Long, Long, Double)].collect()
      .map { case (id, cal, off) => id -> ((cal, off)) }.toMap
    assert(got === Map(1L -> ((100L, 0.1)), 2L -> ((101L, 0.2))))
  }

  // -------------------------------------------------------------
  // range join
  // -------------------------------------------------------------

  test("recentClickJoin multi-matches within the horizon, keyed by user") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L, "click"),
      (2L, ts("2024-01-01 10:20:00"), 5L, "click"),
      (3L, ts("2024-01-01 09:20:00"), 5L, "click"),    // horizon edge: exactly 60 min
      (4L, ts("2024-01-01 10:30:00"), 6L, "click"),    // other user
      (9L, ts("2024-01-01 10:30:00"), 5L, "purchase"),
      (10L, ts("2024-01-01 10:20:00"), 5L, "purchase") // equal ts to click 2: strict <
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.recentClickJoin(events)
      .select("purchase_id", "click_id", "gap_sec")
      .as[(Long, Long, Long)].collect().toSet
    // window is CLOSED at the start: click 3 is exactly 60 min before
    // purchase 10 (gap 3600, included) and 70 min before purchase 9
    // (excluded); equal-ts click 2 vs purchase 10 is strict-< excluded
    assert(got === Set(
      (9L, 1L, 1800L), (9L, 2L, 600L), (10L, 1L, 1200L), (10L, 3L, 3600L)))
  }

  test("RangeJoin.overlap matches intervals wider than one bucket") {
    import graft.operators.RangeJoin
    val points = Seq((1L, ts("2024-03-01 00:30:00")), (2L, ts("2024-03-01 07:00:00")))
      .toDF("pid", "pts")
    // 9h interval over 1h buckets: covers 10 buckets; point 1 inside,
    // point 2 inside; second disjoint interval catches neither
    val intervals = Seq(
      (10L, ts("2024-03-01 00:00:00"), ts("2024-03-01 09:00:00")),
      (11L, ts("2024-03-02 00:00:00"), ts("2024-03-02 01:00:00"))
    ).toDF("iid", "istart", "iend")
    val got = RangeJoin.overlap(points, intervals, "pts", "istart", "iend",
        bucketUs = 3600L * 1000000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 10L)))
  }

  test("RangeJoin.overlap drops empty/inverted intervals instead of exploding them") {
    import graft.operators.RangeJoin
    val points = Seq((1L, ts("2024-03-01 00:30:00"))).toDF("pid", "pts")
    val intervals = Seq(
      // inverted: end a full year BEFORE start — sequence(a, b) with
      // a > b would otherwise generate thousands of descending buckets
      (20L, ts("2024-03-01 00:00:00"), ts("2023-03-01 00:00:00")),
      // empty: end == start contains no point by [start, end)
      (21L, ts("2024-03-01 00:30:00"), ts("2024-03-01 00:30:00")),
      (22L, ts("2024-03-01 00:00:00"), ts("2024-03-01 01:00:00"))
    ).toDF("iid", "istart", "iend")
    val got = RangeJoin.overlap(points, intervals, "pts", "istart", "iend",
        bucketUs = 3600L * 1000000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 22L)))
  }

  test("windowRollup counts events into overlapping windows with [start, end) bounds") {
    // windows every 3h, 6h long: [0,6), [3,9), [6,12)
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 1.0), // window 0 only (start incl.)
      (2L, ts("2024-01-01 04:00:00"), 1L, "view", 2.0), // windows 0 and 1
      (3L, ts("2024-01-01 06:00:00"), 1L, "view", 4.0), // windows 1 and 2 (end excl. of 0)
      (4L, ts("2024-01-01 23:00:00"), 1L, "view", 8.0)  // outside all three
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.windowRollup(events, nWindows = 3, everyHours = 3, lenHours = 6)
      .select("window_id", "n", "sum_value").as[(Long, Long, Double)].collect()
      .map { case (w, n, s) => w -> ((n, s)) }.toMap
    assert(got === Map(0L -> ((2L, 3.0)), 1L -> ((2L, 6.0)), 2L -> ((1L, 4.0))))
  }

  test("valueOutliers ranks the planted extreme value first with the exact z") {
    val events = (1L to 4L).map(i => (i, ts("2024-01-01 00:00:00"), 1L, "a", 1.0)) :+
      ((5L, ts("2024-01-01 01:00:00"), 1L, "a", 11.0))
    val df = events.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.valueOutliers(df, topK = 2)
      .select("event_id", "z", "rn").as[(Long, Double, Long)].collect()
      .sortBy(_._3)
    // n=5, s=15, sq=125 -> mean 3, var (125-45)/4 = 20
    assert(got.head._1 === 5L)
    assert(math.abs(got.head._2 - (11.0 - 3.0) / math.sqrt(20.0)) < 1e-12)
    // the 1.0 rows tie on |z|; event_id breaks the tie
    assert(got(1)._1 === 1L)
  }

  test("valueOutliers excludes degenerate groups (n=1 or zero variance)") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "single", 5.0),   // n = 1
      (2L, ts("2024-01-01 00:00:00"), 1L, "const", 2.0),    // constant values
      (3L, ts("2024-01-01 00:00:00"), 1L, "const", 2.0),
      (4L, ts("2024-01-01 00:00:00"), 1L, "ok", 1.0),
      (5L, ts("2024-01-01 00:00:00"), 1L, "ok", 3.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.valueOutliers(events, topK = 5)
      .select("event_type", "event_id").as[(String, Long)].collect()
    // only the well-defined group survives — no NULL/NaN z rows
    assert(got.map(_._1).toSet === Set("ok"))
    assert(got.map(_._2).toSet === Set(4L, 5L))
  }

  // -------------------------------------------------------------
  // chunking
  // -------------------------------------------------------------

  test("chunks emits overlapping fixed-size pieces; empty docs keep one chunk") {
    val docs = Seq((1L, "x" * 500), (2L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.chunks(docs, size = 256, stride = 192)
      .select("doc_id", "chunk_idx", "off", "chunk_len")
      .as[(Long, Long, Long, Long)].collect().sorted
    // 500 chars at stride 192: offsets 1, 193, 385 -> lens 256, 256, 116
    assert(got.toSeq === Seq(
      (1L, 0L, 1L, 256L), (1L, 1L, 193L, 256L), (1L, 2L, 385L, 116L),
      (2L, 0L, 1L, 0L)))
  }

  test("chunkDups finds boilerplate shared across and within documents") {
    val docs = Seq(
      (1L, "x" * 500), (2L, "x" * 500), // shared + internally repeated chunks
      (3L, ('a' to 'z').mkString * 10)  // distinct content, no dups
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDups(docs)
      .select("keep_doc", "keep_off", "n_copies")
      .as[(Long, Long, Long)].collect().toSet
    // fp("x"*256) sites: (1,1),(1,193),(2,1),(2,193); fp("x"*116): (1,385),(2,385)
    assert(got === Set((1L, 1L, 4L), (1L, 385L, 2L)))
  }

  // -------------------------------------------------------------
  // tf-idf
  // -------------------------------------------------------------

  test("tfidfTopTerms ranks doc-distinctive terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, topK = 2)
      .select("doc_id", "token", "score", "rn")
      .as[(Long, String, Double, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._4).map(r => (r._2, r._3)) }
    // n_docs=2: doc 1 apple = tf2 * 2/df1 = 4.0; banana = 1 * 2/2 = 1.0
    assert(got(1L).toSeq === Seq(("apple", 4.0), ("banana", 1.0)))
    assert(got(2L).toSeq === Seq(("cherry", 2.0), ("banana", 1.0)))
  }

  // -------------------------------------------------------------
  // sketch profile
  // -------------------------------------------------------------

  test("approxProfile sketches agree with the exact operators within tolerance") {
    // 200 docs, 2 sources, lengths 2..101 tokens, unique texts (the
    // leading d$i token — equal-length all-"w" texts would be TRUE
    // duplicates and the distinct count legitimately halves)
    val docs = (1L to 200L).map { i =>
      (i, if (i % 2 == 0) "even" else "odd",
        (s"d$i" +: Seq.fill((i % 100 + 1).toInt)("w")).mkString(" "))
    }.toDF("doc_id", "source", "text")
    val got = Curation.approxProfile(docs, rsd = 0.05)
      .select("source", "n_docs", "n_distinct_approx", "p50_tok", "p90_tok")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    got.values.foreach { case (nDocs, nDistinct, p50, p90) =>
      assert(nDocs === 100L)
      // HLL++ at rsd 0.05: allow 3 sigma
      assert(math.abs(nDistinct - 100L) <= 15, s"hll=$nDistinct")
      // per-source lengths are uniform 2..101; sketch accuracy 10000
      // on 100 values is exact-rank territory — generous bands anyway
      assert(math.abs(p50 - 51L) <= 5, s"p50=$p50")
      assert(math.abs(p90 - 91L) <= 5, s"p90=$p90")
    }
  }

  test("retentionCohorts builds the first-day cohort triangle") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-03 10:00:00"), 1L, "view"), // offset 2
      (3L, ts("2024-01-01 11:00:00"), 2L, "view"),
      (4L, ts("2024-01-01 12:00:00"), 2L, "view"), // same day: one activity
      (5L, ts("2024-01-02 10:00:00"), 3L, "view")  // later cohort
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.retentionCohorts(events)
      .select("cohort", "day_offset", "n_active")
      .as[(java.sql.Date, Long, Long)].collect()
      .map { case (c, o, n) => (c.toString, o, n) }.toSet
    assert(got === Set(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 2L, 1L), ("2024-01-02", 0L, 1L)))
  }

  test("typeTransitions counts adjacent pairs per user with END terminals") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "click"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "view"),
      (4L, ts("2024-01-01 09:00:00"), 2L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.typeTransitions(events)
      .as[(String, String, Long)].collect()
      .map { case (f, t, n) => (f, t) -> n }.toMap
    assert(got === Map(
      ("view", "click") -> 1L, ("click", "view") -> 1L,
      ("view", "END") -> 2L))
  }

  test("sessionFunnel requires the steps IN ORDER within one session") {
    val events = Seq(
      // session A (user 1): view -> click -> purchase = full funnel
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "click"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "purchase"),
      // session B (user 2): purchase BEFORE click/view - only the view counts
      (4L, ts("2024-01-01 10:00:00"), 2L, "purchase"),
      (5L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (6L, ts("2024-01-01 10:02:00"), 2L, "view"),
      // session C (user 1, after a > 30 min gap): click only, no view
      (7L, ts("2024-01-01 11:00:00"), 1L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.sessionFunnel(events)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === ((3L, 2L, 1L, 1L)))
  }

  test("valueHistogram bins exact cents; pivot fills absent combos with 0") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.99),  // bin 0 ([0,2))
      (2L, ts("2024-01-01 10:01:00"), 1L, "view", 2.00),  // bin 1 — edge case
      (3L, ts("2024-01-01 11:00:00"), 1L, "click", 5.50)  // bin 2
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val hist = Events.valueHistogram(events)
      .as[(String, Long, Long)].collect().toSet
    assert(hist === Set(("view", 0L, 1L), ("view", 1L, 1L), ("click", 2L, 1L)))
    val pivot = Events.hourlyTypePivot(events)
      .select("hod", "view", "click", "purchase")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pivot === Set((10L, 2L, 0L, 0L), (11L, 0L, 1L, 0L)))
  }

  test("corpusRollup emits detail, per-source, and grand-total levels") {
    val docs = Seq(
      (1L, "s1", "en", "x"), (2L, "s1", "de", "x"), (3L, "s2", "en", "x")
    ).toDF("doc_id", "source", "lang", "text")
    val got = Curation.corpusRollup(docs)
      .as[(Option[String], Option[String], Long, Long)].collect().toSet
    assert(got === Set(
      (Some("s1"), Some("en"), 1L, 0L), (Some("s1"), Some("de"), 1L, 0L),
      (Some("s2"), Some("en"), 1L, 0L),
      (Some("s1"), None, 2L, 1L), (Some("s2"), None, 1L, 1L),
      (None, None, 3L, 3L)))
  }

  test("bigramLmScore rewards common word ORDER, not just common words") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams: "a b" x2, "b a" x1
      (2L, "a b"),     // bigram: "a b"
      (3L, "a")        // no bigrams -> dropped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(docs)
      .select("doc_id", "n_bigrams", "lm2_score")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // corpus tf: "a b"=3, "b a"=1, total 4
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L) === ((3L, 7.0 / 12.0)))
    assert(got(2L) === ((1L, 3.0 / 4.0)))
  }

  test("bm25 favors term-dense short docs and drops termless docs") {
    val docs = Seq(
      (1L, "data data data"),
      (2L, "data x x x x x x x"),
      (3L, "x y z")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, Seq("data"))
      .select("doc_id", "score").as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq === Seq(1L, 2L)) // doc 3 never matches
    assert(got(0)._2 > got(1)._2)
    // idf = n_docs/df = 3/2; saturation keeps every score below idf*(k1+1)
    assert(got.forall(_._2 <= 1.5 * 2.2))
  }

  // -------------------------------------------------------------
  // pii redaction
  // -------------------------------------------------------------

  test("piiRedact counts and strips the planted emails and URLs") {
    // doc 15 gets both plantings (div by 3 and 5); doc 1 gets none
    val docs = Seq((15L, "hello world"), (1L, "hello world"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.piiRedact(docs)
      .select("doc_id", "n_emails", "n_urls", "clean_len")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, e, u, l) => id -> ((e, u, l)) }.toMap
    val clean15 = "hello world contact <EMAIL> see <URL>"
    assert(got(15L) === ((1L, 1L, clean15.length.toLong)))
    assert(got(1L) === ((0L, 0L, "hello world".length.toLong)))
  }

  // -------------------------------------------------------------
  // pair-graph health
  // -------------------------------------------------------------

  test("pairDegreeHistogram counts near-dup partners per node") {
    // star 1-{2,3,4} + edge 2-3 + isolated pair 10-11:
    // degrees 1->3, 2->2, 3->2, 4->1, 10->1, 11->1
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (10L, 11L))
      .toDF("id1", "id2")
    val got = Dedup.pairDegreeHistogram(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("rollingActives: hand-computed dau/wau over a 3-day fixture") {
    import java.sql.Timestamp
    def ev(id: Long, day: String, user: Long) =
      (id, Timestamp.valueOf(s"2024-01-0$day 10:00:00"), user, "view", 1.0, "{}")
    val events = Seq(
      ev(1, "1", 100), ev(2, "1", 200),           // day 1: users 100, 200
      ev(3, "2", 100), ev(4, "2", 100),           // day 2: user 100 (twice)
      ev(5, "8", 300)                             // day 8: outside day-2's window
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.rollingActives(events)
      .selectExpr("CAST(day AS STRING) AS day", "dau", "wau")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      "2024-01-01" -> ((2L, 2L)),
      "2024-01-02" -> ((1L, 2L)),  // wau: 100 + 200 from day 1
      "2024-01-08" -> ((1L, 2L)))) // window [02..08]: user 100 still in,
                                   // day-1's user 200 aged out
  }

  test("robustOutliers: MAD flags the whale the mean-dragged z-score hides") {
    import java.sql.Timestamp
    def ev(id: Long, v: Double) =
      (id, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "purchase", v, "{}")
    // 9 ordinary values (median 10.00, MAD 1.00) + one 10000.00 whale
    val rows = (1L to 9L).map(i => ev(i, 9.0 + (i % 3))) :+ ev(99L, 10000.0)
    val events = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val got = Events.robustOutliers(events)
      .select("event_id", "med_cents", "mad_cents", "absdev")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq(99L), "exactly the whale flags")
    val (_, med, mad, dev) = got.head
    // values: three each of 9/10/11 + 10000 -> lower median (rk=5) 10.00;
    // absdevs: 0 x3, 1.00 x6, 9990.00 -> lower median (rk=5) = 1.00
    assert(med === 1000L && mad === 100L && dev === 999000L)
  }

  test("robustOutliers: MAD=0 type still surfaces its whale (degenerate fallback)") {
    import java.sql.Timestamp
    def ev(id: Long, v: Double) =
      (id, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "purchase", v, "{}")
    // 8 of 9 values identical -> median 10.00, MAD 0: the k·MAD rule
    // degenerates; the fallback must still flag the single 10000x whale
    // instead of silently suppressing every outlier of the type
    val rows = (1L to 8L).map(ev(_, 10.0)) :+ ev(99L, 10000.0)
    val events = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val got = Events.robustOutliers(events)
      .select("event_id", "mad_cents", "absdev")
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq(99L), "exactly the whale flags")
    assert(got.head._2 === 0L && got.head._3 === 999000L)
  }

  test("containment catches a verbatim excerpt that Jaccard misses") {
    val long = "the quick brown fox jumps over the lazy dog while " +
      "seventeen violinists rehearse an entirely different movement " +
      "in the hall and the janitor counts every single chair twice"
    val excerpt = "seventeen violinists rehearse"
    val docs = Seq(
      (1L, long),
      (2L, excerpt),
      (3L, "completely unrelated text about databases and sorting")
    ).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(docs, n = 5, threshold = 0.9)
      .select("id1", "id2", "containment")
      .as[(Long, Long, Double)].collect()
    assert(cont.map(p => (p._1, p._2)).toSet === Set((1L, 2L)),
      "the excerpt must be flagged as contained, nothing else")
    assert(cont.head._3 === 1.0, "a verbatim excerpt has containment 1.0")
    // the symmetric-Jaccard view of the same pair is far below any
    // dedup threshold -- the blind spot this operator exists for
    val jac = Dedup.ngramJaccardPairs(docs, n = 5, threshold = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)))
  }

  test("sourceContainmentMatrix attributes the quote to the right direction") {
    val long = "the quick brown fox jumps over the lazy dog while " +
      "seventeen violinists rehearse an entirely different movement"
    val docs = Seq(
      (1L, long, "big_crawl"),
      (2L, "seventeen violinists rehearse", "quote_site"),
      (3L, "unrelated corpus text entirely", "clean_src")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.sourceContainmentMatrix(docs, threshold = 0.9)
      .as[(String, String, Long)].collect()
    assert(got.toSeq === Seq(("big_crawl", "quote_site", 1L)),
      "the long doc contains the quote-site doc, never the reverse")
  }

  test("canonicalByRank: hub elected in the star, min-id on rank ties") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L))
      .toDF("id1", "id2")
    val got = Dedup.canonicalByRank(pairs)
      .select("doc_id", "component", "cluster_size", "canonical")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    val canonicals = got.filter(_._4).map(_._1).toSet
    assert(canonicals === Set(1L, 10L),
      "star hub by rank; symmetric pair ties to the smaller id")
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L, 4L, 10L, 11L))
    assert(got.filter(_._2 == 1L).head._3 === 4L) // star cluster size
  }

  test("pairPageRank: hand-computed star ranks, hub strictly first") {
    // star 1-{2,3,4}: deg(1)=3, deg(leaf)=1; 3 exact-integer
    // iterations give pr(1)=2483250, pr(leaf)=505583 (hand-derived:
    // pr' = 150000 + (85·Σ (pr div deg)) div 100 from pr0 = 1e6)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id1", "id2")
    val got = Dedup.pairPageRank(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2483250L, 2L -> 505583L, 3L -> 505583L,
      4L -> 505583L))
    // symmetric pair: both nodes keep identical rank across iterations
    val sym = Dedup.pairPageRank(Seq((7L, 8L)).toDF("id1", "id2"))
      .as[(Long, Long)].collect().toMap
    assert(sym(7L) === sym(8L))
    // un-normalized input — duplicate rows and both orientations —
    // must NOT inflate degrees: ranks equal the canonical pair set's
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 3L), (4L, 1L))
      .toDF("id1", "id2")
    val messyGot = Dedup.pairPageRank(messy)
      .as[(Long, Long)].collect().toMap
    assert(messyGot === got)
  }

  // -------------------------------------------------------------
  // incremental dedup / estimated jaccard
  // -------------------------------------------------------------

  test("incrementalDedup classifies index hits, batch dups, and new docs") {
    val index = Seq("a", "b").toDF("fp")
    val batch = Seq((1L, "a"), (5L, "c"), (7L, "c"), (9L, "d"))
      .toDF("doc_id", "fp")
    val got = Dedup.incrementalDedup(index, batch)
      .as[(Long, String, String)].collect()
      .map { case (id, _, st) => id -> st }.toMap
    assert(got === Map(1L -> "dup_of_index", 5L -> "new",
      7L -> "dup_in_batch", 9L -> "new"))
  }

  test("estimatedJaccardPairs: identical docs agree on all 16 components") {
    val text = "The quick brown fox jumps over the lazy dog and runs far away home"
    val docs = Seq((1L, text), (2L, text),
      (3L, "Completely different content about distributed query engines in the cloud"))
      .toDF("doc_id", "text")
    val got = Dedup.estimatedJaccardPairs(docs)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (a, b, n, e) => (a, b) -> ((n, e)) }.toMap
    // identical shingle sets agree component-for-component
    assert(got((1L, 2L)) === ((16L, 1.0)))
    // any disjoint-content candidate that banding happened to surface
    // must score well below full agreement
    (got - ((1L, 2L))).values.foreach { case (n, _) => assert(n < 16L) }
  }

  test("incrementalNearDups finds the batch doc near an indexed one") {
    val base = "The quick brown fox jumps over the lazy dog and runs far away"
    val index = Dedup.minhashSignatures(Seq(
      (1L, base + " home"),
      (2L, "Completely different indexed content about query engines in the cloud"))
      .toDF("doc_id", "text"))
    val batch = Dedup.minhashSignatures(Seq(
      (10L, base + " house"), // near-dup of indexed doc 1
      (11L, "Fresh unrelated batch material concerning streaming state stores"))
      .toDF("doc_id", "text"))
    val got = Dedup.incrementalNearDups(index, batch)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (i1, i2, n, _) => (i1, i2) -> n }.toMap
    assert(got.contains((1L, 10L)), s"expected (1,10) in ${got.keySet}")
    assert(got((1L, 10L)) >= 8L)
    // the fresh doc matches nothing
    assert(!got.keySet.exists(_._2 == 11L))
  }

  test("hotBucketPairs rescues the mass-duplication case the bucket cap hides") {
    // 300 near-identical template instances: every LSH bucket they
    // share holds 300 > maxBucket members, so the capped probe drops
    // ALL of them — the exact scenario the within-delivery gate
    // exists for. The star probe must flag every copy against the
    // smallest doc_id instead (O(n) pairs, not the O(n²) the cap
    // prevents).
    val template = "breaking news template header repeated across the " +
      "whole crawl with identical boilerplate body and footer sections"
    val mass = (1L to 300L).map(i => (i, template))
    val fresh = Seq((900L,
      "singular genuine article with its own unique prose and content"))
    val sigs = Dedup.minhashSignatures((mass ++ fresh).toDF("doc_id", "text"))
      .localCheckpoint(true)
    // the hole: the capped all-pairs probe sees nothing
    val capped = Dedup.incrementalNearDups(sigs, sigs)
      .filter($"id1" < $"id2").count()
    assert(capped === 0L,
      "fixture error: the template buckets were expected to exceed the cap")
    // the rescue: every copy but the canonical min flags, id1 = min
    val hot = Dedup.hotBucketPairs(sigs)
      .as[(Long, Long, Long, Double)].collect()
    assert(hot.map(_._2).toSet === (2L to 300L).toSet,
      "every non-canonical copy must be flagged exactly once")
    assert(hot.forall(_._1 == 1L), "star centre must be the bucket minimum")
    assert(hot.forall(_._4 >= 0.9), "identical copies must score ~1")
    // the unrelated doc is untouched
    assert(!hot.exists(r => r._1 == 900L || r._2 == 900L))
  }

  test("hotBucketProbe flags batch docs colliding only in over-cap STORE buckets") {
    // the store-side twin of the case above: the INDEX already holds
    // a 300-copy template family, so its buckets are over-cap and
    // incrementalNearDups drops them — a new delivery copy of the
    // template would be silently admitted. The index-vs-batch star
    // must flag it against the bucket's canonical store doc, and must
    // not touch the genuinely fresh delivery doc.
    val template = "breaking news template header repeated across the " +
      "whole crawl with identical boilerplate body and footer sections"
    val store = Dedup.minhashSignatures(
      ((1L to 300L).map(i => (i, template)) :+
        ((500L, "established archival record with distinctive wording")))
        .toDF("doc_id", "text")).localCheckpoint(true)
    val batch = Dedup.minhashSignatures(Seq(
      (1000L, template + " extra"), // near-copy arriving in a delivery
      (1001L, "entirely novel delivery document about orchard economics"))
      .toDF("doc_id", "text")).localCheckpoint(true)
    // the hole this closes: the capped store probe admits the copy
    val capped = Dedup.incrementalNearDups(store, batch)
      .filter($"est_jaccard" >= 0.7).count()
    assert(capped === 0L,
      "fixture error: the template's store buckets were expected over-cap")
    val got = Dedup.hotBucketProbe(store, batch)
      .filter($"est_jaccard" >= 0.7)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._2).toSet === Set(1000L),
      "exactly the template near-copy must be flagged")
    assert(got.forall(_._1 == 1L), "star centre must be the store minimum")
    // a batch against a SMALL store probes nothing here (no hot buckets)
    assert(Dedup.hotBucketProbe(batch, store).count() === 0L)
  }

  test("bucketStats fold == rebuild over the unioned signatures") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001")
      .documents.select($"doc_id", $"text")
    val store = Dedup.minhashSignatures(docs.filter($"doc_id" % 2 === 0))
      .localCheckpoint(true)
    val delivery = Dedup.minhashSignatures(docs.filter($"doc_id" % 2 === 1))
      .localCheckpoint(true)
    val folded = Dedup.bucketStatsFold(Dedup.bucketStats(store), delivery)
    val rebuilt = Dedup.bucketStats(store.unionByName(delivery))
    assert(folded.exceptAll(rebuilt).count() === 0L &&
      rebuilt.exceptAll(folded).count() === 0L,
      "folded bucket store must equal a from-scratch rebuild")
  }

  test("bucketStatsRetract == rebuild over survivors, repairing lost minima") {
    // a 300-copy template family (over-cap buckets, canonical id1 = 1)
    // plus distinct docs; retract the CANONICAL doc 1 and doc 500 —
    // the family's buckets must repair id1 to 2, counts must drop,
    // and the fully-retracted doc-500 buckets must disappear
    val template = "breaking news template header repeated across the " +
      "whole crawl with identical boilerplate body and footer sections"
    val all = Dedup.minhashSignatures(
      ((1L to 300L).map(i => (i, template)) ++ Seq(
        (500L, "established archival record with distinctive wording"),
        (600L, "second surviving record with its own unique content")))
        .toDF("doc_id", "text")).localCheckpoint(true)
    val removedIds = Set(1L, 500L)
    val retracted = all.filter($"doc_id".isin(removedIds.toSeq: _*))
      .localCheckpoint(true)
    val surviving = all.filter(!$"doc_id".isin(removedIds.toSeq: _*))
      .localCheckpoint(true)
    val got = Dedup.bucketStatsRetract(
      Dedup.bucketStats(all), surviving, retracted).localCheckpoint(true)
    val want = Dedup.bucketStats(surviving)
    assert(got.exceptAll(want).count() === 0L &&
      want.exceptAll(got).count() === 0L,
      "retracted bucket store must equal a rebuild over survivors")
    // the repair actually fired: the template buckets' canonical is 2
    assert(got.filter($"bsz" > 256).count() > 0L)
    assert(got.filter($"bsz" > 256).select("id1").distinct()
      .as[Long].collect().toSet === Set(2L))
    // ... and the star probe over the retracted store scores against
    // the REPAIRED canonical (a stale id1 would score against a ghost
    // signature and silently drop every pair)
    val probe = Dedup.hotBucketProbeFrom(got, surviving,
      Dedup.minhashSignatures(Seq((9000L, template + " extra"))
        .toDF("doc_id", "text")))
      .filter($"est_jaccard" >= 0.7)
      .as[(Long, Long, Long, Double)].collect()
    assert(probe.map(r => (r._1, r._2)).toSet === Set((2L, 9000L)))
  }

  test("bucketStatsRetract raises on over-retraction") {
    val sigs = Dedup.minhashSignatures(Seq(
      (1L, "only document in the store with some words"),
      (2L, "another unrelated document about different things"))
      .toDF("doc_id", "text")).localCheckpoint(true)
    val doc1 = sigs.filter($"doc_id" === 1L)
    val store = Dedup.bucketStatsRetract(Dedup.bucketStats(sigs),
      sigs.filter($"doc_id" === 2L), doc1)
    // retracting doc 1 AGAIN drives its buckets negative — corruption
    val ex = intercept[Exception] {
      Dedup.bucketStatsRetract(store,
        sigs.filter($"doc_id" === 2L), doc1).count()
    }
    assert(ex.getMessage.contains("over-retraction") ||
      Option(ex.getCause).exists(_.getMessage.contains("over-retraction")))
  }

  // shared fixture for the verified-pair store maintenance tests:
  // shingle SETS constructed directly (the ops take (doc_id, shingle)
  // tables), maxDf = 2 so the df cut actually crosses.
  //   store: d1={s,t} d2={s,t}  (pair via s AND t, J=1)
  //          d5={w}  d6={w}     (pair via w ONLY, J=1)
  //   delivery: d3={s,w,p,u} d4={s,w,p,v}
  //     -> s,w cross the cut (df 2->4); t,p stay rare
  private def pairStoreFixture = {
    val store = Seq(1L -> "s", 1L -> "t", 2L -> "s", 2L -> "t",
      5L -> "w", 6L -> "w").toDF("doc_id", "shingle")
    val delivery = Seq(3L -> "s", 3L -> "w", 3L -> "p", 3L -> "u",
      4L -> "s", 4L -> "w", 4L -> "p", 4L -> "v").toDF("doc_id", "shingle")
    (store, delivery)
  }
  private def samePairs(got: org.apache.spark.sql.DataFrame,
      want: org.apache.spark.sql.DataFrame): Unit = {
    assert(got.exceptAll(want).count() === 0L, "extra rows vs from-scratch")
    assert(want.exceptAll(got).count() === 0L, "missing rows vs from-scratch")
  }

  test("jaccardPairsFold == rebuild: repairs df-cut crossings, finds delivery pairs") {
    val (store, delivery) = pairStoreFixture
    val store0 = Dedup.ngramJaccardFromShingles(store, maxDf = 2)
    // fixture sanity: the v0 store holds BOTH pairs, (5,6) only via w
    assert(store0.select("id1", "id2").as[(Long, Long)].collect().toSet
      === Set((1L, 2L), (5L, 6L)))
    val folded = Dedup.jaccardPairsFold(store0, store, delivery, maxDf = 2)
    samePairs(folded,
      Dedup.ngramJaccardFromShingles(store.unionByName(delivery), maxDf = 2))
    val got = folded.select("id1", "id2").as[(Long, Long)].collect().toSet
    // (5,6) DROPPED: w crossed the cut and no rare shingle remains;
    // (1,2) kept via still-rare t; (3,4) is the delivery's new pair
    // via p (J = 3/5)
    assert(got === Set((1L, 2L), (3L, 4L)))
  }

  test("jaccardPairsRetract == rebuild: drops endpoints, re-admits uncrossed pairs") {
    val (store, delivery) = pairStoreFixture
    val all = store.unionByName(delivery)
    val store1 = Dedup.ngramJaccardFromShingles(all, maxDf = 2)
    val retracted = Dedup.jaccardPairsRetract(store1, all,
      Seq(3L, 4L).toDF("doc_id"), maxDf = 2)
    samePairs(retracted, Dedup.ngramJaccardFromShingles(store, maxDf = 2))
    val got = retracted.select("id1", "id2").as[(Long, Long)].collect().toSet
    // (5,6) RE-ADMITTED: w uncrossed (df 4->2) so its candidacy — and
    // the exact verify — come back; (3,4) gone with its endpoints
    assert(got === Set((1L, 2L), (5L, 6L)))
  }

  test("estimatorCalibration: identical docs land in the 16-agree bucket at J=1") {
    val text = "The quick brown fox jumps over the lazy dog and runs far away home"
    val docs = Seq((1L, text), (2L, text),
      (3L, "Completely different content about distributed query engines in the cloud"))
      .toDF("doc_id", "text")
    val got = Dedup.estimatorCalibration(docs)
      .as[(Long, Long, Long)].collect()
      .map { case (n, c, m) => n -> ((c, m)) }.toMap
    // the identical pair: full agreement, exact mean J = 1e6 micro
    assert(got(16L)._1 === 1L)
    assert(got(16L)._2 === 1000000L)
    // no bucket reports a mean outside [0, 1e6]
    got.values.foreach { case (_, m) => assert(m >= 0L && m <= 1000000L) }
  }

  test("lshTuningCurve: monotone, exact at the endpoints") {
    val got = Dedup.lshTuningCurve(spark)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(got.length === 20)
    // s = 100%: every band matches with certainty
    assert(got.last === ((100L, 1.0, 1.0)))
    // monotone nondecreasing in s, p_collide >= p_band always
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3 && b._2 >= a._2)
    }
    got.foreach { case (_, pb, pc) => assert(pc >= pb) }
    // closed form at s = 0.5: p_band = 1/16, p_collide = 1-(15/16)^4
    val mid = got.find(_._1 == 50L).get
    assert(mid._2 === 0.0625)
    assert(math.abs(mid._3 - (1.0 - math.pow(15.0 / 16.0, 4))) < 1e-12)
  }

  test("Tables.events fails loudly on an unnormalizable ts type") {
    // the silent `case _ => raw` fallthrough once let a testdata-type
    // drift break four operators at analysis time; the contract now is
    // normalize-or-throw at table access
    val dir = java.nio.file.Files.createTempDirectory("graft-evdrift")
    Seq((1L, "not-a-timestamp")).toDF("event_id", "ts")
      .write.parquet(s"$dir/events.parquet")
    val ex = intercept[IllegalStateException] {
      graft.sources.Tables(spark, dir.toString).events
    }
    assert(ex.getMessage.contains("unexpected type"))
  }

  test("sourceVocabOverlap: mirror sources at J=1, partial overlap exact") {
    val docs = Seq(
      (1L, "alpha beta gamma", "A"),
      (2L, "alpha beta gamma", "B"), // mirror of A via a DIFFERENT doc
      (3L, "alpha delta", "C")       // shares only `alpha` with A/B
    ).toDF("doc_id", "text", "source")
    val got = Dedup.sourceVocabOverlap(docs)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map { case (a, b, v1, v2, c, j) => (a, b) -> ((v1, v2, c, j)) }.toMap
    // mirror sources: identical type sets -> vocab_jaccard exactly 1
    assert(got(("A", "B")) === ((3L, 3L, 3L, 1.0)))
    // partial: |{alpha}| / |{alpha,beta,gamma,delta}| = 1/4
    assert(got(("A", "C")) === ((3L, 2L, 1L, 0.25)))
    assert(got(("B", "C")) === ((3L, 2L, 1L, 0.25)))
    assert(got.size === 3)
  }

  test("novelty: all-novel first doc, zero-novel mirror, shared-shingle deflation") {
    val docs = Seq(
      (1L, "abcdefghij"), // 6 distinct 5-grams, all first-seen here
      (2L, "abcdefghij"), // exact mirror: every shingle first-seen in doc 1
      (3L, "abcdezzzzz")  // shares exactly `abcde` with doc 1 -> 5/6 novel
    ).toDF("doc_id", "text")
    val got = Dedup.novelty(docs)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, n, nov, f) => id -> ((n, nov, f)) }.toMap
    assert(got(1L) === ((6L, 6L, 1.0)))
    assert(got(2L) === ((6L, 0L, 0.0)))
    // deflation: the one shingle doc 1 already introduced is not novel
    assert(got(3L) === ((6L, 5L, 5.0 / 6.0)))
  }
}
