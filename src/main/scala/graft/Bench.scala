package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR, prints ONE COMPACT JSON line.
  *
  * Output contract:
  *  - stdout gets exactly one line — `{"metric":"total","value":…,
  *    "unit":"sec","queries":{name: min sec},"cpu":{name: executor
  *    cpu sec},"cpu_total_sec":…,"sf":…,"runs":N}` plus
  *    the composed/incremental scalars (`composed_build_sec`,
  *    `composed_serve_sec`, `ingest_boot_sec`, `ingest_delivery_sec`,
  *    `ingest_recal_sec`, `ingest_takedown_sec`)
  *    and, when the budget elides sub-threshold queries from the
  *    dict, `omitted_n` + `min_printed_sec` (no silent caps) — kept
  *    well under 2 KB (the driver captures a bounded tail of the
  *    process output; rounds 1-4 lost their wall-clock numbers because
  *    the old single line carried medians + cpu + gc for 42 queries
  *    and the capture window started mid-telemetry);
  *  - the full telemetry (per-query medians, executor cpu, GC) goes to
  *    a FILE — bench_detail.json, path overridable via
  *    SPARK_GRAFT_BENCH_DETAIL — where no capture window can cut it.
  *
  * Methodology:
  *  - warmup pass at sf0.001 first: JIT-compiles Spark's scan/shuffle/
  *    codegen paths and populates the whole-stage-codegen cache (the
  *    generated class for a plan is data-independent, so the timed runs
  *    measure execution, not Janino compilation);
  *  - the WHOLE suite runs SPARK_GRAFT_BENCH_RUNS (default 3) times,
  *    passes interleaved (pass 1 of every query, then pass 2, ...);
  *    the headline number per query is the MIN across passes — host
  *    noise on this box inflates single runs 10-200x (BASELINE.md),
  *    and a sustained noise window that would cover N back-to-back
  *    runs of one query only taints one pass when runs are minutes
  *    apart. Medians and executor cpu/GC ride along for cross-checking;
  *  - executor cpu/GC are attributed per query via the job-group id
  *    set around each timed run: stages are mapped to their group by
  *    the job-start event, so attribution is exact no matter how late
  *    the async listener bus delivers task-end events (the previous
  *    global delta-window charged late events to whichever query ran
  *    next — r4 showed 2.5x swings on identical code);
  *  - timed pass materializes via the noop sink — full execution
  *    including final sorts (a bare count() lets Catalyst elide
  *    orderBys) with zero sink cost;
  *  - cache teardown between runs happens OUTSIDE the timed span;
  *  - queries run in name order (stable timings across rounds).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "bench_detail.json")
    // the PREVIOUS round's detail file (about to be overwritten below):
    // its query set splits this round's total into carried vs new cost,
    // so a round-over-round headline jump self-describes as surface
    // growth vs regression without anyone re-deriving the common set.
    // The prior run must be at THIS run's scale factor — a detail file
    // left behind by a run at another SF would mislabel carried_total
    // (ADVICE round-13), so the sf field gates the whole split.
    // The prior WALL and CPU dicts additionally feed the
    // self-adjudicating regression flag below: wall up with cpu flat
    // is host noise (this box swings 10-200x), wall up AND cpu up is
    // a plan regression — only the latter flags.
    def prevDict(txt: String, tag: String): Map[String, Double] = {
      val t = "\"" + tag + "\":{"
      val start = txt.indexOf(t)
      val end = if (start < 0) -1 else txt.indexOf('}', start)
      if (start < 0 || end < 0) Map.empty
      else "\"([^\"]+)\":(-?[0-9.eE+]+)".r
        .findAllMatchIn(txt.substring(start + t.length, end))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
    val (prevWall, prevCpu): (Map[String, Double], Map[String, Double]) =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          Paths.get(detailPath)), "UTF-8")
        val prevSf = "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(txt)
          .map(_.group(1))
        if (!prevSf.contains(sfDir)) (Map.empty, Map.empty)
        else (prevDict(txt, "queries"), prevDict(txt, "cpu_sec"))
      } catch { case _: Throwable => (Map.empty, Map.empty) }
    val prevQueries: Set[String] = prevWall.keySet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage → job-group mapping + per-group counters (see Scaladoc).
    val stageGroup = new ConcurrentHashMap[Integer, String]()
    val cpuNsByQ = new ConcurrentHashMap[String, AtomicLong]()
    val gcMsByQ = new ConcurrentHashMap[String, AtomicLong]()
    val eventsSeen = new AtomicLong(0L)
    def bump(m: ConcurrentHashMap[String, AtomicLong], k: String, v: Long): Unit =
      m.computeIfAbsent(k, _ => new AtomicLong(0L)).addAndGet(v)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val g = Option(j.properties).map(_.getProperty("spark.jobGroup.id")).orNull
        if (g != null) j.stageIds.foreach(sid => stageGroup.put(sid, g))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        eventsSeen.incrementAndGet()
        val m = t.taskMetrics
        val g = stageGroup.get(t.stageId)
        if (m != null && g != null) {
          bump(cpuNsByQ, g, m.executorCpuTime)
          bump(gcMsByQ, g, m.jvmGCTime)
        }
      }
    })

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)

    // one timed execution under the query's job group; cache teardown
    // (for queries that persist intermediates, e.g. dedup's shingle
    // index) is outside the span
    def run(dir: String, name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      try {
        spark.sparkContext.setJobGroup(name, name)
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed on $dir: ${e.getMessage}")
        -1.0
      } finally {
        spark.sparkContext.clearJobGroup()
        spark.sharedState.cacheManager.clearCache()
      }

    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      ordered.foreach { case (n, f) => run(warmDir, n, f) }
    // warmup work must not count toward the timed-pass cpu/GC totals
    cpuNsByQ.clear(); gcMsByQ.clear()

    val samples = collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to repeats; (name, fn) <- ordered) {
      val t = run(sfDir, name, fn)
      if (t >= 0) samples(name) = t :: samples(name)
    }

    // ---- pair-graph composition mode ----
    // The dedup family's expensive artifact is the near-dup pair graph
    // (and the signature/candidate tables behind it). A real pipeline
    // materializes them ONCE and feeds every consumer (PLANS.md
    // "pair-graph reuse"); the per-query suite above deliberately
    // charges each query its full standalone cost. This section proves
    // the composition claim with numbers: build the artifacts once
    // (timed), then run the q51/q72/q75/q89/q98 semantics off the
    // parquet artifacts via the *From APIs — marginal cost collapses
    // to pair-proportional work. Reported under "composed" in the
    // detail file; disable with SPARK_GRAFT_BENCH_COMPOSED=0.
    // shared by the composed and incremental sections below
    def timedSection(tag: String)(name: String)(body: => Unit): (String, Double) = {
      spark.sparkContext.setJobGroup(name, name)
      val t0 = System.nanoTime()
      val sec =
        try { body; (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $tag $name failed: ${e.getMessage}")
          -1.0
        } finally {
          spark.sparkContext.clearJobGroup()
          spark.sharedState.cacheManager.clearCache()
        }
      name -> sec
    }
    // bench artifacts are scratch: delete so repeated local runs
    // don't accumulate temp dirs' worth of parquet
    def rmTree(f: java.io.File): Unit = FsUtil.rmTree(f)
    val composed: Seq[(String, Double)] =
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_COMPOSED", "1") == "0") Nil
      else {
        import graft.operators.Dedup
        import org.apache.spark.sql.functions.col
        val tmp = Files.createTempDirectory("graft-bench-composed")
        def timedAt(name: String)(body: => Unit): (String, Double) = {
          timedSection("composed")(name)(body)
        }
        val tables = graft.sources.Tables(spark, sfDir)
        val docs = tables.documents
        // three artifacts: the signature store (k BIGINTs per doc),
        // the SCORED candidate table (exact-Jaccard detail per LSH
        // candidate), and the distinct 5-gram SHINGLE index. The
        // near-dup pair graph is a filter view of the scored table,
        // so the pair-family consumers — including the q98
        // calibration — run with zero corpus access; the shingle
        // index feeds the exact-Jaccard family (q27's semantics)
        // without re-deriving the corpus-wide explode + distinct.
        val (sigsP, scoredP, shP) = (s"$tmp/sigs", s"$tmp/scored", s"$tmp/shingles")
        def rd(p: String) = spark.read.parquet(p)
        def pairs() = rd(scoredP).filter(col("jaccard") >= 0.7)
          .select("id1", "id2")
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val out = Seq(
          timedAt("artifacts_build") {
            val sigs = Dedup.minhashSignatures(docs)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              sigs.write.mode("overwrite").parquet(sigsP)
              Dedup.shingles(docs).write.mode("overwrite").parquet(shP)
              val cands = Dedup.lshCandidates(sigs).localCheckpoint(true)
              // the verify leg reads the just-written shingle index
              // (duplicate-tolerant, so the distinct table is a valid
              // input) instead of re-exploding the corpus
              Dedup.jaccardDetailFor(cands, rd(shP))
                .write.mode("overwrite").parquet(scoredP)
            } finally sigs.unpersist(false)
          },
          timedAt("q27_from_shingles") {
            noop(Dedup.ngramJaccardFromShingles(rd(shP))) },
          timedAt("q140_from_shingles") {
            noop(Dedup.ngramContainmentFromShingles(rd(shP))) },
          timedAt("containment_pairs_build") {
            Dedup.ngramContainmentFromShingles(rd(shP))
              .write.mode("overwrite").parquet(s"$tmp/cont_pairs") },
          timedAt("q147_from_pairs") {
            noop(Dedup.sourceContainmentMatrixFromPairs(
              rd(s"$tmp/cont_pairs"), docs)) },
          timedAt("q51_from_pairs") {
            noop(Dedup.componentsOf(pairs())) },
          timedAt("q72_from_pairs") {
            noop(Dedup.clusterKeepsFromPairs(pairs(), docs)) },
          timedAt("q75_from_pairs") {
            noop(Dedup.sourceOverlapFromPairs(pairs(), docs)) },
          timedAt("q89_from_pairs") {
            noop(Dedup.pairDegreeHistogram(pairs())) },
          timedAt("q128_from_pairs") {
            noop(Dedup.pairPageRank(pairs())) },
          timedAt("q133_from_pairs") {
            noop(Dedup.canonicalByRank(pairs())) },
          timedAt("q98_from_artifacts") {
            noop(Dedup.estimatorCalibrationFromScored(rd(scoredP), rd(sigsP))) },
          // within-cell ANN family "assign once, consume thrice":
          // q49/q141/q146 share one IVF training + (two-level)
          // assignment pass standalone; the (vec_id, cell) artifact
          // collapses each to its bounded within-cell join
          timedAt("cells_artifact_build") {
            import graft.operators.Similarity
            Similarity.cellAssignments(tables.embeddings)
              .write.mode("overwrite").parquet(s"$tmp/cells")
          },
          timedAt("q49_from_cells") {
            noop(graft.operators.Similarity.semanticDupPairsFromCells(
              rd(s"$tmp/cells"), tables.embeddings)) },
          timedAt("q141_from_cells") {
            noop(graft.operators.Similarity.hardNegativesFromCells(
              rd(s"$tmp/cells"), tables.embeddings)) },
          timedAt("q146_from_cells") {
            noop(graft.operators.Similarity.labelNoiseFromCells(
              rd(s"$tmp/cells"), tables.embeddings)) },
          // IVF serve-time index: centroids + flat cells persisted
          // once, queries pay probe + cell-pruned join only (q34's
          // standalone retrains per call)
          timedAt("ivf_index_build") {
            import graft.operators.Similarity
            Similarity.ivfCentroidsDf(tables.embeddings)
              .write.mode("overwrite").parquet(s"$tmp/ivf_centroids")
            Similarity.cellsFromCentroids(
              rd(s"$tmp/ivf_centroids"), tables.embeddings)
              .write.mode("overwrite").parquet(s"$tmp/ivf_cells")
          },
          timedAt("q34_from_index") {
            noop(graft.operators.Similarity.ivfTopKFrom(
              rd(s"$tmp/ivf_centroids"), rd(s"$tmp/ivf_cells"),
              tables.embeddings)) },
          // PQ family "train once, serve many": q117/q118/q119/q122
          // each retrain the same codebook standalone; a pipeline
          // persists codebook + codes once per corpus version and
          // serve-time ADC pays only LUT + one code-table pass
          timedAt("pq_artifacts_build") {
            import graft.operators.Similarity
            val emb = tables.embeddings
            Similarity.pqCodebookDf(emb).write.mode("overwrite")
              .parquet(s"$tmp/pq_codebook")
            Similarity.pqEncode(emb).write.mode("overwrite")
              .parquet(s"$tmp/pq_codes")
          },
          timedAt("q118_from_codes") {
            noop(graft.operators.Similarity.pqAdcFromCodes(
              rd(s"$tmp/pq_codes"), rd(s"$tmp/pq_codebook"),
              tables.embeddings)) },
          // NB quality classifier "train once, score every delivery":
          // q156's standalone retrains per call; the persisted LM +
          // constants score deliveries with zero training-corpus
          // access (the streaming twin runs the same join at ingest)
          timedAt("nb_model_build") {
            import graft.operators.TextAnalysis
            val (lm, consts) = TextAnalysis.nbModel(docs,
              posSources = Seq("src0", "src1", "src2"),
              negSources = Seq("src3", "src4", "src5"))
            lm.write.mode("overwrite").parquet(s"$tmp/nb_lm")
            consts.write.mode("overwrite").parquet(s"$tmp/nb_consts")
          },
          timedAt("q156_from_model") {
            noop(graft.operators.TextAnalysis.nbScoreFrom(
              rd(s"$tmp/nb_lm"), rd(s"$tmp/nb_consts"), docs)) },
          timedAt("nb_scores_build") {
            graft.operators.TextAnalysis.nbScoreFrom(
                rd(s"$tmp/nb_lm"), rd(s"$tmp/nb_consts"), docs)
              .select(col("doc_id"), col("llr_micro").as("score"))
              .write.mode("overwrite").parquet(s"$tmp/nb_scores") },
          // label-store family "maintain, don't rebuild": the
          // q207/q208/q213/q220 contract entries rebuild pair graph +
          // closure in-entry for the hash gate; production maintains
          // a persisted LABEL STORE. The build leg prices the base
          // closures once; the fold/retract legs price ONE delivery /
          // ONE takedown of touched-component work off the persisted
          // store, and the split/keeps consumers read it with zero
          // closure cost — the measured touched-slice numbers for the
          // components family
          timedAt("labels_store_build") {
            val b = graft.operators.Curation.hashBucket(col("id1"), 10)
            Dedup.componentsOf(pairs().filter(b =!= 3))
              .write.mode("overwrite").parquet(s"$tmp/labels_base")
            Dedup.componentsOf(pairs())
              .write.mode("overwrite").parquet(s"$tmp/labels_full")
          },
          timedAt("q207_fold_from_store") {
            val b = graft.operators.Curation.hashBucket(col("id1"), 10)
            noop(Dedup.componentsFold(rd(s"$tmp/labels_base"),
              pairs().filter(b === 3)))
          },
          timedAt("q208_retract_from_store") {
            val rm = docs.select(col("doc_id")).filter(
              graft.operators.Curation.hashBucket(col("doc_id"), 7) === 3)
            val surviving = pairs()
              .join(rm.withColumnRenamed("doc_id", "id1"), Seq("id1"),
                "left_anti")
              .join(rm.withColumnRenamed("doc_id", "id2"), Seq("id2"),
                "left_anti")
            noop(Dedup.componentsRetract(rd(s"$tmp/labels_full"), pairs(),
              surviving, rm))
          },
          timedAt("q213_split_from_store") {
            noop(graft.operators.Curation.clusterAwareSplit(docs,
              rd(s"$tmp/labels_full")))
          },
          timedAt("q220_keeps_from_store") {
            noop(Dedup.clusterKeepsByScore(rd(s"$tmp/labels_full"),
              rd(s"$tmp/nb_scores")))
          },
          // suffix-array family "build once, read the arrays": the
          // q230/q231 contract entries rebuild the full SA+LCP
          // in-entry for the hash gate (~16 s each at sf0.1);
          // production persists the arrays once per corpus version
          // (q232's output IS the artifact) and the repeat consumers
          // pay one filtered pass each
          timedAt("suffix_arrays_build") {
            graft.operators.SuffixArray.suffixArrayWithLcp(docs)
              .write.mode("overwrite").parquet(s"$tmp/sa_lcp")
          },
          timedAt("q230_from_arrays") {
            noop(graft.operators.SuffixArray.repeatedSpansFromLcp(
              rd(s"$tmp/sa_lcp")))
          },
          timedAt("q231_from_arrays") {
            noop(graft.operators.SuffixArray.docRepeatProfileFromLcp(
              rd(s"$tmp/sa_lcp")))
          },
          // span-group store maintenance (round-17): the suffix-repeat
          // family's fold/retract path — build the doc-local group
          // store + pair artifact once (base = buckets != 3, full =
          // everything), then price ONE delivery fold and ONE 1-in-7
          // takedown at touched-group cost off the persisted artifacts
          timedAt("suffix_groups_build") {
            import graft.operators.SuffixArray
            val b = graft.operators.Curation.hashBucket(col("doc_id"), 10)
            val baseDocs = docs.filter(b =!= 3)
            SuffixArray.spanGroupStore(baseDocs)
              .write.mode("overwrite").parquet(s"$tmp/sg_base_store")
            SuffixArray.repeatedSpansWithKey(
                rd(s"$tmp/sg_base_store"), baseDocs)
              .write.mode("overwrite").parquet(s"$tmp/sg_base_pairs")
            SuffixArray.spanGroupStore(docs)
              .write.mode("overwrite").parquet(s"$tmp/sg_full_store")
            SuffixArray.repeatedSpansWithKey(
                rd(s"$tmp/sg_full_store"), docs)
              .write.mode("overwrite").parquet(s"$tmp/sg_full_pairs")
          },
          timedAt("q241_fold_from_store") {
            import graft.operators.SuffixArray
            val b = graft.operators.Curation.hashBucket(col("doc_id"), 10)
            val delivery = docs.filter(b === 3)
            val folded = rd(s"$tmp/sg_base_store")
              .unionByName(SuffixArray.spanGroupStore(delivery))
            noop(SuffixArray.repeatedSpansFold(
              rd(s"$tmp/sg_base_pairs"), folded, delivery, docs))
          },
          timedAt("q242_retract_from_store") {
            import graft.operators.SuffixArray
            val rm = col("doc_id") % 7 === 3
            val removed = docs.filter(rm)
            val survivingStore = rd(s"$tmp/sg_full_store")
              .join(removed.select(col("doc_id")), Seq("doc_id"),
                "left_anti")
            noop(SuffixArray.repeatedSpansRetract(
              rd(s"$tmp/sg_full_pairs"), survivingStore, removed,
              docs.filter(!rm)))
          })
        rmTree(tmp.toFile)
        out
      }

    // ---- incremental-ingest mode ----
    // IngestDemo's per-delivery pipeline, timed stage by stage at the
    // bench SF: boot_* legs price the once-per-warehouse index build,
    // inc_* legs price ONE delivery (a content-stable 20% of the
    // corpus) processed entirely against the persisted indexes — the
    // marginal-cost number a continuously-crawled corpus cares about.
    // Fold==from-scratch equality is asserted by IngestDemo.checks /
    // IngestSpec, not re-paid here. Disable with
    // SPARK_GRAFT_BENCH_INCREMENTAL=0.
    val incremental: Seq[(String, Double)] =
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_INCREMENTAL", "1") == "0") Nil
      else {
        val tmp = Files.createTempDirectory("graft-bench-ingest")
        val out = IngestDemo.stages(spark, sfDir, tmp.toString)
          .map { case (n, f) => timedSection("incremental")(n)(f()) }
        // tdn_* legs price ONE takedown (a content-stable ~1/7th of
        // corpus v1 retracted from every persisted store) — the
        // compliance-removal marginal cost, priced against the _v1
        // generation the stages above produced
        val tdn = IngestDemo.takedownStages(spark, sfDir, tmp.toString)
          .map { case (n, f) => timedSection("incremental")(n)(f()) }
        rmTree(tmp.toFile)
        out ++ tdn
      }

    // drain the async listener bus before reading the counters: wait
    // until no event has arrived for 3 consecutive 100 ms polls.
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    var lastCount = -1L; var stable = 0
    while (stable < 3 && System.nanoTime() < deadline) {
      Thread.sleep(100)
      val c = eventsSeen.get()
      if (c == lastCount) stable += 1 else { stable = 0; lastCount = c }
    }

    final case class Stat(min: Double, med: Double, cpuSec: Double, gcSec: Double)
    def fmt(d: Double, digits: Int = 4): String =
      s"%.${digits}f".formatLocal(java.util.Locale.ROOT, d)
    def ctr(m: ConcurrentHashMap[String, AtomicLong], k: String): Long =
      Option(m.get(k)).map(_.get()).getOrElse(0L)

    val results: Seq[(String, Stat)] = ordered.map { case (name, _) =>
      val s = samples(name).sorted
      // cpu/gc average over SUCCESSFUL passes only — dividing by
      // `repeats` would understate per-run cost when a pass failed
      val stat =
        if (s.isEmpty) Stat(-1.0, -1.0, -1.0, -1.0)
        else Stat(s.head, s(s.size / 2),
          ctr(cpuNsByQ, name) / 1e9 / s.size, ctr(gcMsByQ, name) / 1e3 / s.size)
      name -> stat
    }

    def obj(f: Stat => Double, digits: Int = 4): String =
      results.map { case (k, st) => "\"" + k + "\":" + fmt(f(st), digits) }
        .mkString("{", ",", "}")
    val total = results.map(_._2.min).filter(_ >= 0).sum

    // self-adjudicating regression flag (round-16 verdict #8): a
    // carried query regresses only when BOTH its wall min and its
    // executor cpu grew vs the prior round's detail file — wall-only
    // inflation is this box's documented host noise and no longer
    // needs hand-adjudication. Thresholds: wall > 1.5x AND cpu >
    // 1.25x, prior wall > 0.5 s (sub-half-second queries are
    // startup-noise-dominated). reg_n always prints when a prior
    // detail file parsed; the per-query ratios print for the worst 5
    // in the headline (full list in the detail file).
    val regressions: Seq[(String, Double, Double)] = results.flatMap {
      case (n, st) =>
        for {
          pw <- prevWall.get(n)
          pc <- prevCpu.get(n)
          if pw > 0.5 && pc > 0 && st.min >= 0 && st.cpuSec >= 0
          wr = st.min / pw
          cr = st.cpuSec / pc
          if wr > 1.5 && cr > 1.25
        } yield (n, wr, cr)
    }.sortBy(-_._2)
    def regJson(rs: Seq[(String, Double, Double)]): String = rs
      .map { case (n, wr, cr) =>
        "\"" + n + "\":[" + fmt(wr, 2) + "," + fmt(cr, 2) + "]" }
      .mkString("{", ",", "}")

    val composedJson = composed
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val incrementalJson = incremental
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // full telemetry to a file (never truncated by output capture)
    Files.writeString(Paths.get(detailPath),
      s"""{"metric":"total","value":${fmt(total, 6)},"unit":"sec",""" +
        s""""sf":"$sfDir","runs":$repeats,"queries":${obj(_.min)},""" +
        s""""medians":${obj(_.med)},"cpu_sec":${obj(_.cpuSec)},""" +
        s""""gc_sec":${obj(_.gcSec)},"composed":$composedJson,""" +
        s""""incremental":$incrementalJson,""" +
        s""""regressions":${regJson(regressions)}}""")
    // the one stdout line: compact, driver-parseable. The driver
    // captures a bounded tail (~2000 chars) of process output, so the
    // line must FIT — round 6's 108-query map exceeded the window even
    // at 1 decimal and the headline failed to parse. Degradation
    // ladder: all queries at 2 then 1 decimals, then only the SLOWEST
    // queries (the ones a reader of the headline wants) at 1 decimal,
    // shrinking until the line fits; full precision always lives in
    // the detail file. Printed after spark.stop() so nothing trails it.
    // the composed-mode totals ride the headline as two scalars: the
    // artifact build cost and the consumers' marginal cost — the
    // production-path numbers (PipelineDemo) a reader should weigh
    // against the standalone per-query map
    val composedBuild = composed
      .filter(_._1.endsWith("_build")).map(_._2).filter(_ >= 0).sum
    val composedServe = composed
      .filterNot(_._1.endsWith("_build")).map(_._2).filter(_ >= 0).sum
    val composedTag =
      if (composed.isEmpty) ""
      else s""","composed_build_sec":${fmt(composedBuild, 2)}""" +
        s""","composed_serve_sec":${fmt(composedServe, 2)}"""
    // incremental-ingest headline scalars: the once-per-warehouse
    // bootstrap and the marginal one-delivery cost (stage detail in
    // bench_detail.json under "incremental")
    val ingestBoot = incremental
      .filter(_._1.startsWith("boot_")).map(_._2).filter(_ >= 0).sum
    val ingestDelivery = incremental
      .filter(_._1.startsWith("inc_")).map(_._2).filter(_ >= 0).sum
    // cal_* = recalibration-cadence stages (gate-threshold re-derive,
    // artifact receipts): corpus-version-proportional by nature, so
    // they get their own scalar instead of inflating the marginal
    // delivery number
    val ingestRecal = incremental
      .filter(_._1.startsWith("cal_")).map(_._2).filter(_ >= 0).sum
    // tdn_* = one compliance takedown retracted from every store
    val ingestTakedown = incremental
      .filter(_._1.startsWith("tdn_")).map(_._2).filter(_ >= 0).sum
    val ingestTag =
      if (incremental.isEmpty) ""
      else s""","ingest_boot_sec":${fmt(ingestBoot, 2)}""" +
        s""","ingest_delivery_sec":${fmt(ingestDelivery, 2)}""" +
        s""","ingest_recal_sec":${fmt(ingestRecal, 2)}""" +
        s""","ingest_takedown_sec":${fmt(ingestTakedown, 2)}"""
    // carried-vs-new split against the previous round's query set (see
    // prevQueries above); absent when no prior detail file parsed
    val carriedTotal = results
      .filter { case (n, st) => prevQueries.contains(n) && st.min >= 0 }
      .map(_._2.min).sum
    // carried_n counts the queries INSIDE carried_total_sec (min >= 0)
    // so the pair stays internally consistent; a carried query that
    // failed every repeat is surfaced separately as carried_failed_n
    // instead of silently deflating the per-query average
    val carriedN = results.count(r =>
      prevQueries.contains(r._1) && r._2.min >= 0)
    val carriedFailed = results.count(r =>
      prevQueries.contains(r._1) && r._2.min < 0)
    val carriedTag =
      if (prevQueries.isEmpty) ""
      else s""","carried_total_sec":${fmt(carriedTotal, 2)}""" +
        s""","carried_n":$carriedN""" +
        (if (carriedFailed > 0) s""","carried_failed_n":$carriedFailed"""
         else "") +
        s""","new_n":${results.size - carriedN - carriedFailed}"""
    val regTag =
      if (prevQueries.isEmpty) ""
      else s""","reg_n":${regressions.size}""" +
        (if (regressions.isEmpty) ""
         else s""","regressions":${regJson(regressions.take(5))}""")
    // no-silent-caps: when the stdout budget elides sub-threshold
    // queries from the printed dict, the headline says so —
    // omitted_n (how many) and min_printed_sec (the cheapest query
    // that DID print, i.e. everything omitted ran faster than this).
    // bench_detail.json always carries all queries at full precision.
    // per-query executor cpu rides the headline beside the wall map
    // (same subset, 1 decimal): wall up with cpu flat reads as host
    // noise, wall up WITH cpu up reads as a plan regression — the
    // driver artifact alone distinguishes them without cross-
    // referencing BASELINE.md. cpu_total_sec always prints even when
    // the budget elides the dicts.
    val cpuTotal = results.map(_._2.cpuSec).filter(_ >= 0).sum
    def lineFor(subset: Seq[(String, Stat)], digits: Int): String = {
      val qs = subset.map { case (k, st) => "\"" + k + "\":" + fmt(st.min, digits) }
        .mkString("{", ",", "}")
      val cpu = subset.map { case (k, st) => "\"" + k + "\":" + fmt(st.cpuSec, 1) }
        .mkString("{", ",", "}")
      val omitted = results.size - subset.size
      val omitTag =
        if (omitted == 0) ""
        else if (subset.isEmpty) s""","omitted_n":$omitted"""
        else {
          val minPrinted = subset.map(_._2.min).min
          s""","omitted_n":$omitted,"min_printed_sec":${fmt(minPrinted, 2)}"""
        }
      s"""{"metric":"total","value":${fmt(total, 6)},"unit":"sec",""" +
        s""""queries":$qs,"cpu":$cpu,""" +
        s""""cpu_total_sec":${fmt(cpuTotal, 2)},"sf":"$sfDir","runs":$repeats""" +
        s"""$composedTag$ingestTag$carriedTag$regTag$omitTag}"""
    }
    val bySlowest = results.sortBy(-_._2.min)
    val budget = 1900
    // walk n down one query at a time (not successive halving, which
    // over-truncated round 7 to 54/110 when 100+ would have fit):
    // the first fitting n IS the largest, since line length is
    // monotone in n. ~110 cheap string builds, worst case.
    val candidates =
      Iterator(lineFor(results, 2), lineFor(results, 1)) ++
        Iterator.range(bySlowest.size - 1, 0, -1)
          .map(n => lineFor(bySlowest.take(n).sortBy(_._1), 1))
    val headline = candidates.find(_.length <= budget)
      .getOrElse(lineFor(Nil, 1))
    spark.stop()
    println(headline)
  }
}
