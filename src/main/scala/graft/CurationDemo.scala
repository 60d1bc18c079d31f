package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{BloomDecontam, Bpe, Curation, Dedup, SubstringDedup, TextAnalysis}
import graft.sources.Tables

/** End-to-end drive of the training-data curation pipeline — the
  * composed path a library user runs, stage by stage, from raw
  * documents to packed training shards:
  *
  *   quality filter → Gopher rule flags → NB classifier read (model
  *   trained, persisted, served back) → mirror-source diagnostic
  *   (vocab overlap) → exact dedup → near-dup clusters (keep cluster
  *   minimum) → novelty check → decontaminate vs the eval split →
  *   hash split → sequence-pack → write train shards partitioned by
  *   split/bin, plus a sketch profile + DSIR/entropy selection
  *   signals over what survived.
  *
  * `runMain graft.CurationDemo [sfDir] [workDir]`. Each stage prints
  * its surviving count — the funnel a curation run reports.
  */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val work = args.drop(1).headOption.getOrElse(
      Files.createTempDirectory("graft-curation").toString)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-curation-demo")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def report(stage: String, n: Long): Unit =
      println(f"[demo] $stage%-28s $n%7d docs")

    val docs = Tables(spark, sfDir).documents
    report("raw corpus", docs.count())

    // 1. quality floor (lenient: the synthetic corpus is clean-ish)
    val quality = docs.join(
      TextAnalysis.quality(docs).filter(col("quality") >= 0.5)
        .select("doc_id"), Seq("doc_id"))
    report("quality >= 0.5", quality.count())

    // 1b. rule-based filter (Gopher-style flags, q77): auditable
    //     per-rule booleans — the length floor is the one rule the
    //     word-soup fixture can trip, so `keep` is relaxed to it here
    val ruled = quality.join(
      TextAnalysis.gopherRules(quality)
        .filter(col("ok_uniq") && col("ok_stop")).select("doc_id"),
      Seq("doc_id"))
    report("gopher rules", ruled.count())

    // 1b2. model-based quality read (q156): train the NB classifier
    //      on source labels, PERSIST the artifacts, and score the
    //      ruled corpus off the persisted model — the serve path a
    //      live crawl runs. The synthetic sources are not actually
    //      quality-differentiated, so this gate is report-only here;
    //      a real pipeline filters on pred_pos (or an llr threshold).
    val (nbLm, nbConsts) = TextAnalysis.nbModel(ruled,
      posSources = Seq("src0", "src1", "src2"),
      negSources = Seq("src3", "src4", "src5"))
    nbLm.write.mode("overwrite").parquet(s"$work/nb_model/lm")
    nbConsts.write.mode("overwrite").parquet(s"$work/nb_model/consts")
    val nbPos = TextAnalysis.nbScoreFrom(
      spark.read.parquet(s"$work/nb_model/lm"),
      spark.read.parquet(s"$work/nb_model/consts"), ruled)
      .filter(col("pred_pos") === 1L).count()
    report("nb classifier pred-pos", nbPos)

    // 1b3. consolidated composite gate (q164): the SAME three signal
    //      families (NB LLR with a per-source adaptive cut, gopher
    //      rules, entropy band) as ONE decision table with per-rule
    //      attribution booleans — the auditable answer to "why was
    //      this doc dropped" that stages 1-1b2 spread across reports.
    //      Read over the raw corpus so the attribution covers every
    //      doc, not just prior-stage survivors.
    val gate = Curation.compositeGate(docs)
      .select("ok_nb", "ok_gopher", "ok_entropy", "keep")
      .groupBy().agg(
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"),
        sum(when(!col("ok_nb"), 1L).otherwise(0L)).as("nb_kills"),
        sum(when(!col("ok_gopher"), 1L).otherwise(0L)).as("gopher_kills"),
        sum(when(!col("ok_entropy"), 1L).otherwise(0L)).as("entropy_kills"))
      .head()
    println(f"[demo] ${"composite gate keeps"}%-28s ${gate.getLong(0)}%7d docs " +
      s"(kills: nb=${gate.getLong(1)} gopher=${gate.getLong(2)} " +
      s"entropy=${gate.getLong(3)})")
    // ... and its SERVE artifacts: the per-source cut table persists
    // next to the NB model, and future deliveries are gated
    // windowless by compositeGateFrom (equality vs the windowed form
    // asserted — the q179 contract, exercised in the composed demo)
    val (gLm, gConsts) = TextAnalysis.nbModel(docs,
      posSources = Seq("src0", "src1", "src2"),
      negSources = Seq("src3", "src4", "src5"))
    gLm.write.mode("overwrite").parquet(s"$work/gate/lm")
    gConsts.write.mode("overwrite").parquet(s"$work/gate/consts")
    Curation.gateThresholdsFrom(gLm, gConsts, docs)
      .write.mode("overwrite").parquet(s"$work/gate/thresholds")
    val servedGate = Curation.compositeGateFrom(
      spark.read.parquet(s"$work/gate/thresholds"),
      spark.read.parquet(s"$work/gate/lm"),
      spark.read.parquet(s"$work/gate/consts"), docs)
    val windowedGate = Curation.compositeGate(docs)
    require(servedGate.exceptAll(windowedGate).count() == 0 &&
      windowedGate.exceptAll(servedGate).count() == 0,
      "served gate diverged from the windowed gate")
    println(f"[demo] ${"gate served from artifacts"}%-28s " +
      f"${servedGate.filter(col("keep")).count()}%7d docs (== windowed, asserted)")

    // 1c. mirror-site diagnostic (q100): vocabulary-level source
    //     overlap — source pairs with near-identical type sets are
    //     mirror candidates a policy merges BEFORE paying per-doc
    //     dedup on both copies
    val mirrorPairs = Dedup.sourceVocabOverlap(ruled)
      .filter(col("vocab_jaccard") >= 0.9).count()
    println(f"[demo] ${"mirror source pairs"}%-28s $mirrorPairs%7d pairs")
    // (the synthetic sources draw from one vocabulary pool, so the
    // count is expectedly > 0 here; real corpora gate on ~0.9+)

    // 2. exact dedup: keep the canonical copy per fingerprint
    val keepExact = Dedup.exactDuplicates(ruled)
      .select(col("keep_id").as("doc_id"))
    val exact = ruled.join(keepExact, Seq("doc_id"))
    report("exact-deduped", exact.count())

    // 3. near-dup clusters: drop every clustered doc except the
    //    component minimum (q51's KEEP/DROP resolution)
    val drop = Dedup.dupClusters(exact, threshold = 0.7)
      .filter(col("doc_id") =!= col("component"))
      .select("doc_id")
    val nearDeduped = exact.join(drop, Seq("doc_id"), "left_anti")
    report("near-dup clustered", nearDeduped.count())

    // 3b. diversity check (q101): per-doc novelty under id-order —
    //     how many survivors still introduce mostly-new shingles;
    //     boilerplate's complement, read after dedup to confirm the
    //     near-dup pass actually raised corpus-level novelty
    val novel = Dedup.novelty(nearDeduped)
      .filter(col("novelty_frac") >= 0.5).count()
    report("novelty >= 0.5", novel)

    // 4. decontaminate the train side against the eval split (maxDf=2:
    //    the synthetic corpus shares "rare" 8-grams pervasively, the
    //    same fixture tuning q46 documents)
    val contaminated = Curation.decontaminate(nearDeduped, maxDf = 2)
      .select("doc_id")
    val cleanTrain = nearDeduped.join(contaminated, Seq("doc_id"), "left_anti")
    report("decontaminated", cleanTrain.count())

    // 4b. span-level pass (q111/q113): duplicated-span coverage flags
    //     and the broadcast bloom probe against the eval windows —
    //     the Lee-et-al. substring complement of the shingle-level
    //     decontamination above
    val spanFlag = SubstringDedup.dupSpanStats(cleanTrain)
      .filter(col("dup_fraction") > 0.5).count()
    report("span-dup > 0.5 (flag)", spanFlag)
    val bloom = BloomDecontam.buildFilter(cleanTrain)
    report("bloom-flagged",
      BloomDecontam.decontaminateWithFilter(cleanTrain, bloom).count())

    // 4c. span REWRITE (q138): cut every non-owner copy of a repeated
    //     8-token span — the corpus keeps exactly one copy of each.
    //     The packed shards downstream carry the rewritten text.
    val rewritten = SubstringDedup.removeSpansKeepOne(cleanTrain)
    report("span-rewritten (cut > 0)",
      rewritten.filter(col("removed_tokens") > 0).count())

    // 4d. budget subsample (q129): A-ES weighted draw toward long
    //     documents — the deterministic "fit the token budget" step
    report("weighted sample (k=400)",
      Curation.weightedSample(cleanTrain, k = 400).count())

    // 5. split + pack into fixed-token bins, write partitioned shards
    val split = Curation.hashSplit(cleanTrain).select(col("doc_id"), col("split"))
    val packed = Curation.packBins(cleanTrain)
      .join(split, Seq("doc_id"))
    packed.write.mode("overwrite")
      .partitionBy("split", "bin").parquet(s"$work/shards")
    report("packed shards", spark.read.parquet(s"$work/shards").count())

    // 5a2. integrity receipt (q160): per-split manifest written next
    //      to the shards — doc/token counts + the membership+content
    //      hash a rerun diffs to find exactly which shards changed
    Curation.shardManifest(cleanTrain.join(split, Seq("doc_id")))
      .write.mode("overwrite").parquet(s"$work/manifest")
    report("manifest splits",
      spark.read.parquet(s"$work/manifest").count())

    // 5b. loader handoff (q153): deterministic epoch-1 training order
    //     over the packed train docs — reproducible shard + position
    //     for every sequence, replayable bit-for-bit on resume
    val order = Curation.epochShuffle(
      packed.filter(col("split") === "train"), epoch = 1, nShards = 4)
    order.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$work/epoch1_order")
    report("epoch-1 loader rows",
      spark.read.parquet(s"$work/epoch1_order").count())

    // 6. profile what survived (sketches: the 100 TB report path),
    //    plus the round-6 selection signals: DSIR target-likeness
    //    (how much of the surviving corpus resembles src0-src3) and
    //    the char-entropy band (degenerate/noise outliers)
    val profile = Curation.approxProfile(cleanTrain)
    profile.orderBy("source").show(5, truncate = false)
    val dsirPos = Curation.dsirWeights(cleanTrain)
      .filter(col("dsir_micro") > 0).count()
    report("dsir target-like", dsirPos)
    val entropyBand = TextAnalysis.charEntropy(cleanTrain)
      .filter(col("entropy_milli") >= 2000 && col("entropy_milli") <= 6000)
      .count()
    report("entropy in [2,6] bits", entropyBand)

    // 7. tokenizer prep (q47/q124): vocabulary size of the surviving
    //    corpus and the first BPE merges learned from it — the merge
    //    table a tokenizer ships with the shards
    report("vocab types (tf>=2)", TextAnalysis.vocabulary(cleanTrain).count())
    val merges = Bpe.bpeTrain(cleanTrain, merges = 4).orderBy("rank").collect()
    println("[demo] bpe merges: " + merges.map(r =>
      s"${r.getString(1)}+${r.getString(2)}").mkString(" "))
    // price the surviving corpus in subwords under those merges — the
    // number the training run budgets against (q134)
    val priced = Bpe.tokenizeCorpus(cleanTrain,
      merges.map(r => (r.getString(1), r.getString(2))).toSeq)
    val subwords = priced.agg(sum(col("n_subwords"))).head().getLong(0)
    println(f"[demo] ${"corpus subword count"}%-28s $subwords%7d")
    println(s"[demo] shards + profile under $work")
    spark.stop()
  }
}
