package graft

import org.apache.spark.sql.functions._

import graft.operators.NgramLm
import graft.sources.Tables

/** Bigram-LM perplexity family (q198-q201): the micro-nat arithmetic
  * pinned on a hand-computed fixture, count-state fold/retract ==
  * from-scratch on real docs, and the corruption guard. The DuckDB
  * oracle proves Spark==SQL; these pin that BOTH compute the model
  * the scaladoc claims.
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  test("lmScore: hand-computed add-one bigram micro-nats") {
    // reference "a b a c": bigrams (a,b) (b,a) (a,c) — c12 = 1 each;
    // contexts c1: a=2, b=1; v = |{b, a, c}| = 3
    val ref = Seq((1L, "a b a c")).toDF("doc_id", "text")
    // score "a b x": (a,b) seen → p = (1+1)/(2+3+1) = 1/3;
    //                (b,x) unseen, context b seen → p = 1/(1+3+1) = 1/5
    // nll = -(floor(1e6·ln(1/3)) + floor(1e6·ln(1/5)))
    //     = -(-1098613 + -1609438) = 2708051; avg = 2708051 div 2
    val got = NgramLm.lmScore(ref, Seq((10L, "a b x")).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((10L, 2L, 2708051L, 1354025L)))
  }

  test("lmScore: unseen context falls back to 1/(v+1)") {
    val ref = Seq((1L, "a b a c")).toDF("doc_id", "text")
    // "x y": context x unseen → p = (0+1)/(0+3+1) = 1/4
    // nll = -floor(1e6·ln(0.25)) = 1386295
    val got = NgramLm.lmScore(ref, Seq((10L, "x y")).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((10L, 1L, 1386295L, 1386295L)))
  }

  test("lmScore: docs with fewer than two tokens are absent") {
    val ref = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val got = NgramLm.lmScore(ref,
      Seq((10L, "single"), (11L, ""), (12L, "two tokens"))
        .toDF("doc_id", "text"))
    assert(got.select("doc_id").as[Long].collect().toSet === Set(12L))
  }

  test("bigram count fold == from-scratch, retract == re-train") {
    val ref = Tables(spark, "/root/testdata/sf0.001").documents
      .filter($"source".isin("src0", "src1", "src2"))
      .localCheckpoint(true)
    val evens = ref.filter($"doc_id" % 2 === 0)
    val odds = ref.filter($"doc_id" % 2 === 1)
    val full = NgramLm.bigramCounts(ref).localCheckpoint(true)
    val folded = NgramLm.bigramCountsUpdate(
      NgramLm.bigramCounts(evens), odds)
    assert(folded.exceptAll(full).count() === 0L &&
      full.exceptAll(folded).count() === 0L, "fold diverged")
    val retracted = NgramLm.bigramCountsRetract(full, odds)
    val retrained = NgramLm.bigramCounts(evens)
    assert(retracted.exceptAll(retrained).count() === 0L &&
      retrained.exceptAll(retracted).count() === 0L, "retract diverged")
  }

  test("bigramCountsRetract raises on over-retraction") {
    val ref = Seq((1L, "a b c")).toDF("doc_id", "text")
    val once = NgramLm.bigramCountsRetract(
      NgramLm.bigramCounts(ref), ref).localCheckpoint(true)
    assert(once.count() === 0L, "retracting everything must empty the state")
    val ex = intercept[Exception] {
      NgramLm.bigramCountsRetract(once, ref).count()
    }
    assert(ex.getMessage.contains("negative") ||
      Option(ex.getCause).exists(_.getMessage.contains("negative")))
  }

  test("lmGate served from the cut table == windowed gate, zero-quota drops") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    // real docs plus ONE singleton source: at keepPermille=900 its
    // quota is floor(0.9·1)=0, so the windowed gate drops its doc,
    // the cut table emits no row for it, and the served form must
    // agree via the null-threshold branch
    val lone = Seq((990001L, "a perfectly ordinary sentence about " +
      "shipping manifests and freight schedules", "en", "srcLone",
      42L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val docs = t.documents.unionByName(lone).localCheckpoint(true)
    val ref = docs.filter($"source".isin("src0", "src1", "src2"))
      .localCheckpoint(true)
    val windowed = NgramLm.lmGate(ref, docs)
    val served = NgramLm.lmGateFrom(
      NgramLm.lmThresholds(ref, docs).localCheckpoint(true), ref, docs)
    assert(served.exceptAll(windowed).count() === 0L &&
      windowed.exceptAll(served).count() === 0L,
      "served verdicts must equal the windowed gate exactly")
    val loneRow = served.filter($"doc_id" === 990001L)
      .select("keep").as[Boolean].collect()
    assert(loneRow.toSeq === Seq(false),
      "a zero-quota source's doc must be scored but dropped")
    // the cut table carries no row for the zero-quota source
    assert(NgramLm.lmThresholds(ref, docs)
      .filter($"source" === "srcLone").count() === 0L)
  }

  test("score served from persisted artifacts == end-to-end") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val ref = t.documents.filter($"source".isin("src0", "src1", "src2"))
      .localCheckpoint(true)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lm-artifacts").toString
    val bi = NgramLm.bigramCounts(ref)
    bi.write.parquet(s"$dir/bi")
    val (uni, consts) = NgramLm.lmFromCounts(
      spark.read.parquet(s"$dir/bi"))
    uni.write.parquet(s"$dir/uni"); consts.write.parquet(s"$dir/consts")
    val served = NgramLm.lmScoreFrom(spark.read.parquet(s"$dir/bi"),
      spark.read.parquet(s"$dir/uni"), spark.read.parquet(s"$dir/consts"),
      t.documents)
    val direct = NgramLm.lmScore(ref, t.documents)
    assert(served.exceptAll(direct).count() === 0L &&
      direct.exceptAll(served).count() === 0L,
      "parquet round-trip must not change a single score")
  }
}
