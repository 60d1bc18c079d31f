package graft

import graft.operators.Bpe

/** Semantic pins for the BPE trainer (the DuckDB oracle q124 checks
  * engine parity; these check the algorithm's rules on planted
  * fixtures: overlap-counting, greedy left-to-right runs, iterative
  * merge-of-merges, lossless segmentation).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("pair counts include overlapping pairs; greedy merge keeps even offsets") {
    val syms = Bpe.initialSymbols(Bpe.wordTable(docsOf("aaaa")))
    val pc = Bpe.pairCounts(syms).as[(String, String, Long)].collect()
    assert(pc.toSet === Set(("a", "a", 3L)),
      "aaaa has three overlapping (a,a) pairs (the get_stats rule)")
    val merged = Bpe.mergeOnce(syms, "a", "a")
      .orderBy("pos").as[(String, Long, Long, String)].collect()
    assert(merged.map(_._4).toSeq === Seq("aa", "aa"),
      "greedy left-to-right: aaaa -> aa|aa, never a|aa|a")
    assert(merged.map(_._3).toSeq === Seq(1L, 2L), "positions renumber contiguously")
  }

  test("odd-length run merges floor(k/2) times and keeps the tail symbol") {
    val syms = Bpe.initialSymbols(Bpe.wordTable(docsOf("aaaaa")))
    val merged = Bpe.mergeOnce(syms, "a", "a")
      .orderBy("pos").as[(String, Long, Long, String)].collect()
    assert(merged.map(_._4).toSeq === Seq("aa", "aa", "a"))
  }

  test("training is iterative: later merges build on earlier products") {
    // 'ab' dominates, then the merged 'ab' pairs with 'c'
    val docs = docsOf("abc abc abc abc", "abd abd abd", "xy")
    val m = Bpe.bpeTrain(docs, merges = 2)
      .orderBy("rank").as[(Long, String, String, Long)].collect()
    assert(m(0)._2 === "a" && m(0)._3 === "b" && m(0)._4 === 7L,
      s"first merge must be (a,b) across both words: ${m.toSeq}")
    assert(m(1)._2 === "ab" && m(1)._4 === 4L,
      s"second merge must consume the FIRST merge's product: ${m.toSeq}")
  }

  test("tie-break is lexicographic on the pair") {
    // 'ab' and 'cd' both appear exactly twice -> (a,b) wins the tie
    val m = Bpe.bpeTrain(docsOf("ab cd", "ab cd"), merges = 1)
      .as[(Long, String, String, Long)].collect()
    assert(m.head._2 === "a" && m.head._3 === "b")
  }

  test("segmentation with trained merges reassembles every word losslessly") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val merges = Bpe.bpeTrain(docs, merges = 4)
      .orderBy("rank").as[(Long, String, String, Long)].collect()
      .map(r => (r._2, r._3)).toSeq
    assert(merges.length === 4)
    val seg = Bpe.segment(docs, merges)
      .as[(String, Long, Seq[String])].collect()
    assert(seg.nonEmpty)
    seg.foreach { case (word, _, subwords) =>
      assert(subwords.mkString === word,
        s"subwords must concatenate back to '$word', got $subwords")
    }
    // the trained merges actually compress: some word uses a multi-char subword
    assert(seg.exists(_._3.exists(_.length > 1)),
      "at least one word must contain a merged subword")
  }

  test("batched training is bit-identical to one-merge-per-round greedy") {
    // the batch-acceptance proof (disjointness + new-pair bound +
    // product-alias close) must make batchM>1 indistinguishable from
    // the sequential algorithm the q124 oracle replays — on the real
    // fixture AND on a corpus engineered so batches actually form
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val seqn = Bpe.bpeTrain(docs, merges = 6, batchM = 1)
      .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
    val bat = Bpe.bpeTrain(docs, merges = 6, batchM = 8)
      .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
    assert(bat === seqn, "batched selection diverged from sequential greedy")
    // planted: 4 disjoint dominant pairs with distinct counts batch in
    // one round; the 5th merge consumes a product (dependency)
    val planted = docsOf(
      Seq.fill(9)("ab").mkString(" "), Seq.fill(8)("cd").mkString(" "),
      Seq.fill(7)("ef").mkString(" "), Seq.fill(6)("gh").mkString(" "),
      Seq.fill(5)("abcd").mkString(" "))
    val ps = Bpe.bpeTrain(planted, merges = 5, batchM = 1)
      .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
    val pb = Bpe.bpeTrain(planted, merges = 5, batchM = 8)
      .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
    assert(pb === ps, s"planted corpus diverged: seq=$ps batched=$pb")
  }

  test("replayBatches groups independent merges, splits at dependencies") {
    val batches = Bpe.replayBatches(Seq(
      ("a", "b"), ("c", "d"),   // independent -> one batch
      ("ab", "c"),              // consumes batch-mate 'ab' product? no —
                                // 'ab' product came from an EARLIER batch
      ("ab", "d")))             // shares 'ab' with previous -> splits
    assert(batches === Seq(
      Seq(("a", "b"), ("c", "d")),
      Seq(("ab", "c")),
      Seq(("ab", "d"))))
    // a merge consuming an in-batch product must start a new batch
    assert(Bpe.replayBatches(Seq(("a", "b"), ("ab", "c"))) ===
      Seq(Seq(("a", "b")), Seq(("ab", "c"))))
    // batched replay equals sequential replay on the fixture
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val merges = Bpe.bpeTrain(docs, merges = 6)
      .orderBy("rank").as[(Long, String, String, Long)].collect()
      .map(r => (r._2, r._3)).toSeq
    val got = Bpe.segmentSymbols(docs, merges)
      .as[(String, Long, Long, String)].collect().toSet
    var syms = Bpe.initialSymbols(Bpe.wordTable(docs))
    merges.foreach { case (a, b) => syms = Bpe.mergeOnce(syms, a, b).localCheckpoint(true) }
    val want = syms.as[(String, Long, Long, String)].collect().toSet
    assert(got === want, "batched replay must equal merge-at-a-time replay")
  }

  test("tokenizeCorpus prices documents in subwords, merges compress") {
    val docs = Seq((1L, "ab ab c"), (2L, "c ab")).toDF("doc_id", "text")
    // no merges: every char is a subword
    val plain = Bpe.tokenizeCorpus(docs, Nil)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(plain === Map(1L -> ((3L, 5L)), 2L -> ((2L, 3L))))
    // merge (a,b): "ab" collapses to one subword everywhere it occurs
    val merged = Bpe.tokenizeCorpus(docs, Seq(("a", "b")))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(merged === Map(1L -> ((3L, 3L)), 2L -> ((2L, 2L))))
  }
}
