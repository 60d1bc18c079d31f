package graft

import graft.operators.Unigram

/** Semantic tests of the unigram-LM (SentencePiece-style) tokenizer
  * trainer on planted fixtures: the q224/q225/q226 oracles pin engine
  * parity; these pin that the EM actually LEARNS — frequent multi-char
  * pieces win, Viterbi is exactly optimal, character coverage never
  * breaks, and training is shard-order-free.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "abab abab abab cdcd cdcd"),
    (2L, "abab cdcd abab abab x"),
    (3L, "abab abab cdcd zq zq zq"),
    (4L, "cdcd cdcd abab abab abab")
  ).toDF("doc_id", "text")

  test("viterbi: exactly optimal vs exhaustive enumeration, ties to longest") {
    val lnp = Map("a" -> -5000000L, "b" -> -5000000L, "ab" -> -3000000L,
      "ba" -> -3000000L, "abab" -> -2000000L, "aba" -> -2500000L)
    // all segmentations of "ababab" over the vocab, scored exhaustively
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(4, w.length)).flatMap { k =>
        val p = w.take(k)
        if (lnp.contains(p)) segs(w.drop(k)).map(p +: _) else Seq.empty
      }
    val w = "ababab"
    val best = segs(w).map(s => s.map(lnp).sum).max
    val got = Unigram.viterbi(w, lnp)
    // abab+ab and ab+abab tie at -5e6 (beating ab+ab+ab at -9e6); the
    // longest-LAST-piece backtrace rule picks ab|abab
    assert(got.mkString("|") === "ab|abab",
      "tied optimum must resolve to the longest last piece")
    assert(got.map(lnp).sum === best, "viterbi must reach the true optimum")
    // exact tie: "abab" vs "ab"+"ab" when abab scores like two abs —
    // backtrace must prefer the LONGEST last piece
    val tied = Map("ab" -> -1000000L, "abab" -> -2000000L,
      "a" -> -9000000L, "b" -> -9000000L)
    assert(Unigram.viterbi("abab", tied).mkString("|") === "abab",
      "score tie must resolve to the longest piece")
  }

  test("training learns the planted repeated pieces") {
    val table = Unigram.unigramTrain(docs)
      .as[(Long, String, Long, Long, Long)].collect()
    val byPiece = table.map(r => r._2 -> r).toMap
    // the planted dominant 4-gram must survive pruning and rank top
    assert(byPiece.contains("abab"), "dominant piece abab must be kept")
    assert(table.minBy(_._1)._2 === "abab",
      s"abab must rank first, got ${table.minBy(_._1)._2}")
    assert(byPiece.contains("cdcd"), "second planted piece kept")
    assert(byPiece("abab")._4 > byPiece("cdcd")._4,
      "counts must order by planted frequency")
    // character coverage: every character of the corpus stays in the
    // vocab even when the EM never uses it standalone
    val chars = docs.as[(Long, String)].collect()
      .flatMap(_._2.replace(" ", "")).toSet
    chars.foreach(c => assert(byPiece.contains(c.toString),
      s"char '$c' missing from the pruned vocab"))
    // ranks are a permutation 1..N
    assert(table.map(_._1).sorted.toSeq === (1L to table.length).toSeq)
  }

  test("segmentation counts: words segment into the learned pieces") {
    val trained = Unigram.unigramTrain(docs)
    val subs = Unigram.wordSubwordCounts(docs, trained)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(subs("abab") === 1L, "abab is one piece")
    assert(subs("cdcd") === 1L)
    assert(subs("x") === 1L)
    val tok = Unigram.tokenizeCorpus(docs, trained)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(tok(1L)._1 === 5L, "doc 1 has 5 whitespace words")
    assert(tok(1L)._2 === 5L, "all five words are single learned pieces")
  }

  test("long words fall back to single characters at apply time") {
    val withLong = docs.unionByName(
      Seq((9L, "abab supercalifragilistic")).toDF("doc_id", "text"))
    val trained = Unigram.unigramTrain(docs)
    val tok = Unigram.tokenizeCorpus(withLong, trained)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(tok(9L)._1 === 2L)
    assert(tok(9L)._2 === 1L + "supercalifragilistic".length,
      "a > maxWordLen word must price at its character count")
  }

  test("training is shard-order invariant") {
    val a = Unigram.unigramTrain(docs)
      .as[(Long, String, Long, Long, Long)].collect().sorted
    val b = Unigram.unigramTrain(docs.repartition(7))
      .as[(Long, String, Long, Long, Long)].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  test("loss-delta prune keeps the low-frequency/high-coverage piece") {
    // hand-verified under the Laplace micro-nat scores (T = 63,
    // V = 7): 'ab' (freq 10) costs 10·(lnp(ab) − lnp(a) − lnp(b)) =
    // 5,573,460 micro-nats to remove; 'cde' (freq 4, rare chars)
    // costs 4·(lnp(cde) − lnp(c) − lnp(d) − lnp(e)) = 23,790,180 —
    // FREQUENCY pruning at keepMulti = 1 keeps 'ab', the loss prune
    // must keep 'cde' (each use replaces three very-rare chars)
    val freq = Seq(("a", 20L), ("b", 20L), ("c", 3L), ("d", 3L),
      ("e", 3L), ("ab", 10L), ("cde", 4L)).toDF("piece", "freq")
    val kept = Unigram.pruneByLossDelta(freq, keepMulti = 1)
      .as[(String, Long)].collect().toMap
    assert(kept.keySet === Set("a", "b", "c", "d", "e", "cde"),
      s"loss prune must keep 'cde' over the more frequent 'ab': $kept")
  }

  test("real-fixture training: full vocab shape and exact char coverage") {
    val documents = graft.sources.Tables(spark, "/root/testdata/sf0.001")
      .documents
    val table = Unigram.unigramTrain(documents)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(table.nonEmpty)
    // pruned vocab = all corpus chars + at most 96 multi-char pieces
    val multi = table.filter(_._3 >= 2)
    assert(multi.length <= 96)
    assert(multi.nonEmpty, "a real corpus must yield multi-char pieces")
    // every eligible word must be coverable: re-segment the word table
    val counts = Unigram.wordSubwordCounts(documents, table.toSeq
        .map(r => (r._2, r._5)).toDF("piece", "lnp_micro"))
      .as[(String, Long, Long)].collect()
    assert(counts.forall(_._3 >= 1L), "every word segments")
  }
}
