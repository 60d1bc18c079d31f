package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" — public
  * literature): the tokenizer-TRAINING step the corpus pipeline feeds
  * ([[TextAnalysis.vocabulary]] sizes the vocab; this learns the
  * merges). Word-level BPE: the corpus is scanned ONCE into a
  * (word, count) table, and every merge iteration runs over that
  * vocab-sized table — the standard trainer shape, never a repeated
  * corpus pass.
  *
  * Determinism & parity: merge selection is totally ordered (count
  * desc, then pair lexicographic), the greedy left-to-right
  * application over repeated-symbol runs is the gaps-and-islands
  * even-offset rule, and every step is string/integer relational
  * algebra — the DuckDB oracle (q124) replays the whole training
  * bit-for-bit. No end-of-word marker: merges are intra-word
  * (documented simplification; add a sentinel symbol upstream if
  * word-boundary merges are wanted).
  *
  * Scale: the symbol table is Σ|word| rows over word TYPES (heavy-
  * tailed-small vs the corpus); pair counting map-side-combines to
  * (pairs) rows; each iteration's argmax is a 1-row driver collect
  * (the zipf.py pattern — inherently scalar); the rewrite windows
  * partition BY WORD, so the largest partition is one word's symbols.
  * Each iteration localCheckpoints the new symbol table: k bounded
  * materializations, no lineage tower.
  */
object Bpe {

  private def $(name: String): Column = col(name)

  /** (word, n): corpus word frequencies off one normalized scan. */
  def wordTable(documents: DataFrame): DataFrame =
    TextAnalysis.tokens(documents)
      .groupBy($("token"))
      .agg(count(lit(1)).cast("long").as("n"))
      .select($("token").as("word"), $("n"))

  /** (word, n, pos, sym): each word split into single-character
    * symbols, pos 1-based and contiguous.
    */
  def initialSymbols(words: DataFrame): DataFrame =
    words.select($("word"), $("n"),
      posexplode(transform(sequence(lit(1), length($("word"))),
        i => $("word").substr(i, lit(1)))).as(Seq("pos0", "sym")))
      .select($("word"), $("n"), ($("pos0") + 1).cast("long").as("pos"),
        $("sym"))

  /** Adjacent-pair frequencies over the current symbol table,
    * weighted by word count (overlapping pairs counted, the original
    * get_stats rule). Returns (a, b, cnt).
    */
  def pairCounts(syms: DataFrame): DataFrame = {
    val w = Window.partitionBy("word").orderBy("pos")
    syms.withColumn("b", lead($("sym"), 1).over(w))
      .filter($("b").isNotNull)
      .groupBy($("sym").as("a"), $("b"))
      .agg(sum($("n")).cast("long").as("cnt"))
  }

  /** One greedy merge of pair (a, b) across the symbol table.
    * Overlapping matches (only possible when a == b) resolve left to
    * right: within each island of consecutive match positions, the
    * even offsets merge — "aaaa" under (a,a) becomes "aa","aa".
    */
  def mergeOnce(syms: DataFrame, a: String, b: String): DataFrame = {
    val w = Window.partitionBy("word").orderBy("pos")
    val matches = syms.withColumn("nxt", lead($("sym"), 1).over(w))
      .filter($("sym") === a && $("nxt") === b)
      .select($("word"), $("pos"))
    val kept = matches
      .withColumn("prev", lag($("pos"), 1).over(w))
      .withColumn("isStart",
        when($("prev").isNull || $("pos") > $("prev") + 1, 1L).otherwise(0L))
      .withColumn("island", sum($("isStart")).over(w))
      .withColumn("ist",
        min($("pos")).over(Window.partitionBy("word", "island")))
      .filter((($("pos") - $("ist")) % 2) === 0)
      .select($("word"), $("pos"))
    val consumed = kept.select($("word"), ($("pos") + 1).as("pos"),
      lit(1L).as("gone"))
    syms
      .join(kept.withColumn("hit", lit(1L)), Seq("word", "pos"), "left")
      .join(consumed, Seq("word", "pos"), "left")
      .filter($("gone").isNull)
      .select($("word"), $("n"), $("pos").as("opos"),
        when($("hit").isNotNull, concat($("sym"), lit(b)))
          .otherwise($("sym")).as("sym"))
      .withColumn("pos",
        row_number().over(Window.partitionBy("word").orderBy("opos"))
          .cast("long"))
      .select($("word"), $("n"), $("pos"), $("sym"))
  }

  /** Train `merges` BPE merges: returns (rank, lhs, rhs, pair_count)
    * — the merge table a tokenizer ships. Stops early if the corpus
    * runs out of adjacent pairs.
    */
  def bpeTrain(documents: DataFrame, merges: Int = 6): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    var syms = initialSymbols(wordTable(documents)).localCheckpoint(true)
    val out = collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= merges && !exhausted) {
      val top = pairCounts(syms)
        .orderBy($("cnt").desc, $("a").asc, $("b").asc)
        .limit(1).as[(String, String, Long)].collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = top.head
        out += ((r.toLong, a, b, c))
        val next = mergeOnce(syms, a, b).localCheckpoint(true)
        syms.unpersist(false)
        syms = next
        r += 1
      }
    }
    syms.unpersist(false)
    out.toSeq.toDF("rank", "lhs", "rhs", "pair_count")
  }

  /** Symbol table after replaying a merge list in rank order —
    * (word, n, pos, sym), the apply side of [[bpeTrain]] in its
    * oracle-comparable exploded form (q125).
    *
    * Each round materializes (localCheckpoint) before the next —
    * [[mergeOnce]] references its input ~3× (match scan, kept join,
    * consumed join), so an unmaterialized k-merge replay re-expands
    * the base plan ~3^k times: the Spark-side twin of the DuckDB
    * CTE-inlining blowup the q124 oracle pins with MATERIALIZED
    * (measured: 62 s → ~3 s at sf0.1 for the 6-merge replay).
    */
  def segmentSymbols(documents: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    var syms = initialSymbols(wordTable(documents)).localCheckpoint(true)
    merges.foreach { case (a, b) =>
      val next = mergeOnce(syms, a, b).localCheckpoint(true)
      syms.unpersist(false)
      syms = next
    }
    syms
  }

  /** Segment every vocabulary word with a trained merge table: the
    * apply side of [[bpeTrain]] — (word, n, subwords array) after
    * replaying the merges in rank order. The lookup a tokenizer
    * runtime precomputes for its whole vocabulary.
    */
  def segment(documents: DataFrame, merges: Seq[(String, String)]): DataFrame =
    segmentSymbols(documents, merges)
      .groupBy($("word"), $("n"))
      .agg(transform(array_sort(collect_list(struct($("pos"), $("sym")))),
        x => x("sym")).as("subwords"))

  /** Tokenize the CORPUS under a trained merge table: per document,
    * whitespace word count and total subword count after BPE — the
    * number that actually prices a training run (token budgets, pack
    * bins, context-length fits are all in SUBWORDS, not words).
    *
    * Scale: the per-word subword table is vocabulary-sized and joins
    * BROADCAST against the corpus token stream — the canonical
    * model/data split (segment the vocab once, never re-segment per
    * occurrence); the per-doc aggregate partial-combines map-side.
    * Every corpus token hits the vocab by construction (the vocab was
    * built from this corpus); for tokenizing FOREIGN text against a
    * shipped vocab, left-join and count misses as OOV upstream.
    */
  def tokenizeCorpus(documents: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val sw = segmentSymbols(documents, merges)
      .groupBy($("word"))
      .agg(count(lit(1)).cast("long").as("n_sub"))
    TextAnalysis.tokens(documents)
      .join(broadcast(sw), $("token") === $("word"))
      .groupBy($("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum($("n_sub")).cast("long").as("n_subwords"))
  }
}
