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
  * (pairs) rows; merge selection is BATCHED (one ranked collect per
  * round accepts up to `batchM` provably-sequential-equal merges —
  * see [[bpeTrain]]), so driver rounds are O(merges / batch); the
  * rewrite windows partition BY WORD, so the largest partition is one
  * word's symbols. Each round [[cut]]s the new symbol table
  * (localCheckpoint + stats reset): bounded materializations, no
  * lineage tower, no compounding size estimates.
  */
object Bpe {

  private def $(name: String): Column = col(name)

  /** Materialize one round's table AND reset its carried statistics:
    * localCheckpoint alone keeps the origin plan's size estimate,
    * which compounds through each round's join products until the
    * optimizer stalls in BigInteger stats arithmetic (measured at
    * merges=64; see ColumnBridge.freshStatsView). Every round
    * boundary in this file goes through here.
    */
  private def cut(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.ColumnBridge.freshStatsView(
      df.localCheckpoint(true))

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

  /** One greedy merge of pair (a, b) across the symbol table —
    * [[mergeBatch]] with a single pair. Overlapping matches (only
    * possible when a == b) resolve left to right: within each island
    * of consecutive match positions, the even offsets merge — "aaaa"
    * under (a,a) becomes "aa","aa".
    */
  def mergeOnce(syms: DataFrame, a: String, b: String): DataFrame =
    mergeBatch(syms, Seq((a, b)))

  /** SIMULTANEOUS application of a set of pairwise symbol-disjoint
    * merges in one pass — the O(merges) → O(merges/M) driver-loop
    * collapse. With `{a_i, b_i}` pairwise disjoint, no merge can
    * create, destroy, or consume another's matches (a new adjacency
    * would need a shared symbol), so one simultaneous pass is
    * bit-identical to applying the pairs sequentially in any order;
    * consecutive match positions can only belong to one SELF-pair
    * (pos p and p+1 both matching forces sym(p+1) to be a right AND a
    * left symbol — disjointness leaves only a == b), so the
    * even-offset island rule carries over unchanged.
    *
    * Callers are responsible for BATCH VALIDITY (disjointness is
    * asserted; the selection-order conditions live in [[bpeTrain]] /
    * [[segmentSymbols]]).
    */
  def mergeBatch(syms: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "empty merge batch")
    val sets = pairs.map(p => Set(p._1, p._2))
    for (i <- sets.indices; j <- 0 until i)
      require((sets(i) intersect sets(j)).isEmpty,
        s"batch pairs ${pairs(j)} and ${pairs(i)} share a symbol")
    val spark = syms.sparkSession
    import spark.implicits._
    val pdf = broadcast(pairs.toDF("ma", "mb"))
    val w = Window.partitionBy("word").orderBy("pos")
    val matches = syms.withColumn("nxt", lead($("sym"), 1).over(w))
      .join(pdf, $("sym") === $("ma") && $("nxt") === $("mb"))
      .select($("word"), $("pos"), $("nxt"))
    val kept = matches
      .withColumn("prev", lag($("pos"), 1).over(w))
      .withColumn("isStart",
        when($("prev").isNull || $("pos") > $("prev") + 1, 1L).otherwise(0L))
      .withColumn("island", sum($("isStart")).over(w))
      .withColumn("ist",
        min($("pos")).over(Window.partitionBy("word", "island")))
      .filter((($("pos") - $("ist")) % 2) === 0)
      .select($("word"), $("pos"), $("nxt"))
    val consumed = kept.select($("word"), ($("pos") + 1).as("pos"),
      lit(1L).as("gone"))
    syms
      .join(kept.withColumn("hit", lit(1L))
        .select($("word"), $("pos"), $("hit"), $("nxt")),
        Seq("word", "pos"), "left")
      .join(consumed, Seq("word", "pos"), "left")
      .filter($("gone").isNull)
      .select($("word"), $("n"), $("pos").as("opos"),
        when($("hit").isNotNull, concat($("sym"), $("nxt")))
          .otherwise($("sym")).as("sym"))
      .withColumn("pos",
        row_number().over(Window.partitionBy("word").orderBy("opos"))
          .cast("long"))
      .select($("word"), $("n"), $("pos"), $("sym"))
  }

  /** Train `merges` BPE merges: returns (rank, lhs, rhs, pair_count)
    * — the merge table a tokenizer ships. Stops early if the corpus
    * runs out of adjacent pairs.
    *
    * BATCHED selection (default `batchM = 8`): each Spark round ranks
    * the pair counts once, then the driver accepts the longest prefix
    * of the (cnt desc, a, b) order that is PROVABLY what sequential
    * greedy would pick — so the output is bit-for-bit identical to
    * one-merge-per-round training (the q124 oracle replays the
    * sequential algorithm and stays green) while the driver loop runs
    * O(merges / batch) Spark rounds instead of O(merges): the wall
    * fix for a real tokenizer's 32k merges, where one collect +
    * checkpoint per merge is a driver-side bottleneck.
    *
    * A ranked candidate extends the batch iff sequential greedy could
    * not have chosen differently at its turn:
    *  1. its symbols are disjoint from every accepted pair's — an
    *     accepted merge only changes counts of pairs sharing one of
    *     its symbols, so this candidate's own count is still exact;
    *  2. its count strictly exceeds every accepted pair's new-pair
    *     bound B = max(max_x cnt(x, lhs), max_y cnt(rhs, y)) — a
    *     merge's NEW pairs (x·lhsrhs / lhsrhs·y) inherit at most the
    *     adjacent old counts, so nothing new can outrank it;
    *  3. no accepted pair's product string aliases an existing symbol
    *     (symbols only ever arise as merge products, so the driver
    *     knows them all): an aliased product would ADD instances to
    *     existing pairs, invalidating bound 2 — the batch closes
    *     after such a merge instead.
    */
  def bpeTrain(documents: DataFrame, merges: Int = 6,
      batchM: Int = 8): DataFrame = {
    require(batchM >= 1, s"batchM=$batchM must be >= 1")
    val spark = documents.sparkSession
    import spark.implicits._
    var syms = cut(initialSymbols(wordTable(documents)))
    val out = collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    val products = collection.mutable.Set.empty[String]
    var exhausted = false
    while (out.size < merges && !exhausted) {
      val counts = cut(pairCounts(syms))
      val inMax = counts.groupBy($("b").as("ia"))
        .agg(max($("cnt")).as("in_max"))
      val outMax = counts.groupBy($("a").as("ob"))
        .agg(max($("cnt")).as("out_max"))
      val cand = counts
        .orderBy($("cnt").desc, $("a").asc, $("b").asc)
        .limit(batchM)
        .join(inMax, $("a") === $("ia"), "left")
        .join(outMax, $("b") === $("ob"), "left")
        .select($("a"), $("b"), $("cnt"), $("in_max"), $("out_max"))
        .as[(String, String, Long, Option[Long], Option[Long])]
        .collect().sortBy(c => (-c._3, c._1, c._2))
      counts.unpersist(false)
      if (cand.isEmpty) exhausted = true
      else {
        val batch = collection.mutable.ArrayBuffer.empty[(String, String)]
        var used = Set.empty[String]
        var maxB = Long.MinValue
        var open = true
        for (c <- cand if open && out.size < merges) {
          val (a, b, cnt, inMaxA, outMaxB) = c
          val ok = batch.isEmpty ||
            (!used.contains(a) && !used.contains(b) && cnt > maxB)
          if (!ok) open = false
          else {
            out += ((out.size + 1L, a, b, cnt))
            batch += ((a, b))
            used = used + a + b
            maxB = math.max(maxB, math.max(
              inMaxA.getOrElse(Long.MinValue),
              outMaxB.getOrElse(Long.MinValue)))
            if (products.contains(a + b)) open = false
            products += (a + b)
          }
        }
        val next = cut(mergeBatch(syms, batch.toSeq))
        syms.unpersist(false)
        syms = next
      }
    }
    syms.unpersist(false)
    out.toSeq.toDF("rank", "lhs", "rhs", "pair_count")
  }

  /** Greedy grouping of an ordered merge list into maximal
    * consecutive runs that [[mergeBatch]] may apply simultaneously
    * without changing the sequential result: members must be pairwise
    * symbol-disjoint, and no member's lhs/rhs may equal an earlier
    * batch member's product (the later merge would consume symbols
    * the earlier one is only now creating — a true dependency, which
    * string equality detects even when the product aliases an older
    * symbol).
    */
  private[graft] def replayBatches(
      merges: Seq[(String, String)]): Seq[Seq[(String, String)]] = {
    val batches = collection.mutable.ArrayBuffer.empty[Seq[(String, String)]]
    val cur = collection.mutable.ArrayBuffer.empty[(String, String)]
    var used = Set.empty[String]
    var prods = Set.empty[String]
    def flush(): Unit = if (cur.nonEmpty) {
      batches += cur.toSeq; cur.clear(); used = Set.empty; prods = Set.empty
    }
    merges.foreach { case (a, b) =>
      if (used.contains(a) || used.contains(b) ||
        prods.contains(a) || prods.contains(b)) flush()
      cur += ((a, b)); used = used + a + b; prods = prods + (a + b)
    }
    flush()
    batches.toSeq
  }

  /** Symbol table after replaying a merge list in rank order —
    * (word, n, pos, sym), the apply side of [[bpeTrain]] in its
    * oracle-comparable exploded form (q125). Consecutive independent
    * merges apply as ONE [[mergeBatch]] pass ([[replayBatches]]), so
    * the replay runs O(merges / batch) Spark rounds like the trainer.
    *
    * Each batch materializes (localCheckpoint) before the next —
    * [[mergeBatch]] references its input ~3× (match scan, kept join,
    * consumed join), so an unmaterialized k-round replay re-expands
    * the base plan ~3^k times: the Spark-side twin of the DuckDB
    * CTE-inlining blowup the q124 oracle pins with MATERIALIZED
    * (measured: 62 s → ~3 s at sf0.1 for the 6-merge replay).
    */
  def segmentSymbols(documents: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    var syms = cut(initialSymbols(wordTable(documents)))
    replayBatches(merges).foreach { batch =>
      val next = cut(mergeBatch(syms, batch))
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
