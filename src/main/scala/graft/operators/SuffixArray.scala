package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.OrderedOut.SmallOrderOps

/** EXACT substring-duplication analysis via a distributed suffix
  * array — the exactness completion of the fixed-k rolling-window
  * span dedup ([[SubstringDedup]]): where the window index detects
  * repeats of one fixed length k, the suffix array + LCP array
  * surface MAXIMAL repeated token spans of ANY length, the structure
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language
  * Models Better" — public literature) build their exact
  * substring-dedup on.
  *
  * Construction is token-level PREFIX DOUBLING (Manber–Myers, the
  * standard distributed suffix-sort: Flick & Aluru 2015 describe the
  * same shape for MPI — public literature): suffixes live WITHIN a
  * document (the corpus-concatenation separators of the paper are
  * exactly doc boundaries), rank 0 is the dense rank of the first
  * token, and level m re-ranks by the pair (rank_m at pos, rank_m at
  * pos + 2^m, −1 beyond the doc end) until 2^m covers the longest
  * document. The suffix ARRAY is the total order (final rank,
  * doc_id, pos); the LCP between order-adjacent suffixes descends
  * the SAME doubling tables (add 2^m when the level-m ranks at the
  * current offset agree), so every number is exact integer
  * comparison — no hashing, no probabilistic anything — and the
  * DuckDB oracle replays construction and LCP bit-for-bit (q230).
  *
  * Scale: each doubling level is one equi-join (suffix table against
  * itself shifted) plus one distributed dense rank — log(maxDocLen)
  * corpus-sized shuffles, the textbook suffix-array cost. Dense
  * ranking and the final array order use sort + zipWithIndex
  * (range-partitioned global sort, per-partition offset scan) —
  * NEVER a global single-partition window. The LCP descent is
  * log(maxDocLen) equi-joins over the ADJACENT-PAIR table (n rows).
  */
object SuffixArray {

  private def $(name: String): Column = col(name)

  /** (doc_id, pos, token): 1-based token positions of the normalized
    * text — the suffix universe (empty docs contribute nothing).
    */
  def tokenPositions(documents: DataFrame): DataFrame =
    documents.spread()
      .select($("doc_id"),
        posexplode(split(TextAnalysis.normText($("text")), " "))
          .as(Seq("p0", "token")))
      .filter(length($("token")) > 0)
      .select($("doc_id"), ($("p0") + 1).cast("long").as("pos"), $("token"))

  /** Order-preserving DENSE rank (1-based) of the distinct values of
    * `keys`: global range-partitioned sort + zipWithIndex — the
    * distributed ranking shape (contiguous ids, no single-partition
    * exchange). Returns the distinct keys with an extra `rankCol`.
    */
  private def denseRankOf(df: DataFrame, keys: Seq[String],
      rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val distinct = df.select(keys.map(col): _*).distinct()
      .orderBy(keys.map(col(_).asc): _*)
    val schema = StructType(distinct.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    val ranked = distinct.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L)) }
    spark.createDataFrame(ranked, schema)
  }

  /** Doubling levels beyond this cover prefixes longer than
    * 2^MaxDoubling = 128 tokens. Suffix comparison is EXACT for
    * documents up to 128 tokens (every fixture's bound); past-end
    * positions rank as −1, so levels past a corpus's longest doc are
    * provably no-ops — which is what lets both engines unroll the
    * SAME fixed count with no data-dependence. Raise in lockstep with
    * the oracle for longer-document corpora.
    */
  val MaxDoubling = 7

  /** All prefix-doubling levels: element m of the result holds
    * (doc_id, pos, r) where r is the dense rank of the length-2^m
    * prefix of the suffix at (doc_id, pos) (−1-padded past the doc
    * end). Exactly [[MaxDoubling]]+1 levels. Levels are
    * localCheckpointed — the LCP descent re-reads every one.
    */
  private[operators] def doublingLevels(
      positions: DataFrame): Seq[DataFrame] = {
    val r0 = positions
      .join(denseRankOf(positions, Seq("token"), "r"), Seq("token"))
      .select($("doc_id"), $("pos"), $("r"))
      .localCheckpoint(true)
    val levels = collection.mutable.ArrayBuffer(r0)
    for (m <- 1 to MaxDoubling) {
      val shift = 1L << (m - 1)
      val cur = levels.last
      val shifted = cur.select($("doc_id"),
        ($("pos") - shift).as("pos"), $("r").as("r2"))
      val paired = cur.join(shifted, Seq("doc_id", "pos"), "left")
        .na.fill(-1L, Seq("r2"))
      val rk = denseRankOf(paired, Seq("r", "r2"), "rn")
      levels += paired.join(rk, Seq("r", "r2"))
        .select($("doc_id"), $("pos"), $("rn").as("r"))
        .localCheckpoint(true)
    }
    levels.toSeq
  }

  /** The suffix array with its LCP array: (idx, doc_id, pos,
    * lcp_prev) — idx is the suffix's 1-based position in (final
    * rank, doc_id, pos) order and lcp_prev the exact longest common
    * token prefix with the suffix at idx−1 (0 at idx = 1). The two
    * classic arrays, relationally.
    */
  def suffixArrayWithLcp(documents: DataFrame): DataFrame = {
    val positions = tokenPositions(documents).localCheckpoint(true)
    val levels = doublingLevels(positions)
    val last = levels.last
    val saSorted = last.orderBy($("r").asc, $("doc_id").asc, $("pos").asc)
    val spark = documents.sparkSession
    val saSchema = StructType(
      StructField("idx", LongType, nullable = false) +:
        saSorted.schema.fields.toIndexedSeq)
    val sa = spark.createDataFrame(
        saSorted.rdd.zipWithIndex().map { case (row, i) =>
          Row.fromSeq((i + 1L) +: row.toSeq) }, saSchema)
      .select($("idx"), $("doc_id"), $("pos"))
      .localCheckpoint(true)
    // adjacent pairs in suffix order; LCP by descending the levels
    var pairs = sa
      .join(sa.select(($("idx") - 1).as("idx"), $("doc_id").as("b_doc"),
        $("pos").as("b_pos")), Seq("idx"))
      .select($("idx"), $("doc_id").as("a_doc"), $("pos").as("a_pos"),
        $("b_doc"), $("b_pos"), lit(0L).as("l"))
    for (m <- levels.indices.reverse) {
      val shift = 1L << m
      val ra = levels(m).select($("doc_id").as("a_doc"),
        $("pos").as("a_at"), $("r").as("ra"))
      val rb = levels(m).select($("doc_id").as("b_doc"),
        $("pos").as("b_at"), $("r").as("rb"))
      pairs = pairs
        .withColumn("a_at", $("a_pos") + $("l"))
        .withColumn("b_at", $("b_pos") + $("l"))
        .join(ra, Seq("a_doc", "a_at"), "left")
        .join(rb, Seq("b_doc", "b_at"), "left")
        // a missing rank means the suffix has ended — distinct
        // sentinels so ended sides can never extend the match
        .withColumn("l",
          when(coalesce($("ra"), lit(-1L)) === coalesce($("rb"), lit(-2L)),
            $("l") + shift).otherwise($("l")))
        .select($("idx"), $("a_doc"), $("a_pos"), $("b_doc"), $("b_pos"),
          $("l"))
        .localCheckpoint(true)
    }
    // clamp to the shorter remaining suffix: identical-to-end
    // suffixes match through their −1 padding at every level, so the
    // descent's sum can exceed the true common length — the true LCP
    // of padded-equal suffixes is exactly the shorter remainder
    val lens = positions.groupBy($("doc_id"))
      .agg(count(lit(1)).cast("long").as("n")).localCheckpoint(true)
    val clamped = pairs
      .join(lens.select($("doc_id").as("a_doc"), $("n").as("a_n")),
        Seq("a_doc"))
      .join(lens.select($("doc_id").as("b_doc"), $("n").as("b_n")),
        Seq("b_doc"))
      .select($("idx"), least($("l"), $("a_n") - $("a_pos") + 1,
        $("b_n") - $("b_pos") + 1).as("l"))
    // lcp_prev keyed on the HIGHER index: row idx+1 carries the lcp
    // between suffixes idx and idx+1
    sa.join(clamped.select(($("idx") + 1).as("idx"), $("l").as("lcp_prev")),
        Seq("idx"), "left")
      .na.fill(0L, Seq("lcp_prev"))
      .select($("idx"), $("doc_id"), $("pos"), $("lcp_prev"))
  }

  /** Maximal repeated token spans of length ≥ `minLen`: every
    * adjacent suffix pair whose exact LCP clears the threshold —
    * (doc1, pos1, doc2, pos2, lcp), the raw exact-repeat table the
    * window index only approximates at its fixed k. A span repeated
    * r times appears r−1 times here (its suffixes are consecutive in
    * the array) — pair-linear, never group-quadratic.
    */
  def repeatedSpans(documents: DataFrame, minLen: Long = 5L): DataFrame =
    repeatedSpansFromLcp(
      suffixArrayWithLcp(documents).localCheckpoint(true), minLen)

  /** [[repeatedSpans]] off a PERSISTED [[suffixArrayWithLcp]] table —
    * the production path: build the arrays once per corpus version,
    * and every repeat consumer pays one lcp-filtered self-join of the
    * artifact (the *From discipline of the pair-graph family).
    */
  def repeatedSpansFromLcp(withLcp: DataFrame,
      minLen: Long = 5L): DataFrame = {
    require(minLen >= 1, s"minLen=$minLen must be >= 1")
    val prev = withLcp.select(($("idx") + 1).as("idx"),
      $("doc_id").as("doc1"), $("pos").as("pos1"))
    withLcp.filter($("lcp_prev") >= minLen)
      .join(prev, Seq("idx"))
      .select($("doc1"), $("pos1"), $("doc_id").as("doc2"),
        $("pos").as("pos2"), $("lcp_prev").as("lcp"))
  }

  /** Per-document exact-duplication diagnosis off the LCP array:
    * a suffix's longest common prefix with ANY other suffix equals
    * the max of its two ADJACENT LCPs (the classic LCP-array
    * property), so (doc_id, n_tokens, n_dup_pos, max_lcp) counts
    * positions whose suffix shares ≥ `minLen` tokens with somewhere
    * else in the corpus — the exact-maximal sibling of the
    * fixed-k dup_fraction profile (q111).
    */
  def docRepeatProfile(documents: DataFrame,
      minLen: Long = 5L): DataFrame =
    docRepeatProfileFromLcp(
      suffixArrayWithLcp(documents).localCheckpoint(true), minLen)

  /** [[docRepeatProfile]] off a persisted array table — see
    * [[repeatedSpansFromLcp]].
    */
  def docRepeatProfileFromLcp(withLcp: DataFrame,
      minLen: Long = 5L): DataFrame = {
    require(minLen >= 1, s"minLen=$minLen must be >= 1")
    val nextLcp = withLcp.select(($("idx") - 1).as("idx"),
      $("lcp_prev").as("lcp_next"))
    withLcp.join(nextLcp, Seq("idx"), "left")
      .na.fill(0L, Seq("lcp_next"))
      .select($("doc_id"),
        greatest($("lcp_prev"), $("lcp_next")).as("best"))
      .groupBy($("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(when($("best") >= minLen, 1L).otherwise(0L)).cast("long")
          .as("n_dup_pos"),
        max($("best")).cast("long").as("max_lcp"))
  }
}
