package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training (Kudo 2018, "Subword
  * Regularization" — the SentencePiece unigram model; public
  * literature): the EM alternative to [[Bpe]], closing the second
  * half of the public tokenizer-training surface. Seed vocabulary =
  * frequent substrings, E-step = Viterbi segmentation of the word
  * table under the current piece log-probabilities, M-step = count
  * re-estimation from the Viterbi paths, then a frequency prune to
  * the target vocab and one final E-step under the pruned scores.
  *
  * Exactness discipline (the NB/LM family): every log-probability is
  * `floor(1e6 · ln((c + 1) / (T + V)))` — an integer micro-nat with
  * NB's Laplace smoothing (so zero-count pieces, including required
  * single characters, keep a finite score and character coverage
  * never breaks). Viterbi compares exact INTEGER score sums, ties in
  * the backtrace resolve to the LONGEST last piece — total orders
  * both engines replay bit-for-bit, so the DuckDB oracle (q225)
  * re-runs the whole EM from the same seed and hash-matches.
  *
  * Simplifications vs full SentencePiece (documented contract):
  * hard-EM (Viterbi counts, not forward-backward expectations),
  * LOSS-DELTA pruning with the single-character fallback as the
  * alternative segmentation (Kudo prunes by likelihood-loss
  * contribution; re-segmenting every affected word per candidate
  * piece is quadratic, and the character fallback — always legal,
  * since single characters are never pruned — upper-bounds the true
  * loss: delta = freq · (lnp(piece) − Σ lnp(char)), see
  * [[pruneByLossDelta]]), word-level training (the [[Bpe]]
  * word-table shape), and words longer than `maxWordLen` are
  * excluded from training and segment as single characters at apply
  * time ([[tokenizeCorpus]]).
  *
  * Scale: one corpus scan builds the word table (word TYPES —
  * heavy-tailed-small vs the corpus); seeding explodes ≤ maxPieceLen
  * substrings per word-char (vocab-sized × small constant); every
  * E-step is ONE mapPartitions pass over the word table with the
  * piece scores riding as a broadcast-sized local map (the model/
  * data split — scores are `seedSize`-bounded by construction, the
  * [[Similarity]] centroid-localize discipline); counts aggregate
  * map-side. Driver rounds = emIters + 1, independent of corpus
  * size.
  */
object Unigram {

  private def $(name: String): Column = col(name)

  val MaxPieceLen = 4
  val MaxWordLen = 12

  /** (word, n) corpus word frequencies, training-eligible words only
    * (length ≤ [[MaxWordLen]]).
    */
  def wordTable(documents: DataFrame): DataFrame =
    Bpe.wordTable(documents).filter(length($("word")) <= MaxWordLen)

  /** Seed vocabulary: every substring of length 1..[[MaxPieceLen]]
    * of every eligible word, occurrence-weighted by word count
    * (overlapping occurrences count — the raw substring frequency).
    * ALL single characters are kept (coverage); multi-char pieces
    * need `minFreq` occurrences and the top `seedMulti` survive by
    * (freq desc, piece asc). Returns (piece, freq).
    */
  def seedPieces(words: DataFrame, minFreq: Long = 2L,
      seedMulti: Int = 384): DataFrame = {
    val subs = words
      .select($("word"), $("n"), explode(sequence(lit(1), length($("word"))))
        .as("i"))
      .select($("word"), $("n"), $("i"),
        explode(sequence(lit(1), least(lit(MaxPieceLen),
          length($("word")) - $("i") + 1))).as("l"))
      .select($("n"), $("word").substr($("i"), $("l")).as("piece"))
    val freq = subs.groupBy($("piece"))
      .agg(sum($("n")).cast("long").as("freq"))
    val chars = freq.filter(length($("piece")) === 1)
    val multi = freq.filter(length($("piece")) >= 2)
      .filter($("freq") >= minFreq)
      .orderBy($("freq").desc, $("piece").asc)
      .limit(seedMulti)
    chars.unionByName(multi)
  }

  /** Piece scores under NB-style Laplace smoothing over the CURRENT
    * vocab: lnp_micro = floor(1e6 · ln((c + 1) / (T + V))), T = Σ c,
    * V = vocab size. The ln runs in Spark SQL (not driver code) so
    * the floor matches the DuckDB oracle the same way the NB/LM
    * family's does. Input (piece, freq); output (piece, c, lnp).
    */
  private[operators] def scoresOf(freq: DataFrame): DataFrame = {
    val tot = freq.agg(sum($("freq")).cast("long").as("tot"),
      count(lit(1)).cast("long").as("nv"))
    freq.crossJoin(broadcast(tot))
      .select($("piece"), $("freq").as("c"),
        floor(lit(1000000.0) * log(($("freq") + 1).cast("double") /
          ($("tot") + $("nv")).cast("double"))).cast("long").as("lnp"))
  }

  /** Exact Viterbi segmentation of one word under a local score map:
    * dp(j) = max over k ≤ MaxPieceLen of dp(j−k) + lnp(word[j−k, j));
    * backtrace prefers the LONGEST last piece on exact ties. Returns
    * the piece sequence left to right. Pure integer comparisons —
    * deterministic, shard-order-free.
    */
  private[graft] def viterbi(word: String,
      lnp: collection.Map[String, Long]): Seq[String] = {
    val L = word.length
    val dp = Array.fill(L + 1)(Long.MinValue)
    dp(0) = 0L
    var j = 1
    while (j <= L) {
      var k = 1
      while (k <= math.min(MaxPieceLen, j)) {
        lnp.get(word.substring(j - k, j)).foreach { s =>
          if (dp(j - k) != Long.MinValue && dp(j - k) + s > dp(j))
            dp(j) = dp(j - k) + s
        }
        k += 1
      }
      j += 1
    }
    require(dp(L) != Long.MinValue,
      s"word '$word' not coverable — character coverage broken")
    val out = collection.mutable.ArrayBuffer.empty[String]
    var pos = L
    while (pos > 0) {
      // longest k achieving the optimum (ties → longest last piece)
      val k = (math.min(MaxPieceLen, pos) to 1 by -1).find { k =>
        val p = word.substring(pos - k, pos)
        lnp.contains(p) && dp(pos - k) != Long.MinValue &&
          dp(pos - k) + lnp(p) == dp(pos)
      }.get
      out += word.substring(pos - k, pos)
      pos -= k
    }
    out.reverse.toSeq
  }

  /** One hard-EM E-step: Viterbi-segment every word under `scores`
    * ((piece, c, lnp) — localized to a broadcast map, seedSize-
    * bounded) and return the piece counts (piece, freq) with freq =
    * Σ n over path occurrences. One mapPartitions pass, map-side
    * combined aggregate.
    */
  private[operators] def emCounts(words: DataFrame,
      scores: DataFrame): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val local = scores.select($("piece"), $("lnp"))
      .as[(String, Long)].collect().toMap
    val bc = spark.sparkContext.broadcast(local)
    words.select($("word"), $("n")).as[(String, Long)]
      .flatMap { case (w, n) => viterbi(w, bc.value).map(p => (p, n)) }
      .toDF("piece", "n")
      .groupBy($("piece"))
      .agg(sum($("n")).cast("long").as("freq"))
  }

  /** Counts carried onto a vocab: every vocab piece with its new
    * count (0 where the E-step never used it — the piece stays,
    * smoothing keeps it scoreable).
    */
  private def carry(vocab: DataFrame, counts: DataFrame): DataFrame =
    vocab.select($("piece"))
      .join(counts, Seq("piece"), "left")
      .select($("piece"), coalesce($("freq"), lit(0L)).as("freq"))

  /** Kudo-style LOSS-DELTA prune of a counted vocabulary: every
    * multi-char piece is scored by how much corpus likelihood its
    * removal would cost, with the SINGLE-CHARACTER segmentation as
    * the alternative (always legal: chars are never pruned) —
    * delta = freq · (lnp(piece) − Σ_{c ∈ piece} lnp(c)), exact
    * integer micro-nats under [[scoresOf]] of the CURRENT counts.
    * Keeps all single chars + the top `keepMulti` multi-char pieces
    * with freq > 0 by (delta desc, piece asc). Against frequency
    * pruning this keeps low-frequency/high-coverage pieces: a long
    * piece saves (len−1) char scores per use, so fewer uses can
    * still outweigh a frequent 2-char piece (UnigramSpec pins such a
    * case). Returns (piece, freq).
    *
    * Scale: one vocab-sized join of exploded piece characters
    * (≤ [[MaxPieceLen]] rows per piece) against the char scores, one
    * vocab-sized top-k — no corpus access.
    */
  private[graft] def pruneByLossDelta(freq: DataFrame,
      keepMulti: Int): DataFrame = {
    val sc = scoresOf(freq).localCheckpoint(true)
    val charScores = sc.filter(length($("piece")) === 1)
      .select($("piece").as("ch"), $("lnp").as("chlnp"))
    val chars = freq.filter(length($("piece")) === 1)
    val multi = sc.filter(length($("piece")) >= 2)
      .filter($("c") > 0)
      .select($("piece"), $("c"), $("lnp"),
        explode(sequence(lit(1), length($("piece")))).as("i"))
      .select($("piece"), $("c"), $("lnp"),
        $("piece").substr($("i"), lit(1)).as("ch"))
      .join(charScores, Seq("ch"))
      .groupBy($("piece"), $("c"), $("lnp"))
      .agg(sum($("chlnp")).as("sumc"), count(lit(1)).cast("int").as("nch"))
      // inner join must not drop characters: every char of an
      // in-vocab piece is itself in the vocab (seedPieces keeps all
      // single chars) — a miss means the vocab invariant broke
      .filter(when($("nch") === length($("piece")), lit(true))
        .otherwise(raise_error(concat(lit("piece '"), $("piece"),
          lit("' has a character outside the vocab")))))
      .select($("piece"), $("c").as("freq"),
        ($("c") * ($("lnp") - $("sumc"))).as("delta"))
      .orderBy($("delta").desc, $("piece").asc)
      .limit(keepMulti)
      .select($("piece"), $("freq"))
    chars.unionByName(multi)
  }

  /** Train the unigram tokenizer: seed → `emIters` hard-EM rounds →
    * loss-delta prune ([[pruneByLossDelta]]: all single chars + top
    * `keepMulti` multi-char pieces by removal cost) → one final
    * E-step under the pruned scores. Returns the shippable piece
    * table (rank, piece, n_chars, count, lnp_micro): count = final
    * E-step usage, lnp_micro = the score the final segmentation ran
    * under, rank by (count desc, piece asc).
    */
  def unigramTrain(documents: DataFrame, emIters: Int = 2,
      minFreq: Long = 2L, seedMulti: Int = 384,
      keepMulti: Int = 96): DataFrame = {
    require(emIters >= 1, s"emIters=$emIters must be >= 1")
    val words = wordTable(documents).localCheckpoint(true)
    val seed = seedPieces(words, minFreq, seedMulti).localCheckpoint(true)
    var freq = seed
    for (_ <- 1 to emIters)
      freq = carry(seed, emCounts(words, scoresOf(freq)))
        .localCheckpoint(true)
    val pruned = pruneByLossDelta(freq, keepMulti).localCheckpoint(true)
    val finalScores = scoresOf(pruned).localCheckpoint(true)
    val finalCounts = carry(pruned, emCounts(words, finalScores))
    finalCounts.join(finalScores.select($("piece"), $("lnp")), Seq("piece"))
      .select($("piece"), length($("piece")).cast("long").as("n_chars"),
        $("freq").as("count"), $("lnp").as("lnp_micro"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($("count").desc, $("piece").asc)).cast("long"))
      .select($("rank"), $("piece"), $("n_chars"), $("count"),
        $("lnp_micro"))
  }

  /** Per-word subword counts under a TRAINED piece table ((piece,
    * lnp_micro) columns): eligible words Viterbi-segment, words
    * longer than [[MaxWordLen]] fall back to single characters
    * (their piece count = length — the documented apply-time rule).
    * Returns (word, n, n_sub).
    */
  def wordSubwordCounts(documents: DataFrame,
      pieces: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val local = pieces.select($("piece"), $("lnp_micro"))
      .as[(String, Long)].collect().toMap
    val bc = spark.sparkContext.broadcast(local)
    Bpe.wordTable(documents).select($("word"), $("n"))
      .as[(String, Long)]
      .map { case (w, n) =>
        val ns =
          if (w.length > MaxWordLen) w.length.toLong
          else viterbi(w, bc.value).length.toLong
        (w, n, ns)
      }
      .toDF("word", "n", "n_sub")
  }

  /** Tokenize the corpus under a trained piece table: per document,
    * whitespace word count and total subword count — [[Bpe
    * .tokenizeCorpus]]'s contract for the unigram model, the number
    * that prices a training run. Vocabulary-sized broadcast join
    * against the token stream; per-doc aggregate map-side combines.
    */
  def tokenizeCorpus(documents: DataFrame,
      pieces: DataFrame): DataFrame = {
    val sw = wordSubwordCounts(documents, pieces)
      .select($("word"), $("n_sub"))
    TextAnalysis.tokens(documents)
      .join(broadcast(sw), $("token") === $("word"))
      .groupBy($("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum($("n_sub")).cast("long").as("n_subwords"))
  }
}
