package graft

import graft.operators.{BloomDecontam, SubstringDedup}

/** Pins the bloom-decontamination twins to each other and to bloom
  * theory: the broadcast byte-array path must equal the oracle-gated
  * relational path row for row (same deterministic hashes → same false
  * positives), and the hit set must be a superset of the exact
  * shared-window set (no false negatives, ever).
  */
class BloomDecontamSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = graft.sources.Tables(spark, sfDir).documents

  test("byte-array filter equals the relational formulation exactly") {
    val rel = BloomDecontam.decontaminateRelational(docs)
      .as[(Long, Long)].collect().sorted
    val filter = BloomDecontam.buildFilter(docs)
    val blob = BloomDecontam.decontaminateWithFilter(docs, filter)
      .as[(Long, Long)].collect().sorted
    assert(rel.nonEmpty, "fixture produced no bloom hits — resize m/k")
    assert(blob === rel)
  }

  test("no false negatives: bloom hits ⊇ exact shared windows, per doc") {
    val wins = SubstringDedup.windowOccurrences(docs, 8)
      .select("doc_id", "fp").distinct()
    val evalFp = wins.filter($"doc_id" % 10 === 0).select("fp").distinct()
    val exact = wins.filter($"doc_id" % 10 =!= 0)
      .join(evalFp, "fp")
      .groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    val bloom = BloomDecontam.decontaminateRelational(docs)
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (doc, n) =>
      assert(bloom.getOrElse(doc, 0L) >= n,
        s"doc $doc: bloom ${bloom.get(doc)} < exact $n — false negative")
    }
  }

  test("BloomBitsAgg: reduce sets bits, merge ORs, byte order low-first") {
    val agg = new BloomDecontam.BloomBitsAgg(16)
    val a = agg.reduce(agg.reduce(agg.zero, 0L), 9L) // byte0 bit0, byte1 bit1
    assert(a.toSeq === Seq(1.toByte, 2.toByte))
    val b = agg.reduce(agg.zero, 15L) // byte1 bit7
    assert(agg.merge(a, b).toSeq === Seq(1.toByte, (2 | 0x80).toByte))
  }

  test("spanCleanCorpus: each drop rule fires independently (k=4)") {
    // doc 10 = eval; doc 1 shares "a b c d" with it → bloom-flagged
    // (kept by the ≤half-dup rule: 4·2 ≤ 12); docs 2,3 duplicate each
    // other fully → 6·2 > 6 dropped; doc 4 too short to window;
    // doc 5 clean → the only survivor
    val docs = Seq(
      (10L, "a b c d e f"),
      (1L, "a b c d zz q r s t u v w"),
      (2L, "m n o p q r"),
      (3L, "m n o p q r"),
      (4L, "u v w"),
      (5L, "unique tokens here indeed truly")).toDF("doc_id", "text")
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
    val kept = graft.operators.Curation.spanCleanCorpus(docs, k = 4)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(5L))
  }

  test("bitIndex is stable and in range") {
    val bits = docs.limit(1)
      .select(BloomDecontam.bitArray(
        org.apache.spark.sql.functions.lit("cafe"), 65536, 2).as("b"))
      .as[Seq[Long]].head()
    assert(bits.length === 2 && bits.forall(b => b >= 0 && b < 65536))
    // pinned value: 60 bits of md5("cafe#0") mod 2^16 — regression
    // canary for the hash derivation (oracle depends on it)
    val h0 = java.security.MessageDigest.getInstance("MD5")
      .digest("cafe#0".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expect = java.lang.Long.parseLong(h0.take(15), 16) % 65536
    assert(bits.head === expect)
  }
}
