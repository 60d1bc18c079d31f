package graft

import graft.operators.Curation

/** Pins the versioned-warehouse behavior of [[ComposedArtifacts]]:
  * the published family directory carries an integrity receipt that
  * matches a recomputation over the published stores (so "which
  * artifact version served this query" is answerable from the
  * warehouse alone), and repeated access reuses the same build (the
  * amortize-across-jobs contract).
  */
class ComposedArtifactsSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("published receipt matches recomputed manifest; access is stable") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select("artifact", "n_docs", "n_tok", "content_md5")
        .collect().map(_.toString).toSet
    val receipt = rows(ComposedArtifacts.receipt(spark, sfDir, "pair"))
    assert(receipt.nonEmpty)
    val redo = rows(Curation.artifactManifest(Seq(
      "sigs" -> ComposedArtifacts.sigs(spark, sfDir),
      "shingles" -> ComposedArtifacts.shingles(spark, sfDir),
      "scored" -> ComposedArtifacts.scored(spark, sfDir),
      "cont_pairs" -> ComposedArtifacts.contPairs(spark, sfDir))))
    assert(redo === receipt,
      "published receipt diverged from the published stores")
    // second resolution serves the SAME published build (memoized
    // in-JVM; across JVMs the corpus-fingerprint key does the same)
    val p1 = ComposedArtifacts.sigs(spark, sfDir).inputFiles.toSet
    val p2 = ComposedArtifacts.sigs(spark, sfDir).inputFiles.toSet
    assert(p1 === p2 && p1.nonEmpty)
    // the ann family publishes a receipt too
    assert(rows(ComposedArtifacts.receipt(spark, sfDir, "ann")).nonEmpty)
  }
}
