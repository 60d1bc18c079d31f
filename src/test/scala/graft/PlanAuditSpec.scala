package graft

import org.apache.spark.sql.catalyst.plans.logical.{Repartition, RepartitionByExpression}

/** Plan-shape gate: no query may funnel its result through a single
  * partition (`repartition(1)` / `coalesce(1)`). Operators emit
  * unordered output — the oracle compare sorts rows — so any
  * single-partition exchange in a query plan is a scale bug, not a
  * correctness need (a 100 TB result would serialize through one task).
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("no query plan contains a single-partition repartition/coalesce") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.optimizedPlan
        val funnels = plan.collect {
          case r: Repartition if r.numPartitions == 1 => r.nodeName
          case r: RepartitionByExpression
              if r.optNumPartitions.contains(1) => r.nodeName
        }
        spark.sharedState.cacheManager.clearCache()
        if (funnels.nonEmpty) Some(s"$name: ${funnels.mkString(", ")}") else None
    }
    assert(offenders.isEmpty,
      s"single-partition funnels in:\n${offenders.mkString("\n")}")
  }

  test("q77/q79 are zero-shuffle scans (expression-only, no hash exchange)") {
    Seq("q77_gopher_rules", "q79_char_entropy").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      // the only allowed exchange is the conditional round-robin
      // spread() of a single-file local input — never a key shuffle
      assert(!plan.contains("hashpartitioning"),
        s"$name shuffles on a key:\n$plan")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("q78/q80 join their type-level tables broadcast, never sort-merge") {
    // q78's public surface returns a checkpoint scan — audit the
    // un-checkpointed build instead
    val docs = graft.sources.Tables(spark, sfDir).documents
    val (toks, q78) = graft.operators.Curation
      .dsirWeightsBuild(docs, Seq("src0", "src1", "src2", "src3"))
    val q80 = SparkEntry.queries("q80_pmi_pairs")(spark, sfDir)
    try {
      Seq("q78_dsir_weights" -> q78, "q80_pmi_pairs" -> q80).foreach {
        case (name, df) =>
          val plan = df.queryExecution.executedPlan.toString
          assert(plan.contains("BroadcastHashJoin"), s"$name: no broadcast join")
          assert(!plan.contains("SortMergeJoin"),
            s"$name: row-proportional sort-merge join:\n$plan")
      }
    } finally {
      toks.unpersist(true)
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("q90's pairwise stage is centroid-sized: broadcast only, no sort-merge") {
    val emb = graft.sources.Tables(spark, sfDir).embeddings
    val plan = graft.operators.Similarity.labelCentroidSim(emb)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "no broadcast join")
    assert(!plan.contains("SortMergeJoin"),
      s"row-proportional sort-merge join in the pairwise stage:\n$plan")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q97's top-k is TakeOrderedAndProject, never a global vocabulary sort") {
    val docs = graft.sources.Tables(spark, sfDir).documents
    val plan = graft.operators.TextAnalysis.vocabCoverage(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a distributed top-k:\n$plan")
    // the only Sort allowed is the k-row window's, under the take
    assert(!plan.contains("GlobalLimit"),
      s"sort+limit instead of TakeOrdered:\n$plan")
  }

  test("q100's size-table joins are broadcast; no cartesian anywhere") {
    // the public surface returns a checkpoint scan — audit the
    // un-checkpointed build (the scaladoc's promised plan pin)
    val docs = graft.sources.Tables(spark, sfDir).documents
    val (st, res) = graft.operators.Dedup.sourceVocabOverlapBuild(docs)
    try {
      val plan = res.queryExecution.executedPlan.toString
      // the m²-bounded source-size joins must come in broadcast — a
      // sources-sized table shuffled against the vocab join would be
      // a needless exchange at 100 TB
      assert(plan.contains("BroadcastHashJoin"),
        s"q100: size joins not broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"q100: cartesian in the vocab overlap plan:\n$plan")
    } finally {
      st.unpersist(true)
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("q118/q122: PQ scoring joins are broadcast — the code table never sort-merges") {
    // the ADC promise: the corpus-sized code table streams against a
    // broadcast LUT/codebook; a sort-merge THERE would shuffle the
    // whole code table per query set at 100 TB. q122 additionally
    // carries one legitimate corpus×corpus equi-join (cell assignment
    // ⋈ codes on vec_id — both sides N rows, co-partitioned, linear);
    // that one MAY sort-merge, nothing else may.
    Seq("q118_pq_ann", "q122_ivfpq_ann").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$name: no broadcast join in the scoring plan")
      val smjKeys = "SortMergeJoin \\[(\\w+)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(smjKeys.forall(_.startsWith("vec_id")),
        s"$name: sort-merge join on non-corpus keys $smjKeys:\n$plan")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("q123: drift plan has no row-proportional join after the centroid aggregate") {
    val plan = SparkEntry.queries("q123_embedding_drift")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // everything after the (label × dim) aggregates is centroid-sized;
    // the count joins are declared broadcast
    assert(plan.contains("BroadcastHashJoin"), "q123: count joins not broadcast")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q123: cartesian in the drift plan:\n$plan")
    spark.sharedState.cacheManager.clearCache()
  }
}
