package graft

/** Physical-plan shape assertions: the scale properties the Scaladoc claims
  * (broadcasts, pushdown, pruning, codegen) are checked here so a regression
  * in plan shape fails CI, not a 100 TB run.
  */
class PlanSpec extends SparkSuite {

  private val sf = SparkSpec.sf0001

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan.toString

  /** Post-execution plan: AQE-final, with exchanges inserted and codegen
    * stages marked `*(n)` (sparkPlan has neither). */
  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
  }

  test("q02 dimension joins are broadcast hash joins, never shuffle joins") {
    val p = plan("q02_region_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q01 pushes the shipdate filter into the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"))
    assert(p.contains("LessThanOrEqual") || p.contains("lessThanOrEqual"))
  }

  test("q18 scan is pruned to the referenced document columns") {
    val p = plan("q18_token_stats")
    val scanLine = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(scanLine.contains("doc_id") && scanLine.contains("text"))
    assert(!scanLine.contains("source") && !scanLine.contains("lang"))
  }

  test("q33 gazetteer mention match is a broadcast join against the token stream") {
    val p = plan("q33_gazetteer_mentions")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q01/q26 hot paths stay inside whole-stage codegen") {
    // `*(n)` prefixes are WholeStageCodegen stage markers; the aggregates and
    // the native cosine join must carry them
    assert(executedPlan("q01_pricing_summary").linesIterator
      .exists(l => l.contains("*(") && l.contains("HashAggregate")))
    assert(executedPlan("q26_cosine_pairs").linesIterator
      .exists(l => l.contains("*(") && l.contains("cosine_sim")))
  }

  test("q13 k-hop frontier joins broadcast the reached set") {
    val p = plan("q13_two_hop_network")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q08 window top-k gets Spark's native map-side partial top-k (WindowGroupLimit)") {
    // Spark 4's InferWindowGroupLimit rewrites Filter(rn <= k, Window(row_number))
    // into a partial WindowGroupLimit BELOW the shuffle + a final one above —
    // each map task forwards at most k rows per group instead of all rows.
    // This is why topKPerGroup stays a declarative window instead of a custom
    // operator: the built-in already gives the scale plan we'd hand-write.
    val p = plan("q08_topk_window")
    assert(p.contains("WindowGroupLimit"))
    assert(p.linesIterator.count(_.contains("WindowGroupLimit")) >= 2,
      "expected partial + final WindowGroupLimit nodes")
  }

  test("q46 fuzzy blocking joins broadcast the bigram-frequency index") {
    val p = plan("q46_fuzzy_candidates")
    assert(p.contains("BroadcastHashJoin"))
    // the exact verify must appear as a plain filter on levenshtein, i.e.
    // AFTER blocking — never a cartesian levenshtein over probes × aliases
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("levenshtein"))
  }

  test("q48 dominance pruning is an anti-join on doc_id, not a cartesian sweep") {
    // the q48 query closure materializes its result for cache hygiene, so
    // its returned plan is a checkpoint scan — assert on the library op's
    // plan, which is what the query executes
    val docs = graft.Tables.documents(spark, sf)
    val spans = graft.text.EntityLinking.ngramSpans(docs, 3)
    val gaz = graft.text.EntityLinking.phraseGazetteer(spans, 30)
    val p = graft.text.EntityLinking.phraseMentionsGlobal(spans, gaz)
      .queryExecution.sparkPlan.toString
    assert(p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q55 chunking scan is pruned to (doc_id, text) and stays generator-only") {
    val p = plan("q55_chunking")
    val scanLine = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(scanLine.contains("doc_id") && scanLine.contains("text"))
    assert(!scanLine.contains("source") && !scanLine.contains("lang"))
    // chunk enumeration is per-row expression work — no exchange before the
    // generate (only the final orderBy may range-shuffle)
    val beforeGenerate = p.substring(p.indexOf("Generate"))
    assert(!beforeGenerate.contains("Exchange hashpartitioning"))
  }

  test("q21 dedup window input carries fingerprints, not document text") {
    val p = executedPlan("q21_fingerprint_dedup")
    // the exchange feeding the window partitions by fp_md5; text must have
    // been projected away before it (hashpartitioning on fp_md5 present,
    // and no Exchange row containing the raw text column)
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.exists(_.contains("fp_md5")))
    assert(!exchanges.exists(_.contains("text#")))
  }

  test("q83 tfidf join probes through the broadcast df-pruned idf table") {
    // the q83 closure materializes for cache hygiene (checkpoint scan), so
    // assert on the op's pre-checkpoint plan: the vocabulary-sized idf
    // table must reach the postings as a broadcast, and the pair stage must
    // stay an equi-join on token — a cartesian/BNLJ here means the
    // inverted-index blocking was lost
    val docs = graft.Tables.documents(spark, sf)
    val (out, postings) = graft.text.RankedSearch.tfidfPairsPlan(
      docs, "doc_id", "text", 0.1, 0.3)
    val p = out.queryExecution.sparkPlan.toString
    postings.unpersist()
    assert(p.contains("BroadcastHashJoin"))
    // the only nested-loop allowed is the 1-row n_docs scalar crossJoin
    assert(!p.contains("CartesianProduct"))
    val selfJoin = p.linesIterator.find(l =>
      l.contains("Join") && l.contains("token")).getOrElse("")
    assert(!selfJoin.contains("NestedLoop"),
      s"pair stage must be an equi-join on token, got: $selfJoin")
  }

  test("q53 ac_spans match stage participates in whole-stage codegen") {
    // ac_spans has a doGenCode (round-3 fix) — the generate/project stage
    // that evaluates it must carry a `*(n)` codegen marker; with the old
    // CodegenFallback the whole containing stage dropped to interpreted.
    val p = executedPlan("q53_ac_mentions")
    val acLines = p.linesIterator.filter(_.contains("ac_spans")).toSeq
    assert(acLines.nonEmpty)
    assert(acLines.exists(_.contains("*(")),
      s"ac_spans stage not codegen'd:\n${acLines.mkString("\n")}")
  }

  test("q101 prefix sum is two-phase: the per-doc window is bucket-partitioned") {
    // The scale trap packSequences exists to avoid: a global
    // `sum over (order by doc_id)` window has no partition key and runs the
    // whole corpus in ONE task. The plan must show (a) the document-level
    // cumsum window PARTITIONED by bucket, and (b) the only
    // unpartitioned-window sort being the tiny bucket-offsets table (fed by
    // the bucket aggregate, not by documents).
    val p = plan("q101_pack_sequences")
    val windows = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.size == 2, s"expected 2 windows in:\n$p")
    // Spark prints windowspecdefinition(bucket#.., doc_id#.. ASC ...) for
    // the bucket-partitioned per-doc cumsum and
    // windowspecdefinition(bucket#.. ASC ...) for the tiny offsets sort —
    // distinguish by the per-doc ordering column
    assert(windows.count(_.contains("doc_id")) == 1,
      s"document-level window count:\n${windows.mkString("\n")}")
    val docWindow = windows.find(_.contains("doc_id")).get
    assert(docWindow.contains("windowspecdefinition(bucket"),
      s"per-doc cumsum not bucket-partitioned:\n$docWindow")
  }

  test("q117 bigram-table joins are not mandatory broadcasts (Heaps-law growth)") {
    // the c2/c1 count tables grow with the corpus; only the 1-row vocab
    // aggregate may stay a pinned broadcast under threshold -1
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = plan("q117_bigram_lm_ppl")
      val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
      assert(bhj == 0, s"count-table join still forces a broadcast:\n$p")
    } finally spark.conf.set(key, prev)
  }

  test("q127 duplicated-hash join is not a mandatory broadcast (boilerplate growth)") {
    // the duplicated-window hash set grows with corpus boilerplate — a
    // broadcast() hint on it would OOM on repetitive corpora; with the
    // auto threshold at -1 the join must degrade to a shuffle join
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = plan("q127_repeated_spans")
      val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
      assert(bhj == 0, s"duplicated-hash join still forces a broadcast:\n$p")
    } finally spark.conf.set(key, prev)
  }

  test("q138 fine-book join is not a mandatory broadcast (k grows with N)") {
    // ivf2Assign's grouped fine book is corpus-sized/64 (k ∝ N) — only the
    // two 1-row coarse-book crossJoins are pinned broadcasts (they render
    // as BroadcastNestedLoopJoin); with the auto threshold at -1 the
    // ccell equi-join must degrade to a shuffle join, so no
    // BroadcastHashJoin may appear anywhere in the assign plan
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      spark.sharedState.cacheManager.clearCache() // see q135's comment
      val p = graft.vector.VectorOps
        .ivf2Assign(Tables.embeddings(spark, sf), 8, 3)
        .queryExecution.sparkPlan.toString
      val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
      assert(bhj == 0, s"fine-book join still forces a broadcast:\n$p")
    } finally spark.conf.set(key, prev)
  }

  test("q139 global top-k runs as TakeOrdered, never a full sort") {
    // orderBy(...).limit(k) must compile to TakeOrderedAndProject —
    // map-side partial top-k per partition; a global Sort before the
    // Limit would shuffle the whole corpus to sort it
    val p = plan("q139_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.linesIterator.exists(l =>
      l.trim.startsWith("Sort ") || l.contains("+- Sort ")), s"global sort:\n$p")
  }

  test("q135 degree joins are not mandatory broadcasts (vertex-table growth)") {
    // both degree attachments join a vertex-sized table — hinting it
    // broadcast would OOM the driver at graph scale; with the auto
    // threshold at -1 they must degrade to shuffle joins
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      // earlier suites may have cached overlapping plan fragments whose
      // SERIALIZED physical plans (built under the default threshold)
      // contain BroadcastHashJoins — cache substitution would splice them
      // into this fresh plan's printout and fail the count spuriously
      spark.sharedState.cacheManager.clearCache()
      val p = plan("q135_assortativity")
      val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
      assert(bhj == 0, s"degree join still forces a broadcast:\n$p")
    } finally spark.conf.set(key, prev)
  }

  test("q120 centroid join is a broadcast (label-enum-sized build side)") {
    val p = plan("q120_embedding_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q133 export-shard window is partitioned by shard, never global") {
    // a global (unpartitioned) row_number would pull the whole corpus into
    // one partition at 100 TB; the shard key must partition the window
    val p = plan("q133_export_shards")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, p)
    assert(windows.forall(_.contains("windowspecdefinition(shard")),
      s"unpartitioned window found:\n${windows.mkString("\n")}")
  }

  test("q66 probe-side block keys are never broadcast (corpus-scale probe set)") {
    // q66's mention set is every distinct adjacent bigram of the whole
    // corpus — a broadcast() hint on the blockKeys side would OOM the
    // driver at 100 TB (RankedSearch's docstring contract). tokenIdf and
    // the 1-row stats aggregate stay legitimately hinted (vocabulary- /
    // scalar-sized), so assert specifically that no broadcast build side
    // carries the `surface` column rather than counting all BHJs.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      // checkpoint=false: the production entry eagerly localCheckpoints,
      // which hides the retrieval plan behind an RDD scan
      val phys = graft.queries.NlpQueries.bm25Candidates(spark, sf, checkpoint = false)
        .queryExecution.sparkPlan
      val offenders = phys.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if {
              val build = j.buildSide match {
                case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
                case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
              }
              build.output.exists(_.name == "surface")
            } => j
      }
      assert(offenders.isEmpty,
        s"blockKeys probe still forces a broadcast:\n${offenders.mkString("\n")}")
      // and the probe join must still exist — degraded to a shuffle join
      val probeSmj = phys.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.output.exists(_.name == "surface") => j
      }
      assert(probeSmj.nonEmpty, s"expected a shuffle probe join:\n$phys")
    } finally spark.conf.set(key, prev)
  }

  test("q203 train-gram semi-join is not a mandatory broadcast (train side is corpus-sized)") {
    // q203 reverses q105's cardinality: the DISTINCT train 8-gram set is
    // the corpus-sized side — a broadcast() hint there is a driver OOM at
    // 100 TB (the semi-join must shuffle on the gram key, or ride q153's
    // Bloom). With auto-broadcast forced off, any surviving BHJ whose
    // build side carries `gram` would be a mandatory hint.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val phys = SparkEntry.queries("q203_ngram_coverage")(spark, sf)
        .queryExecution.sparkPlan
      val offenders = phys.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if {
              val build = j.buildSide match {
                case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
                case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
              }
              build.output.exists(_.name == "gram")
            } => j
      }
      assert(offenders.isEmpty,
        s"train grams still force a broadcast:\n${offenders.mkString("\n")}")
    } finally spark.conf.set(key, prev)
  }

  test("q108 cohort join is not a mandatory broadcast (firstSeen grows with data)") {
    // firstSeen is one row PER USER — broadcasting it is a driver OOM at
    // scale. With the auto-broadcast threshold forced to -1 the join must
    // degrade to a shuffle join; a broadcast() hint would pin BHJ anyway.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = plan("q108_retention_cohorts")
      assert(!p.contains("BroadcastHashJoin"),
        s"cohort join still forces a broadcast:\n$p")
    } finally spark.conf.set(key, prev)
  }
}
