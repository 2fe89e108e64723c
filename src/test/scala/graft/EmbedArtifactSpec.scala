package graft

import org.apache.spark.sql.functions._

import graft.sources.EmbedArtifact

/** The materialized hash-embedding artifact (sources.EmbedArtifact): value
  * parity with the live embed plan, zero-job location on re-read, and the
  * exchange-free consumer join the vec_id bucketing buys — the
  * DedupClosureSpec laws applied to the vector family's boundary.
  */
class EmbedArtifactSpec extends SparkSuite {
  private val d = SparkSpec.sf0001
  private def docs = Tables.documents(spark, d)

  test("artifact == live embed (parquet round-trip is value-exact)") {
    val s = spark
    val t = EmbedArtifact.materialize(s, docs, d)
    try {
      def key(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toList)).toMap
      val live = key(EmbedArtifact.embed(docs))
      val art = key(s.table(t))
      assert(art === live)
      assert(art.nonEmpty)
      assert(art.head._2.size === EmbedArtifact.Dim)
      // write-once: a second materialize reuses the table (same name,
      // unchanged creation time)
      val created = s.sql(s"DESCRIBE EXTENDED $t")
        .filter(col("col_name") === "Created Time").collect()(0).getString(1)
      assert(EmbedArtifact.materialize(s, docs, d) === t)
      val created2 = s.sql(s"DESCRIBE EXTENDED $t")
        .filter(col("col_name") === "Created Time").collect()(0).getString(1)
      assert(created2 === created)
    } finally s.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("post-materialize read is metadata-only: zero jobs, no source scan") {
    val s = spark
    val t = EmbedArtifact.materialize(s, docs, d)
    try {
      val sc = s.sparkContext
      val dd = docs
      dd.inputFiles // force the input's own footer/listing job outside the probe
      sc.setJobGroup("embed-read-probe", "second read must be job-free")
      val df = try EmbedArtifact.read(s, dd, d) finally sc.clearJobGroup()
      Thread.sleep(500) // status store is fed asynchronously
      assert(sc.statusTracker.getJobIdsForGroup("embed-read-probe").isEmpty,
        "locating the artifact ran a Spark job")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("documents.parquet"), plan)
      assert(df.count() === docs.count())
    } finally s.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("consumer join on vec_id adds no Exchange on the artifact side") {
    val s = spark
    val t = EmbedArtifact.materialize(s, docs, d)
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the metadata-enrich shape: unbucketed doc attributes joined onto
      // the bucketed embedding table
      val joined = docs.select(col("doc_id").as("vec_id"), col("source"))
        .join(s.table(t), Seq("vec_id"))
      joined.collect()
      val p = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case other => other.toString
      }
      val exchanges = p.linesIterator
        .filter(_.contains("Exchange hashpartitioning(vec_id")).size
      assert(exchanges <= 1, s"artifact side re-shuffled, plan:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
