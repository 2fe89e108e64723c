package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Co-located bucketed join: both fact tables pre-bucketed on the join key →
  * the equi-join plans with ZERO exchanges (the 100 TB strategy documented in
  * [[graft.sources.Bucketing]]).
  */
class BucketingSpec extends SparkSuite {

  test("bucketed orders ⋈ lineitem joins with no Exchange in the plan") {
    val s = spark
    val d = SparkSpec.sf0001
    Bucketing.writeBucketed(
      Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
      "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "lineitem_b", "o_orderkey", 4)
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so the assertion is about co-location,
      // not about one side being broadcastable at toy scale
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.readBucketed(s, "orders_b")
        .join(Bucketing.readBucketed(s, "lineitem_b"), Seq("o_orderkey"))
        .groupBy(col("o_custkey")).agg(sum(col("l_quantity")).as("qty"))
      joined.collect()
      val p = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case other => other.toString
      }
      assert(p.contains("SortMergeJoin"))
      val joinSection = p.substring(p.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        s"join inputs must be co-located by bucketing, plan was:\n$p")
      // sanity: same join over the raw (unbucketed) parquet DOES shuffle
      val raw = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(s, d).select(col("l_orderkey").as("o_orderkey")),
          Seq("o_orderkey"))
      raw.collect()
      val rawPlan = raw.queryExecution.executedPlan.toString
      assert(rawPlan.contains("Exchange"))
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("MISMATCHED bucket counts fall back to shuffling (the co-location contract)") {
    val s = spark
    val d = SparkSpec.sf0001
    Bucketing.writeBucketed(
      Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
      "orders_b4", "o_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "lineitem_b8", "o_orderkey", 8)
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.readBucketed(s, "orders_b4")
        .join(Bucketing.readBucketed(s, "lineitem_b8"), Seq("o_orderkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case other => other.toString
      }
      // at least one side must re-shuffle — bucket layouts only co-locate
      // when every table joining on the key uses the SAME bucket count
      assert(p.contains("Exchange"),
        s"expected a fallback shuffle for mismatched buckets, plan:\n$p")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS orders_b4")
      s.sql("DROP TABLE IF EXISTS lineitem_b8")
    }
  }
}
