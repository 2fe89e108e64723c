package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning — the ROW-level complement of DPP's
  * partition-level pruning (PartitionPruningSpec): on a selective dim join
  * with no partition layout to exploit, Spark's InjectRuntimeFilter builds a
  * Bloom filter from the dim's surviving keys and applies `might_contain`
  * on the fact side BEFORE the join shuffle — at 100 TB this drops most of
  * the shuffle write for a selective star join.
  */
class RuntimeFilterSpec extends SparkSuite {

  test("selective dim join injects a bloom filter on the fact side") {
    val s = spark
    val keep = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> s.conf.getOption(k)).toMap
    val factDir = Files.createTempDirectory("bloom_fact").toString
    val dimDir = Files.createTempDirectory("bloom_dim").toString
    try {
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // fixture-sized fact: lower the application-side scan floor; keep the
      // join a shuffle join so the filter has a shuffle to save
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.range(0, 200000)
        .select(col("id").as("k"), md5(col("id").cast("string")).as("pay"))
        .write.mode("overwrite").parquet(factDir)
      s.range(0, 1000)
        .select(col("id").as("k"), (col("id") % 7).as("w"))
        .write.mode("overwrite").parquet(dimDir)
      val fact = s.read.parquet(factDir)
      val dim = s.read.parquet(dimDir)
      val q = fact.join(dim.filter(col("w") === 3), Seq("k"))
      q.collect()
      val plan = (q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }).toString
      assert(plan.contains("bloom_filter_agg"),
        s"expected a bloom filter build on the dim side, plan:\n$plan")
      assert(plan.contains("might_contain"),
        s"expected might_contain applied on the fact side, plan:\n$plan")
    } finally {
      keep.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None)    => s.conf.unset(k)
      }
    }
  }
}
