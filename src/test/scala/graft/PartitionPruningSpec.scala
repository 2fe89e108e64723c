package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Partition pruning: a date-partitioned events layout + a date-filtered
  * query must scan ONLY the matching partition directories — the plan's
  * PartitionFilters prune at planning time, no data from other days is
  * read. At 100 TB this is the difference between scanning one day and
  * scanning the archive; hive-style `partitionBy` layout gives it for free
  * as long as the filter references the partition column declaratively.
  */
class PartitionPruningSpec extends SparkSuite {

  test("date-partitioned scan prunes to the filtered day") {
    val s = spark
    val dir = Files.createTempDirectory("evpart").toFile.getAbsolutePath
    Tables.events(s, SparkSpec.sf0001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val days = s.read.parquet(dir).select("day").distinct().count()
    assert(days > 1, "fixture must span multiple days for pruning to matter")

    // partition values are type-inferred (the yyyy-MM-dd strings come back
    // as DATE) — carry the value through as-is
    val firstDay = s.read.parquet(dir).agg(min(col("day"))).collect().head.get(0)
    val q = s.read.parquet(dir).filter(col("day") === firstDay)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.sparkPlan.toString
    // the partition predicate must appear as a PartitionFilter on the scan,
    // NOT as a post-scan data Filter
    assert(plan.contains("PartitionFilters") &&
      plan.linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("day")),
      s"expected day in PartitionFilters, plan:\n$plan")
    // and the scan must report exactly one selected partition
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    val selected = scan.metrics.get("numPartitions")
    q.collect()
    assert(selected.forall(_.value == 1L),
      s"expected 1 selected partition, got ${selected.map(_.value)}")
  }
}
