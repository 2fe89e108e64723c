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

  test("dim-filtered join prunes the fact scan via dynamic partition pruning") {
    // The join-driven sibling of static pruning: the fact side is
    // partitioned on the join key, the dim side carries the selective
    // filter, and DPP injects the dim's surviving keys as a runtime
    // partition filter (dynamicpruningexpression) into the fact scan —
    // at 100 TB this is how `fact ⋈ dim WHERE dim.pred` reads one
    // partition's files instead of the archive.
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("evdpp").toFile.getAbsolutePath
    val dimDir = Files.createTempDirectory("evdppdim").toFile.getAbsolutePath
    Tables.events(s, SparkSpec.sf0001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val fact = s.read.parquet(dir)
    val nDays = fact.select("day").distinct().count()
    assert(nDays > 1)
    // dim: its own parquet table, one row per day, flag marking exactly one
    // — the selective predicate lives on the DIM side only (canonical
    // star-schema shape: FileScan dim + literal Filter)
    // the predicate must be one Catalyst's isLikelySelective recognizes
    // (EqualTo on a column) — a bare boolean attribute does not qualify
    // and DPP skips insertion
    val firstDay = fact.agg(min(col("day"))).collect().head.get(0)
    fact.select(col("day")).distinct()
      .withColumn("tag", when(col("day") === lit(firstDay), "pick").otherwise("skip"))
      .write.mode("overwrite").parquet(dimDir)
    val dim = s.read.parquet(dimDir)
    val q = fact.join(dim.filter(col("tag") === "pick"), Seq("day"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    q.collect()
    val finalPlan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    assert(finalPlan.toString.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruningexpression in the fact scan, plan:\n$finalPlan")
    // the runtime filter must actually have pruned: the fact scan reads one
    // partition despite the query having no literal predicate on `day`.
    // Scans live INSIDE materialized query stages, which are leaves of the
    // AQE final plan — recurse through them.
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.flatMap {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case _ => Nil
      }
    val pruned = scans(finalPlan).flatMap(_.metrics.get("numPartitions").map(_.value))
    assert(pruned.contains(1L),
      s"expected a 1-partition fact scan, got $pruned")
  }
}
