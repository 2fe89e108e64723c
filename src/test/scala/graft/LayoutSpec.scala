package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Sorted-partitioned layout writer: partition dirs for planning-time
  * pruning, per-file sorted runs for scan-time row-group skipping.
  */
class LayoutSpec extends SparkSuite {

  test("writePartitionedSorted: hive dirs per day, every file internally sorted") {
    val s = spark
    val dir = Files.createTempDirectory("layout").toFile.getAbsolutePath
    val ev = Tables.events(s, SparkSpec.sf0001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    Layout.writePartitionedSorted(ev, dir, "day", Seq("ts", "event_id"))

    // hive-style layout: one directory per day
    val dayDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
    val nDays = ev.select("day").distinct().count()
    assert(dayDirs.length.toLong == nDays, s"expected $nDays day= dirs")

    // every written FILE is a sorted run on (ts, event_id) — the property
    // that makes parquet row-group min/max stats selective
    val withFile = s.read.parquet(dir)
      .select(input_file_name().as("f"), col("ts"), col("event_id"))
    val unsortedFiles = withFile
      .withColumn("prev_ts", lag(col("ts"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("f"))
          .orderBy(monotonically_increasing_id())))
      .filter(col("prev_ts") > col("ts"))
    assert(unsortedFiles.isEmpty,
      "found a file whose rows are not ts-sorted")

    // read back equals input (layout changes bytes, not data)
    assert(s.read.parquet(dir).count() == ev.count())
  }
}
