package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew-join evidence (round-2 verdict #8): a deliberately hot-keyed
  * sort-merge join, with the skew thresholds forced low enough for the
  * fixture, must be re-planned by AQE with the oversized partition SPLIT —
  * the `skew=true` marker on the join. This is the join-side complement of
  * the salted-aggregation equality law in PropertySpec: at 100 TB a single
  * hot entity (the reference corpus' "UNKNOWN" name, a viral document) lands
  * one executor with the whole key unless AQE splits it.
  */
class AqeSkewSpec extends SparkSuite {

  test("hot-key sort-merge join is split by AQE (skew=true in final plan)") {
    val s = spark
    import s.implicits._
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> s.conf.getOption(k)).toMap
    try {
      // force SMJ (no broadcast) and make the skew detector sensitive
      // enough for a fixture-sized build
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1024")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4096")

      // 99% of left rows share key 0, with an INCOMPRESSIBLE payload (md5
      // hex) so the hot partition's post-compression shuffle bytes actually
      // dwarf the threshold — a constant-ish payload compresses below the
      // skew detector's floor and nothing triggers
      val left = s.range(0, 120000)
        .select(
          when(col("id") % 100 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          concat(md5(col("id").cast("string")),
            md5((col("id") + 1).cast("string"))).as("payload"))
      val right = s.range(0, 200).select(col("id").as("k"), (col("id") * 2).as("v"))
      // no aggregation on the join key downstream: a same-key consumer would
      // REQUIRE the join's hash partitioning and AQE refuses to split skewed
      // partitions when that would force an extra shuffle
      val j = left.join(right, "k").select(col("k"), col("v"))
      val out = j.collect()
      assert(out.nonEmpty)
      val finalPlan = (j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE to mark the join skew=true, plan:\n$finalPlan")
    } finally keep.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }
}
