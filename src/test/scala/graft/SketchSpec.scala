package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate laws. Sketches are THE 100 TB cardinality/quantile
  * operators but have no cross-engine oracle (engine-private algorithms), so
  * they are locked by laws instead: bounded error against the exact
  * operator, and exact distributivity of the sketch merge — the property
  * that makes them safe to compute per-partition and combine.
  */
class SketchSpec extends SparkSuite {

  private def ev = Tables.events(spark, SparkSpec.sf0001)

  test("approx_count_distinct stays within its rsd bound of the exact count") {
    val row = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).collect().head
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.06,
      s"approx $approx vs exact $exact exceeds 3x rsd")
  }

  test("HLL sketch merge is exactly distributive: union of per-group sketches == global sketch") {
    val perGroup = ev.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().head.getLong(0)
    val global = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().head.getLong(0)
    // not approximately equal — EXACTLY equal: the union merges the same
    // registers the global aggregation builds, which is what makes the
    // sketch safe to compute map-side and combine
    assert(perGroup == global, s"union estimate $perGroup != global $global")
  }

  test("percentile_approx brackets the exact discrete percentile") {
    val row = ev.agg(
      percentile_approx(col("value"), lit(0.5), lit(10000)).as("approx"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("exact"),
      min(col("value")).as("lo"), max(col("value")).as("hi"))
      .collect().head
    val approx = row.getDouble(0)
    val exact = row.getDouble(1)
    val span = row.getDouble(3) - row.getDouble(2)
    assert(math.abs(approx - exact) <= 0.05 * span,
      s"approx p50 $approx too far from exact $exact (span $span)")
  }
}
