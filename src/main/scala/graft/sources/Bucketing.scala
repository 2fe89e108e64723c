package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location (SURVEY.md §5 scale strategy): pre-shuffle the
  * big fact tables ONCE at write time so every subsequent equi-join or
  * aggregation on the bucket key runs with NO exchange at all.
  *
  * At 100 TB the dominant cost of `orders ⋈ lineitem` is shuffling both
  * sides on the join key for every query that needs it. Writing both tables
  * `bucketBy(n, key)` + `sortBy(key)` materializes that shuffle once: each
  * bucket file holds one hash-slice of the key space, Spark's scan reports
  * `HashPartitioning(key, n)`, and EnsureRequirements inserts no Exchange —
  * the join degenerates to a per-bucket sort-merge (already sorted on disk).
  * BucketingSpec asserts the exchange-free plan.
  *
  * Pick `buckets` so a single bucket of the LARGEST table fits an executor's
  * task comfortably (~128-256 MB compressed): 100 TB / 256 MB ≈ 400 k —
  * round to a power of two and co-partition every table that joins on the
  * same key with the SAME bucket count, or Spark falls back to shuffling the
  * mismatched side.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (scan reports the bucket partitioning). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
