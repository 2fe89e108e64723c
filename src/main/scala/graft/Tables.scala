package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver test tables (`TESTDATA.md`): one parquet file per
  * table under a scale-factor directory. Columnar parquet scans give Catalyst
  * filter pushdown + column pruning for free — the idiomatic replacement for
  * the reference's three full JSONL passes
  * (/root/reference/src/senzing_pipeline.py:63,227,333).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.parquet` has shipped `ts` in two physical forms across driver
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
    * read nanos as long and truncate to µs, identical to DuckDB's
    * TIMESTAMP_NS → TIMESTAMP cast) and plain TIMESTAMP(MICROS) without UTC
    * adjustment (inferred as TIMESTAMP_NTZ; cast to session-TZ timestamp —
    * an exact micros identity because every entry point pins
    * `spark.sql.session.timeZone=UTC`). Branch on the footer schema so both
    * generations load to the same µs TimestampType column. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    if (eventsTsIsLong(raw))
      raw.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else
      raw.withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast("timestamp"))
  }

  /** True when the events `ts` column decodes as raw nanos (legacy layout). */
  def eventsTsIsLong(raw: DataFrame): Boolean =
    raw.schema("ts").dataType == org.apache.spark.sql.types.LongType
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
