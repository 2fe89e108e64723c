package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Structured Streaming specs driven by MemoryStream — the streaming surface
  * has no DuckDB oracle, so invariants are locked here instead.
  */
case class Raw(event_id: Long, ts: Timestamp, user_id: Long,
               event_type: String, value: Double)

case class Doc(doc_id: Long, ts: Timestamp, text: String)

class StreamingSpec extends SparkSuite {

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  test("streaming tumbling agg emits finalized windows past the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Raw]
    val q = StreamOps.tumblingAgg(in.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("tumble")
      .outputMode("append").start()
    try {
      in.addData(
        Raw(0, ts(1), 1, "click", 1.0), Raw(1, ts(2), 1, "click", 2.0),
        Raw(2, ts(11), 2, "view", 3.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first two windows
      in.addData(Raw(3, ts(40), 1, "click", 4.0))
      q.processAllAvailable()
      val out = s.table("tumble").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(out.contains((ts(0), "click", 2L, 3.0)))
      assert(out.contains((ts(10), "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("streaming dedup drops repeated event_ids within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Raw]
    val q = StreamOps.dedup(in.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      in.addData(
        Raw(7, ts(1), 1, "click", 1.0),
        Raw(7, ts(1), 1, "click", 1.0),
        Raw(8, ts(2), 1, "view", 2.0))
      q.processAllAvailable()
      in.addData(Raw(7, ts(3), 1, "click", 1.0)) // dup again, still in horizon
      q.processAllAvailable()
      assert(s.table("dedup").collect().map(_.getLong(0)).sorted.toSeq == Seq(7L, 8L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer closes sessions on gap timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[StreamOps.Ev]
    val q = StreamOps.sessionizeWithState(in.toDS(), gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: events at 00:01 and 00:03 (one session), then silence
      in.addData(StreamOps.Ev(1, ts(1), 1.0), StreamOps.Ev(1, ts(3), 2.0))
      q.processAllAvailable()
      // a later event advances the watermark past 00:03+gap → session closes
      in.addData(StreamOps.Ev(2, ts(30), 9.0))
      q.processAllAvailable()
      in.addData(StreamOps.Ev(2, ts(59), 1.0))
      q.processAllAvailable()
      val out = s.table("sessions").as[StreamOps.Session].collect()
      val u1 = out.filter(_.user_id == 1)
      assert(u1.length == 1)
      assert(u1.head.n == 2 && u1.head.sum_value == 3.0)
      assert(u1.head.s_start == ts(1) && u1.head.s_end == ts(8))
    } finally q.stop()
  }

  test("stream-stream interval join pairs rows within the window, GCs by watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val errs = MemoryStream[Raw]
    val clicks = MemoryStream[Raw]
    val joined = StreamOps.intervalJoin(
      errs.toDF().select(col("user_id"), col("ts"), col("event_id")),
      clicks.toDF().select(col("user_id"), col("ts"), col("event_id")),
      keyCol = "user_id", windowSec = 10 * 60, watermark = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      errs.addData(Raw(100, ts(1), 1, "error", 0.0))
      clicks.addData(
        Raw(200, ts(2), 1, "click", 0.0),   // in window, same user
        Raw(201, ts(2), 2, "click", 0.0),   // other user
        Raw(202, ts(20), 1, "click", 0.0))  // outside 10-minute window
      q.processAllAvailable()
      val out = s.table("ssjoin").collect()
        .map(r => (r.getAs[Long]("l_event_id"), r.getAs[Long]("r_event_id"))).toSet
      assert(out == Set((100L, 200L)))
    } finally q.stop()
  }

  test("streaming near-dup dedup keeps first arrival per SimHash") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamOps.nearDupDedup(in.toDF(), "text", "10 minutes")
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      in.addData(
        Doc(0, ts(1), "the quick brown fox"),
        Doc(1, ts(2), "the quick brown fox"),   // exact dup -> same simhash
        Doc(2, ts(3), "fox brown quick the"),   // same token multiset -> same simhash
        Doc(3, ts(4), "completely different payload entirely"))
      q.processAllAvailable()
      assert(s.table("neardup").collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
        == Seq(0L, 3L))
    } finally q.stop()
  }

  test("streaming ingest pipeline: quality gate, masking, chunking, chunk dedup") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Doc]
    // a 12-token doc chunks into size-8/overlap-2 windows (stride 6 -> 2)
    val goodText = "the of and to in a is was data word text here"
    val q = StreamOps.ingestPipeline(in.toDF(), minQuality = 0.3,
        chunkSize = 8, overlap = 2, watermark = "10 minutes")
      .writeStream.format("memory").queryName("ingest")
      .outputMode("append").start()
    try {
      in.addData(
        Doc(0, ts(1), goodText),
        Doc(1, ts(2), goodText),            // full duplicate -> all chunks dedup'd
        Doc(2, ts(3), "zzzz9 qqqq8 xxxx7")) // low quality -> filtered out
      q.processAllAvailable()
      val out = s.table("ingest").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id"), r.getAs[String]("chunk")))
      // only doc 0 survives: doc 1 is chunk-identical, doc 2 fails quality
      assert(out.map(_._1).toSet == Set(0L))
      assert(out.map(_._2).sorted.toSeq == Seq(0, 1))
      // 12 tokens, size 8, stride 6: chunk 0 = tokens 1-8, chunk 1 = tokens 7-12
      assert(out.find(_._2 == 0).get._3 == "the of and to in a is was")
      assert(out.find(_._2 == 1).get._3 == "is was data word text here")
    } finally q.stop()
  }

  test("file-source stream: readEvents over a parquet directory aggregates correctly") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evstream").toFile.getAbsolutePath
    Seq(
      (0L, ts(1), 1L, "click", 2.0, """{"k":1}"""),
      (1L, ts(2), 2L, "click", 3.0, """{"k":2}"""),
      (2L, ts(12), 1L, "view", 4.0, """{"k":3}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val q = graft.streaming.StreamOps
      .tumblingAgg(graft.streaming.StreamOps.readEvents(s, dir), "10 minutes", "0 seconds")
      .writeStream.format("memory").queryName("filesrc")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val out = s.table("filesrc").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(out == Set((ts(0), "click", 2L, 5.0), (ts(10), "view", 1L, 4.0)))
    } finally q.stop()
  }

  test("batch and streaming tumbling aggs agree on the same data") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = Seq(
      Raw(0, ts(1), 1, "click", 1.5), Raw(1, ts(4), 1, "click", 2.5),
      Raw(2, ts(12), 2, "view", 3.0), Raw(3, ts(25), 3, "click", 4.0))
    val batch = graft.events.EventOps.tumblingAgg(rows.toDF(), "10 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val in = MemoryStream[Raw]
    val q = StreamOps.tumblingAgg(in.toDF(), "10 minutes", "0 seconds")
      .writeStream.format("memory").queryName("parity")
      .outputMode("complete").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val stream = s.table("parity").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(stream == batch)
    } finally q.stop()
  }

  test("q78 sequenced replay drops genuinely late rows and withholds open windows") {
    // The q78 gate mechanics in miniature: the streaming result must equal
    // the batch tumbling agg MINUS (a) the first-2-hours rows (delivered in
    // the last replay batch, behind the watermark -> dropped) and (b) the
    // windows whose end exceeds the final eviction watermark (append mode
    // withholds open windows). Mirrors the DuckDB oracle in Scala so a
    // semantics drift is caught before the external gate.
    val s = spark
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(s, d).select(col("ts"), col("event_type"), col("value"))
    val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
    val loUs = mm.getTimestamp(0).toInstant.getEpochSecond * 1000000L +
      mm.getTimestamp(0).toInstant.getNano / 1000L
    val hiUs = mm.getTimestamp(1).toInstant.getEpochSecond * 1000000L +
      mm.getTimestamp(1).toInstant.getNano / 1000L
    val wmUs = (hiUs / 1000L - 3600000L) * 1000L // ms-floored final watermark
    val expected = ev
      .filter(unix_micros(col("ts")) >= loUs + 2L * 3600000000L)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
      .filter(unix_micros(col("w_start")) + 3600000000L <= wmUs)
    val actual = graft.queries.StreamingQueries
      .queries("q78_stream_late_data")(s, d)
    assert(actual.collect().toSeq.sortBy(_.toString) ==
      expected.collect().toSeq.sortBy(_.toString))
    // and it genuinely differs from the naive batch agg (late rows exist)
    val naive = ev.groupBy(window(col("ts"), "1 hour"), col("event_type")).count().count()
    assert(actual.count() < naive)
  }

  test("ingest resumes from checkpoint with exactly-once output and restored dedup state") {
    // The production property the memory-sink gates can't show: stop the
    // ingest query, add more files, RESTART from the same checkpoint with
    // the fault-tolerant file sink — already-processed files are not
    // re-emitted (exactly-once), and a re-crawled duplicate arriving AFTER
    // the restart is suppressed by the dropDuplicates state restored from
    // the state store.
    val s = spark
    import s.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("ingest_src").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("ingest_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ingest_ckpt").toString
    val schema = "doc_id LONG, ts TIMESTAMP, text STRING"
    def docs(rows: (Long, String)*) =
      rows.map { case (id, t) => (id, ts((id % 50).toInt), t) }
        .toDF("doc_id", "ts", "text")
    def runOnce(): Unit = {
      val q = StreamOps.ingestPipeline(
          s.readStream.schema(schema).parquet(srcDir),
          minQuality = 0.0, chunkSize = 4, overlap = 1, watermark = "2 hours")
        .writeStream.format("parquet")
        .option("path", sinkDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val text0 = "the quick brown fox jumps over the lazy dog"
    docs((0L, text0), (1L, "pack my box with five dozen jugs"))
      .write.mode("append").parquet(srcDir)
    runOnce()
    val phase1 = s.read.parquet(sinkDir).select("fp").collect().map(_.getString(0))
    assert(phase1.nonEmpty)
    // phase 2: one genuinely new doc + one re-crawl of doc 0 (same text)
    docs((2L, "sphinx of black quartz judge my vow"), (3L, text0))
      .write.mode("append").parquet(srcDir)
    runOnce()
    val all = s.read.parquet(sinkDir).select("fp", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // exactly-once: no fp appears twice — phase-1 files were not re-emitted
    // AND the re-crawled doc 3 was suppressed by the RESTORED dedup state
    assert(all.map(_._1).distinct.length == all.length,
      s"duplicate fingerprints after restart: ${all.mkString(", ")}")
    assert(!all.exists(_._2 == 3L), "re-crawled duplicate must not re-emit")
    assert(all.exists(_._2 == 2L), "genuinely new doc must flow through")
    // and the surviving fp set equals the one-shot batch semantics
    val batchFps = docs((0L, text0), (1L, "pack my box with five dozen jugs"),
        (2L, "sphinx of black quartz judge my vow"), (3L, text0))
      .select(posexplode(graft.text.TextOps.chunks(
        graft.text.TextOps.maskPii(col("text")), 4, 1)).as(Seq("cid", "chunk")))
      .select(md5(col("chunk")).as("fp")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(all.map(_._1).toSet == batchFps)
  }
}
