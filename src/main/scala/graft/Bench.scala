package graft
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Output goes BOTH to stdout (one JSON line, the driver contract) and to a
  * file (`BENCH.json`, or `SPARK_GRAFT_BENCH_OUT`) so a truncated stdout tail
  * can never lose per-query entries.
  *
  * Measures STEADY-STATE: one warm-up pass first (JIT + whole-stage-codegen
  * compilation dominate cold numbers — cold-vs-warm varies 2× run to run),
  * then `SPARK_GRAFT_REPEATS` (default 3) timed passes with a forced GC
  * before every query so collector debt from query N doesn't bill query N+1.
  * Per-query "queries" is the MEDIAN across passes; "queries_min" /
  * "queries_max" expose the spread so run-to-run variance is visible in the
  * artifact itself. The headline total is the sum of medians. Set
  * SPARK_GRAFT_WARMUP=0 to skip warm-up, SPARK_GRAFT_REPEATS=1 for a quick
  * single-pass run.
  *
  * The timed action is a `noop`-format WRITE, not count(): under a count
  * Catalyst eliminates final sorts and prunes the project (EliminateSorts
  * below an aggregate), flattering ordered queries — the noop sink executes
  * the full result plan while discarding rows. A query that throws is
  * reported as time -1 and listed in "errors" instead of masquerading as a
  * fast success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt.max(1)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    // optional comma-separated query-name filter for focused A/B runs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = (only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None => SparkEntry.queries
    }).toSeq.sortBy(_._1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Tables.events relies on NTZ→timestamp being an exact micros
      // identity; pin UTC here so the invariant holds under bare
      // java/spark-submit launches, not only sbt-forked ones.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runFull(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    def timedPass(): Seq[(String, Double)] = selected.map { case (name, fn) =>
      // settle GC debt from the previous query before the clock starts
      System.gc()
      val t0 = System.nanoTime()
      val ok = try { runFull(fn); true } catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // caches populated inside queries alias by logical plan — clear between
    // passes so every pass measures the real plans, not a cache read
    def clearState(): Unit = spark.sharedState.cacheManager.clearCache()
    val warmupTimes: Seq[(String, Double)] = if (warmup) {
      val w = timedPass(); clearState(); w
    } else Seq.empty
    val passes: Seq[Map[String, Double]] = (1 to repeats).map { _ =>
      val p = timedPass(); clearState(); p.toMap
    }
    val names = selected.map(_._1)
    def stats(name: String): (Double, Double, Double) = {
      val ts = passes.map(_(name)).sorted
      if (ts.head < 0) (-1.0, -1.0, -1.0)
      else (ts.head, ts(ts.length / 2), ts.last)
    }
    val med = names.map(n => n -> stats(n)._2)
    val mn = names.map(n => n -> stats(n)._1)
    val mx = names.map(n => n -> stats(n)._3)
    def js(m: Seq[(String, Double)]) =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errors = med.collect { case (k, v) if v < 0 => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = med.collect { case (_, v) if v >= 0 => v }.sum
    // Flagship stage-level timings: the two composites (q98/q116) hide
    // stage regressions inside their whole-query medians, so time each
    // CUMULATIVE stage prefix once in the warm JVM — a wrong-plan stage
    // shows as a jump between consecutive entries, no bisect needed.
    // Skipped under SPARK_GRAFT_ONLY (focused A/B runs) or
    // SPARK_GRAFT_STAGES=0.
    val stageFams: Seq[(String, Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)])] = Seq(
      "q98_erkg_flagship" -> graft.queries.SenzingQueries.flagshipStages,
      "q116_corpus_flagship" -> graft.queries.TextQueries.flagshipStages,
      "q79_hybrid_linking" -> graft.queries.NlpQueries.hybridStages,
      "q226_corpus_release" -> graft.queries.TextQueries.releaseStages)
    val doStages = only.isEmpty && sys.env.getOrElse("SPARK_GRAFT_STAGES", "1") != "0"
    val stageJson =
      if (!doStages) "{}"
      else stageFams.map { case (q, sts) =>
        val ts = sts.map { case (sn, fn) =>
          System.gc()
          val t0 = System.nanoTime()
          val ok = try { runFull(fn); true } catch { case _: Throwable => false }
          sn -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
        }
        s"\"" + q + "\":" + js(ts)
      }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","repeats":$repeats,"queries":${js(med)},"queries_min":${js(mn)},"queries_max":${js(mx)},"warmup_queries":${js(warmupTimes)},"stages":$stageJson,"errors":$errors,"sf":"$sfDir"}"""
    Files.write(Paths.get(outPath), json.getBytes(StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
