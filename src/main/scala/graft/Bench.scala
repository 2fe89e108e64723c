package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Measures STEADY-STATE: one warm-up pass first (JIT
  * + whole-stage-codegen compilation dominate cold numbers on this suite —
  * cold-vs-warm varies 2× run to run), then the timed pass. BOTH passes'
  * per-query times are emitted ("warmup_queries" / "queries") so
  * compile-noise artifacts are diagnosable from the JSON alone; the headline
  * total comes from the steady-state pass. Set SPARK_GRAFT_WARMUP=0 to time
  * the cold pass only.
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
    // optional comma-separated query-name filter for focused A/B runs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None => SparkEntry.queries
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runFull(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    def timedPass(): Map[String, Double] = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { runFull(fn); true } catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // BOTH passes are timed and reported (warm-up per-query times diagnose
    // JIT/codegen-compile noise from the artifact alone — a query that is
    // fast warm but 3× cold is compile-bound, not plan-bound); only the
    // steady-state pass feeds the headline total.
    val warmupTimes: Map[String, Double] = if (warmup) {
      val w = timedPass()
      // drop caches populated by the warm-up so the timed pass measures the
      // real plans (cache() inside queries would otherwise alias by logical
      // plan and turn the timed pass into a cache read)
      spark.sharedState.cacheManager.clearCache()
      w
    } else Map.empty
    val results = timedPass()
    def js(m: Map[String, Double]) =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(results)},"warmup_queries":${js(warmupTimes)},"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
