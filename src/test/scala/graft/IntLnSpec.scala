package graft

import org.apache.spark.sql.functions._

import graft.functions.IntLn

/** Laws for the integer-only fixed-point ln (the q114/q117 quantization
  * primitive): accuracy vs Math.log over the full domain shape, exact
  * pinned values (so any change to the recurrence is a loud diff, since
  * the DuckDB twin must change in lockstep), and monotonicity.
  */
class IntLnSpec extends SparkSuite {

  private def run(ns: Seq[Long]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    ns.toDF("n").select(col("n"), IntLn.iln1e9(col("n")).as("iln"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("iln1e9 tracks ln within 2e-9 over the domain, including boundaries") {
    val rnd = new scala.util.Random(7)
    val cases = Seq(1L, 2L, 3L, 7L, 10L, 1000L, 999999937L,
      1L << 40, 10000000000000L, (1L << 60) - 1, 1L << 60, (1L << 61) - 1,
      1L << 61, (1L << 62) - 1) ++
      Seq.fill(500)(math.abs(rnd.nextLong()) % ((1L << 62) - 1) + 1)
    val got = run(cases.distinct)
    for ((n, v) <- got) {
      val err = math.abs(v - math.log(n.toDouble) * 1e9)
      assert(err < 2.0, s"n=$n iln=$v err=$err")
    }
    assert(got(1L) == 0L)
  }

  test("iln1e9 pinned values (DuckDB twin must match these exactly)") {
    val got = run(Seq(2L, 3L, 10L, 999999937L, 10000000000000L, (1L << 62) - 1))
    assert(got(2L) == 693147180L)
    assert(got(3L) == 1098612288L)
    assert(got(10L) == 2302585092L)
    assert(got(999999937L) == 20723265773L)
    assert(got(10000000000000L) == 29933606208L)
    assert(got((1L << 62) - 1) == 42975125194L)
  }

  test("iln1e9 is monotonic on consecutive integers near a normalization edge") {
    val ns = ((1L << 60) - 5 to (1L << 60) + 5).toSeq ++ (1L to 64L)
    val got = run(ns)
    for (Seq(a, b) <- ns.sorted.sliding(2))
      assert(got(a) <= got(b), s"monotonicity broke between $a and $b")
  }
}
