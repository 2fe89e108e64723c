package graft

import org.apache.spark.sql.functions._

import graft.ml.LogReg

class LogRegSpec extends SparkSuite {

  test("fastSigmoid: 0 ↦ 0.5, monotonic, bounded in (0, 1)") {
    val s = spark
    import s.implicits._
    val zs = Seq(-100.0, -2.0, -0.5, 0.0, 0.5, 2.0, 100.0)
    val out = zs.toDF("z").select(LogReg.fastSigmoid(col("z")).as("s"))
      .collect().map(_.getDouble(0))
    assert(out(3) == 0.5)
    assert(out.sliding(2).forall { case Array(a, b) => a < b })
    assert(out.forall(v => v > 0.0 && v < 1.0))
  }

  test("train separates linearly separable labels") {
    val s = spark
    import s.implicits._
    // y=1 ⇔ the single feature is 1.0; bias + one feature, 5 GD rounds
    val feats = (0 until 40).map { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      (i.toLong, y, 1.0, y)
    }.toDF("id", "y", "f0", "f1").cache()
    val w = LogReg.train(feats, Seq("f0", "f1"), "y", 5, 0.5)
    feats.unpersist()
    assert(w(1) > 0.0) // the informative feature gets positive weight
    val sPos = 0.5 + (w(0) + w(1)) / (2.0 * (1.0 + math.abs(w(0) + w(1))))
    val sNeg = 0.5 + w(0) / (2.0 * (1.0 + math.abs(w(0))))
    assert(sPos > sNeg)
  }

  test("train is deterministic across partition layouts") {
    val s = spark
    import s.implicits._
    val base = (0 until 30).map(i =>
      (i.toLong, (i % 3 == 0).compareTo(false).toDouble, 1.0, i / 30.0))
    val w1 = LogReg.train(base.toDF("id", "y", "f0", "f1").repartition(1),
      Seq("f0", "f1"), "y", 4, 0.5)
    val w32 = LogReg.train(base.toDF("id", "y", "f0", "f1").repartition(32),
      Seq("f0", "f1"), "y", 4, 0.5)
    assert(w1.toSeq == w32.toSeq) // fixed-point sums: bit-equal, any layout
  }
}
