package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.vector.VectorOps

class CosineSimilaritySpec extends SparkSuite {

  private def vecs = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
      (1L, Seq(0.1f, -0.2f, 0.3f), Seq(-0.4f, 0.5f, -0.6f)),
      (2L, Seq(1f, 0f, 0f), Seq(0f, 1f, 0f))).toDF("id", "a", "b")
  }

  test("native expression is bit-identical to the HOF fold") {
    GraftFunctions.register(spark)
    val out = vecs.select(
      VectorOps.cosine(col("a"), col("b")).as("hof"),
      call_function("cosine_sim", col("a"), col("b")).as("native")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null semantics match the HOF path: null input / length mismatch → null") {
    GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(1f))),          // length mismatch
      (None: Option[Seq[Float]], Some(Seq(1f))))   // null input
      .toDF("a", "b")
    val out = df.select(call_function("cosine_sim", col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("registered in SQL and survives whole-stage codegen") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("cv")
    val rows = spark.sql(
      "SELECT id, cosine_sim(a, b) AS c FROM cv WHERE cosine_sim(a, b) IS NOT NULL")
      .collect()
    assert(rows.length == 3)
    val orth = rows.find(_.getLong(0) == 2L).get.getDouble(1)
    assert(math.abs(orth) < 1e-12)
  }
}
