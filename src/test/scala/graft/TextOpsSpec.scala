package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

class TextOpsSpec extends SparkSuite {

  private def one(text: String, c: org.apache.spark.sql.Column): Seq[String] = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("text").select(c.as("v")).collect().head.getSeq[String](0)
  }

  test("chunks cover every token, stride by size-overlap, tail may be short") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = one(text, TextOps.chunks(col("text"), 4, 1)) // stride 3
    assert(out == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    // consecutive chunks share exactly `overlap` tokens
    assert(out(0).split(' ').last == out(1).split(' ').head)
  }

  test("chunks: doc shorter than size yields one chunk; empty doc yields none") {
    assert(one("a b", TextOps.chunks(col("text"), 4, 1)) == Seq("a b"))
    assert(one("   ", TextOps.chunks(col("text"), 4, 1)).isEmpty)
  }

  test("bigrams: adjacent pairs in order; short docs yield empty, not negative sequence") {
    val s = spark
    import s.implicits._
    val out = Seq("a b c", "  solo  ", "", "x y")
      .toDF("text")
      .select(TextOps.bigrams(col("text")).as("b"))
      .collect()
      .map(_.getSeq[org.apache.spark.sql.Row](0).map(r =>
        (r.getString(0), r.getString(1))))
    assert(out(0) == Seq(("a", "b"), ("b", "c")))
    assert(out(1).isEmpty && out(2).isEmpty)
    assert(out(3) == Seq(("x", "y")))
  }

  test("maskPii masks emails before digit runs, leaves clean text alone") {
    val s = spark
    import s.implicits._
    val out = Seq(
      "contact bob99@mail.example.com or call 555 1234",
      "Customer#000000001",
      "no pii here").toDF("text")
      .select(TextOps.maskPii(col("text")).as("m")).collect().map(_.getString(0))
    assert(out(0) == "contact <EMAIL> or call <NUM> <NUM>")
    assert(out(1) == "Customer#<NUM>")
    assert(out(2) == "no pii here")
  }
}
