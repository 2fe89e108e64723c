package graft

import org.apache.spark.sql.functions._

import graft.text.{EntityLinking, TextRank}

class NlpSpec extends SparkSuite {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq((0L, "red widget small ring red widget"),
        (1L, "blue bolt blue bolt blue bolt")).toDF("doc_id", "text")
  }

  private def obs = {
    val s = spark
    import s.implicits._
    // alias "red" seen 3× for entity 1, 1× for entity 2
    Seq(("red", 1L), ("red", 1L), ("red", 1L), ("red", 2L), ("blue", 3L))
      .toDF("alias", "entity")
  }

  test("gazetteer priors sum to 1 per alias and are capped + deterministic") {
    val g = EntityLinking.gazetteer(obs, "alias", "entity", 8)
    val sums = g.groupBy("alias").agg(sum("prior").as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(sums("red") - 1.0) < 1e-12)
    val red = g.filter(col("alias") === "red").orderBy(col("prior").desc).collect()
    assert(red.head.getLong(1) == 1L && red.head.getDouble(2) == 0.75)
  }

  test("gazetteer cap keeps top-N by count with entity tiebreak") {
    val g = EntityLinking.gazetteer(obs, "alias", "entity", 1)
    val red = g.filter(col("alias") === "red").collect()
    assert(red.length == 1 && red.head.getLong(1) == 1L)
    // prior still normalized over ALL entities, not just the kept ones
    assert(red.head.getDouble(2) == 0.75)
  }

  test("mention candidates carry positions and priors") {
    val g = EntityLinking.gazetteer(obs, "alias", "entity", 8)
    val m = EntityLinking.mentionCandidates(docs, g)
    val reds = m.filter(col("token") === "red").collect()
    assert(reds.map(_.getInt(1)).toSet == Set(0, 4)) // both "red" positions, 2 cands each
    assert(reds.length == 4)
  }

  test("textrank ranks sum to ~1 per doc and favor frequent co-occurring tokens") {
    val toks = EntityLinking.tokenStream(docs, "doc_id", "text")
    val pr = TextRank.pageRank(toks, 2, 4)
    val sums = pr.groupBy("doc_id").agg(sum("rank").as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // fixed-point floor loses ≤1e-14 per edge; sums stay ≈ 1
    assert(sums.values.forall(s => math.abs(s - 1.0) < 1e-6))
    val d0 = pr.filter(col("doc_id") === 0).orderBy(col("rank").desc).collect()
    assert(Set("red", "widget").contains(d0.head.getString(1)))
  }
}
