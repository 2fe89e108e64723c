package graft

import org.apache.spark.sql.functions._

import graft.text.FuzzyMatch

class FuzzySpec extends SparkSuite {

  private def aliasDf(names: String*) = {
    val s = spark
    import s.implicits._
    names.toDF("alias")
  }

  private def probeDf(tokens: String*) = {
    val s = spark
    import s.implicits._
    tokens.toDF("token")
  }

  test("misspelled mention finds its alias (the reference's fuzzy-search recall)") {
    // "fonseka" vs alias "fonseca": one substitution — exact-surface matching
    // returns nothing, the fuzzy path must recover it.
    val out = FuzzyMatch.fuzzyCandidates(
      probeDf("fonseka"), aliasDf("fonseca", "mossack", "widget"), 2, 2, 5)
      .collect()
    assert(out.length == 1)
    assert(out.head.getString(1) == "fonseca" && out.head.getInt(2) == 1)
  }

  test("exact match ranks first at distance 0") {
    val out = FuzzyMatch.fuzzyCandidates(
      probeDf("widget"), aliasDf("widget", "widgets", "gadget"), 2, 2, 5)
      .orderBy(col("rn")).collect()
    assert(out.head.getString(1) == "widget" && out.head.getInt(2) == 0
      && out.head.getInt(3) == 1)
    // "widgets" is one insertion away and ranks second
    assert(out(1).getString(1) == "widgets" && out(1).getInt(2) == 1)
  }

  test("maxDist filters far candidates; unrelated tokens yield nothing") {
    val out = FuzzyMatch.fuzzyCandidates(
      probeDf("zzzzzz"), aliasDf("widget", "bolt", "ring"), 2, 2, 5).collect()
    assert(out.isEmpty)
  }

  test("topK caps candidates per probe deterministically") {
    val out = FuzzyMatch.fuzzyCandidates(
      probeDf("bolt"), aliasDf("bolt", "bolts", "bout", "belt", "boat", "bold"),
      2, 4, 3).collect()
    assert(out.length == 3)
    assert(out.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3))
    // distance-0 exact match always survives the cap
    assert(out.exists(r => r.getString(1) == "bolt" && r.getInt(2) == 0))
  }

  test("bigrams are deduplicated and guarded below length 2") {
    val s = spark
    import s.implicits._
    val out = Seq("aaa", "x", "").toDF("v")
      .select(col("v"), FuzzyMatch.bigrams(col("v")).as("bg")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("aaa") == Seq("aa")) // deduped
    assert(out("x").isEmpty && out("").isEmpty)
  }
}
