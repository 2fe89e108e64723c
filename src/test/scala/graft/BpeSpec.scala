package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

class BpeSpec extends SparkSuite {

  private def vocab(rows: (String, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("word", "freq")
  }

  test("overlapping occurrences merge greedily left-to-right (aaa → [aa, a])") {
    val (v, merges) = Bpe.learn(vocab("aaa" -> 5L), 1)
    val m = merges.collect().head
    assert(m.getAs[String]("lhs") == "a" && m.getAs[String]("rhs") == "a")
    // weighted count: 2 adjacent (a,a) pairs × freq 5
    assert(m.getAs[Long]("pair_freq") == 10L)
    val syms = v.collect().head.getAs[scala.collection.Seq[String]]("syms").toSeq
    assert(syms == Seq("aa", "a"), s"got $syms")
  }

  test("winner is (count DESC, lhs ASC, rhs ASC) — ties break lexicographically") {
    // "bc" and "ab" both occur 3 times; "ab" must win the tie
    val (_, merges) = Bpe.learn(vocab("ab" -> 3L, "bc" -> 3L), 1)
    val m = merges.collect().head
    assert(m.getAs[String]("lhs") == "a" && m.getAs[String]("rhs") == "b")
  }

  test("exhausted rounds are no-ops: vocab survives, no phantom merge row") {
    // round 1 merges the only pair (x,y); round 2 finds nothing — the
    // vocabulary must pass through untouched, not get wiped by the join
    val (v, merges) = Bpe.learn(vocab("a" -> 100L, "xy" -> 1L), 2)
    assert(merges.count() == 1)
    val byWord = v.collect().map(r =>
      r.getAs[String]("word") -> r.getAs[scala.collection.Seq[String]]("syms").toSeq).toMap
    assert(byWord("a") == Seq("a"))
    assert(byWord("xy") == Seq("xy"))
  }

  test("merge ranks are sequential and counts non-increasing on a real corpus") {
    val m = SparkEntry.queries("q122_bpe_merges")(spark, SparkSpec.sf0001)
      .collect()
    assert(m.map(_.getAs[Int]("merge_rank")).toSeq == Seq(1, 2, 3))
    val freqs = m.map(_.getAs[Long]("pair_freq")).toSeq
    assert(freqs == freqs.sorted.reverse, s"counts increased: $freqs")
  }
}
