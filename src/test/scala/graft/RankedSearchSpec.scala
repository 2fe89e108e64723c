package graft

import org.apache.spark.sql.functions._

import graft.text.RankedSearch

/** BM25 ranked candidate search (the scored half of the reference's tantivy
  * surface): ranking quality + blocking + determinism invariants.
  */
class RankedSearchSpec extends SparkSuite {

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "mossack fonseca panama papers"),
      (2L, "fonseca wine cellars porto export"),
      (3L, "panama canal zone shipping registry"),
      (4L, "the mossack archive collection"),
      (5L, "widget catalog of common common common words"))
      .toDF("doc_id", "text")
  }

  private def mention(m: String*) = {
    val s = spark
    import s.implicits._
    m.toDF("surface")
  }

  test("multi-token mention ranks its true alias above substring noise") {
    // "mossack fonseca": doc 1 carries BOTH terms, docs 2/4 only one each —
    // the full-match doc must outrank every partial (substring-noise) match.
    val out = RankedSearch.bm25TopK(corpus, "doc_id", "text",
      mention("mossack fonseca"), blockK = 2, topK = 5).collect()
    assert(out.nonEmpty)
    val top = out.find(_.getInt(3) == 1).get
    assert(top.getLong(1) == 1L, s"expected doc 1 first, got ${top.getLong(1)}")
    val scores = out.sortBy(_.getInt(3)).map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores must be non-increasing in rank")
    // partial matches are still retrieved (ranked candidates, not a filter)
    assert(out.map(_.getLong(1)).toSet.intersect(Set(2L, 4L)).nonEmpty)
  }

  test("rarer term dominates: idf orders single-term matches") {
    // "panama" appears in 2 docs, "common" concentrated in doc 5 only; a
    // mention of both must rank the rare-term docs by tf-saturated idf, and
    // candidates come only from the RAREST token's postings when blockK=1.
    val out = RankedSearch.bm25TopK(corpus, "doc_id", "text",
      mention("panama common"), blockK = 1, topK = 5).collect()
    // rarest token is "common" (df=1) under (df asc, token asc) — blocking
    // admits only doc 5; scoring is exact BM25 over shared terms.
    assert(out.map(_.getLong(1)).toSet == Set(5L))
  }

  test("tfidfCosinePairs: identical docs hit cosine 1, df-pruned tokens can't pair") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),          // exact dup of 1 → cosine 1.0
      (3L, "delta epsilon zeta"),        // shares nothing kept with 1/2
      (4L, "alpha beta other words here"))
      .toDF("doc_id", "text")
    // maxDfFrac=1.0 keeps every token
    val out = RankedSearch.tfidfCosinePairs(docs, "doc_id", "text",
        maxDfFrac = 1.0, minCos = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out((1L, 2L)) - 1.0) < 1e-6)
    assert(!out.contains((1L, 3L)) && !out.contains((2L, 3L)))
    // a token in >maxDfFrac of docs is dropped BEFORE pairing: with the
    // fraction at 0.5, "alpha"/"beta" (df 3 of 4) stop linking doc 4
    val pruned = RankedSearch.tfidfCosinePairs(docs, "doc_id", "text",
        maxDfFrac = 0.5, minCos = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pruned.contains((1L, 4L)) && !pruned.contains((2L, 4L)))
    assert(pruned.contains((1L, 2L))) // "gamma" (df 2 of 4) still pairs them
  }

  test("blockK widens recall without changing scores of shared candidates") {
    val narrow = RankedSearch.bm25TopK(corpus, "doc_id", "text",
      mention("mossack fonseca"), blockK = 1, topK = 5)
      .select(col("doc_id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val wide = RankedSearch.bm25TopK(corpus, "doc_id", "text",
      mention("mossack fonseca"), blockK = 2, topK = 5)
      .select(col("doc_id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(narrow.keySet.subsetOf(wide.keySet))
    narrow.foreach { case (d, sc) => assert(wide(d) == sc,
      s"doc $d score changed with blockK: $sc vs ${wide(d)}") }
  }
}
