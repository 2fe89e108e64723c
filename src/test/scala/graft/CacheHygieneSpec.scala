package graft

import graft.dedup.DedupOps
import graft.text.{EntityLinking, TextRank}

/** Library calls must leave NOTHING in the session cache registry (round-2
  * verdict #5): un-owned cache entries accumulate over a long-lived session
  * and alias by logical plan across unrelated queries. Loop invariants are
  * materialized via localCheckpoint instead — reuse without residue.
  */
class CacheHygieneSpec extends SparkSuite {

  test("dedup + textrank + span ops leave the cache registry empty") {
    val s = spark
    import s.implicits._
    s.sharedState.cacheManager.clearCache()
    val docs = Seq(
      (1L, "a b c a b d e"), (2L, "a b c a b d f"), (3L, "x y z w q r s"))
      .toDF("doc_id", "text")
    DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.3).collect()
    DedupOps.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.3).collect()
    DedupOps.minhashPairs(docs, "doc_id", "text", 3, 8, 2, 0.3).collect()
    val toks = EntityLinking.tokenStream(docs, "doc_id", "text")
    TextRank.pageRank(toks, 2, 2).collect()
    val spans = EntityLinking.ngramSpans(docs, 3)
    EntityLinking.phraseMentionsGlobal(spans,
      EntityLinking.phraseGazetteer(spans, 5)).collect()
    graft.text.RankedSearch.bm25TopK(docs, "doc_id", "text",
      Seq("a b").toDF("surface"), blockK = 2, topK = 3).collect()
    assert(s.sharedState.cacheManager.isEmpty,
      "a library op registered a cache entry it never released")
  }
}
