package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-16 operators. The DuckDB gate pins
  * exact values at sf0.01; these pin the artifact laws that must hold on
  * ANY corpus — the kNN-graph artifact's read-equals-rebuild identity
  * (q228), the CDC maintenance's persisted-tables-equal-from-scratch laws
  * (q229), and the streaming EL's batch-twin identity (q230).
  */
class R16QueriesSpec extends SparkSuite {
  import SparkSpec.sf0001

  // ---- q228 ----------------------------------------------------------------

  test("q228: artifact read equals an in-plan graph rebuild; pruned implies a >=0.4 neighbor edge") {
    val e = Tables.embeddings(spark, sf0001)
    // the consumer, off the persisted artifact
    val viaArtifact = SparkEntry.queries("q228_semdedup_knn_artifact")(
      spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // the same closure off a FRESH in-plan graph build (never touching the
    // catalog table) — write-once must not drift from rebuild
    val g = graft.sources.KnnGraphArtifact.graph(
      e.select(col("vec_id"), col("embedding")).localCheckpoint())
    val sem = g.filter(col("cos") >= 0.4)
      .select(col("u").as("src"), col("v").as("dst"))
    val comp = graft.graph.GraphOps.connectedComponentsDF(sem)
      .withColumnRenamed("id", "vec_id")
    val rebuilt = e.select(col("vec_id")).join(comp, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("component"), col("vec_id")).as("canonical"))
      .withColumn("pruned", col("canonical") =!= col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(viaArtifact === rebuilt)
    // law: pruned ⟺ canonical < vec_id (min-id representative survives)
    viaArtifact.foreach { case (id, canon, pruned) =>
      assert(pruned === (canon != id))
      assert(canon <= id)
    }
    // fixture sanity: the threshold actually splits — some pruned, some kept
    assert(viaArtifact.exists(_._3) && viaArtifact.exists(!_._3))
  }

  test("q228: the persisted graph table is exactly KnnGraphArtifact.graph's rows") {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val persisted = graft.sources.KnnGraphArtifact.read(spark, e, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fresh = graft.sources.KnnGraphArtifact.graph(e.localCheckpoint())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(persisted === fresh)
    // 3-regular up to corpus size: every u carries at most K neighbors
    val byU = persisted.groupBy(_._1)
    byU.foreach { case (u, edges) =>
      assert(edges.size <= graft.sources.KnnGraphArtifact.K, s"u=$u")
    }
  }

  // ---- q229 ----------------------------------------------------------------

  test("q229: maintained v2 signature + closure tables equal their from-scratch rebuilds") {
    val off = graft.queries.TextQueries.AddedDocIdOffset
    val v1 = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val survivors = v1.filter(col("doc_id") % 13 =!= 0)
    val added = v1.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + off).as("doc_id"),
        concat(lit("v2new "), col("text")).as("text"))
    val v2 = survivors.unionByName(added)
    // run the maintenance (the query does the same; direct call gives the
    // table names back)
    val removed = v1.filter(col("doc_id") % 13 === 0).select(col("doc_id"))
    val (sigT, cloT) = graft.sources.DedupClosure.maintainCdc(
      spark, v1, sf0001, survivors, added, removed, "cdcspec")
    // law 1: the persisted v2 closure equals the full recompute over v2
    val maintained = spark.table(cloT)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = graft.sources.DedupClosure.closure(v2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(maintained === full)
    // law 2: the persisted v2 signatures equal a from-scratch signature
    // build over v2 (content-keyed: survivor rows copy verbatim, delta
    // rows compute)
    val sigMaint = spark.table(sigT)
      .select(col("doc_id"), col("sig"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector)).toSet
    val sigFull = graft.dedup.DedupOps.minhashSignatureArray(
      graft.dedup.DedupOps.shingleTable(v2, "doc_id", "text", 3), 32)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector)).toSet
    assert(sigMaint === sigFull)
    // fixture sanity: tombstones actually removed rows, delta added some
    assert(sigMaint.forall { case (id, _) => id % 13 != 0 || id >= off })
    assert(sigMaint.exists { case (id, _) => id >= off })
  }

  // ---- q230 ----------------------------------------------------------------

  test("q230: streaming entity linking equals batch q34 row for row") {
    val streamed = SparkEntry.queries("q230_stream_entity_linking")(
      spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet
    val batch = SparkEntry.queries("q34_entity_linking")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
