package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Senzing

/** Fixture-driven spec for the Senzing export surface: the JSONL below
  * exercises every branch observed in the reference (bearer filter, dead-MISC
  * type inference, description order, empty-MATCH_KEY default, record dedup,
  * match-level alias filter, has_ref propagation).
  */
class SenzingSpec extends SparkSuite {

  private def feat(k: String, v: String) = s""""$k": [{"FEAT_DESC": "$v"}]"""

  private lazy val exportPath: String = {
    val dir = Files.createTempDirectory("senzing").toFile
    val f = new java.io.File(dir, "export.jsonl")
    val lines = Seq(
      // 1: full ORG — all description segments, country GB resolves
      s"""{"RESOLVED_ENTITY": {"ENTITY_ID": 1, "ENTITY_NAME": "Acme Corp",
         |"FEATURES": {${feat("NAME", "Acme Corp")}, ${feat("RECORD_TYPE", "ORGANIZATION")},
         |${feat("ADDRESS", "1 Main St")}, ${feat("DUNS_NUMBER", "123")},
         |${feat("PHONE", "555")}, ${feat("COUNTRY_OF_ASSOCIATION", "GB")},
         |${feat("WEBSITE", "acme.com")}},
         |"RECORDS": [
         |  {"DATA_SOURCE": "icij", "RECORD_ID": "r1", "MATCH_KEY": "", "ENTITY_DESC": "", "INTERNAL_ID": 11},
         |  {"DATA_SOURCE": "ICIJ", "RECORD_ID": "r1", "MATCH_KEY": "NAME", "ENTITY_DESC": "Acme Corp", "INTERNAL_ID": 11},
         |  {"DATA_SOURCE": "open", "RECORD_ID": "r2", "MATCH_KEY": "ADDR", "ENTITY_DESC": "ACME", "INTERNAL_ID": 12}]},
         |"RELATED_ENTITIES": [
         |  {"ENTITY_ID": 2, "MATCH_LEVEL_CODE": "POSSIBLY_SAME"},
         |  {"ENTITY_ID": 5, "MATCH_LEVEL_CODE": "POSSIBLY_RELATED"}]}""",
      // 2: PER with unknown country (no ", in" segment)
      s"""{"RESOLVED_ENTITY": {"ENTITY_ID": 2, "ENTITY_NAME": "John Doe",
         |"FEATURES": {${feat("NAME", "John Doe")}, ${feat("RECORD_TYPE", "PERSON")},
         |${feat("DOB", "1970-01-01")}, ${feat("PHONE", "777")},
         |${feat("ADDRESS", "2 Side St")}, ${feat("GROUP_ASSOCIATION", "Acme")},
         |${feat("COUNTRY_OF_ASSOCIATION", "XX")}},
         |"RECORDS": [{"DATA_SOURCE": "icij", "RECORD_ID": "p1", "MATCH_KEY": "NAME", "ENTITY_DESC": "John Doe", "INTERNAL_ID": 21}]},
         |"RELATED_ENTITIES": [{"ENTITY_ID": 1, "MATCH_LEVEL_CODE": "DISCLOSED"}]}""",
      // 3: bearer pseudo-name — dropped from the KB
      s"""{"RESOLVED_ENTITY": {"ENTITY_ID": 3, "ENTITY_NAME": "The Bearer",
         |"FEATURES": {${feat("NAME", "The Bearer")}},
         |"RECORDS": []},
         |"RELATED_ENTITIES": []}""",
      // 4: no NAME feature + empty ENTITY_NAME — dropped everywhere
      s"""{"RESOLVED_ENTITY": {"ENTITY_ID": 4, "ENTITY_NAME": "",
         |"FEATURES": {${feat("ADDRESS", "nowhere")}},
         |"RECORDS": []},
         |"RELATED_ENTITIES": []}""",
      // 5: no RECORD_TYPE, no DOB/GROUP — lands in ORG (dead-MISC semantics);
      //    no records at all → name falls back to uid
      s"""{"RESOLVED_ENTITY": {"ENTITY_ID": 5, "ENTITY_NAME": "Mystery Ltd",
         |"FEATURES": {${feat("NAME", "Mystery Ltd")}},
         |"RECORDS": []},
         |"RELATED_ENTITIES": []}""",
      // 6: no RECORD_TYPE but DOB → PER via the fallthrough branch
      s"""{"RESOLVED_ENTITY": {"ENTITY_ID": 6, "ENTITY_NAME": "Jane Roe",
         |"FEATURES": {${feat("NAME", "Jane Roe")}, ${feat("DOB", "1980-02-02")}},
         |"RECORDS": [{"DATA_SOURCE": "icij", "RECORD_ID": "p2", "MATCH_KEY": "", "ENTITY_DESC": "Jane Roe", "INTERNAL_ID": 61}]},
         |"RELATED_ENTITIES": []}"""
    ).map(_.stripMargin.replace("\n", " "))
    Files.write(f.toPath, String.join("\n", lines: _*).getBytes)
    f.getAbsolutePath
  }

  private lazy val countries = {
    val s = spark
    import s.implicits._
    Seq(("GB", "United Kingdom"), ("PA", "Panama")).toDF("code", "country")
  }

  private lazy val raw = Senzing.readExport(spark, exportPath).cache()

  test("entities: filters, type inference, ordered description synthesis") {
    val out = Senzing.entities(raw, countries).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(3))).toMap
    assert(out.keySet == Set("1", "2", "5", "6")) // 3 bearer-dropped, 4 nameless
    assert(out("1") == ("ORG",
      "Acme Corp, located at 1 Main St, DUNS 123, phone 555, in United Kingdom, website acme.com"))
    assert(out("2") == ("PER",
      "John Doe, born 1970-01-01, phone 777, located at 2 Side St, associated with Acme"))
    assert(out("5")._1 == "ORG") // dead-MISC: no features at all still ORG
    assert(out("6")._1 == "PER") // DOB fallthrough
  }

  test("bearer filter accepts real names, rejects the recorded pseudo-names") {
    val s = spark
    import s.implicits._
    val cases = Seq("the bearer", "EL PORTADOR", "bearer 1234", "Bearer Shares",
      "nan", "???", "-to the bearer. 5a", "Acme Corp", "bearer island hotel")
    val kept = cases.toDF("name").filter(Senzing.bearerKeep(trim(col("name"))))
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("Acme Corp", "bearer island hotel"))
  }

  test("aliasRecords: record + match-level-filtered related aliases, raw-keyed type") {
    val recs = Senzing.aliasRecords(raw).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    // record aliases (incl. empty ENTITY_DESC string — reference keeps them)
    assert(recs.contains(("Acme Corp", 11L, "ORG")))
    assert(recs.contains(("ACME", 12L, "ORG")))
    // related: POSSIBLY_SAME + DISCLOSED kept, POSSIBLY_RELATED dropped
    assert(recs.contains(("Acme Corp", 2L, "ORG")))
    assert(recs.contains(("John Doe", 1L, "PER"))) // raw-keyed: DOB → PER
    assert(!recs.exists { case (_, e, _) => e == 5L })
    // entity 4 (empty ENTITY_NAME) contributes nothing
    assert(!recs.exists { case (a, _, _) => a == "nowhere" })
  }

  test("aliases: P(entity|alias) with deterministic array order") {
    val s = spark
    import s.implicits._
    val recs = Seq(("X", "7", "ORG"), ("X", "7", "ORG"), ("X", "8", "ORG"))
      .toDF("alias", "entity", "type")
    val row = Senzing.aliases(recs.withColumn("entity", col("entity").cast("long")))
      .filter(col("alias") === "X").collect().head
    assert(row.getSeq[String](1) == Seq("7", "8"))
    assert(row.getSeq[Double](2).zip(Seq(2.0 / 3, 1.0 / 3))
      .forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("withSelfAliases appends each entity's own name at probability 1") {
    val ents = Senzing.entities(raw, countries)
    val base = Senzing.aliases(Senzing.aliasRecords(raw))
    val all = Senzing.withSelfAliases(base, ents)
    assert(all.count() == base.count() + ents.count())
    val self = all.filter(org.apache.spark.sql.functions.col("alias") === "Mystery Ltd")
      .collect().head
    assert(self.getSeq[String](1) == Seq("5"))
    assert(self.getSeq[Double](2) == Seq(1.0))
  }

  test("graph: record-uid dedup, name fallback, INITIAL default, has_ref") {
    val v = Senzing.graphVertices(raw).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(v(1L) == ("Acme Corp", 2)) // ICIJ.r1 deduped; first non-empty desc
    assert(v(5L) == ("5", 0))         // nameless record set → uid fallback
    val recs = Senzing.recordTable(raw).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(recs.contains((1L, "ICIJ.r1", "INITIAL"))) // empty MATCH_KEY default
    assert(recs.contains((6L, "ICIJ.p2", "INITIAL")))
    val hr = Senzing.withHasRef(Senzing.graphVertices(raw),
      Senzing.graphEdges(raw)).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(hr(1L))  // has records + referenced
    assert(hr(5L))  // no records but neighbor of 1
    assert(!hr(3L)) // no records, never referenced
  }

  test("end-to-end CLI flow: export → KB → graph → seeds → 2-hop closure → alias report") {
    // The reference's full command-line journey (senzing_pipeline.py main +
    // analysis seeds→2-hop) on one synthetic export: a 1-2-3-4-5 chain, a
    // 6-7 island, an isolated 8. Seeds {Node One, Node Six} must close to
    // exactly {1,2,3} ∪ {6,7} at radius 2, and the closure's alias report
    // must split the shared "Shadow Ltd" record alias 50/50.
    val dir = Files.createTempDirectory("senzing_e2e").toFile
    def ent(id: Long, name: String, rels: Seq[Long], desc: String, iid: Long) =
      s"""{"RESOLVED_ENTITY": {"ENTITY_ID": $id, "ENTITY_NAME": "$name",
         |"FEATURES": {${feat("NAME", name)}, ${feat("RECORD_TYPE", "ORGANIZATION")}},
         |"RECORDS": [{"DATA_SOURCE": "icij", "RECORD_ID": "r$id", "MATCH_KEY": "NAME", "ENTITY_DESC": "$desc", "INTERNAL_ID": $iid}]},
         |"RELATED_ENTITIES": [${rels.map(r =>
             s"""{"ENTITY_ID": $r, "MATCH_LEVEL_CODE": "POSSIBLY_SAME"}""").mkString(", ")}]}"""
        .stripMargin.replace("\n", " ")
    val lines = Seq(
      ent(1, "Node One", Seq(2), "Node One", 101),
      ent(2, "Node Two", Seq(3), "Shadow Ltd", 102),
      ent(3, "Node Three", Seq(4), "Shadow Ltd", 103),
      ent(4, "Node Four", Seq(5), "Node Four", 104),
      ent(5, "Node Five", Seq(), "Node Five", 105),
      ent(6, "Node Six", Seq(7), "Node Six", 106),
      ent(7, "Node Seven", Seq(), "Node Seven", 107),
      ent(8, "Node Eight", Seq(), "Node Eight", 108))
    val ef = new java.io.File(dir, "export.jsonl")
    Files.write(ef.toPath, String.join("\n", lines: _*).getBytes)
    val sf = new java.io.File(dir, "suspicions.txt")
    Files.write(sf.toPath, "Node One   \nNode Six\n".getBytes) // rtrim exercised

    val raw2 = Senzing.readExport(spark, ef.getAbsolutePath)
    val kb = Senzing.withSelfAliases(
      Senzing.aliases(Senzing.aliasRecords(raw2)),
      Senzing.entities(raw2, countries))
    assert(kb.filter(col("alias") === "Shadow Ltd").count() == 1)

    val edges = graft.graph.GraphOps.symmetrize(
      Senzing.graphEdges(raw2).select(col("src"), col("dst")))
    val seeds = Senzing.graphVertices(raw2)
      .join(Senzing.readSuspicions(spark, sf.getAbsolutePath), Seq("name"))
      .select(col("id"))
    assert(seeds.count() == 2)
    val closure = graft.graph.GraphOps.kHop(edges, seeds, 2)
      .collect().map(_.getLong(0)).toSet
    assert(closure == Set(1L, 2L, 3L, 6L, 7L))

    val s = spark
    import s.implicits._
    val cids = closure.toSeq.toDF("cid")
    val rawClosure = raw2
      .join(cids, col("RESOLVED_ENTITY.ENTITY_ID") === col("cid")).drop("cid")
    val rep = Senzing.aliases(
      Senzing.aliasRecords(rawClosure, includePossiblyRelated = false))
    val shadow = rep.filter(col("alias") === "Shadow Ltd").collect().head
    assert(shadow.getSeq[String](1) == Seq("102", "103"))
    assert(shadow.getSeq[Double](2) == Seq(0.5, 0.5))
    assert(shadow.getLong(3) == 2L)
  }

  test("jsonl round-trip: entities sink re-reads identically") {
    val dir = Files.createTempDirectory("sink").toFile.getAbsolutePath
    val ents = Senzing.entities(raw, countries)
    Senzing.writeJsonl(ents, dir)
    val back = spark.read.json(dir)
    assert(back.count() == ents.count())
    assert(back.select("entity_id", "type", "name", "description").collect().toSet ==
      ents.collect().toSet)
  }

  test("flagship fixture golden: 17 seed names → 33 vertices → 185-entity closure") {
    // The fixture-scale twin of the reference's pinned 17-seed → 29-id
    // closure (/root/reference/dev.ipynb cell 141): q98's seed match and
    // 2-hop expansion land on exact golden counts (independently re-derived
    // by a Python/DuckDB walk over the same JSONL). Two of the 17 names
    // match nothing — "Nonexistent Company XYZ" by design, and
    // "Entity 102 Corp" because entity 102's NAME feature is a bearer
    // pseudo-name (102 % 17 == 0), exactly the high-precision/low-recall
    // exact-match miss the reference comments on (senzing_pipeline.py:381).
    // At the 10k-entity fixture scale the "bearer warrant" seed name matches
    // 19 distinct vertices (every k%17==0 entity whose first ENTITY_DESC is
    // that pseudo-name) — the realistic exact-name multi-match the
    // reference's precision comment warns about; the graph has no
    // blacklist, only the KB does.
    val s = spark
    import s.implicits._
    val path = graft.sources.SenzingFixture.ensureWritten()
    val fraw = Senzing.readExport(s, path)
    val verts = Senzing.graphVertices(fraw)
    val seeds = verts
      .join(broadcast(graft.sources.SenzingFixture.seedNames.toDF("name")),
        Seq("name"))
      .select(col("id"))
    val seedIds = seeds.as[Long].collect().toSet
    assert(seedIds.size == 33)
    assert(seedIds.contains(119L))  // bearer-named vertex seeds the graph
    assert(seedIds.contains(765L))  // ...as do its 10k-scale name twins
    assert(!seedIds.contains(102L)) // bearer NAME broke the exact match
    val closure = graft.graph.GraphOps.kHop(
      Senzing.graphEdges(fraw).select(col("src"), col("dst")), seeds, 2)
    assert(closure.count() == 185L)
  }

  test("10k fixture export scans multi-partition and splits losslessly") {
    // The ~8 MB line-delimited export must SPLIT — at cluster scale a real
    // export is hundreds of GB and a one-partition JSON scan serializes the
    // whole pipeline behind a single task. Lowering maxPartitionBytes below
    // the file size forces the split locally; the entity KB must come back
    // identical, proving no record straddles a split boundary incorrectly.
    val path = graft.sources.SenzingFixture.ensureWritten()
    val whole = Senzing.entities(Senzing.readExport(spark, path), countries)
      .collect().toSet
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", 1L << 20)
      val raw = Senzing.readExport(spark, path)
      assert(raw.rdd.getNumPartitions > 1)
      assert(Senzing.entities(raw, countries).collect().toSet == whole)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
