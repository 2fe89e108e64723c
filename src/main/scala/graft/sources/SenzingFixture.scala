package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Deterministic Senzing-export JSONL fixture for the ORACLE-BACKED Senzing
  * queries (q50/q51): the harness testdata has no Senzing export, so the
  * query itself materializes this fixed corpus on first use and both engines
  * — Spark via [[Senzing.readExport]], DuckDB via `read_json` — consume the
  * SAME file. Content exercises every observed branch of the reference
  * pipeline (/root/reference/src/senzing_pipeline.py): the bearer blacklist
  * (F1), the name-present filter (F2), the match-level predicate (F3), both
  * type-inference paths incl. the dead-MISC fallthrough (F6), the
  * order-sensitive description synthesis with country lookup (F7), and
  * record/related alias extraction.
  */
object SenzingFixture {

  val path = "/tmp/graft_senzing_fixture/export.jsonl"

  private def feat(k: String, v: String) = s""""$k": [{"FEAT_DESC": "$v"}]"""

  private def js(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Bearer pseudo-names hitting every blacklist pattern's boundary form. */
  private val bearerForms = Seq(
    "bearer", "the bearer", "to the bearer 123", "el portador", "al portador",
    "bearer shares", "the bearer (1,000)", "bearer warrant",
    "bearer shareholder", "the, bearer", "bearer (reedeem shares)",
    "the bearer (lost)", "bearer - x", "bearer \"a\"", "bearer 12-34",
    "bearer no. 5", "the bearer at 1,234", "nan", "???")

  /** Near-miss names that must SURVIVE the blacklist (each one edit away
    * from a pattern: extra words, missing article, non-matching tail). */
  private val nearMisses = Seq(
    "bearer of good news", "portador", "the bearers society",
    "bearer asset management", "nanette", "?!?")

  /** Deterministic generated entity (pure function of k, ids 100-399):
    * cycles all 11 feature keys (incl. the pipeline-ignored REL_ANCHOR /
    * REL_POINTER), all 4 match levels, empty names (F2), empty MATCH_KEY
    * (INITIAL default), empty first ENTITY_DESC (name fallback), an
    * empty-string country (present() boundary), and bearer boundary
    * strings on both sides of the blacklist. */
  private def genLine(k: Int): String = {
    val name =
      if (k % 13 == 0) ""
      else if (k % 17 == 0) bearerForms((k / 17) % bearerForms.length)
      else if (k % 19 == 0) nearMisses((k / 19) % nearMisses.length)
      else if (k % 5 == 0) s"Person $k"
      else s"Entity $k Corp"
    val fs = Seq.newBuilder[(String, String)]
    if (name.nonEmpty) fs += "NAME" -> name
    if (k % 5 == 0) fs += "RECORD_TYPE" -> "PERSON"
    if (k % 5 == 1) fs += "RECORD_TYPE" -> "ORGANIZATION"
    if (k % 5 == 2 || k % 7 == 0) fs += "DOB" -> s"19${50 + k % 40}-01-0${1 + k % 9}"
    if (k % 5 == 3 || k % 11 == 0) fs += "GROUP_ASSOCIATION" -> s"Group ${k % 20}"
    if (k % 2 == 0) fs += "ADDRESS" -> s"$k Main St"
    if (k % 3 == 0) fs += "DUNS_NUMBER" -> s"D$k"
    if (k % 4 <= 1) fs += "PHONE" -> s"555-$k"
    if (k % 6 == 0) fs += "WEBSITE" -> s"www.e$k.example"
    (if (k % 20 == 5) Some("")
     else k % 4 match {
       case 0 => Some("GB"); case 1 => Some("PA"); case 2 => Some("XX")
       case _ => None
     }).foreach(c => fs += "COUNTRY_OF_ASSOCIATION" -> c)
    if (k % 8 == 0) fs += "REL_ANCHOR" -> s"A$k"
    if (k % 9 == 0) fs += "REL_POINTER" -> s"P${k % 50}"
    val feats = fs.result()
      .map { case (key, v) => feat(key, js(v)) }.mkString(", ")
    val recs = (0 until k % 4).map { j =>
      val mk = j match { case 0 => ""; case 1 => "NAME"; case _ => "NAME+DOB" }
      val desc =
        if (j == 0 && k % 10 == 7) "" // name-fallback boundary (graphVertices)
        else if (j == 0 && name.nonEmpty) name
        else s"Alias $k-$j"
      val ds = Seq("icij", "open", "oc")(j % 3)
      s"""{"DATA_SOURCE": "$ds", "RECORD_ID": "r$k-$j", "MATCH_KEY": "$mk", "ENTITY_DESC": "${js(desc)}", "INTERNAL_ID": ${k * 100 + j}}"""
    }
    val levels = Seq("RESOLVED", "POSSIBLY_SAME", "POSSIBLY_RELATED", "DISCLOSED")
    val rels = (0 until k % 5).map { r =>
      s"""{"ENTITY_ID": ${100 + ((k * 7 + r * 13) % genCount)}, "MATCH_LEVEL_CODE": "${levels((k + r) % 4)}"}"""
    }
    s"""{"RESOLVED_ENTITY": {"ENTITY_ID": $k, "ENTITY_NAME": "${js(name)}", "FEATURES": {$feats}, "RECORDS": [${recs.mkString(", ")}]}, "RELATED_ENTITIES": [${rels.mkString(", ")}]}"""
  }

  /** Generated-entity count (ids 100 until 100+genCount). ~10k entities ≈
    * 8 MB JSONL so q50/q51/q98 exercise a real-shape export volume — the
    * closure's broadcast path and the alias aggregation run over thousands
    * of vertices instead of a toy graph (VERDICT r8 item 8), and
    * SenzingSpec's split-scan test reads it multi-partition under a lowered
    * maxPartitionBytes. */
  val genCount = 9900

  /** One line per entity: 9 handcrafted branch exemplars (ids 1-9) plus
    * `genCount` generated rows (ids 100-9999) so the q50/q51/q98 gates
    * exercise the source at export scale instead of 6/11 output rows. */
  val lines: Seq[String] = handLines ++ (100 until 100 + genCount).map(genLine)

  private def handLines: Seq[String] = Seq(
    // 1: full ORG — every description segment, country GB resolves
    s"""{"RESOLVED_ENTITY": {"ENTITY_ID": 1, "ENTITY_NAME": "Acme Corp", "FEATURES": {${feat("NAME", "Acme Corp")}, ${feat("RECORD_TYPE", "ORGANIZATION")}, ${feat("ADDRESS", "1 Main St")}, ${feat("DUNS_NUMBER", "123")}, ${feat("PHONE", "555")}, ${feat("COUNTRY_OF_ASSOCIATION", "GB")}, ${feat("WEBSITE", "acme.com")}}, "RECORDS": [{"DATA_SOURCE": "icij", "RECORD_ID": "r1", "MATCH_KEY": "", "ENTITY_DESC": "Acme Corp", "INTERNAL_ID": 11}, {"DATA_SOURCE": "open", "RECORD_ID": "r2", "MATCH_KEY": "ADDR", "ENTITY_DESC": "ACME", "INTERNAL_ID": 12}]}, "RELATED_ENTITIES": [{"ENTITY_ID": 2, "MATCH_LEVEL_CODE": "POSSIBLY_SAME"}, {"ENTITY_ID": 5, "MATCH_LEVEL_CODE": "POSSIBLY_RELATED"}]}""",
    // 2: full PER — RECORD_TYPE PERSON, all PER segments, unknown country XX
    s"""{"RESOLVED_ENTITY": {"ENTITY_ID": 2, "ENTITY_NAME": "John Doe", "FEATURES": {${feat("NAME", "John Doe")}, ${feat("RECORD_TYPE", "PERSON")}, ${feat("DOB", "1970-01-01")}, ${feat("PHONE", "777")}, ${feat("ADDRESS", "2 Side St")}, ${feat("GROUP_ASSOCIATION", "Acme")}, ${feat("COUNTRY_OF_ASSOCIATION", "XX")}}, "RECORDS": [{"DATA_SOURCE": "icij", "RECORD_ID": "p1", "MATCH_KEY": "NAME", "ENTITY_DESC": "John Doe", "INTERNAL_ID": 21}]}, "RELATED_ENTITIES": [{"ENTITY_ID": 1, "MATCH_LEVEL_CODE": "DISCLOSED"}]}""",
    // 3: bearer pseudo-name — dropped from the entity KB (F1)
    s"""{"RESOLVED_ENTITY": {"ENTITY_ID": 3, "ENTITY_NAME": "The Bearer", "FEATURES": {${feat("NAME", "The Bearer")}}, "RECORDS": [{"DATA_SOURCE": "icij", "RECORD_ID": "b1", "MATCH_KEY": "", "ENTITY_DESC": "The Bearer", "INTERNAL_ID": 31}]}, "RELATED_ENTITIES": []}""",
    // 4: empty name — dropped by F2; records contribute NO aliases either
    s"""{"RESOLVED_ENTITY": {"ENTITY_ID": 4, "ENTITY_NAME": "", "FEATURES": {${feat("ADDRESS", "nowhere")}}, "RECORDS": [{"DATA_SOURCE": "icij", "RECORD_ID": "x1", "MATCH_KEY": "", "ENTITY_DESC": "ghost", "INTERNAL_ID": 41}]}, "RELATED_ENTITIES": []}""",
    // 5: no RECORD_TYPE, no DOB/GROUP — ORG via the dead-MISC fallthrough
    s"""{"RESOLVED_ENTITY": {"ENTITY_ID": 5, "ENTITY_NAME": "Mystery Ltd", "FEATURES": {${feat("NAME", "Mystery Ltd")}}, "RECORDS": []}, "RELATED_ENTITIES": []}""",
    // 6: no RECORD_TYPE but DOB — PER via the fallthrough branch
    s"""{"RESOLVED_ENTITY": {"ENTITY_ID": 6, "ENTITY_NAME": "Jane Roe", "FEATURES": {${feat("NAME", "Jane Roe")}, ${feat("DOB", "1980-02-02")}}, "RECORDS": [{"DATA_SOURCE": "icij", "RECORD_ID": "p2", "MATCH_KEY": "", "ENTITY_DESC": "Jane Roe", "INTERNAL_ID": 61}]}, "RELATED_ENTITIES": []}""",
    // 7: GROUP_ASSOCIATION fallthrough — PER; Panama country resolves
    s"""{"RESOLVED_ENTITY": {"ENTITY_ID": 7, "ENTITY_NAME": "Juan Perez", "FEATURES": {${feat("NAME", "Juan Perez")}, ${feat("GROUP_ASSOCIATION", "Mossfon")}, ${feat("COUNTRY_OF_ASSOCIATION", "PA")}}, "RECORDS": [{"DATA_SOURCE": "icij", "RECORD_ID": "p3", "MATCH_KEY": "NAME+DOB", "ENTITY_DESC": "Juan Perez", "INTERNAL_ID": 71}]}, "RELATED_ENTITIES": [{"ENTITY_ID": 8, "MATCH_LEVEL_CODE": "RESOLVED"}]}""",
    // 8: shared-alias entity — two records with the SAME ENTITY_DESC
    s"""{"RESOLVED_ENTITY": {"ENTITY_ID": 8, "ENTITY_NAME": "Shadow Ltd", "FEATURES": {${feat("NAME", "Shadow Ltd")}, ${feat("RECORD_TYPE", "ORGANIZATION")}}, "RECORDS": [{"DATA_SOURCE": "icij", "RECORD_ID": "s1", "MATCH_KEY": "", "ENTITY_DESC": "Shadow Ltd", "INTERNAL_ID": 81}, {"DATA_SOURCE": "open", "RECORD_ID": "s2", "MATCH_KEY": "NAME", "ENTITY_DESC": "Shadow Ltd", "INTERNAL_ID": 82}]}, "RELATED_ENTITIES": []}""",
    // 9: el portador — another F1 reject spelling
    s"""{"RESOLVED_ENTITY": {"ENTITY_ID": 9, "ENTITY_NAME": "el portador", "FEATURES": {${feat("NAME", "el portador")}}, "RECORDS": []}, "RELATED_ENTITIES": []}""")

  /** Country lookup rows shared by both engines. */
  val countries: Seq[(String, String)] =
    Seq(("GB", "United Kingdom"), ("PA", "Panama"))

  /** The flagship's 17-name suspicion list (q98) — the fixture analog of
    * the reference's 17-line suspicious.txt
    * (/root/reference/data/icij-example/suspicious.txt): hand + generated
    * KB names, two ENTITY_DESC-derived vertex names ("Alias 107-1" is the
    * empty-first-desc fallback, "Alias 130-0" names an F2-dropped entity),
    * one uid-fallback vertex ("124" has no records), one bearer pseudo-name
    * (the GRAPH doesn't blacklist — only the KB does), and one deliberate
    * no-match (exact matching is high-precision/low-recall,
    * senzing_pipeline.py:381-383). */
  val seedNames: Seq[String] = Seq(
    "Acme Corp", "John Doe", "Juan Perez",
    "Person 105", "Person 110", "Person 125", "Person 145", "Person 355",
    "Entity 101 Corp", "Entity 102 Corp", "Entity 103 Corp",
    "Entity 202 Corp", "Alias 107-1", "Alias 130-0", "124",
    "bearer warrant", "Nonexistent Company XYZ")

  /** Idempotently materialize the fixture; returns its path. */
  def ensureWritten(): String = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    val bytes = (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8)
    if (!Files.exists(p) || Files.size(p) != bytes.length)
      Files.write(p, bytes)
    path
  }
}
