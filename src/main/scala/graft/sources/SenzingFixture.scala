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

  /** One line per entity; ids 1-9. */
  val lines: Seq[String] = Seq(
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
