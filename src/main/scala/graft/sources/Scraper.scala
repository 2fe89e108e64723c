package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Article-scraper surface (SURVEY.md §2 S1-S3): the reference fetches two
  * ICIJ article URLs, parses ONLY the `header.post-header` and
  * `div.post-body` subtrees (a SoupStrainer — scan-level predicate pushdown),
  * projects h1/p/figcaption text, joins with newlines and appends "." to the
  * title so it terminates a sentence
  * (/root/reference/src/scraper.py:11-46,56-74).
  *
  * Design: fetching is a PLUGGABLE `String => String` executed inside a
  * Dataset map — the driver distributes URLs, executors fetch (tests inject a
  * stub; this container has no egress). Extraction is pure regex expression
  * work (codegen, no UDF) — a deliberate simple-HTML parser: the reference
  * pages are flat article markup; swap in a real DOM parser behind the same
  * column signature if nesting ever matters.
  */
object Scraper {

  /** S1 — distribute URLs, fetch each with `fetch`. */
  def scrape(spark: SparkSession, urls: Seq[String],
             fetch: String => String): DataFrame = {
    import spark.implicits._
    urls.toDF("url").as[String].map(u => (u, fetch(u))).toDF("url", "html")
  }

  private def section(html: Column, pattern: String): Column =
    regexp_extract(html, pattern, 1)

  /** S2 — partial parse: keep only the two wanted subtrees, then project
    * h1/p/figcaption inner text (tags stripped, trimmed, empties dropped). */
  def extractBlocks(html: Column): Column = {
    val wanted = concat_ws("\n",
      section(html, "(?s)<header[^>]*class=\"[^\"]*post-header[^\"]*\"[^>]*>(.*?)</header>"),
      section(html, "(?s)<div[^>]*class=\"[^\"]*post-body[^\"]*\"[^>]*>(.*?)</div>"))
    val blocks = regexp_extract_all(wanted,
      lit("(?s)<(?:h1|p|figcaption)[^>]*>(.*?)</(?:h1|p|figcaption)>"), lit(1))
    filter(
      transform(blocks, b => trim(regexp_replace(b, "<[^>]+>", ""))),
      b => length(b) > 0)
  }

  /** S3 — text assembly: newline-join; element 0 is the title and gets "."
    * appended (scraper.py:67-74). */
  def assembleText(blocks: Column): Column =
    concat_ws("\n",
      transform(blocks, (b, i) => when(i === 0, concat(b, lit("."))).otherwise(b)))

  /** Full S1→S3 pipeline: (url, text) document table. */
  def articles(spark: SparkSession, urls: Seq[String],
               fetch: String => String): DataFrame =
    scrape(spark, urls, fetch)
      .select(col("url"), assembleText(extractBlocks(col("html"))).as("text"))
}
