package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scraped crop-profile text source (SURVEY §2.1 S7–S9,
  * `etl/extract/web_scraper.py`). The engine ingests already-fetched
  * HTML (fetching is an ingest concern, not an engine one); the
  * text-extraction step mirrors BeautifulSoup's get_text over the
  * content region: drop script/style/nav/footer blocks, strip tags,
  * unescape common entities, collapse whitespace
  * (`web_scraper.py:110-123`).
  */
object ScrapedTextSource {

  /** Source-priority table (`web_scraper.py:30-67`): FAO first. */
  val sourceReliability: Seq[(String, Double)] =
    Seq("fao" -> 0.9, "usda_plants" -> 0.85, "extension" -> 0.7)

  /** HTML → visible text. */
  def htmlToText(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style|nav|footer)\\b[^>]*>.*?</\\1>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]+>", " ")
    val unescaped = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (acc, (e, r)) =>
        regexp_replace(acc, e, r)
      }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** S9 — prioritized multi-source resolution: one row per crop, the
    * highest-reliability source wins (`scrape_multiple_crops`,
    * `web_scraper.py:168-184`); ties broken by source name for
    * determinism.
    */
  def resolvePriority(sources: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("crop_name")
      .orderBy(col("reliability").desc, col("source"))
    sources.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
