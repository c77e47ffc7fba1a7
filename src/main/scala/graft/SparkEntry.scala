package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-domain registries; every entry
  * with an oracle is hash-checked against DuckDB at sf0.01 by the
  * driver's Verify run.
  */
object SparkEntry {

  /** Registry of all engine queries. */
  def registry: Seq[Q] =
    StarQueries.all ++ EventQueries.all ++ DocQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ TextQueries.all ++
      NlpQueries.all ++ WarehouseQueries.all ++ QualityQueries.all ++
      MultimodalQueries.all ++ AnalyticsQueries.all ++
      AdvancedQueries.all ++ StatsQueries.all ++ TimeSeriesQueries.all ++
      MiscQueries.all ++ RelevanceQueries.all ++ BehaviorQueries.all ++
      CorpusQueries.all ++ IngestQueries.all ++ GeoQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head.fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap

  /** Shared `SPARK_GRAFT_ONLY` comma-separated name filter for the
    * Verify/Bench mains (local iteration on a few queries; the driver
    * never sets it). Warns on names matching no query, so a typo
    * doesn't silently run nothing. */
  private[graft] def nameFilter(): String => Boolean =
    sys.env.get("SPARK_GRAFT_ONLY") match {
      case None => _ => true
      case Some(s) =>
        val tokens = s.split(",").map(_.trim).filter(_.nonEmpty).toSet
        def matches(tok: String)(name: String): Boolean =
          name == tok || name.startsWith(tok + "_")
        val unknown = tokens.filter(t => !queries.keySet.exists(matches(t)))
        if (unknown.nonEmpty)
          System.err.println("[graft] SPARK_GRAFT_ONLY names match " +
            s"no query: ${unknown.toSeq.sorted.mkString(", ")}")
        name => tokens.exists(t => matches(t)(name))
    }
}
