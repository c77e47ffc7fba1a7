package graft.quality

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality rules (SURVEY §1.1 "quality-rule config",
  * §2.6–2.7, §3.3): the reference's `data-quality.yml` vocabulary
  * (`.github/workflows/data-quality.yml:55-325`) parsed from YAML and
  * compiled to `Column` predicates / aggregation jobs — a rule-to-
  * expression compiler, no interpretation at row level.
  *
  * Rule vocabulary: range, regex, enum, not_null, unique,
  * cross_validations (SQL boolean expressions), referential_integrity
  * (anti-joins), freshness (max age vs an as-of date), completeness
  * (non-null ratio thresholds), anomalies (SQL conditions incl. window
  * functions, evaluated via `spark.sql`).
  */
sealed trait Rule {
  def table: String
  def name: String
  def severity: String
}
final case class RangeRule(table: String, column: String, min: Double,
    max: Double, severity: String) extends Rule {
  def name = s"range_${table}_$column"
}
final case class RegexRule(table: String, column: String, pattern: String,
    severity: String) extends Rule {
  def name = s"regex_${table}_$column"
}
final case class EnumRule(table: String, column: String,
    values: Seq[String], severity: String) extends Rule {
  def name = s"enum_${table}_$column"
}
final case class NotNullRule(table: String, column: String) extends Rule {
  def name = s"not_null_${table}_$column"
  def severity = "critical"
}
final case class UniqueRule(table: String, columns: Seq[String])
    extends Rule {
  def name = s"unique_${table}_${columns.mkString("_")}"
  def severity = "critical"
}
final case class CrossRule(table: String, ruleName: String,
    expression: String, severity: String) extends Rule {
  def name = s"cross_${table}_$ruleName"
}
final case class RefIntegrityRule(table: String, column: String,
    refTable: String, refColumn: String) extends Rule {
  def name = s"ri_${table}_${column}"
  def severity = "error"
}
final case class FreshnessRule(table: String, dateColumn: String,
    maxAgeDays: Int) extends Rule {
  def name = s"freshness_$table"
  def severity = "warning"
}
final case class CompletenessRule(table: String, column: String,
    thresholdPct: Double) extends Rule {
  def name = s"completeness_${table}_$column"
  def severity = "warning"
}
final case class AnomalyRule(table: String, ruleName: String,
    condition: String, severity: String) extends Rule {
  def name = s"anomaly_$ruleName"
}
/** Named SQL validation (`data-quality.yml:298-325` `custom_validations`):
  * a SELECT returning the violating rows, run verbatim via `spark.sql`
  * over the suite's tables registered as temp views. The violation
  * count is the returned row count. `CURRENT_DATE` in the SQL is bound
  * to the suite's `asOf` date, which makes the check reproducible and
  * backfillable (the reference's `future_weather_data` rule is
  * wall-clock-dependent as written). `table` — used for the report's
  * table_name / n_rows columns — is the explicit YAML `table:` key if
  * given, else the first FROM target that is not a CTE defined in the
  * statement. */
final case class CustomSqlRule(ruleName: String, sql: String,
    severity: String, tableOverride: Option[String] = None) extends Rule {
  def name = s"custom_$ruleName"
  val table: String = tableOverride
    .getOrElse(CustomSqlRule.fromTable(sql).getOrElse("(sql)"))
}
object CustomSqlRule {
  private val From = "(?i)\\bfrom\\s+([a-z_][a-z0-9_]*)".r
  // covers `WITH name AS (`, `WITH RECURSIVE name AS (`, the
  // SQL-standard column-list form `WITH name(cols) AS (`, and
  // follow-on `, name AS (` members
  private val CteName =
    ("(?i)(?:\\bwith\\s+(?:recursive\\s+)?|,\\s*)" +
      "([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s*as\\s*\\(").r
  /** The MAIN query's first FROM target: the first FROM at parenthesis
    * depth 0 (i.e. outside CTE bodies and subqueries) that does not
    * name a CTE defined in the statement — so
    * `WITH cte AS (... FROM a) SELECT ... FROM b` attributes to `b`,
    * and a scalar subquery ahead of the main FROM is skipped. Falls
    * back to the first non-CTE FROM at any depth (e.g. when the main
    * query selects FROM a CTE — the CTE's base table is the best
    * attribution available). A parenthesis inside a string literal
    * shifts the depth heuristic, never the executed SQL; the explicit
    * YAML `table:` key overrides the heuristic entirely. */
  def fromTable(sql: String): Option[String] = {
    val ctes = CteName.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
    val depth = new Array[Int](sql.length + 1)
    for (i <- sql.indices)
      depth(i + 1) = depth(i) + (sql(i) match {
        case '(' => 1
        case ')' => -1
        case _ => 0
      })
    val targets = From.findAllMatchIn(sql)
      .map(mm => (depth(mm.start), mm.group(1).toLowerCase)).toSeq
    targets.collectFirst { case (0, t) if !ctes.contains(t) => t }
      .orElse(targets.collectFirst { case (_, t) if !ctes.contains(t) => t })
      .orElse(targets.headOption.map(_._2))
  }
}
/** Monitoring metric (`data-quality.yml:327-341` `monitoring.metrics`):
  * a named metric query over the suite's tables and/or its own report.
  * The cron `schedule` and the `alerts` routing block are operational
  * concerns (they belong to whatever invokes the suite) and are
  * deliberately not compiled — only the metric computation is engine
  * surface. `dateColumns` is the same lake extension freshness uses:
  * the reference's runner knows each table's date column a priori.
  */
final case class MetricDef(metricName: String, tables: Seq[String],
    schedule: String, dateColumns: Map[String, String])
/** ETL pipeline quality gate (`data-quality.yml:346-361` `etl_gates`):
  * a per-phase threshold evaluated against the audit table (extract /
  * load phases) or against the rest of the report itself (transform
  * phase). Boolean gates carry 1.0 / 0.0. */
final case class GateRule(phase: String, metric: String, value: Double)
    extends Rule {
  def table = "etl_audit_log"
  def name = s"gate_${phase}_$metric"
  def severity = "critical"
}

object QualityConfig {

  /** Parse the `data-quality.yml` vocabulary into rules. Supported
    * top-level sections: `tables` (validations / not_null_columns /
    * unique_columns / cross_validations), `referential_integrity`,
    * `freshness` (with a `date_column` extension, since a lake table
    * declares its own event-time column), `completeness`
    * (`table_thresholds` applied per declared `columns`), `anomalies`.
    */
  def parse(yaml: String): Seq[Rule] = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](yaml).asScala
    def m(o: Object): collection.Map[String, Object] =
      o.asInstanceOf[java.util.Map[String, Object]].asScala
    def l(o: Object): Seq[Object] =
      o.asInstanceOf[java.util.List[Object]].asScala.toSeq
    def d(o: Object): Double = o.toString.toDouble
    val rules = Seq.newBuilder[Rule]

    for ((table, tObj) <- root.get("tables").map(m).getOrElse(Map())) {
      val t = m(tObj)
      for (c <- t.get("not_null_columns").map(l).getOrElse(Nil))
        rules += NotNullRule(table, c.toString)
      // unique_columns is ONE composite key (dim_soil declares
      // [location_key, extraction_date] mirroring the schema's
      // UNIQUE(location_key, extraction_date)) — per-column rules
      // would flag every location with two extraction dates
      val uniqueCols = t.get("unique_columns").map(l).getOrElse(Nil)
        .map(_.toString)
      if (uniqueCols.nonEmpty) rules += UniqueRule(table, uniqueCols)
      for ((colName, vObj) <- t.get("validations").map(m).getOrElse(Map())) {
        val v = m(vObj)
        val sev = v.get("critical") match {
          case Some(b) if b.toString == "true" => "critical"
          case _ => "warning"
        }
        v("type").toString match {
          case "range" =>
            rules += RangeRule(table, colName, d(v("min")), d(v("max")), sev)
          case "regex" =>
            rules += RegexRule(table, colName, v("pattern").toString, sev)
          case "enum" =>
            rules += EnumRule(table, colName,
              l(v("values")).map(_.toString), sev)
        }
      }
      for (cvObj <- t.get("cross_validations").map(l).getOrElse(Nil)) {
        val cv = m(cvObj)
        val sev = cv.get("critical") match {
          case Some(b) if b.toString == "true" => "critical"
          case _ => "warning"
        }
        rules += CrossRule(table, cv("name").toString,
          cv("expression").toString, sev)
      }
    }
    for ((ref, rObj) <- root.get("referential_integrity").map(m)
        .getOrElse(Map())) {
      val Array(table, column) = ref.split("\\.", 2)
      val Array(refTable, refCol) =
        m(rObj)("references").toString.split("\\.", 2)
      rules += RefIntegrityRule(table, column, refTable, refCol)
    }
    for ((table, fObj) <- root.get("freshness").map(m).getOrElse(Map())) {
      val f = m(fObj)
      val days = f.get("max_age_days").map(_.toString.toInt)
        .orElse(f.get("max_age_hours").map(h =>
          math.max(1, h.toString.toInt / 24)))
        .getOrElse(365)
      // date_column is a lake extension (the reference's entries name
      // none — its runner knows each table's date column a priori);
      // entries without one are skipped rather than crashing the parse
      for (dc <- f.get("date_column").map(_.toString))
        rules += FreshnessRule(table, dc, days)
    }
    for ((table, cObj) <- root.get("completeness").map(m)
        .getOrElse(Map())) table match {
      // `global_threshold` is a settings-level default for tables the
      // config doesn't name — there is no table list to apply it to at
      // parse time, so it stays declarative
      case "global_threshold" => ()
      // the reference's shape: per-table thresholds with no column
      // list → ONE whole-table rule (column "*", the non-null ratio
      // over every column of the table at run time)
      case "table_thresholds" =>
        for ((t, pct) <- m(cObj))
          rules += CompletenessRule(t, "*", d(pct))
      case _ =>
        val c = m(cObj)
        val threshold = d(c("threshold_percent"))
        for (colName <- l(c("columns")))
          rules += CompletenessRule(table, colName.toString, threshold)
    }
    for ((ruleName, aObj) <- root.get("anomalies").map(m).getOrElse(Map())) {
      val a = m(aObj)
      rules += AnomalyRule(a("table").toString, ruleName,
        a("condition").toString, a("severity").toString)
    }
    for (cvObj <- root.get("custom_validations").map(l).getOrElse(Nil)) {
      val cv = m(cvObj)
      rules += CustomSqlRule(cv("name").toString, cv("sql").toString,
        cv.get("severity").map(_.toString).getOrElse("warning"),
        cv.get("table").map(_.toString))
    }
    for ((phase, gObj) <- root.get("etl_gates").map(m).getOrElse(Map());
        (metric, v) <- m(gObj))
      rules += GateRule(phase, metric, v.toString match {
        case "true" => 1.0
        case "false" => 0.0
        case other => other.toDouble
      })
    rules.result()
  }

  /** Parse `monitoring.metrics` into [[MetricDef]]s. `tables` is
    * optional (score / completeness metrics range over the whole
    * suite); `date_columns` is the lake extension mapping each table
    * to its event-date column for daily bucketing. */
  def parseMetrics(yaml: String): Seq[MetricDef] = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](yaml).asScala
    def m(o: Object): collection.Map[String, Object] =
      o.asInstanceOf[java.util.Map[String, Object]].asScala
    def l(o: Object): Seq[Object] =
      o.asInstanceOf[java.util.List[Object]].asScala.toSeq
    for (mObj <- root.get("monitoring").map(m)
        .flatMap(_.get("metrics")).map(l).getOrElse(Nil).toSeq) yield {
      val mm = m(mObj)
      MetricDef(
        mm("name").toString,
        mm.get("tables").map(l).getOrElse(Nil).map(_.toString),
        mm.get("schedule").map(_.toString).getOrElse(""),
        mm.get("date_columns").map(m).getOrElse(Map()).map {
          case (k, v) => k -> v.toString
        }.toMap)
    }
  }
}

object QualitySuite {

  /** Compile one rule into (violation-count, row-count) over its
    * table. Violation semantics per rule type:
    *   - range/regex/enum: non-null values outside the domain
    *   - not_null: null values
    *   - unique: rows beyond the first per key
    *   - cross: rows where the boolean SQL expression is NOT true
    *   - referential: fact rows whose key misses the dimension
    *   - freshness: 0/1 — whole table stale vs `asOf`
    *   - completeness: 0/1 — non-null ratio below threshold
    *   - anomaly: rows where the (window-capable) condition is true
    */
  def violationCount(spark: SparkSession, tables: Map[String, DataFrame],
      rule: Rule, asOf: Column): (Long, Long) = rule match {
    case c: CustomSqlRule =>
      // n_rows is 0 (not the violation count) when the rule's table is
      // not among the supplied frames — a fallback equal to
      // n_violations read as a fully-violating table
      (runCustom(spark, tables, c, asOf),
        tables.get(c.table).map(_.count()).getOrElse(0L))
    case _ => violationCountBase(spark, tables, rule, asOf)
  }

  /** Run one custom SQL validation — see [[runCustomBatch]]. */
  private def runCustom(spark: SparkSession,
      tables: Map[String, DataFrame], rule: CustomSqlRule,
      asOf: Column): Long =
    runCustomBatch(spark, tables, Seq(rule), asOf)(rule.name)

  /** Run a batch of custom SQL validations over ONE registration of
    * the suite's tables as temp views, dropped afterwards so nothing
    * lingers in the session catalog. A pre-existing temp view with the
    * same name as a suite table is replaced and then dropped — callers
    * sharing a session should not reuse suite table names for
    * unrelated views. Returns rule name → violation count. */
  private def runCustomBatch(spark: SparkSession,
      tables: Map[String, DataFrame], rules: Seq[CustomSqlRule],
      asOf: Column): Map[String, Long] = {
    tables.foreach { case (n, t) => t.createOrReplaceTempView(n) }
    try rules.map(r =>
      r.name -> spark.sql(bindAsOf(spark, r.sql, asOf)).count()).toMap
    finally tables.keys.foreach(spark.catalog.dropTempView(_))
  }

  /** Bind `CURRENT_DATE` in a custom-validation SQL to the suite's
    * `asOf` date (rendered once — a scalar, not data). A wall-clock
    * CURRENT_DATE would make the suite non-reproducible and
    * non-backfillable. Plain textual substitution: an occurrence
    * inside a string literal or comment is rewritten too (none of the
    * reference's validations contain one). */
  private def bindAsOf(spark: SparkSession, sql: String,
      asOf: Column): String = {
    lazy val lit = spark.range(1)
      .select(asOf.cast("date").cast("string")).head.getString(0)
    "(?i)\\bCURRENT_DATE\\b".r.replaceAllIn(sql, _ => s"DATE'$lit'")
  }

  private def violationCountBase(spark: SparkSession,
      tables: Map[String, DataFrame], rule: Rule,
      asOf: Column): (Long, Long) = {
    val df = tables(rule.table)
    // fusable rules share the aggExpr definitions (one source of truth
    // for the semantics; also null-safe on empty tables, where the
    // old collect-and-unbox forms NPE'd)
    (rule match {
      case CompletenessRule(_, "*", pct) =>
        Some(wholeTableCompletenessAgg(df, pct))
      case r => aggExpr(r, asOf)
    }) match {
      case Some(e) =>
        val row = df.agg(count(lit(1)).as("__t"), e.as("__v")).collect()(0)
        (row.getLong(1), row.getLong(0))
      case None =>
        val total = df.count()
        val violations: Long = rule match {
          case UniqueRule(_, cs) =>
            // null keys don't violate uniqueness (SQL semantics; also
            // matches COUNT(col) - COUNT(DISTINCT col) oracles)
            val nonNull = df.filter(cs.map(col(_).isNotNull)
              .reduce(_ && _))
            nonNull.count() - nonNull.select(cs.map(col): _*)
              .distinct().count()
          case RefIntegrityRule(_, c, refT, refC) =>
            df.filter(col(c).isNotNull).join(tables(refT)
                .select(col(refC).as(c)).distinct(), Seq(c), "left_anti")
              .count()
          case AnomalyRule(_, _, cond, _) =>
            val view = s"__q_${rule.table}"
            df.createOrReplaceTempView(view)
            spark.sql(s"SELECT count(*) AS n FROM " +
                s"(SELECT ($cond) AS a FROM $view) WHERE a")
              .collect()(0).getLong(0)
          case other => sys.error(s"unhandled rule ${other.name}")
        }
        (violations, total)
    }
  }

  /** Violation-count aggregate expression for rules that can share one
    * scan of their table (everything except unique / referential /
    * anomaly). */
  private def aggExpr(rule: Rule, asOf: Column): Option[Column] =
    rule match {
      case RangeRule(_, c, lo, hi, _) => Some(
        coalesce(sum(when(col(c).isNotNull && !col(c).between(lo, hi),
          1L)), lit(0L)))
      case RegexRule(_, c, p, _) => Some(
        coalesce(sum(when(col(c).isNotNull && !col(c).rlike(p), 1L)),
          lit(0L)))
      case EnumRule(_, c, vs, _) => Some(
        coalesce(sum(when(col(c).isNotNull && !col(c).isin(vs: _*), 1L)),
          lit(0L)))
      case NotNullRule(_, c) => Some(
        coalesce(sum(when(col(c).isNull, 1L)), lit(0L)))
      case CrossRule(_, _, e, _) => Some(
        coalesce(sum(when(!coalesce(expr(e), lit(false)), 1L)), lit(0L)))
      case FreshnessRule(_, dc, maxDays) => Some(
        when(datediff(asOf, max(col(dc)).cast("date")) > maxDays, 1L)
          .otherwise(0L))
      case CompletenessRule(_, c, pct) => Some(
        when(count(col(c)) * lit(100.0) / count(lit(1)) < pct, 1L)
          .otherwise(0L))
      case _ => None
    }

  /** A plain-predicate anomaly condition fuses into the single table
    * scan; one containing a window or aggregate function needs its own
    * job. Decided by ANALYZING the condition against the table — a
    * textual "contains OVER" test would wrongly fuse aggregate
    * conditions like `count(*) = 0` (which explode inside a
    * conditional aggregation). Analysis failures defer to the
    * spark.sql path so the real error surfaces there. */
  private def fusableAnomaly(df: DataFrame, cond: String): Boolean =
    try {
      import org.apache.spark.sql.catalyst.expressions.WindowExpression
      import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
      val analyzed = df.select(expr(cond).as("__a"))
        .queryExecution.analyzed
      !analyzed.exists(_.expressions.exists(_.exists {
        case _: AggregateExpression => true
        case _: WindowExpression => true
        case _ => false
      }))
    } catch { case _: Throwable => false }

  /** Fused form of a plain-predicate anomaly count (see
    * [[fusableAnomaly]]). */
  private def anomalyAgg(cond: String): Column =
    coalesce(sum(when(coalesce(expr(cond), lit(false)), 1L)), lit(0L))

  /** Whole-table completeness (the reference's `table_thresholds`
    * shape, compiled as column "*"): non-null cells ×100 / total cells
    * across every column, 0/1 against the threshold. Needs the frame's
    * schema, so it can't live in [[aggExpr]]. */
  private def wholeTableCompletenessAgg(df: DataFrame,
      pct: Double): Column = {
    val nonNull = df.columns.toSeq
      .map(c => count(col(c)).cast("double")).reduce(_ + _)
    when(nonNull * lit(100.0) /
      (count(lit(1)) * lit(df.columns.length.toDouble)) < pct, 1L)
      .otherwise(0L)
  }

  /** Run every rule and return the quality report as a DataFrame:
    * (rule_name, table_name, severity, n_violations, n_rows, passed).
    *
    * Scale posture: all range/regex/enum/not-null/cross/freshness/
    * completeness rules for a table are fused into ONE conditional
    * aggregation — a single scan per table regardless of rule count.
    * Only unique (distinct), referential (anti-join) and anomaly
    * (window) rules run their own jobs, since they genuinely need a
    * shuffle of their own.
    */
  def report(spark: SparkSession, tables: Map[String, DataFrame],
      rules: Seq[Rule], asOf: Column): DataFrame = {
    val (gateRules, rest) = rules.partition(_.isInstanceOf[GateRule])
    val (customRules, baseRules) =
      rest.partition(_.isInstanceOf[CustomSqlRule])
    val results = scala.collection.mutable.Map[String, (Long, Long)]()
    val tableTotals = scala.collection.mutable.Map[String, Long]()
    // All per-table fused scans, standalone rule jobs (unique/
    // referential/window-anomaly) and custom-SQL counts are
    // independent Spark actions. Run sequentially they cost one
    // job-submission round-trip EACH — at 19 rules that latency (not
    // data) dominated the report's wall time. Submit them from a
    // fixed thread pool instead: Spark's scheduler interleaves
    // concurrent jobs safely, results are assembled on this thread
    // only after every future completes.
    val customs = customRules.collect { case c: CustomSqlRule => c }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      val byTable = baseRules.groupBy(_.table).toSeq.sortBy(_._1)
      val planned = byTable.map { case (table, tableRules) =>
        val df = tables(table)
        // plain-predicate anomalies join the fused single scan;
        // window/aggregate conditions keep their own spark.sql job
        val fused = tableRules.flatMap {
          case r @ AnomalyRule(_, _, cond, _) if fusableAnomaly(df, cond) =>
            Some(r -> anomalyAgg(cond))
          case r @ CompletenessRule(_, "*", pct) =>
            Some(r -> wholeTableCompletenessAgg(df, pct))
          case r => aggExpr(r, asOf).map(r -> _)
        }
        (table, df, fused,
          tableRules.filter(r => !fused.exists(_._1 eq r)))
      }
      val fusedF = planned.collect {
        case (table, df, fused, _) if fused.nonEmpty => Future {
          val aggs = count(lit(1)).as("__total") +:
            fused.zipWithIndex.map { case ((_, e), i) => e.as(s"__v$i") }
          val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
          val total = row.getLong(0)
          (table, total, fused.zipWithIndex.map { case ((r, _), i) =>
            r.name -> row.getLong(i + 1) })
        }
      }
      val soloF = planned.flatMap { case (_, _, _, solo) =>
        solo.map(r => Future(r.name -> violationCount(spark, tables, r,
          asOf)))
      }
      // custom SQL validations run their own spark.sql job (arbitrary
      // SELECTs can't fuse into the per-table scan) but reuse the
      // fused scans' row totals for n_rows — no extra full-table scan
      // per rule; they still count as validations for the transform-
      // phase meta-gates below. Views are registered once for the
      // whole batch (on this thread, before the futures race) and
      // dropped afterwards.
      val customF = if (customs.isEmpty) Nil else {
        tables.foreach { case (n, t) => t.createOrReplaceTempView(n) }
        customs.map(c => Future(
          c.name -> spark.sql(bindAsOf(spark, c.sql, asOf)).count()))
      }
      try {
        for ((table, total, perRule) <-
            Await.result(Future.sequence(fusedF), Duration.Inf)) {
          tableTotals(table) = total
          perRule.foreach { case (n, v) => results(n) = (v, total) }
        }
        results ++= Await.result(Future.sequence(soloF), Duration.Inf)
        def totalOf(t: String): Long = tableTotals.getOrElseUpdate(t,
          tables.get(t).map(_.count()).getOrElse(0L))
        for ((name, v) <-
            Await.result(Future.sequence(customF), Duration.Inf)) {
          val c = customs.find(_.name == name).get
          results(name) = (v, totalOf(c.table))
        }
      } finally if (customs.nonEmpty)
        tables.keys.foreach(spark.catalog.dropTempView(_))
    } finally pool.shutdown()
    results ++= evalGates(
      gateRules.collect { case g: GateRule => g },
      tables.get("etl_audit_log"),
      (baseRules ++ customRules).map(r => r -> results(r.name)))
    val rows = rules.map { r =>
      val (v, n) = results(r.name)
      (r.name, r.table, r.severity, v, n, v == 0L)
    }
    spark.createDataFrame(rows)
      .toDF("rule_name", "table_name", "severity", "n_violations",
        "n_rows", "passed")
  }

  /** Compute `monitoring.metrics` rows:
    * (metric_name, target, bucket, metric_value).
    *
    *   - record-count metrics (`daily_record_count`): per declared
    *     table, row count per event day (bucket = the day; one
    *     map-side-combining aggregation per table). A table with no
    *     `date_columns` entry degrades to a single whole-table count
    *     bucketed at `asOf`.
    *   - quality-score metrics (`weekly_quality_score`): rules passed
    *     ×100 / rules total over the supplied report (bucket = asOf,
    *     target = "(all)") — the report is already computed, so this
    *     adds one tiny aggregation.
    *   - completeness metrics (`monthly_completeness_report`): non-null
    *     percentage per completeness column, all columns of a table
    *     fused into ONE scan (target = "table.column", bucket = asOf).
    *
    * The cron schedules decide WHEN the caller runs this; the metric
    * itself is schedule-free, so every variant is computed as-of now.
    * Unknown metric names raise — a declared metric must never be
    * silently dropped.
    */
  def metrics(spark: SparkSession, tables: Map[String, DataFrame],
      defs: Seq[MetricDef], rules: Seq[Rule], report: DataFrame,
      asOf: Column): DataFrame = {
    val bucketAsOf = asOf.cast("date").cast("string")
    def shaped(name: String, target: Column, bucket: Column,
        value: Column)(df: DataFrame): DataFrame =
      df.select(lit(name).as("metric_name"), target.as("target"),
        bucket.as("bucket"), value.cast("double").as("metric_value"))
    val frames = defs.flatMap { d =>
      d.metricName match {
        case n if n.contains("record_count") =>
          d.tables.map { t =>
            val df = tables(t)
            d.dateColumns.get(t) match {
              case Some(dc) =>
                shaped(n, lit(t), col("bucket"), col("__n"))(
                  df.groupBy(col(dc).cast("date").cast("string")
                    .as("bucket")).agg(count(lit(1)).as("__n")))
              case None =>
                shaped(n, lit(t), bucketAsOf, col("__n"))(
                  df.agg(count(lit(1)).as("__n")))
            }
          }
        case n if n.contains("quality_score") =>
          Seq(shaped(n, lit("(all)"), bucketAsOf, col("__score"))(
            report.agg((sum(col("passed").cast("long")) * lit(100.0) /
              count(lit(1))).as("__score"))))
        case n if n.contains("completeness") =>
          val byTable = rules.collect { case c: CompletenessRule => c }
            .groupBy(_.table).toSeq.sortBy(_._1)
          byTable.map { case (t, cs0) =>
            // whole-table rules ("*", the reference's table_thresholds
            // shape) expand to every column of the frame for reporting
            val cs = cs0.flatMap {
              case CompletenessRule(t2, "*", pct) =>
                tables(t2).columns.toSeq
                  .map(cn => CompletenessRule(t2, cn, pct))
              case c => Seq(c)
            }.distinctBy(_.column)
            val aggs = cs.map(c => (count(col(c.column)) * lit(100.0) /
              count(lit(1))).as(c.column))
            // one fused scan per table; the 1-row aggregate is then
            // exploded to a row per column
            val one = tables(t).agg(aggs.head, aggs.tail: _*)
            shaped(n, concat(lit(t + "."), col("e.c")), bucketAsOf,
              col("e.v"))(
              one.select(explode(array(cs.map(c => struct(
                lit(c.column).as("c"),
                col(c.column).cast("double").as("v"))): _*)).as("e")))
          }
        case other => sys.error(s"unknown monitoring metric '$other'")
      }
    }
    if (frames.isEmpty) {
      // no monitoring block (or every def ranged over zero tables):
      // an empty frame with the metrics schema, not a crash
      import spark.implicits._
      Seq.empty[(String, String, String, Double)]
        .toDF("metric_name", "target", "bucket", "metric_value")
    } else frames.reduceLeft(_ unionByName _)
  }

  /** Evaluate ETL gates. Extract/load gates read the audit table (one
    * fused aggregation over latest-state-per-batch joined to batch
    * start times); transform gates are meta-rules over the rest of the
    * report (validation pass rate, not-null violation rate). Violation
    * counts: per-batch gates count offending batches; rate gates are
    * whole-log 0/1 (like completeness).
    */
  private def evalGates(gates: Seq[GateRule], audit: Option[DataFrame],
      base: Seq[(Rule, (Long, Long))]): Map[String, (Long, Long)] = {
    val out = scala.collection.mutable.Map[String, (Long, Long)]()
    val (transformGates, auditGates) = gates.partition(_.phase == "transform")
    val nRules = base.size.toLong
    val passedRules = base.count(_._2._1 == 0L).toLong
    val nnViol = base.collect { case (_: NotNullRule, (v, _)) => v }.sum
    val nnTotal = base.collect { case (_: NotNullRule, (_, t)) => t }.sum
    for (g <- transformGates) g.metric match {
      case "min_validation_pass_rate" =>
        val bad = nRules > 0 && passedRules.toDouble / nRules < g.value
        out(g.name) = (if (bad) 1L else 0L, nRules)
      case "max_null_rate" =>
        val bad = nnTotal > 0 && nnViol.toDouble / nnTotal > g.value
        out(g.name) = (if (bad) 1L else 0L, nnTotal)
      case _ => out(g.name) = (0L, nRules)
    }
    if (auditGates.nonEmpty) audit match {
      case None =>
        // critical gates must never silently pass because the data to
        // evaluate them is missing — same contract as a base rule
        // whose table is absent from the map
        sys.error("etl_gates declared but no 'etl_audit_log' table " +
          "was supplied to evaluate them against")
      case Some(log) =>
        val latest = graft.warehouse.AuditLog.latest(log)
        val starts = log.groupBy("batch_id")
          .agg(min(col("event_time")).as("__start"))
        val j = latest.join(starts, Seq("batch_id"))
        val terminal = col("status") =!= "RUNNING"
        val success = col("status") === "SUCCESS"
        val durMin = (unix_micros(col("event_time")) -
          unix_micros(col("__start"))) / 6e7
        val aggs = auditGates.map { g =>
          ((g.phase, g.metric) match {
            case ("extract", "min_source_availability") =>
              when(sum(terminal.cast("long")).cast("double") /
                count(lit(1)) < g.value, 1L).otherwise(0L)
            case ("extract", "max_error_rate") =>
              when(sum((col("status") === "FAILED").cast("long"))
                .cast("double") / count(lit(1)) > g.value, 1L).otherwise(0L)
            case ("load", "min_rows_loaded") =>
              coalesce(sum(when(success &&
                coalesce(col("records_processed"), lit(0L)) < g.value,
                1L)), lit(0L))
            case ("load", "max_load_time_minutes") =>
              coalesce(sum(when(terminal && durMin > g.value, 1L)),
                lit(0L))
            case ("load", "verify_row_count") if g.value > 0 =>
              coalesce(sum(when(success &&
                col("records_processed").isNull, 1L)), lit(0L))
            case _ => lit(0L)
          }).as(g.name)
        }
        val row = j.agg(count(lit(1)).as("__n"), aggs: _*).collect()(0)
        auditGates.zipWithIndex.foreach { case (g, i) =>
          out(g.name) = (row.getLong(i + 1), row.getLong(0))
        }
    }
    out.toMap
  }
}
