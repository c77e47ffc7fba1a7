package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-shaping operators (SURVEY §2.1 S10–S15, §2.4, §2.5 J6):
  * the Spark rewrites of the reference's PostgreSQL `ON CONFLICT`
  * upserts, SCD lookup-or-insert, generated date dimension, and
  * audit/idempotency bookkeeping.
  *
  * Scale posture: every operation is a key-partitioned join or
  * map-side projection — the hash→surrogate lookup that the reference
  * keeps in a Python dict (`etl/orchestrator.py:65,113`) is a join
  * here, so nothing ever collects to the driver.
  */
object Merge {

  /** `INSERT ... ON CONFLICT (keys) DO UPDATE SET (updateCols)`
    * rewrite (`etl/load/postgres_loader.py:77-80,118-123,154-159`):
    *
    *   - the incoming batch is deduplicated per key first
    *     (last-writer-wins by `tiebreak` — Postgres would error on
    *     in-batch conflicts, so any deterministic choice is a superset
    *     of reference behavior);
    *   - matched rows take `updateCols` from incoming and keep every
    *     other column from the target (partial update);
    *   - unmatched incoming rows are inserted whole;
    *   - unmatched target rows pass through.
    *
    * One shuffle keyed on `keys` (the full-outer join); at scale the
    * target side can be bucketed on the same keys to make the merge
    * shuffle-free on one side.
    */
  def upsert(target: DataFrame, incoming: DataFrame, keys: Seq[String],
      updateCols: Seq[String], tiebreak: Seq[Column]): DataFrame = {
    val dataCols = target.columns.toSeq.filterNot(keys.contains)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak: _*)
    val dedup = incoming
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val s = dedup.select(
      (keys ++ dataCols).map(c => col(c).as(s"__s_$c")) :+
        lit(true).as("__s"): _*)
    val t = target
      .select((keys ++ dataCols).map(col) :+ lit(true).as("__t"): _*)
    val cond = keys.map(k => t(k) <=> s(s"__s_$k")).reduce(_ && _)
    val joined = t.join(s, cond, "full_outer")
    val out = keys.map(k =>
      coalesce(col(k), col(s"__s_$k")).as(k)) ++
      dataCols.map { c =>
        if (updateCols.contains(c))
          when(col("__s").isNotNull, col(s"__s_$c")).otherwise(col(c)).as(c)
        else
          when(col("__t").isNotNull, col(c)).otherwise(col(s"__s_$c")).as(c)
      }
    joined.select(out: _*)
  }

  /** Insert-only variant (`ON CONFLICT DO NOTHING`): incoming rows
    * whose keys already exist are dropped. */
  def insertIfAbsent(target: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame =
    target.unionByName(
      incoming.join(target.select(keys.map(col): _*), keys, "left_anti"))
}

/** SCD Type-2-ready dimension maintenance (`dim_location`,
  * `db/init/01-schema.sql:12-26`; loader `postgres_loader.py:19-63`).
  * The reference's loader only ever *adds* current rows (never expires
  * — SURVEY §7 "degenerate SCD2"); `lookupOrInsert` reproduces that:
  * existing current rows win, novel hashes are appended with the SCD2
  * envelope. Surrogate keys are content-derived (60-bit prefix of the
  * row hash) so re-runs are reproducible — the reference's SERIAL keys
  * are insertion-ordered and unreproducible, which SURVEY §7 calls out
  * as a correctness hazard at scale.
  */
object Scd2 {

  /** Deterministic surrogate key from a 32-hex natural hash. */
  def surrogateKey(hash: Column): Column =
    conv(substring(hash, 1, 15), 16, 10).cast("long")

  /** Append rows for hashes not present among current dim rows.
    * `incoming` must carry `hashCol`; novel rows get the SCD2 envelope
    * (current, effective now) and are aligned to `existing`'s schema.
    * Returns the updated dimension with `is_new` marking this batch's
    * inserts.
    */
  def lookupOrInsert(existing0: DataFrame, incoming: DataFrame,
      hashCol: String, keyCol: String, effectiveDate: Column): DataFrame = {
    // tolerate a dimension produced by a previous lookupOrInsert round
    val existing =
      if (existing0.columns.contains("is_new")) existing0.drop("is_new")
      else existing0
    val novel = incoming
      .dropDuplicates(hashCol)
      .join(existing.filter(col("is_current")).select(hashCol),
        Seq(hashCol), "left_anti")
      .withColumn(keyCol, surrogateKey(col(hashCol)))
      .withColumn("effective_date", effectiveDate)
      .withColumn("expiration_date", lit("9999-12-31").cast("date"))
      .withColumn("is_current", lit(true))
    existing.withColumn("is_new", lit(false)).unionByName(
      novel.select(existing.columns.map(col): _*)
        .withColumn("is_new", lit(true)))
  }
}

/** Generated date dimension (W6, `db/init/01-schema.sql:86-131`):
  * calendar attributes for every day in [start, end]. `day_of_week`
  * follows the reference's `EXTRACT(DOW)` convention (Sunday = 0);
  * names are unpadded English (`TO_CHAR('Day')` space-pads to 9 chars
  * — deliberately not reproduced).
  */
object DateDim {

  def build(spark: SparkSession, start: String = "2020-01-01",
      end: String = "2030-12-31"): DataFrame = {
    val d = col("full_date")
    val m = month(d)
    spark.range(0, java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(start),
        java.time.LocalDate.parse(end)) + 1)
      .select(date_add(lit(start).cast("date"),
        col("id").cast("int")).as("full_date"))
      .select(
        date_format(d, "yyyyMMdd").cast("int").as("date_key"),
        d,
        (dayofweek(d) - 1).as("day_of_week"),
        date_format(d, "EEEE").as("day_name"),
        dayofmonth(d).as("day_of_month"),
        dayofyear(d).as("day_of_year"),
        weekofyear(d).as("week_of_year"),
        m.as("month_number"),
        date_format(d, "MMMM").as("month_name"),
        quarter(d).as("quarter"),
        year(d).as("year"),
        (dayofweek(d) === 1 || dayofweek(d) === 7).as("is_weekend"),
        when(m.isin(3, 4, 5), "Spring").when(m.isin(6, 7, 8), "Summer")
          .when(m.isin(9, 10, 11), "Autumn").otherwise("Winter")
          .as("season_northern"),
        when(m.isin(9, 10, 11), "Spring").when(m.isin(12, 1, 2), "Summer")
          .when(m.isin(3, 4, 5), "Autumn").otherwise("Winter")
          .as("season_southern"),
        lit(false).as("is_growing_season"))
  }
}

/** Audit-log bookkeeping (S14, `etl_audit_log`
  * `db/init/01-schema.sql:227-243`; writers `etl/orchestrator.py:
  * 168-176`, `postgres_loader.py:178-190`). The reference UPDATEs the
  * RUNNING row in place; in an append-only lake the same contract is
  * append + latest-wins view (`row_number` over batch_id by
  * event_time).
  */
object AuditLog {

  /** One lifecycle row. `status`: RUNNING | SUCCESS | FAILED. */
  def entry(batchId: Column, pipelineName: Column, status: Column,
      eventTime: Column, recordsProcessed: Column,
      errorMessage: Column): Column =
    struct(batchId.as("batch_id"), pipelineName.as("pipeline_name"),
      status.as("status"), eventTime.as("event_time"),
      recordsProcessed.as("records_processed"),
      errorMessage.as("error_message"))

  /** Latest entry per batch — the queryable state of the audit table.
    * Equal-timestamp ties rank terminal states over RUNNING explicitly
    * (alphabetical status order would rank RUNNING above FAILED and
    * report a dead batch as in-flight).
    */
  def latest(log: DataFrame): DataFrame = {
    val terminalRank = when(col("status") === "SUCCESS", 3)
      .when(col("status") === "FAILED", 2).otherwise(1)
    val w = Window.partitionBy("batch_id")
      .orderBy(col("event_time").desc, terminalRank.desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}

/** Idempotency keys (S15, `etl/utils/database.py:49-63`):
  * `sha256("{entity_type}:{entity_key}")`, insert-if-new. The batch
  * analogue of the reference's row-at-a-time
  * `ON CONFLICT DO NOTHING RETURNING`: the returned frame is the set
  * of *novel* rows (True results), and appending them to the key table
  * completes the transaction.
  */
object Idempotency {

  def keyHash(entityType: Column, entityKey: Column): Column =
    sha2(concat(entityType, lit(":"), entityKey.cast("string")), 256)

  /** Rows of `batch` whose key hash is not yet in `keyTable`
    * (column `key_hash`). */
  def novelRows(batch: DataFrame, keyTable: DataFrame,
      entityType: Column, entityKey: Column): DataFrame =
    batch.withColumn("key_hash", keyHash(entityType, entityKey))
      .join(keyTable.select("key_hash"), Seq("key_hash"), "left_anti")
}
