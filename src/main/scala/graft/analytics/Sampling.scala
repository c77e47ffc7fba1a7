package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / rebalancing operators for training-data
  * pipelines. Everything keys off the portable content hash
  * ([[Dedup.h30]]), never `rand()`: the same row set is selected on
  * every run, engine, and partitioning — resumable pipelines and
  * reproducible ablations depend on that.
  */
object Sampling {

  /** Fraction-sample predicate: keep a row iff
    * `h30(key) % denom < fraction · denom`. Map-only (no shuffle); the
    * expected kept share of every group is `fraction` with
    * deterministic membership. A pure Column — bound to whatever frame
    * it is filtered on. */
  def hashFraction(keyCol: Column, fraction: Double,
      denom: Int = 1000000): Column =
    Dedup.h30(keyCol.cast("string")) % denom <
      lit((fraction * denom).toLong)

  /** Row rank within its group by hash order — the ranking
    * [[capPerGroup]] filters on, exposed so single-pass aggregations
    * can mark kept/overflow rows without a second scan. */
  def groupHashRank(groupCol: String, keyCol: Column): Column =
    row_number().over(Window.partitionBy(groupCol)
      .orderBy(Dedup.h30(keyCol.cast("string")), keyCol))

  /** Mixture sampling: per-group deterministic keep-fractions — the
    * domain-mixing step of training-data assembly ("keep all of wiki,
    * half of books, a tenth of crawl; exclude the eval source").
    * One map-only pass, no shuffle: the group column selects its
    * integer threshold through a literal CASE and membership is the
    * [[hashFraction]] test. Thresholds are computed DRIVER-side
    * (`(f·denom).toLong`) so the eval-time arithmetic is pure integer
    * in any engine — `0.3·10⁶` truncates vs rounds differently across
    * engines, a hash-mismatch trap the literal sidesteps. Groups
    * absent from `fractions` keep `defaultFraction`.
    */
  def mixtureSample(df: DataFrame, groupCol: String, keyCol: Column,
      fractions: Map[String, Double], defaultFraction: Double = 1.0,
      denom: Int = 1000000): DataFrame = {
    val thr = fractions.toSeq.sortBy(_._1).foldLeft(
      lit((defaultFraction * denom).toLong)) { case (acc, (g, f)) =>
      when(col(groupCol) === g, lit((f * denom).toLong)).otherwise(acc)
    }
    df.filter(Dedup.h30(keyCol.cast("string")) % denom < thr)
  }

  /** Cap each group at `perGroup` rows, chosen by hash order (a
    * deterministic "reservoir"): rank rows within their group by
    * (h30(key), key) and keep the first `perGroup`. One shuffle on the
    * group column — the standard way to flatten a skewed source mix
    * (e.g. equalize languages) without a driver-side plan.
    */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: Column,
      perGroup: Int): DataFrame =
    df.withColumn("__rk", groupHashRank(groupCol, keyCol))
      .filter(col("__rk") <= perGroup).drop("__rk")

  /** Weighted-sampling-without-replacement priority (Efraimidis &
    * Spirakis 2006, log form): each row draws the deterministic
    * uniform `u = (h30(key) + 0.5) / P` and gets priority
    * `ln(u) / w` — taking the k LARGEST priorities yields a weighted
    * sample without replacement with inclusion probability increasing
    * in `w`, reproducible across runs/engines/partitionings because
    * the "randomness" is the portable content hash. Quantized to
    * 1e-12 so a ≤1-ulp libm `ln` difference cannot reorder engines;
    * callers break quantization ties by key. Selection is a global
    * top-k (`TakeOrderedAndProject`: per-partition heads, no full
    * sort) — map-only until the final k-row reduction. */
  def weightedPriority(keyCol: Column, weightCol: Column): Column = {
    val u = (Dedup.h30(keyCol.cast("string")) + lit(0.5)) /
      lit(Dedup.P.toDouble)
    round((log(u) / weightCol) * 1e12) / 1e12
  }

  /** Bounded per-group top-k as an AGGREGATE
    * ([[graft.expressions.TopKByHash]]): the k rows with the smallest
    * (hash, id) order key, payload columns returned as
    * `array<struct>` in that order. Row-identical to
    * `row_number() OVER (PARTITION BY g ORDER BY hash, id) <= k`, but
    * the partial phase caps state at k rows per group per partition —
    * the exchange ships a bounded sample instead of the whole corpus,
    * which is the difference that matters at 100 TB. `id` must be a
    * unique long key (it is the deterministic tie-break across 30-bit
    * hash collisions, same as the window form and the oracle's
    * ORDER BY). */
  def topKByHash(k: Int, hash: Column, id: Column,
      payload: (String, Column)*): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.TopKByHash(
        (Seq(hash, id) ++ payload.map(_._2))
          .map(org.apache.spark.sql.graft.ColumnBridge.expression),
        payload.map(_._1), k).toAggregateExpression())

  /** Stratified k-fold assignment for cross-validation: within each
    * stratum (source/language), docs are ranked by the portable hash
    * order and dealt round-robin into `k` folds — every stratum's
    * docs split across folds within ±1, and the assignment is
    * deterministic on any engine/partitioning (no rand()).
    *
    * One stratum-partitioned window (rank by (md5(id), id)) — no
    * global sort, no shuffle beyond the stratum key. Returns
    * (doc_id, strata, fold) with fold ∈ [0, k).
    */
  def stratifiedFolds(df: DataFrame, idCol: String, strataCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val w = Window.partitionBy("strata")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    df.select(col(idCol).as("doc_id"), col(strataCol).as("strata"))
      .where(col("doc_id").isNotNull && col("strata").isNotNull)
      .withColumn("fold",
        ((row_number().over(w) - 1) % k).cast("int"))
  }

  /** Greedy token-budget corpus selection — "take the best documents
    * until the token budget is spent": rank docs by an INTEGER
    * quality score (descending; hash order inside a score tie) and
    * keep the maximal prefix whose inclusive token cumsum fits
    * `budget`.
    *
    * Scale shape: semantically equal to one global sorted cumsum, but
    * executed in two phases that never globally sort the corpus —
    * (1) aggregate token mass per DISTINCT SCORE and cumsum over that
    * value-domain-sized frame (the unpartitioned window runs over
    * |distinct scores| rows, not corpus rows) to find the boundary
    * score and its remaining budget; (2) fully keep every higher
    * score via one score-keyed semi-join, and rank ONLY the boundary
    * score's docs by (md5(id), id) for the partial take. The oracle
    * runs the naive single-window form — different algorithm, must
    * select the identical set.
    *
    * Returns (doc_id, score, toks) of selected docs ordered by
    * doc_id. Deterministic: integer scores, exact cumsums, hash tie
    * order.
    */
  def tokenBudgetSelect(docs: DataFrame, idCol: String,
      scoreCol: String, tokensCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val d = docs.select(col(idCol).as("doc_id"),
        col(scoreCol).cast("long").as("score"),
        col(tokensCol).cast("long").as("toks"))
      .where(col("doc_id").isNotNull && col("score").isNotNull &&
        col("toks").isNotNull && col("toks") >= 0)
    val perScore = d.groupBy("score").agg(sum(col("toks")).as("t"))
    // |buckets|-row window: single partition is the point
    val wDesc = Window.orderBy(col("score").desc)
      .rowsBetween(Long.MinValue, -1)
    val cum = perScore.withColumn("above",
      coalesce(sum(col("t")).over(wDesc), lit(0L)))
    val full = cum.where(col("above") + col("t") <= budget)
      .select("score")
    val boundary = cum
      .where(col("above") <= budget && col("above") + col("t") > budget)
      .select(col("score"), (lit(budget) - col("above")).as("rem"))
    val kept = d.join(full, Seq("score"), "left_semi")
    val wTie = Window.partitionBy("score")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Long.MinValue, 0)
    val partial = d.join(boundary, Seq("score"))
      .withColumn("__cum", sum(col("toks")).over(wTie))
      .where(col("__cum") <= col("rem"))
      .select("score", "doc_id", "toks")
    kept.select("doc_id", "score", "toks")
      .unionByName(partial.select("doc_id", "score", "toks"))
      .orderBy("doc_id")
  }

  /** Mixture-weighted corpus selection — [[tokenBudgetSelect]] run
    * under PER-GROUP budgets (the "data mixture" a training run
    * specifies: so many tokens of web, so many of code, …): within
    * each listed group, greedily keep the best-scored docs until that
    * group's token budget is spent; groups absent from `budgets` are
    * dropped (the mixture is a whitelist).
    *
    * Scale shape mirrors [[tokenBudgetSelect]] exactly, with every
    * window additionally keyed by the group: the budget map joins in
    * as a broadcast literal frame; the cumsum window runs over the
    * (group × distinct score) value-domain frame, never corpus rows;
    * only each group's single boundary score ranks its docs by
    * (md5(id), id). No global sort at any size.
    *
    * Returns (doc_id, g, score, toks) of selected docs, ordered by
    * doc_id. Deterministic: integer scores, exact cumsums, hash ties.
    */
  def mixtureSelect(docs: DataFrame, idCol: String, groupCol: String,
      scoreCol: String, tokensCol: String,
      budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty, "budgets must list at least one group")
    require(budgets.values.forall(_ >= 0), "budgets must be >= 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val d = docs.select(col(groupCol).as("g"), col(idCol).as("doc_id"),
        col(scoreCol).cast("long").as("score"),
        col(tokensCol).cast("long").as("toks"))
      .where(col("doc_id").isNotNull && col("g").isNotNull &&
        col("score").isNotNull && col("toks").isNotNull &&
        col("toks") >= 0)
    val bud = budgets.toSeq.sortBy(_._1).toDF("g", "budget")
    val dd = d.join(broadcast(bud), Seq("g"))
    val perScore = dd.groupBy("g", "score")
      .agg(sum(col("toks")).as("t"), first(col("budget")).as("budget"))
    val wDesc = Window.partitionBy("g").orderBy(col("score").desc)
      .rowsBetween(Long.MinValue, -1)
    val cum = perScore.withColumn("above",
      coalesce(sum(col("t")).over(wDesc), lit(0L)))
    val full = cum.where(col("above") + col("t") <= col("budget"))
      .select("g", "score")
    val boundary = cum
      .where(col("above") <= col("budget") &&
        col("above") + col("t") > col("budget"))
      .select(col("g"), col("score"),
        (col("budget") - col("above")).as("rem"))
    val kept = dd.join(full, Seq("g", "score"), "left_semi")
    val wTie = Window.partitionBy("g", "score")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Long.MinValue, 0)
    val partial = dd.join(boundary, Seq("g", "score"))
      .withColumn("__cum", sum(col("toks")).over(wTie))
      .where(col("__cum") <= col("rem"))
    kept.select("doc_id", "g", "score", "toks")
      .unionByName(partial.select("doc_id", "g", "score", "toks"))
      .orderBy("doc_id")
  }

  /** Mixture PLAN — the sizing question answered before
    * [[mixtureSelect]] runs: given target weights and a total token
    * budget, how many tokens does each source need (target = ⌊w·B⌋),
    * how many does it have, and what is the epoch/repeat factor
    * (DoReMi-style mixture planning: repeat_factor > 1 means the
    * source must be seen multiple times; < 1 means subsample).
    * Sources not in `weights` are dropped (the mixture is a
    * whitelist). One map-side-combined aggregation over the corpus +
    * a broadcast literal join — a planning query, not a selection.
    *
    * Returns per source: (g, available_tokens, target_tokens,
    * repeat_factor, action) with repeat_factor the one double
    * division of two exact longs and action ∈ repeat/subsample/exact.
    */
  def mixturePlan(docs: DataFrame, groupCol: String, tokensCol: String,
      weights: Map[String, Double], totalBudget: Long): DataFrame = {
    require(weights.nonEmpty, "weights must list at least one group")
    require(weights.values.forall(w => w >= 0 && w <= 1),
      "weights must be in [0, 1]")
    require(totalBudget >= 0, "totalBudget must be >= 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val targets = weights.toSeq.sortBy(_._1)
      .map { case (g, w) => (g, math.floor(w * totalBudget).toLong) }
      .toDF("g", "target_tokens")
    docs.select(col(groupCol).as("g"),
        col(tokensCol).cast("long").as("toks"))
      .where(col("g").isNotNull && col("toks").isNotNull)
      .groupBy("g").agg(sum(col("toks")).as("available_tokens"))
      .join(broadcast(targets), Seq("g"))
      .withColumn("repeat_factor",
        // guard the zero-token group (all docs in a whitelisted source
        // carrying 0 tokens): target/0 would read Infinity — null is
        // the honest "no finite repeat factor exists" answer, same
        // contract as the q252 fertility computation
        when(col("available_tokens") > 0,
          col("target_tokens").cast("double") /
            col("available_tokens").cast("double")))
      .withColumn("action",
        when(col("target_tokens") > col("available_tokens"), lit("repeat"))
          .when(col("target_tokens") < col("available_tokens"),
            lit("subsample"))
          .otherwise(lit("exact")))
  }

  /** Training-order shuffle audit: given the deterministic global
    * hash order a pipeline would emit examples in (md5 of the id —
    * the same order [[hashFraction]]/[[capPerGroup]] key off), how
    * often are ADJACENT examples from the same group (source/domain)?
    * A well-shuffled order shows ≈ Σ p_g² same-group adjacency; runs
    * of one source signal a broken shuffle that turns SGD batches
    * into single-domain bursts.
    *
    * Scale shape: adjacency is audited WITHIN `buckets` hash buckets
    * (bucket = h30(id) mod buckets, order = full md5 within bucket) —
    * per-bucket window functions, never one global sort; the
    * buckets−1 cross-boundary pairs are deliberately not counted
    * (documented, deterministic). Returns one row per bucket:
    * (bucket, n_docs, n_pairs, n_same_adj), exact BIGINTs, ordered.
    */
  def shuffleAudit(docs: DataFrame, idCol: String, groupCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val rows = docs
      .where(col(idCol).isNotNull && col(groupCol).isNotNull)
      .select(col(idCol).as("id"), col(groupCol).as("g"))
      .withColumn("ord", md5(col("id").cast("string")))
      .withColumn("bucket",
        pmod(Dedup.h30(col("id").cast("string")), lit(buckets.toLong)))
    val w = Window.partitionBy("bucket").orderBy("ord", "id")
    rows
      .withColumn("same",
        when(lag(col("g"), 1).over(w).isNull, lit(0L))
          .otherwise((col("g") === lag(col("g"), 1).over(w))
            .cast("long")))
      .groupBy("bucket")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        (count(lit(1)) - 1).cast("long").as("n_pairs"),
        sum(col("same")).cast("long").as("n_same_adj"))
      .orderBy("bucket")
  }

  /** Deterministic negative sampling for contrastive training: for
    * each query in `positives` (query, item), draw up to `k`
    * pseudo-random items the query did NOT interact with. The
    * candidate pool is the `k·poolFactor` universe items with the
    * smallest (md5(item), item) key — one global top-N (never a full
    * sort), broadcast to every executor — so the per-query work is
    * |pool| candidate rows minus that query's positives, ranked by
    * the pair hash md5(query ∥ '|' ∥ item): negatives differ per
    * query, every draw is replayable on any engine/partitioning, and
    * NOTHING here is rand().
    *
    * Scale shape: queries × pool is a broadcast nested loop emitting
    * |Q|·|pool| rows (linear in queries for fixed k); the positives
    * anti-join is one (query, item)-keyed shuffle; the rank window
    * partitions by query over ≤ |pool| rows each. A query whose
    * positives cover more than `(poolFactor−1)·k` pool items yields
    * fewer than k negatives — raise `poolFactor` for dense queries.
    *
    * Returns (query_id, item_id, rk) with rk = 1..k in draw order.
    */
  def negativeSample(positives: DataFrame, queryCol: String,
      itemCol: String, items: DataFrame, universeCol: String,
      k: Int, poolFactor: Int = 4): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(poolFactor >= 2, "poolFactor must be >= 2")
    val pool = items
      .select(col(universeCol).as("item_id"))
      .where(col("item_id").isNotNull).distinct()
      .orderBy(md5(col("item_id").cast("string")), col("item_id"))
      .limit(k * poolFactor)
    val queries = positives
      .select(col(queryCol).as("query_id"))
      .where(col("query_id").isNotNull).distinct()
    val cand = queries.crossJoin(broadcast(pool))
    val negs = cand.join(
      positives.select(col(queryCol).as("query_id"),
        col(itemCol).as("item_id")),
      Seq("query_id", "item_id"), "left_anti")
    negs
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(
          md5(concat(col("query_id").cast("string"), lit("|"),
            col("item_id").cast("string"))), col("item_id"))))
      .where(col("rk") <= k)
      .orderBy("query_id", "rk")
  }
}
