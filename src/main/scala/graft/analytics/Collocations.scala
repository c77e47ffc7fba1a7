package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.expressions.WordNgrams

/** Collocation mining: adjacent word pairs ranked by association
  * lift — the PMI ratio WITHOUT the log,
  *
  *   lift(x,y) = P(x,y) / (P(x)·P(y))
  *             = (c_xy / B) / ((c_x / N)·(c_y / N))
  *             = c_xy · N² / (c_x · c_y · B),
  *
  * which orders pairs identically to PMI (log is monotone) while
  * staying hash-reproducible across engines: every count is an exact
  * DECIMAL(38,0) product and the only floating-point step is ONE
  * division per output row. `log` is exactly what breaks
  * cross-engine parity — libm implementations differ in the last
  * ulp — so the engine deliberately ranks by the rational argument.
  *
  * Scale shape: two generator scans of the corpus (unigram and
  * bigram explode — map-only), a keyed count aggregation each
  * (map-side combined), the `minSupport` filter BEFORE the joins
  * (at web scale this drops the bigram frame by orders of
  * magnitude), then two equi-joins of the surviving bigrams against
  * the unigram counts. Totals ride along as one broadcast row each.
  * The final top-k is a distributed TakeOrdered, never a global
  * sort.
  */
object Collocations {

  private val D = DecimalType(38, 0)
  private def d(c: Column): Column = c.cast(D)

  /** Top-`topK` adjacent-pair collocations with observed count `n`
    * and association `lift`, ordered by (lift DESC, x, y). Pairs
    * observed fewer than `minSupport` times are dropped before
    * ranking (rare pairs have wildly high lift by chance — the
    * standard collocation guard, e.g. Manning & Schütze ch. 5). */
  def collocations(docs: DataFrame, textCol: String,
      minSupport: Long = 5L, topK: Int = 40): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val body = docs.where(col(textCol).isNotNull)

    val uni = body
      .select(explode(
        WordNgrams.column(col(textCol), 1, distinct = false)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val bi = body
      .select(explode(
        WordNgrams.column(col(textCol), 2, distinct = false)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("n"))

    val nTot = uni.agg(sum(d(col("cw"))).as("n_tokens"))
    val bTot = bi.agg(sum(d(col("n"))).as("n_bigrams"))

    val cand = bi.where(col("n") >= minSupport)
      .withColumn("x", split(col("bg"), " ").getItem(0))
      .withColumn("y", split(col("bg"), " ").getItem(1))

    val ux = uni.select(col("w").as("x"), col("cw").as("cx"))
    val uy = uni.select(col("w").as("y"), col("cw").as("cy"))
    cand
      .join(ux, Seq("x")).join(uy, Seq("y"))
      .crossJoin(broadcast(nTot)).crossJoin(broadcast(bTot))
      .select(col("x"), col("y"), col("n"),
        ((d(col("n")) * col("n_tokens") * col("n_tokens"))
          .cast("double") /
          (d(col("cx")) * d(col("cy")) * col("n_bigrams"))
            .cast("double")).as("lift"))
      .orderBy(desc("lift"), asc("x"), asc("y"))
      .limit(topK)
  }
}
