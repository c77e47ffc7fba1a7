package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item-item co-occurrence similarity — the collaborative-filtering
  * primitive ("users who bought X also bought Y") over any
  * (basket, item) relation: item pairs sharing a basket, scored by
  * Jaccard similarity of their basket sets,
  *
  *   jaccard(a,b) = n_ab / (n_a + n_b − n_ab),
  *
  * all exact integers and one double division — hash-reproducible.
  *
  * Scale shape: the pair generation is a SELF-JOIN KEYED BY BASKET,
  * so each basket contributes |basket|²/2 pairs and nothing crosses
  * baskets — the standard market-basket bound (cost is Σ|basket|²,
  * linear when basket sizes are domain-bounded, e.g. order lines).
  * A degenerate giant basket is the one hazard: `maxBasket` drops
  * baskets above it BEFORE the join (mirroring the df-cap guard on
  * the dedup tier), trading those baskets' pairs for a hard
  * quadratic bound. `minSupport` prunes before the per-item joins;
  * the final top-k is a distributed TakeOrdered.
  */
object CoOccurrence {

  /** Top-`topK` item pairs by basket-set Jaccard. Output:
    * (item_a, item_b, n_ab, n_a, n_b, jaccard), item_a < item_b,
    * ordered by (jaccard DESC, item_a, item_b). Null baskets/items
    * are excluded; duplicate (basket, item) rows collapse first. */
  def itemPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 3L, topK: Int = 30,
      maxBasket: Option[Long] = None): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val base0 = df
      .where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    val base = maxBasket match {
      case None => base0
      case Some(m) =>
        val sizes = base0.groupBy("bk")
          .agg(count(lit(1)).as("__bsz"))
          .where(col("__bsz") <= m)
          .select("bk")
        base0.join(sizes, Seq("bk"))
    }
    val a = base.select(col("bk"), col("it").as("item_a"))
    val b = base.select(col("bk"), col("it").as("item_b"))
    val pairs = a.join(b, Seq("bk"))
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    val per = base.groupBy(col("it")).agg(count(lit(1)).as("n"))
    pairs
      .join(per.select(col("it").as("item_a"), col("n").as("n_a")),
        Seq("item_a"))
      .join(per.select(col("it").as("item_b"), col("n").as("n_b")),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        col("n_a"), col("n_b"),
        (col("n_ab").cast("double") /
          (col("n_a") + col("n_b") - col("n_ab")).cast("double"))
          .as("jaccard"))
      .orderBy(desc("jaccard"), asc("item_a"), asc("item_b"))
      .limit(topK)
  }

  /** Single-antecedent association rules (Agrawal–Srikant market-
    * basket form): for every DIRECTED item pair a→b co-occurring in
    * ≥ `minSupport` baskets, the classic rule triple
    *   support    = n_ab / n_baskets
    *   confidence = n_ab / n_a
    *   lift       = n_ab·n_baskets / (n_a·n_b)
    * Top `topK` rules by (lift DESC, antecedent, consequent) — a
    * TOTAL order, so the limit cut is deterministic in any engine.
    *
    * Scale shape: identical to [[itemPairs]] — the pair join is an
    * equi-join on basket id, so candidates are Σ basket_size² (use
    * `maxBasket`-style pre-capping upstream or a coarser item rollup
    * when baskets are unbounded); counts are one keyed aggregation;
    * the per-item table joins back by item key. Every ratio is one
    * double division of exact BIGINTs (n_ab·n_baskets and n_a·n_b
    * stay < 2⁶³ below ~3·10⁹ baskets) — engine-portable.
    *
    * Output: (antecedent, consequent, n_ab, n_a, n_b, support,
    * confidence, lift), both rule directions emitted.
    */
  def associationRules(df: DataFrame, basketCol: String,
      itemCol: String, minSupport: Long = 3L,
      topK: Int = 25): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val base = df
      .where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    val nBaskets = base.agg(
      countDistinct(col("bk")).as("n_baskets"))
    val a = base.select(col("bk"), col("it").as("antecedent"))
    val b = base.select(col("bk"), col("it").as("consequent"))
    val pairs = a.join(b, Seq("bk"))
      .where(col("antecedent") =!= col("consequent"))
      .groupBy("antecedent", "consequent")
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    val per = base.groupBy(col("it")).agg(count(lit(1)).as("n"))
    pairs
      .join(per.select(col("it").as("antecedent"), col("n").as("n_a")),
        Seq("antecedent"))
      .join(per.select(col("it").as("consequent"), col("n").as("n_b")),
        Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        col("n_a"), col("n_b"),
        (col("n_ab").cast("double") /
          col("n_baskets").cast("double")).as("support"),
        (col("n_ab").cast("double") /
          col("n_a").cast("double")).as("confidence"),
        ((col("n_ab") * col("n_baskets")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(desc("lift"), asc("antecedent"), asc("consequent"))
      .limit(topK)
  }
}
