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
  * Scale shape: pair generation is a map-side explode of per-basket
  * sorted item arrays ([[basketsOf]] + [[pairsFromBaskets]], r19 —
  * one exchange where the old distinct + bk-keyed self-join paid
  * three), so each basket contributes |basket|²/2 pairs and nothing
  * crosses baskets — the standard market-basket bound (cost is
  * Σ|basket|², linear when basket sizes are domain-bounded, e.g.
  * order lines). A degenerate giant basket is the one hazard:
  * `maxBasket` drops baskets above it at the basket aggregate
  * (mirroring the df-cap guard on the dedup tier), trading those
  * baskets' pairs for a hard quadratic bound. `minSupport` prunes
  * before the per-item joins; the final top-k is a distributed
  * TakeOrdered.
  */
object CoOccurrence {

  /** One basket per row — (bk, its = sorted distinct item array) —
    * the shared base of every basket-keyed pair generation here
    * (r19, the [[graft.operators.AnalyticsQueries]] `copurchasePairs`
    * idiom, guide §2.4): ONE exchange replaces the old
    * distinct + window-count cap + bk-keyed SELF-JOIN chain (three
    * exchanges and two sort-merge sorts before each query's own
    * aggregation). `collect_set` IS the within-basket dedup the
    * distinct paid a corpus-wide shuffle for, and the giant-basket
    * guard becomes a plain `size(its) <= maxBasket` filter —
    * identical semantics (the window counted the same deduped rows).
    * Per-row arrays are basket-bounded: the callers' maxBasket caps
    * them hard, and uncapped callers (TPC-H orders, ≤ 7 lines) are
    * domain-bounded — same Σ|basket| state the windowed form held
    * per partition, now one row. */
  private def basketsOf(df: DataFrame, basketCol: String,
      itemCol: String, maxBasket: Option[Long]): DataFrame = {
    val b = df
      .where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .groupBy(col(basketCol).as("bk"))
      .agg(array_sort(collect_set(col(itemCol))).as("its"))
    maxBasket match {
      case None => b
      case Some(m) =>
        require(m >= 1, "maxBasket must be >= 1")
        b.where(size(col("its")) <= m)
    }
  }

  /** Map-side unordered-pair explode of the sorted basket arrays:
    * each basket emits each of its C(|basket|,2) item pairs
    * (item_a < item_b) exactly once — the same pair multiset the
    * bk-keyed self-join with `x.it < y.it` produced, with no
    * exchange at all (the pairs flow straight into the caller's
    * groupBy). */
  private def pairsFromBaskets(baskets: DataFrame): DataFrame =
    baskets.select(explode(flatten(transform(col("its"), (x, i) =>
        transform(slice(col("its"), i + lit(2), size(col("its"))),
          y => struct(x.as("item_a"), y.as("item_b")))))).as("p"))
      .select(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))

  /** Top-`topK` item pairs by basket-set Jaccard. Output:
    * (item_a, item_b, n_ab, n_a, n_b, jaccard), item_a < item_b,
    * ordered by (jaccard DESC, item_a, item_b). Null baskets/items
    * are excluded; duplicate (basket, item) rows collapse first. */
  def itemPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 3L, topK: Int = 30,
      maxBasket: Option[Long] = None): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val baskets = basketsOf(df, basketCol, itemCol, maxBasket)
    val pairs = pairsFromBaskets(baskets)
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    // per-item basket counts from the same basket frame: each basket
    // contributes each distinct item once — exactly the old deduped
    // (bk,it) groupBy
    val per = baskets.select(explode(col("its")).as("it"))
      .groupBy(col("it")).agg(count(lit(1)).as("n"))
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
    * equi-join on basket id, so candidates are Σ basket_size²;
    * `maxBasket` drops degenerate giant baskets BEFORE the join (the
    * same [[basketsOf]] guard), bounding the quadratic; counts are
    * one keyed aggregation; the per-item table joins back by item
    * key. Every ratio is one double division of exact BIGINTs
    * (n_ab·n_baskets and n_a·n_b stay < 2⁶³ below ~3·10⁹ baskets) —
    * engine-portable. n_baskets counts CAPPED baskets, so support
    * stays a true frequency over the population the pairs saw.
    *
    * Output: (antecedent, consequent, n_ab, n_a, n_b, support,
    * confidence, lift), both rule directions emitted.
    */
  def associationRules(df: DataFrame, basketCol: String,
      itemCol: String, minSupport: Long = 3L,
      topK: Int = 25, maxBasket: Option[Long] = None): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val baskets = basketsOf(df, basketCol, itemCol, maxBasket)
    // one row per capped basket, so n_baskets is a plain count
    val nBaskets = baskets.agg(count(lit(1)).as("n_baskets"))
    // the directed a≠b count equals the unordered count for both
    // directions (n(a→b) = #baskets holding both = n(b→a)), so count
    // the a<b pair stream ONCE and mirror the surviving (minSupport-
    // filtered, item-pair-bounded) aggregate — half the shuffled pair
    // rows of the old directed self-join
    val und = pairsFromBaskets(baskets)
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    val pairs = und.select(col("item_a").as("antecedent"),
        col("item_b").as("consequent"), col("n_ab"))
      .unionByName(und.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("n_ab")))
    val per = baskets.select(explode(col("its")).as("it"))
      .groupBy(col("it")).agg(count(lit(1)).as("n"))
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

  /** User–user cosine similarity over shared items — the
    * collaborative-filtering neighbor computation:
    * sim(u,v) = |I_u ∩ I_v| / √(|I_u|·|I_v|) over the item-capped
    * universe. Items in more than `maxItemDf` baskets leave the
    * universe FIRST (the stop-shingle defense: a ubiquitous item
    * pairs everyone with everyone — Σ df² blowup — while carrying no
    * preference signal), and degrees are counted AFTER the cap so
    * the cosine stays consistent.
    *
    * One item-keyed self-join bounded by Σ df² over capped items,
    * one pair aggregation; the score is exact-integer counts with
    * one √ and ÷ (correctly rounded IEEE — engine-portable).
    * Returns top `topK` (user_a < user_b, shared, deg_a, deg_b,
    * sim) by (sim desc, users).
    */
  def userSimilarity(df: DataFrame, userCol: String, itemCol: String,
      maxItemDf: Long, topK: Int): DataFrame = {
    require(maxItemDf >= 1 && topK >= 1, "maxItemDf, topK >= 1")
    val base = df
      .where(col(userCol).isNotNull && col(itemCol).isNotNull)
      .select(col(userCol).as("u"), col(itemCol).as("it"))
      .distinct()
    val keptItems = base.groupBy("it").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxItemDf).select("it")
    // deliberately NOT materialized: the cost is the Σ df² pair join
    // itself (measured 186 M candidate rows at the sf1 rehearsal —
    // 52 s; checkpointing the 6 M-row capped frame first measured
    // SLOWER, 64 s, because the write adds a full pass while the
    // recomputed scan lineage is cheap columnar parquet)
    val capped = base.join(keptItems, Seq("it"), "left_semi")
    val deg = capped.groupBy("u").agg(count(lit(1)).as("d"))
    // deliberately NOT the [[basketsOf]] array-explode idiom: with
    // df-capped arrays up to maxItemDf=64 elements the interpreted
    // nested-HOF explode allocates C(64,2) ≈ 2k structs per item row
    // and MEASURED 2× slower than this join (q224 5.6 → 11.1 s,
    // same-machine A/B at sf0.1, r19) — the idiom only wins on the
    // small-basket relations above (TPC-H baskets ≤ 7 items)
    val shared = capped.as("x")
      .join(capped.as("y"),
        col("x.it") === col("y.it") && col("x.u") < col("y.u"))
      .groupBy(col("x.u").as("ua"), col("y.u").as("ub"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(deg.select(col("u").as("ua"), col("d").as("deg_a")),
        Seq("ua"))
      .join(deg.select(col("u").as("ub"), col("d").as("deg_b")),
        Seq("ub"))
      .select(col("ua").as("user_a"), col("ub").as("user_b"),
        col("shared").cast("long"), col("deg_a").cast("long"),
        col("deg_b").cast("long"),
        (col("shared").cast("double") /
          sqrt((col("deg_a") * col("deg_b")).cast("double")))
          .as("sim"))
      .orderBy(desc("sim"), asc("user_a"), asc("user_b"))
      .limit(topK)
  }

  /** Frequent 3-itemsets, Apriori-pruned (Agrawal & Srikant
    * VLDB'94): candidate triples are generated ONLY from frequent
    * pairs sharing an anchor item AND every sub-pair must itself be
    * frequent — the anti-monotonicity prune that keeps level 3 from
    * touching the Σ C(|basket|,3) naive triple space. Support is
    * then counted candidate-driven: each candidate joins the basket
    * index once per member item (three (basket,item)-keyed joins,
    * cost Σ_cand df — never basket-wise triple explosion). The
    * level-2 pair generation is still a basket-keyed self-join
    * (Σ basket_size²): `maxBasket` drops degenerate giant baskets
    * BEFORE it ([[basketsOf]]), the guard the sf3 rehearsal showed
    * this needs (4.1× at 3× data unguarded).
    *
    * Exact BIGINT counts throughout; ties broken by the item triple.
    * Output: top `topK` (item_a < item_b < item_c, n_abc, support)
    * by (n_abc desc, items); support is over capped baskets.
    */
  def frequentTriples(df: DataFrame, basketCol: String,
      itemCol: String, minSupport: Long = 2L,
      topK: Int = 20, maxBasket: Option[Long] = None): DataFrame = {
    require(minSupport >= 1 && topK >= 1, "minSupport, topK >= 1")
    val baskets = basketsOf(df, basketCol, itemCol, maxBasket)
    // the candidate-driven level-3 counting joins need the flat
    // (bk, it) relation — derived from the capped basket frame, the
    // same rows the old distinct+cap chain produced
    val base = baskets.select(col("bk"), explode(col("its")).as("it"))
    val nBaskets = baskets.agg(count(lit(1)).as("n_baskets"))
    val pairs = pairsFromBaskets(baskets)
      .groupBy(col("item_a").as("a"), col("item_b").as("b"))
      .agg(count(lit(1)).as("s"))
      .where(col("s") >= minSupport)
      .select("a", "b")
    // candidates (a < b < c): (a,b) ⋈ (a,c) frequent, prune on (b,c)
    val cand = pairs.as("p")
      .join(pairs.select(col("a"), col("b").as("c")).as("q"),
        col("p.a") === col("q.a") && col("p.b") < col("q.c"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("q.c").as("c"))
      .join(pairs.select(col("a").as("b"), col("b").as("c")),
        Seq("b", "c"), "left_semi")
    val counted = cand
      .join(base.select(col("bk"), col("it").as("a")), Seq("a"))
      .join(base.select(col("bk"), col("it").as("b")), Seq("bk", "b"))
      .join(base.select(col("bk"), col("it").as("c")), Seq("bk", "c"))
      .groupBy("a", "b", "c")
      .agg(count(lit(1)).as("n_abc"))
      .where(col("n_abc") >= minSupport)
    counted.crossJoin(broadcast(nBaskets))
      .select(col("a").as("item_a"), col("b").as("item_b"),
        col("c").as("item_c"), col("n_abc").cast("long"),
        (col("n_abc").cast("double") / col("n_baskets").cast("double"))
          .as("support"))
      .orderBy(desc("n_abc"), asc("item_a"), asc("item_b"),
        asc("item_c"))
      .limit(topK)
  }
}
