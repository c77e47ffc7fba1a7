package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group embedding diagnostics: centroid norm and mean squared
  * distance to the centroid — the cluster-quality numbers a corpus
  * curator reads before trusting labels or semantic-dedup cells
  * (tight cells ⇒ small avg_sq_dist relative to centroid_norm²).
  *
  * Floating-point vector means can never hash-match across engines
  * (per-dimension double sums are partition-order dependent), so the
  * components are scaled to 2²⁰ fixed-point integers up front:
  * fx = ⌊x·2²⁰⌋ is exact IEEE arithmetic on every engine, all sums
  * are DECIMAL(38,0)-exact, and both statistics reduce to closed
  * forms over those integer sums —
  *
  *   ‖centroid‖² = Σ_d S_d² / n²           (S_d = Σ_rows fx_d)
  *   avgSqDist   = A/n − Σ_d S_d²/n²       (A = Σ_rows Σ_d fx_d²)
  *
  * finished with a fixed double op sequence (divide, divide by the
  * 2⁴⁰ scale, sqrt — IEEE sqrt is correctly rounded everywhere).
  *
  * Scale shape: one generator scan (posexplode — map-only), one
  * (group, dim)-keyed aggregation (the key space is |groups|·dim, so
  * hot groups spread across dim partitions), one |groups|·dim →
  * |groups| reduction. No row ever meets another row.
  */
object EmbeddingStats {

  private val D = DecimalType(38, 0)
  private def d(c: Column): Column = c.cast(D)
  private val Scale2 = 1099511627776.0 // 2^40, the fx² scale

  /** Per-`groupCol` report over `vecCol` (array<float|double>):
    * (group, n, centroid_norm, avg_sq_dist) ordered by group. Rows
    * with a null vector are excluded; `n` counts rows with at least
    * one component (position 0). */
  def groupStats(df: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    val flat = df
      .where(col(vecCol).isNotNull)
      .select(col(groupCol),
        posexplode(col(vecCol)).as(Seq("dim", "e")))
      .select(col(groupCol), col("dim"),
        floor(col("e").cast("double") * lit(1048576L)).as("fx"))

    val perDim = flat.groupBy(col(groupCol), col("dim"))
      .agg(sum(d(col("fx"))).as("s"),
        sum(d(col("fx") * col("fx"))).as("ss"),
        count(lit(1)).as("c"))

    val perGroup = perDim.groupBy(col(groupCol))
      .agg(max(when(col("dim") === 0, col("c"))).as("n"),
        sum(col("s") * col("s")).as("b"),
        sum(col("ss")).as("a"))

    val nd = col("n").cast("double")
    val n2d = (d(col("n")) * d(col("n"))).cast("double")
    perGroup.select(col(groupCol), col("n"),
        sqrt(col("b").cast("double") / n2d / lit(Scale2))
          .as("centroid_norm"),
        (col("a").cast("double") / nd / lit(Scale2) -
          col("b").cast("double") / n2d / lit(Scale2))
          .as("avg_sq_dist"))
      .orderBy(groupCol)
  }

  /** Embedding quality gate — the validation pass an ANN/semantic
    * pipeline runs before indexing: counts of null vectors, wrong
    * dimensionality, non-finite components (NaN/±Inf poison every
    * downstream dot product), and effectively-zero vectors (norm
    * below the 2⁻²⁰ fixed-point resolution — they make cosine
    * undefined), plus the norm² envelope of the healthy rows.
    *
    * Map-only scan + one scalar aggregation. Norm² is computed in
    * the [[groupStats]] fixed-point units per row (integer sums are
    * order-free, so no float summation ambiguity), making every
    * output an exact BIGINT.
    *
    * Output (one row): n_vecs, n_null_vec, n_wrong_dim,
    * n_nonfinite, n_zero, min_norm2_fp, max_norm2_fp.
    */
  def qualityGate(df: DataFrame, vecCol: String,
      expectedDim: Int): DataFrame = {
    val v = col(vecCol)
    val isNullV = v.isNull
    val wrongDim = !isNullV && size(v) =!= expectedDim
    val nonfinite = !isNullV && !wrongDim && exists(v, x =>
      isnan(x) || x === Double.PositiveInfinity ||
        x === Double.NegativeInfinity)
    val norm2 = aggregate(
      transform(v, x =>
        floor(x.cast("double") * lit(1048576L)).cast("long")),
      lit(0L), (acc, fx) => acc + fx * fx)
    val ok = !isNullV && !wrongDim && !nonfinite
    df.select(isNullV.as("nl"), wrongDim.as("wd"),
        nonfinite.as("nf"), when(ok, norm2).as("n2"))
      .agg(count(lit(1)).cast("long").as("n_vecs"),
        sum(col("nl").cast("long")).cast("long").as("n_null_vec"),
        sum(col("wd").cast("long")).cast("long").as("n_wrong_dim"),
        sum(col("nf").cast("long")).cast("long").as("n_nonfinite"),
        sum(when(col("n2") === 0L, 1L).otherwise(0L)).cast("long")
          .as("n_zero"),
        min(col("n2")).cast("long").as("min_norm2_fp"),
        max(col("n2")).cast("long").as("max_norm2_fp"))
  }

  /** Inter-centroid separation matrix — "are these labels actually
    * separated in embedding space": for every label pair a < b, the
    * centroid Euclidean distance and its ratio to the combined
    * intra-class dispersion (a Fisher-style separation index;
    * ratio ≫ 1 = cleanly separated classes, ≲ 1 = the labels overlap
    * and a classifier trained on them will struggle).
    *
    * Same fixed-point determinism contract as [[groupStats]]: all
    * per-dimension component sums are exact DECIMAL(38,0) integers;
    * dist²(a,b) = Σ_d (S_ad/n_a − S_bd/n_b)² expands to the three
    * exact cross sums ΣS_a², ΣS_aS_b, ΣS_b² with doubles only in the
    * final closed form. Scale shape: the (group, dim) sum frame
    * (|labels|·dim rows) self-joins on dim — |labels|²·dim
    * intermediate rows, never corpus rows.
    *
    * Output: (label_a, label_b, centroid_dist, sep_ratio) ordered.
    */
  def centroidSeparation(df: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    val flat = df
      .where(col(vecCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        posexplode(col(vecCol)).as(Seq("dim", "e")))
      .select(col("g"), col("dim"),
        floor(col("e").cast("double") * lit(1048576L)).as("fx"))
    val perDim = flat.groupBy("g", "dim")
      .agg(sum(d(col("fx"))).as("s"),
        sum(d(col("fx") * col("fx"))).as("ss"),
        count(lit(1)).as("c"))
    val perGroup = perDim.groupBy("g")
      .agg(max(when(col("dim") === 0, col("c"))).as("n"),
        sum(col("s") * col("s")).as("b"),
        sum(col("ss")).as("a"))
    val nd = col("n").cast("double")
    val n2d = (d(col("n")) * d(col("n"))).cast("double")
    val stats = perGroup.select(col("g"), col("n"),
      (col("a").cast("double") / nd / lit(Scale2) -
        col("b").cast("double") / n2d / lit(Scale2)).as("disp"))
    val cross = perDim.select(col("g").as("ga"), col("dim"),
        col("s").as("sa"))
      .join(perDim.select(col("g").as("gb"), col("dim"),
        col("s").as("sb")), Seq("dim"))
      .where(col("ga") < col("gb"))
      .groupBy("ga", "gb")
      .agg(sum(col("sa") * col("sa")).as("saa"),
        sum(col("sa") * col("sb")).as("sab"),
        sum(col("sb") * col("sb")).as("sbb"))
    val dist2 = (col("saa").cast("double") /
        (d(col("na")) * d(col("na"))).cast("double") -
      lit(2.0) * col("sab").cast("double") /
        (d(col("na")) * d(col("nb"))).cast("double") +
      col("sbb").cast("double") /
        (d(col("nb")) * d(col("nb"))).cast("double")) / lit(Scale2)
    cross
      .join(stats.select(col("g").as("ga"), col("n").as("na"),
        col("disp").as("da")), Seq("ga"))
      .join(stats.select(col("g").as("gb"), col("n").as("nb"),
        col("disp").as("db")), Seq("gb"))
      .select(col("ga").as("label_a"), col("gb").as("label_b"),
        sqrt(dist2).as("centroid_dist"),
        when(col("da") + col("db") > 0,
          dist2 / (col("da") + col("db"))).as("sep_ratio"))
      .orderBy("label_a", "label_b")
  }
}
