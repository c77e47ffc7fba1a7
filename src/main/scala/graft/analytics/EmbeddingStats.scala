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

  /** Top principal component of the embedding cloud — the spectral
    * health report a curator reads before trusting an ANN index or a
    * semantic-dedup clustering: a dominant `explained` ratio means
    * the space has collapsed onto one axis (anisotropy — common after
    * bad normalization) and cosine is mostly measuring that axis.
    *
    * Determinism contract (the [[groupStats]] / kmeansCodebook
    * conventions composed): the corpus-sized pass computes the raw
    * moment matrix M_ij = Σ_rows ⌊x_i·x_j·2²⁰⌋ and the component sums
    * S_i = Σ_rows ⌊x_i·2²⁰⌋ as DECIMAL(38,0)-exact integer sums —
    * partition-order free. The dim×dim covariance assembled from
    * them, Cov_ij = M_ij/n/2²⁰ − (S_i/n/2²⁰)(S_j/n/2²⁰), is a fixed
    * double chain from exact integers. Power iteration (`iterations`
    * steps from the uniform v₀ = 1/√dim) runs on the DRIVER over the
    * collected MODEL-SIZED matrix (dim² doubles — the codebook-
    * collect shape, never corpus rows); every inner sum is a
    * sequential left fold seeded with the FIRST element (the q116
    * `list_reduce` convention), so a DuckDB oracle replays the exact
    * IEEE op sequence. The returned loading's sign is canonicalized
    * (component with the largest |loading|, ties to the lowest index,
    * is made non-negative). `eigenvalue` is the final iterate's
    * normalization constant ‖Cov·v‖ — the operator's defined output
    * is the `iterations`-step estimate, not an implementation-
    * dependent convergence point.
    *
    * Scale shape: ONE map-only pass — each row folds its ⌊x·2²⁰⌋
    * vector (dim longs) and its ⌊x_i·x_j·2²⁰⌋ outer-product (dim²
    * longs) into per-partition [[graft.expressions.VecSumLong]]
    * buffers (constant state, element-wise-add merge), so the shuffle
    * is one dim²-long array per partition regardless of corpus size
    * (the posexplode + (i,j)-keyed alternative measured 22.4 s at sf1
    * where this is map-only). Rows that are null or not `dim` long
    * are excluded up front (q206 reports them). Practical to
    * dim ≲ 512; beyond that, use a sketched/sampled pass.
    *
    * Output: one row per dimension, (dim_idx, mu, variance, loading,
    * eigenvalue, explained) ordered by dim_idx — eigenvalue/explained
    * are scalars repeated per row so the frame is self-contained.
    */
  def pcaTopComponent(df: DataFrame, vecCol: String, dim: Int,
      iterations: Int = 20): DataFrame = {
    val sess = df.sparkSession
    import sess.implicits._
    val (nD, sArr, cov) = covarianceMatrix(df, vecCol, dim)
    val (lambda, v) = powerIterate(cov, dim, iterations)
    val sg = canonicalSign(v, dim)
    val trace = foldDim(dim)(i => cov(i)(i))
    val explained = lambda / trace
    (0 until dim).map { i =>
      (i.toLong, sArr(i) / nD / 1048576.0, cov(i)(i), v(i) * sg,
        lambda, explained)
    }.toDF("dim_idx", "mu", "variance", "loading", "eigenvalue",
      "explained")
  }

  /** Top-`nComponents` spectral profile via Hotelling deflation: run
    * [[pcaTopComponent]]'s power iteration, subtract λ·u·uᵀ (the RAW
    * iterate — the outer product is sign-invariant), iterate again.
    * Adds `cum_explained`, the cumulative explained-variance ratio —
    * the effective-dimensionality read ("two axes carry 80 % of the
    * space"). Same determinism contract: the corpus pass is the one
    * exact-integer moment aggregation, deflation and every fold are
    * fixed double chains, and the oracle replays the deflated matrix
    * through a second unrolled CTE block.
    *
    * Output: (component, dim_idx, loading, eigenvalue, explained,
    * cum_explained) ordered by (component, dim_idx); component is
    * 1-based.
    */
  def pcaTopComponents(df: DataFrame, vecCol: String, dim: Int,
      nComponents: Int, iterations: Int = 20): DataFrame = {
    require(nComponents >= 1 && nComponents <= 8,
      "pcaTopComponents needs 1 <= nComponents <= 8")
    val sess = df.sparkSession
    import sess.implicits._
    val (_, _, cov0) = covarianceMatrix(df, vecCol, dim)
    val trace = foldDim(dim)(i => cov0(i)(i))
    var mat = cov0
    var cumLambda = 0.0
    val out = (1 to nComponents).flatMap { c =>
      val (lambda, v) = powerIterate(mat, dim, iterations)
      val sg = canonicalSign(v, dim)
      // deflate with the RAW iterate: u_i·u_j is sign-invariant
      mat = Array.tabulate(dim, dim)((i, j) =>
        mat(i)(j) - lambda * v(i) * v(j))
      cumLambda = if (c == 1) lambda else cumLambda + lambda
      (0 until dim).map { i =>
        (c.toLong, i.toLong, v(i) * sg, lambda, lambda / trace,
          cumLambda / trace)
      }
    }
    out.toDF("component", "dim_idx", "loading", "eigenvalue",
      "explained", "cum_explained")
      .orderBy("component", "dim_idx")
  }

  /** The shared one-pass exact moment aggregation behind the PCA
    * family: (n as double, component sums ⌊x·2²⁰⌋, covariance matrix
    * assembled from the exact integer sums — see [[pcaTopComponent]]
    * for the full contract). */
  private def covarianceMatrix(df: DataFrame, vecCol: String,
      dim: Int): (Double, Array[Double], Array[Array[Double]]) = {
    require(dim >= 2 && dim <= 1024, "PCA needs 2 <= dim <= 1024")
    val qD = 1048576.0
    def vecSum(c: Column, n: Int): Column =
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.VecSumLong(
          org.apache.spark.sql.graft.ColumnBridge.expression(c), n)
          .toAggregateExpression())
    val e = df.where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(vecCol).cast("array<double>").as("v"))
    val fxVec = transform(col("v"),
      x => floor(x * lit(1048576L)).cast("long"))
    val prodVec = flatten(transform(col("v"), xi =>
      transform(col("v"),
        xj => floor(xi * xj * lit(1048576.0)).cast("long"))))
    // one corpus pass; the collected result is model-sized (dim² longs)
    val agg = e.agg(count(lit(1)).as("n"), vecSum(fxVec, dim).as("s"),
      vecSum(prodVec, dim * dim).as("m")).collect()(0)
    val n = agg.getAs[Long]("n")
    require(n > 0, "PCA: empty input")
    val nD = n.toDouble
    val sArr = agg.getAs[scala.collection.Seq[Long]]("s")
      .map(_.toDouble).toArray
    val mArr = agg.getAs[scala.collection.Seq[Long]]("m")
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      mArr(i * dim + j).toDouble / nD / qD -
        (sArr(i) / nD / qD) * (sArr(j) / nD / qD)
    }
    (nD, sArr, cov)
  }

  /** Left fold over dimension index, seeded with the FIRST element —
    * the list_reduce chain every oracle replays. */
  private def foldDim(dim: Int)(vals: Int => Double): Double = {
    var acc = vals(0); var k = 1
    while (k < dim) { acc += vals(k); k += 1 }
    acc
  }

  /** `iterations` power-iteration steps from the uniform start;
    * returns (final normalization constant, final RAW iterate). */
  private def powerIterate(cov: Array[Array[Double]], dim: Int,
      iterations: Int): (Double, Array[Double]) = {
    require(iterations >= 1 && iterations <= 100,
      "PCA needs 1 <= iterations <= 100")
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    for (_ <- 1 to iterations) {
      val mv = Array.tabulate(dim)(i =>
        foldDim(dim)(j => cov(i)(j) * v(j)))
      lambda = math.sqrt(foldDim(dim)(i => mv(i) * mv(i)))
      v = mv.map(_ / lambda)
    }
    (lambda, v)
  }

  /** Canonical sign factor: the component with the largest |loading|
    * (ties to the lowest index) is made non-negative. */
  private def canonicalSign(v: Array[Double], dim: Int): Double = {
    val pivot = (0 until dim).maxBy(i => (math.abs(v(i)), -i))
    if (v(pivot) < 0) -1.0 else 1.0
  }

  /** Distance-concentration audit (Beyer et al. ICDT'99, "when is
    * nearest neighbor meaningful"): pairwise Euclidean distance
    * statistics over a deterministic k-sample — as dimensionality
    * effectively grows, std/mean → 0 and every neighbor looks
    * equidistant, which is the regime where ANN recall quietly
    * degrades no matter the index. Read `concentration` (std/mean,
    * the relative contrast) BEFORE trusting an ANN tier: healthy
    * spaces sit well above ~0.1.
    *
    * Determinism: the sample is the k smallest (h30(id), id) rows via
    * the bounded-state [[graft.expressions.TopKByHash]] aggregate
    * (partition-order free, k rows of state per partition — the only
    * corpus-scale stage). The k(k−1)/2 pairwise distances are
    * model-sized driver math: each distance folds squared component
    * differences in dimension order, and the mean/variance fold the
    * pair distances in (id_a, id_b) order — every sum a first-
    * element-seeded left fold, so a DuckDB oracle replays the exact
    * IEEE chain with list_reduce.
    *
    * Output (one row): n_sample, n_pairs, mean_dist, std_dist,
    * concentration (std/mean), min_dist, max_dist.
    */
  def distanceConcentration(df: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int = 48): DataFrame = {
    require(dim >= 2 && dim <= 4096,
      "distanceConcentration needs 2 <= dim <= 4096")
    require(k >= 4 && k <= 512, "distanceConcentration needs 4<=k<=512")
    val sess = df.sparkSession
    import sess.implicits._
    val e = df.where(col(vecCol).isNotNull &&
        size(col(vecCol)) === dim && col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
    val sample = e
      .agg(Sampling.topKByHash(k,
        Dedup.h30(col("id").cast("string")), col("id"),
        "id" -> col("id"), "emb" -> col("v")).as("s"))
      .select(explode(col("s")).as("r"))
      .select(col("r.id").as("id"), col("r.emb").as("emb"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Double]](1).toArray))
      .sortBy(_._1)
    val nS = sample.length
    require(nS >= 2, "distanceConcentration: fewer than 2 sampled rows")
    // pair distances in (id_a, id_b) order; each a seed-first fold
    val dists = for {
      a <- 0 until nS; b <- (a + 1) until nS
    } yield {
      val va = sample(a)._2; val vb = sample(b)._2
      var acc = (va(0) - vb(0)) * (va(0) - vb(0))
      var i = 1
      while (i < dim) {
        acc += (va(i) - vb(i)) * (va(i) - vb(i)); i += 1
      }
      math.sqrt(acc)
    }
    val np = dists.length
    def fold(xs: Seq[Double]): Double = {
      var acc = xs.head; var i = 1
      while (i < xs.length) { acc += xs(i); i += 1 }
      acc
    }
    val mean = fold(dists) / np.toDouble
    val std = math.sqrt(
      fold(dists.map(x => (x - mean) * (x - mean))) / np.toDouble)
    Seq((nS.toLong, np.toLong, mean, std, std / mean,
      dists.min, dists.max))
      .toDF("n_sample", "n_pairs", "mean_dist", "std_dist",
        "concentration", "min_dist", "max_dist")
  }
}
