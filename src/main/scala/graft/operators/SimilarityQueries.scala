package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.analytics.Similarity

/** Similarity-search queries (north-star ANN tier) over `embeddings`.
  * The cosine is a left-fold double sum in both engines (Spark
  * `aggregate` with 0.0 init vs DuckDB `list_reduce` seeded by the first
  * element — `0.0 + x` is exact, so the two folds are bit-identical).
  */
object SimilarityQueries {

  /** DuckDB cosine between two DOUBLE[] expressions, as a left fold. */
  private[operators] def duckCosine(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b), x -> x[1] * x[2]), (acc, v) -> acc + v)
       | / (sqrt(list_reduce(list_transform($a, x -> x * x), (acc, v) -> acc + v))
       |   * sqrt(list_reduce(list_transform($b, x -> x * x), (acc, v) -> acc + v)))"""
      .stripMargin

  val all: Seq[Q] = Seq(

    // Exact brute-force top-k: query set (vec_id < 16) broadcast against
    // the corpus scan; per-query top-5 via row_number. At 100 TB the
    // corpus side stays a single narrow scan — no corpus shuffle.
    Q("q23_cosine_topk", Some(s"""
      WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          ${duckCosine("q.embedding::DOUBLE[]", "c.embedding::DOUBLE[]")} AS score
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 16)
      SELECT query_id, neighbor_id, score, CAST(rn AS INT) AS rn FROM (
        SELECT query_id, neighbor_id, score,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY score DESC, neighbor_id) AS rn
        FROM scored) t
      WHERE rn <= 5 ORDER BY query_id, rn""")) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 16), emb, k = 5)
        .orderBy("query_id", "rn")
    },

    // LSH-bucketed approximate top-k: candidates restricted to the
    // query's 8-bit sign bucket — the shuffle key is the bucket id.
    {
      val bits = 8
      val duckBucket = (tbl: String) => (0 until bits).map(i =>
        s"CASE WHEN $tbl.embedding[${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END")
        .mkString(" + ")
      Q("q24_cosine_topk_lsh", Some(s"""
      WITH scored AS (
        SELECT q.vec_id AS query_id, ${duckBucket("q")} AS bucket,
          c.vec_id AS neighbor_id,
          ${duckCosine("q.embedding::DOUBLE[]", "c.embedding::DOUBLE[]")} AS score
        FROM embeddings q JOIN embeddings c
          ON (${duckBucket("q")}) = (${duckBucket("c")})
         AND q.vec_id <> c.vec_id
        WHERE q.vec_id < 16)
      SELECT query_id, CAST(bucket AS INT) AS bucket, neighbor_id, score,
        CAST(rn AS INT) AS rn FROM (
        SELECT query_id, bucket, neighbor_id, score,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY score DESC, neighbor_id) AS rn
        FROM scored) t
      WHERE rn <= 5 ORDER BY query_id, rn""")) { (s, dir) =>
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.bucketedTopK(emb.filter(col("vec_id") < 16), emb,
            k = 5, bits = bits)
          .orderBy("query_id", "rn")
      }
    },

    // IVF approximate top-k: 16-centroid codebook (first vectors),
    // corpus assigned to nearest cell, queries probe 2 cells, exact
    // cosine only within candidate cells.
    Q("q46_ivf_topk", Some(s"""
      WITH centroids AS (
        SELECT vec_id AS centroid_id, embedding AS cent_emb
        FROM embeddings WHERE vec_id < 16),
      corpus_cells AS (
        SELECT neighbor_id, c_emb, centroid_id AS cell FROM (
          SELECT e.vec_id AS neighbor_id, e.embedding AS c_emb,
            c.centroid_id,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
              ${duckCosine("e.embedding::DOUBLE[]", "c.cent_emb::DOUBLE[]")} DESC,
              c.centroid_id) AS crn
          FROM embeddings e CROSS JOIN centroids c) t
        WHERE crn <= 1),
      query_cells AS (
        SELECT query_id, q_emb, centroid_id AS cell FROM (
          SELECT e.vec_id AS query_id, e.embedding AS q_emb,
            c.centroid_id,
            ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
              ${duckCosine("e.embedding::DOUBLE[]", "c.cent_emb::DOUBLE[]")} DESC,
              c.centroid_id) AS crn
          FROM embeddings e CROSS JOIN centroids c
          WHERE e.vec_id < 16) t
        WHERE crn <= 2),
      scored AS (
        SELECT q.query_id, cc.neighbor_id,
          ${duckCosine("q.q_emb::DOUBLE[]", "cc.c_emb::DOUBLE[]")} AS score
        FROM query_cells q JOIN corpus_cells cc USING (cell)
        WHERE q.query_id <> cc.neighbor_id)
      SELECT query_id, neighbor_id, score, CAST(rn AS INT) AS rn FROM (
        SELECT query_id, neighbor_id, score,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY score DESC, neighbor_id) AS rn
        FROM scored) t
      WHERE rn <= 5 ORDER BY query_id, rn""")) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.ivfTopK(emb.filter(col("vec_id") < 16), emb,
          k = 5, codebookSize = 16, nprobe = 2)
        .orderBy("query_id", "rn")
    }
  )
}
