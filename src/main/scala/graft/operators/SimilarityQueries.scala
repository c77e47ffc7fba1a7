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
  private def duckCosine(a: String, b: String): String =
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
    }
  )
}
