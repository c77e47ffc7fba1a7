package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables

/** Text / document-corpus operators (SURVEY §2.3 + the LLM-pipeline
  * extensions): exact dedup, token counting, text normalization. All are
  * single-scan group-bys or narrow projections — embarrassingly parallel
  * at 100 TB.
  */
object DocQueries {
  import Q._

  val all: Seq[Q] = Seq(

    // Exact dedup by content hash (north-star dedup baseline): one
    // hash-shuffle keyed on md5(text); at scale this is the canonical
    // map-side-combine group-by.
    Q("q08_exact_dedup", Some("""
      SELECT md5(text) AS text_hash, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
             CAST(COUNT(*) AS BIGINT) AS n_copies
      FROM documents GROUP BY md5(text) ORDER BY text_hash""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      d.groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_copies"))
        .orderBy("text_hash")
    },

    // Token counting (whitespace tokenizer) + per-language stats.
    Q("q12_doc_token_stats", Some("""
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY lang ORDER BY lang""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(trim(col("text")), "\\s+"))).cast("long")
            .as("total_tokens"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy("lang")
    },

    // Vocabulary heavy hitters — the corpus census a tokenizer
    // training run starts from: explode tokens, one map-side-combining
    // count shuffle keyed on the token, top-100 via
    // TakeOrderedAndProject (count desc, token asc tie-break). At
    // 100 TB the combine collapses each partition's counts before the
    // exchange, so shuffle volume is bounded by |vocab|·partitions,
    // not corpus tokens.
    Q("q82_vocab_topk", Some("""
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents WHERE text IS NOT NULL) t
      GROUP BY token ORDER BY n DESC, token LIMIT 100""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      d.where(col("text").isNotNull)
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(100)
    },

    // Approximate heavy hitters, verified (q82's at-scale sibling):
    // per-partition Space-Saving sketch — shuffle bounded by
    // capacity·partitions instead of |vocab|·partitions — then a
    // broadcast candidate gate and an exact recount of candidates
    // only. The oracle is the EXACT census: sketch+verify must
    // reproduce it whenever the guarantee covers rank 100 (Zipf-shaped
    // token frequencies clear it by orders of magnitude).
    Q("q96_vocab_topk_approx", Some("""
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents WHERE text IS NOT NULL) t
      GROUP BY token ORDER BY n DESC, token LIMIT 100""")) { (s, dir) =>
      graft.analytics.HeavyHitters.approxVocabTopK(
        Tables.load(s, dir, "documents"), k = 100, capacity = 4096)
    },

    // T7 whitespace collapse + lowercase normalize (reference
    // cleaners.py:160-175 pipeline tail) — deterministic string output.
    Q("q18_text_normalize", Some("""
      SELECT doc_id,
             lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS clean_text
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      d.select(col("doc_id"),
          lower(trim(regexp_replace(col("text"), "\\s+", " ")))
            .as("clean_text"))
        .orderBy("doc_id")
    }
  )
}
