package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.analytics.{Bpe, Dedup, LangModel, TextAnalysis => TA}

/** Text-analysis queries (north-star tier: language-ID, quality
  * scoring, token counting, fingerprinting) over `documents`. Oracle
  * SQL is generated from the same stopword lists / coefficients the
  * Spark expressions use.
  */
object TextQueries {

  private def inList(lang: String): String =
    TA.stopwords(lang).map(w => s"'$w'").mkString(", ")

  /** DuckDB: stopword-hit ratio for one language over token list `t`. */
  private def duckScore(lang: String): String =
    s"len(list_filter(t, x -> x IN (${inList(lang)})))::DOUBLE / len(t)::DOUBLE"

  /** DuckDB: per-language score columns `s_<lang>` over token list
    * `t` — shared with the composed corpus-prep pipeline (q79). */
  private[operators] def duckLangScores: String =
    TA.langs.map(l => s"${duckScore(l)} AS s_$l").mkString(",\n          ")

  /** DuckDB: the argmax CASE over the [[duckLangScores]] columns,
    * alphabetical tie-break — mirrors TextAnalysis.langPredict. */
  private[operators] def duckLangCase: String = {
    val cases = TA.langs.map { l =>
      val others = TA.langs.filter(_ != l)
        .map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN s_$l > 0 AND $others THEN '$l'"
    }.mkString("\n          ")
    s"CASE $cases ELSE 'und' END"
  }

  /** Bigram-LM smoothing and CCNet bucket thresholds (q108). The
    * thresholds are corpus-calibrated tertiles (CCNet publishes the
    * analogous per-language cutoff tables computed offline); both the
    * Spark plan and the generated oracle read these constants, so they
    * can only drift together. Defined BEFORE `all` — object vals
    * initialize in declaration order, and a forward reference would
    * silently interpolate 0.0 into the oracle SQL. */
  /** Shared q110/q252 BPE oracle pieces: merge count, the
    * sentinel-encoded symbol string of an expression, and the full
    * train+encode CTE chain `wd → w0..wM / m1..mM → d0..dM` (see the
    * q110 comment for the agreement argument). */
  private val BpeM = 24
  private def duckEnc(c: String): String =
    s"substr('\u00b7' || regexp_replace($c, '(.)', '\\1\u00b7\u00b7', 'g'), 1, " +
      s"length('\u00b7' || regexp_replace($c, '(.)', '\\1\u00b7\u00b7', 'g')) - 1)"
  private def bpeCtes: String = {
    val M = BpeM
    val sb = new StringBuilder
    sb.append(s"""
      wd AS MATERIALIZED (
        SELECT word, COUNT(*) AS freq FROM (
          SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
          FROM documents WHERE text IS NOT NULL)
        WHERE len(word) >= 1 GROUP BY word),
      w0 AS MATERIALIZED (
        SELECT ${duckEnc("word")} AS enc, freq FROM wd)""")
    for (k <- 1 to M) sb.append(s""",
      m$k AS MATERIALIZED (
        SELECT '\u00b7' || l || '\u00b7\u00b7' || r || '\u00b7' AS pat,
               '\u00b7' || l || r || '\u00b7' AS rep
        FROM (
          SELECT t[i] AS l, t[i+1] AS r, SUM(freq) AS c FROM (
            SELECT t, freq,
              unnest(generate_series(1, len(t) - 1)) AS i FROM (
              SELECT string_split(substr(enc, 2, length(enc) - 2),
                '\u00b7\u00b7') AS t, freq
              FROM w${k - 1}) WHERE len(t) >= 2)
          GROUP BY l, r ORDER BY c DESC, l, r LIMIT 1)),
      w$k AS MATERIALIZED (
        SELECT replace(enc,
          coalesce((SELECT pat FROM m$k), '\u00b7\u00b7\u00b7'),
          coalesce((SELECT rep FROM m$k), '\u00b7\u00b7\u00b7')) AS enc,
          freq
        FROM w${k - 1})""")
    sb.append(s""",
      d0 AS (
        SELECT doc_id,
          array_to_string([${duckEnc("w")}
            for w in string_split_regex(trim(text), '\\s+')], ' ') AS enc,
          len(string_split_regex(trim(text), '\\s+')) AS n_words,
          trim(text) = '' AS blank
        FROM documents WHERE text IS NOT NULL)""")
    for (k <- 1 to M) sb.append(s""",
      d$k AS (
        SELECT doc_id, replace(enc,
          coalesce((SELECT pat FROM m$k), '\u00b7\u00b7\u00b7'),
          coalesce((SELECT rep FROM m$k), '\u00b7\u00b7\u00b7')) AS enc,
          n_words, blank
        FROM d${k - 1})""")
    sb.toString
  }

  private val LmAlpha = 0.1
  private val LmHeadBelow = 3.3727
  private val LmTailAbove = 3.3992

  val all: Seq[Q] = Seq(

    // Stopword-profile language identification; argmax with
    // alphabetical tie-break mirrors TextAnalysis.langPredict's fold.
    {
      Q("q25_lang_id", Some(s"""
      SELECT doc_id, s_de, s_en, s_es, s_fr,
        $duckLangCase AS predicted
      FROM (
        SELECT doc_id,
          $duckLangScores
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM documents))
      ORDER BY doc_id""")) { (s, dir) =>
        val d = Tables.load(s, dir, "documents")
        // explode(array(struct)) is a generator barrier: the one-pass
        // profile evaluates once per row; a plain multi-column select
        // would be projection-collapsed back into 5 re-evaluations
        d.select(col("doc_id"),
            explode(array(TA.langProfile(col("text")))).as("r"))
          .select(col("doc_id") +:
            TA.langs.map(l => col(s"r.s_$l").as(s"s_$l")) :+
            col("r.predicted").as("predicted"): _*)
          .orderBy("doc_id")
      }
    },

    // Gopher-style quality gates + composite score.
    Q("q26_doc_quality", Some("""
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, mean_token_len,
        stop_ratio, punct_ratio,
        (CAST(n_tokens BETWEEN 20 AND 100000 AS INT)
         + CAST(mean_token_len BETWEEN 3.0 AND 10.0 AS INT)
         + CAST(stop_ratio >= 0.01 AS INT)
         + CAST(punct_ratio <= 0.1 AS INT))::DOUBLE / 4 AS quality_score
      FROM (
        SELECT doc_id, len(t) AS n_tokens,
          length(regexp_replace(text, '\s', '', 'g'))::DOUBLE / len(t)::DOUBLE AS mean_token_len,
          len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it', 'that', 'for')))::DOUBLE / len(t)::DOUBLE AS stop_ratio,
          length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::DOUBLE / greatest(length(text), 1)::DOUBLE AS punct_ratio
        FROM (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS t
              FROM documents))
      ORDER BY doc_id""")) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          explode(array(TA.qualityProfile(col("text")))).as("r"))
        .select(col("doc_id"), col("r.n_tokens").as("n_tokens"),
          col("r.mean_token_len").as("mean_token_len"),
          col("r.stop_ratio").as("stop_ratio"),
          col("r.punct_ratio").as("punct_ratio"),
          col("r.quality_score").as("quality_score"))
        .orderBy("doc_id")
    },

    // Collocation mining: adjacent word pairs ranked by association
    // lift (= the PMI ratio without the log — same ordering, but
    // hash-reproducible: exact HUGEINT/DECIMAL count products, one
    // double division per row; libm `log` differs across engines in
    // the last ulp).
    Q("q135_collocations", Some("""
      WITH toks AS (
        SELECT string_split_regex(trim(text), '\s+') AS t
        FROM documents WHERE text IS NOT NULL
      ), uni AS (
        SELECT u AS w, count(*) AS c
        FROM (SELECT unnest(t) AS u FROM toks) GROUP BY 1
      ), bi AS (
        SELECT b, count(*) AS c
        FROM (SELECT unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i+1])) AS b
              FROM toks) GROUP BY 1
      ), tot AS (
        SELECT (SELECT sum(CAST(c AS HUGEINT)) FROM uni) AS n,
               (SELECT sum(CAST(c AS HUGEINT)) FROM bi) AS bn
      )
      SELECT split_part(b, ' ', 1) AS x, split_part(b, ' ', 2) AS y,
        CAST(bi.c AS BIGINT) AS n,
        CAST(CAST(bi.c AS HUGEINT) * tot.n * tot.n AS DOUBLE)
          / CAST(CAST(ux.c AS HUGEINT) * uy.c * tot.bn AS DOUBLE)
          AS lift
      FROM bi, tot
      JOIN uni ux ON ux.w = split_part(b, ' ', 1)
      JOIN uni uy ON uy.w = split_part(b, ' ', 2)
      WHERE bi.c >= 5
      ORDER BY lift DESC, x, y LIMIT 40""")) { (s, dir) =>
      graft.analytics.Collocations.collocations(
        Tables.load(s, dir, "documents"), "text",
        minSupport = 5L, topK = 40)
    },

    // Whitespace vs BPE-ish sub-word token counts per document.
    Q("q27_token_counts", Some(s"""
      SELECT doc_id,
        CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
        CAST(len(regexp_extract_all(text, '${TA.bpeRegex.replace("'", "''")}')) AS BIGINT) AS bpe_tokens
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TA.wsTokenCount(col("text")).cast("long").as("ws_tokens"),
          TA.bpeTokenCount(col("text")).cast("long").as("bpe_tokens"))
        .orderBy("doc_id")
    },

    // Order-sensitive polynomial rolling-hash fingerprint (Horner fold
    // over portable 30-bit token hashes).
    Q("q28_doc_fingerprint", Some(s"""
      SELECT doc_id,
        list_reduce(
          list_prepend(0::BIGINT,
            list_transform(string_split_regex(trim(text), '\\s+'),
              tok -> CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % ${Dedup.P})),
          (acc, h) -> (acc * 131 + h) % ${Dedup.P}) AS fingerprint
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TA.rollingFingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    },

    // BPE merge-pair statistics (Sennrich et al. 2016): corpus-weighted
    // adjacent-character-pair counts — the inner loop of tokenizer
    // training. The scale trick is in the plan shape: the corpus is
    // aggregated to (distinct word, freq) FIRST (one vocab-sized
    // shuffle), then each distinct word's pairs explode exactly once.
    Q("q105_bpe_pairs", Some("""
      WITH words AS (
        SELECT word, COUNT(*) AS freq FROM (
          SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
          FROM documents WHERE text IS NOT NULL) GROUP BY word),
      pairs AS (
        SELECT substr(word, CAST(i AS INT), 2) AS pair, freq
        FROM (SELECT word, freq, unnest(range(1, len(word))) AS i
              FROM words WHERE len(word) >= 2))
      SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
      FROM pairs GROUP BY pair ORDER BY pair""")) { (s, dir) =>
      TA.bpePairCounts(Tables.load(s, dir, "documents"),
          "doc_id", "text")
        .orderBy("pair")
    },

    // CCNet-style bigram-LM perplexity quality filter (Wenzek et al.
    // 2020): score every document's cross-entropy under an add-α
    // bigram model trained on the corpus itself, bucket head/middle/
    // tail on calibrated thresholds. The per-doc Σ ln P is a
    // position-sorted fold in BOTH engines (float addition is not
    // associative); ln is not bit-portable, so scores compare at 4
    // decimals (the verified bround/round_even idiom).
    Q("q108_lm_perplexity", Some(s"""
      WITH tok AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents WHERE text IS NOT NULL),
      big AS (
        SELECT doc_id, i, t[i] AS w1, t[i+1] AS w2
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i
              FROM tok WHERE len(t) >= 2)),
      c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2),
      c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
      v AS (SELECT COUNT(DISTINCT w) AS v
            FROM (SELECT unnest(t) AS w FROM tok)),
      sc AS (
        SELECT b.doc_id, b.i,
          ln((c2.c2 + ${LmAlpha}) / (c1.c1 + ${LmAlpha} *
            (SELECT v FROM v))) AS logp
        FROM big b JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
        JOIN c1 ON b.w1 = c1.w1),
      ce AS (
        SELECT doc_id,
          round_even(-list_reduce(list_prepend(0.0, list(logp ORDER BY i)),
            (acc, v) -> acc + v) / COUNT(*), 4) AS ce4,
          COUNT(*) AS n_bigrams
        FROM sc GROUP BY doc_id)
      SELECT doc_id, ce4, CAST(n_bigrams AS BIGINT) AS n_bigrams,
        CASE WHEN ce4 < ${LmHeadBelow} THEN 'head'
             WHEN ce4 > ${LmTailAbove} THEN 'tail'
             ELSE 'middle' END AS bucket
      FROM ce ORDER BY doc_id""")) { (s, dir) =>
      LangModel.bigramCrossEntropy(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          alpha = LmAlpha)
        .withColumn("ce4", bround(col("ce"), 4))
        .select(col("doc_id"), col("ce4"),
          col("n_bigrams").cast("long").as("n_bigrams"),
          LangModel.ceBucket(col("ce4"), LmHeadBelow, LmTailAbove)
            .as("bucket"))
        .orderBy("doc_id")
    },

    // Interpolated Kneser–Ney TRIGRAM cross-entropy (Kneser & Ney
    // 1995; fixed discount 0.75) — the CCNet filter one modeling
    // order up from q108: continuation counts N₁₊ replace raw MLE
    // counts at the backoff levels, so boilerplate repetition can't
    // fake fluency. Six exact count tables joined back to the trigram
    // stream; probability is one fixed double expression tree;
    // Σ ln P folds position-sorted; scores compare at 4 decimals.
    Q("q269_kn_trigram", Some("""
      WITH tok AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents WHERE text IS NOT NULL),
      tri AS (
        SELECT doc_id, i, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
              FROM tok WHERE len(t) >= 3)),
      bt AS (
        SELECT DISTINCT t[i] AS w1, t[i+1] AS w2
        FROM (SELECT t, unnest(generate_series(1, len(t)-1)) AS i
              FROM tok WHERE len(t) >= 2)),
      c3 AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM tri GROUP BY 1, 2, 3),
      ctx AS (SELECT w1, w2, COUNT(*) AS c2ctx,
                COUNT(DISTINCT w3) AS n1f2 FROM tri GROUP BY 1, 2),
      mid AS (SELECT w2, w3, COUNT(DISTINCT w1) AS m23
              FROM tri GROUP BY 1, 2),
      mid2 AS (SELECT w2, CAST(SUM(m23) AS BIGINT) AS mid2
               FROM mid GROUP BY 1),
      fb AS (SELECT w1 AS w2, COUNT(*) AS n1fb2 FROM bt GROUP BY 1),
      ct AS (SELECT w2 AS w3, COUNT(*) AS contw3 FROM bt GROUP BY 1),
      b AS (SELECT COUNT(*) AS b FROM bt),
      sc AS (
        SELECT tr.doc_id, tr.i,
          ln((greatest(CAST(c3.c3 AS DOUBLE) - 0.75, 0.0)
                / CAST(ctx.c2ctx AS DOUBLE))
            + ((0.75 * CAST(ctx.n1f2 AS DOUBLE)
                / CAST(ctx.c2ctx AS DOUBLE)) *
              ((greatest(CAST(mid.m23 AS DOUBLE) - 0.75, 0.0)
                  / CAST(mid2.mid2 AS DOUBLE))
                + ((0.75 * CAST(fb.n1fb2 AS DOUBLE)
                    / CAST(mid2.mid2 AS DOUBLE)) *
                  (CAST(ct.contw3 AS DOUBLE)
                    / CAST((SELECT b FROM b) AS DOUBLE)))))) AS logp
        FROM tri tr
        JOIN c3 ON tr.w1 = c3.w1 AND tr.w2 = c3.w2 AND tr.w3 = c3.w3
        JOIN ctx ON tr.w1 = ctx.w1 AND tr.w2 = ctx.w2
        JOIN mid ON tr.w2 = mid.w2 AND tr.w3 = mid.w3
        JOIN mid2 ON tr.w2 = mid2.w2
        JOIN fb ON tr.w2 = fb.w2
        JOIN ct ON tr.w3 = ct.w3),
      ce AS (
        SELECT doc_id,
          round_even(-list_reduce(list_prepend(0.0, list(logp ORDER BY i)),
            (acc, v) -> acc + v) / COUNT(*), 4) AS ce4,
          COUNT(*) AS n_trigrams
        FROM sc GROUP BY doc_id)
      SELECT doc_id, ce4, CAST(n_trigrams AS BIGINT) AS n_trigrams
      FROM ce ORDER BY doc_id""")) { (s, dir) =>
      LangModel.knTrigramCrossEntropy(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          discount = 0.75)
        .select(col("doc_id"), bround(col("ce"), 4).as("ce4"),
          col("n_trigrams").cast("long").as("n_trigrams"))
        .orderBy("doc_id")
    },

    // BPE tokenizer train + ENCODE (Sennrich et al. 2016): learn 24
    // merges from corpus-weighted pair statistics, then encode every
    // document and report its BPE token count. Spark trains from the
    // collected (vocab-bounded, budget-gated) word-frequency table and
    // encodes with a codegen'd literal-replace chain; the oracle
    // unrolls the SAME training rounds as SQL CTEs (argmax pair with
    // (count DESC, left, right) tie-break per round) and the same
    // sentinel-encoded replaces, so merge tables — and therefore every
    // token count — can only agree or hash-mismatch loudly.
    {
      val M = BpeM
      Q("q110_bpe_encode", Some(s"""
      WITH $bpeCtes
      SELECT doc_id,
        CAST(CASE WHEN blank THEN 0 ELSE n_words END AS BIGINT)
          AS n_words,
        CAST(CASE WHEN blank THEN 0 ELSE n_words +
          (length(enc) - length(replace(enc, '\u00b7\u00b7', '\u00b7')))
          END AS BIGINT) AS n_tokens
      FROM d$M ORDER BY doc_id""")) { (s, dir) =>
        val docs = Tables.load(s, dir, "documents")
        val merges = Bpe.train(docs, "text", M)
        // vocabulary-sized encode: replay the merge chain once per
        // DISTINCT word and join the counts back, instead of running
        // M full-text replaces over every document (the oracle's
        // formulation — results identical because merges never span
        // the inter-word space, so per-word token counts sum to the
        // whole-text count). Blank docs keep their 0/0 contract.
        val base = docs.where(col("text").isNotNull)
        val wordsDf = base.where(trim(col("text")) =!= "")
          .select(col("doc_id"),
            explode(split(trim(col("text")), "\\s+")).as("word"))
        val vocabTok = wordsDf.select("word").distinct()
          .withColumn("wtok", Bpe.wordTokenCount(col("word"), merges))
        val counts = wordsDf.join(vocabTok, "word")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"), sum("wtok").as("n_tokens"))
        base.select("doc_id").join(counts, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_words"), lit(0L)).cast("long").as("n_words"),
            coalesce(col("n_tokens"), lit(0L)).cast("long")
              .as("n_tokens"))
          .orderBy("doc_id")
      }
    },

    // Tokenizer fertility per source (tokens per word under the q110
    // BPE): the tokenizer-evaluation number a corpus run reads before
    // committing a vocab — high-fertility sources burn context
    // budget. Same train+encode chain as q110, aggregated per source
    // with exact integer sums and one guarded double division.
    {
      val M = BpeM
      Q("q252_tokenizer_fertility", Some(s"""
      WITH $bpeCtes,
      per AS (
        SELECT doc_id,
          CAST(CASE WHEN blank THEN 0 ELSE n_words END AS BIGINT)
            AS n_words,
          CAST(CASE WHEN blank THEN 0 ELSE n_words +
            (length(enc) - length(replace(enc, '··', '·')))
            END AS BIGINT) AS n_tokens
        FROM d$M)
      SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_words) AS BIGINT) AS n_words,
        CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        CAST(SUM(n_tokens) AS DOUBLE)
          / CAST(NULLIF(SUM(n_words), 0) AS DOUBLE) AS fertility
      FROM per JOIN documents d USING (doc_id)
      WHERE d.source IS NOT NULL
      GROUP BY d.source ORDER BY d.source""")) { (s, dir) =>
        val docs = Tables.load(s, dir, "documents")
        val merges = Bpe.train(docs, "text", M)
        val base = docs.where(col("text").isNotNull)
        val wordsDf = base.where(trim(col("text")) =!= "")
          .select(col("doc_id"),
            explode(split(trim(col("text")), "\\s+")).as("word"))
        val vocabTok = wordsDf.select("word").distinct()
          .withColumn("wtok", Bpe.wordTokenCount(col("word"), merges))
        val counts = wordsDf.join(vocabTok, "word")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"), sum("wtok").as("n_tokens"))
        base.select("doc_id", "source")
          .where(col("source").isNotNull)
          .join(counts, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("n_words"), lit(0L))).as("n_words"),
            sum(coalesce(col("n_tokens"), lit(0L))).as("n_tokens"))
          .withColumn("fertility", col("n_tokens").cast("double") /
            when(col("n_words") > 0, col("n_words").cast("double")))
          .orderBy("source")
      }
    },

    // Classifier-based quality filtering (the GPT-3/CCNet gate):
    // logistic regression over per-doc features, trained with 3
    // full-batch GD iterations — ONE aggregation job per iteration,
    // driver state = 5 weights — then applied map-only. The oracle
    // UNROLLS the same iterations as chained CTEs; quantized
    // transcendentals + integer gradient sums make the replay
    // bit-exact across engines and partitionings (QualityModel doc).
    {
      val iters = 3
      val lr = "0.5"
      val sc = "100000000.0" // gradient term scale (1e8)
      def zSql(w: String): String =
        s"($w.w0 + x1*$w.w1 + x2*$w.w2 + x3*$w.w3 + x4*$w.w4)"
      def sigSql(w: String): String =
        s"(round((1.0/(1.0+exp(-${zSql(w)})))*10000.0)/10000.0)"
      val terms = Seq("", "x1", "x2", "x3", "x4")
      val iterCtes = (1 to iters).map { i =>
        val prev = s"c${i - 1}"
        val sums = terms.zipWithIndex.map { case (x, j) =>
          val m = if (x.isEmpty) "(t)" else s"(t * $x)"
          s"SUM(CAST(round($m * $sc) AS BIGINT)) AS s$j"
        }.mkString(",\n          ")
        val upd = (0 until 5).map(j =>
          s"c.w$j - $lr * ((g.s$j / $sc) / g.n) AS w$j").mkString(", ")
        s"""r$i AS (
        SELECT x1, x2, x3, x4, (${sigSql("c")} - y) AS t
        FROM feat, $prev c),
      g$i AS (
        SELECT $sums,
          COUNT(*) AS n FROM r$i),
      c$i AS (SELECT $upd FROM g$i g, $prev c)"""
      }.mkString(",\n      ")
      Q("q115_quality_lr", Some(s"""
      WITH feat AS (
        SELECT doc_id,
          round(ln(1 + len(w)) * 1000000.0) / 1000000.0 AS x1,
          round((CAST(len(list_distinct(w)) AS DOUBLE) / len(w))
            * 1000000.0) / 1000000.0 AS x2,
          round((CAST(list_sum(list_transform(w, t -> len(t))) AS DOUBLE)
            / len(w)) * 1000000.0) / 1000000.0 AS x3,
          round((CAST(len(list_filter(w, t -> len(t) <= 3)) AS DOUBLE)
            / len(w)) * 1000000.0) / 1000000.0 AS x4,
          CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
               ELSE CAST(0.0 AS DOUBLE) END AS y
        FROM (SELECT doc_id, lang,
                string_split_regex(trim(text), '\\s+') AS w
              FROM documents WHERE text IS NOT NULL)),
      c0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3,
                    0.0 AS w4),
      $iterCtes
      SELECT doc_id, score,
        CAST(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS pred
      FROM (SELECT f.doc_id, ${sigSql("c")} AS score
            FROM feat f, c$iters c)
      ORDER BY doc_id""")) { (s, dir) =>
        // when/otherwise, not a bare boolean cast: a NULL lang must
        // label 0.0 exactly as the oracle's CASE ... ELSE 0.0 does
        // (a NULL label would silently drop the row from every
        // gradient sum while still counting in n)
        val feat = graft.analytics.QualityModel.features(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          when(col("lang") === "en", 1.0).otherwise(0.0)).cache()
        val w = graft.analytics.QualityModel.train(feat, iters, lr.toDouble)
        graft.analytics.QualityModel.score(feat, w).orderBy("doc_id")
      }
    },

    // Calibration curve + expected calibration error of the q115
    // quality classifier (the reliability diagram: does a predicted
    // 0.9 behave like a 90%?). The oracle replays the identical
    // 3-iteration GD, then both engines bin the 1e-4-quantized
    // sigmoid as EXACT integers (si = score·10⁴, bin = si·10 div 10⁴,
    // ECE numerator Σ_b|pos_b·10⁴ − Σsi_b|) — every emitted double is
    // one division of exact integers.
    {
      val iters = 3
      val lr = "0.5"
      val sc = "100000000.0"
      def zSql(w: String): String =
        s"($w.w0 + x1*$w.w1 + x2*$w.w2 + x3*$w.w3 + x4*$w.w4)"
      def sigSql(w: String): String =
        s"(round((1.0/(1.0+exp(-${zSql(w)})))*10000.0)/10000.0)"
      val terms = Seq("", "x1", "x2", "x3", "x4")
      val iterCtes = (1 to iters).map { i =>
        val prev = s"c${i - 1}"
        val sums = terms.zipWithIndex.map { case (x, j) =>
          val m = if (x.isEmpty) "(t)" else s"(t * $x)"
          s"SUM(CAST(round($m * $sc) AS BIGINT)) AS s$j"
        }.mkString(",\n          ")
        val upd = (0 until 5).map(j =>
          s"c.w$j - $lr * ((g.s$j / $sc) / g.n) AS w$j").mkString(", ")
        s"""r$i AS (
        SELECT x1, x2, x3, x4, (${sigSql("c")} - y) AS t
        FROM feat, $prev c),
      g$i AS (
        SELECT $sums,
          COUNT(*) AS n FROM r$i),
      c$i AS (SELECT $upd FROM g$i g, $prev c)"""
      }.mkString(",\n      ")
      Q("q167_calibration_ece", Some(s"""
      WITH feat AS (
        SELECT doc_id,
          round(ln(1 + len(w)) * 1000000.0) / 1000000.0 AS x1,
          round((CAST(len(list_distinct(w)) AS DOUBLE) / len(w))
            * 1000000.0) / 1000000.0 AS x2,
          round((CAST(list_sum(list_transform(w, t -> len(t))) AS DOUBLE)
            / len(w)) * 1000000.0) / 1000000.0 AS x3,
          round((CAST(len(list_filter(w, t -> len(t) <= 3)) AS DOUBLE)
            / len(w)) * 1000000.0) / 1000000.0 AS x4,
          CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
               ELSE CAST(0.0 AS DOUBLE) END AS y
        FROM (SELECT doc_id, lang,
                string_split_regex(trim(text), '\\s+') AS w
              FROM documents WHERE text IS NOT NULL)),
      c0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3,
                    0.0 AS w4),
      $iterCtes,
      scored AS (
        SELECT CAST(y AS BIGINT) AS y,
          CAST(round(${sigSql("c")} * 10000.0) AS BIGINT) AS si
        FROM feat f, c$iters c),
      b AS (
        SELECT LEAST((si * 10) // 10000, 9) AS bin, COUNT(*) AS n,
          SUM(y) AS n_pos, SUM(si) AS s_conf
        FROM scored GROUP BY 1),
      t AS (
        SELECT SUM(abs(n_pos * 10000 - s_conf)) AS num, SUM(n) AS nn
        FROM b)
      SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
        CAST(s_conf AS DOUBLE) / CAST(10000 * n AS DOUBLE) AS mean_conf,
        CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS obs_rate,
        CAST(num AS DOUBLE) / CAST(10000 * nn AS DOUBLE) AS ece
      FROM b, t ORDER BY bin""")) { (s, dir) =>
        val feat = graft.analytics.QualityModel.features(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          when(col("lang") === "en", 1.0).otherwise(0.0)).cache()
        val w = graft.analytics.QualityModel.train(feat, iters,
          lr.toDouble)
        val scored = feat.select(
          graft.analytics.QualityModel.scoreCol(w).as("score"),
          col("y"))
        graft.analytics.Evaluation.calibrationBins(scored,
          col("score"), col("y"), nBins = 10, scale = 10000L)
      }
    },

    // Per-language top-10 tokens — the grouped vocabulary census
    // (which tokens dominate each language slice; the per-group
    // sibling of q96's global Space-Saving census). Exact here: one
    // (lang, token) count shuffle + a per-lang rank window over
    // VOCABULARY-sized partitions (bounded by distinct tokens, not
    // corpus rows). At 100 TB the same shape survives because the
    // window input is the aggregated count frame; a per-group
    // Space-Saving sketch (HeavyHitters) is the sub-vocabulary
    // alternative when even counts are too wide.
    Q("q169_lang_top_tokens", Some("""
      WITH t AS (
        SELECT lang, unnest(string_split_regex(trim(text), '\s+'))
          AS token
        FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
      c AS (SELECT lang, token, COUNT(*) AS n FROM t GROUP BY 1, 2),
      r AS (SELECT lang, token, n,
        ROW_NUMBER() OVER (PARTITION BY lang
                           ORDER BY n DESC, token) AS rn
        FROM c)
      SELECT lang, CAST(rn AS INT) AS rn, token, CAST(n AS BIGINT) AS n
      FROM r WHERE rn <= 10 ORDER BY lang, rn""")) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val c = Tables.load(s, dir, "documents")
        .where(col("text").isNotNull && col("lang").isNotNull)
        .select(col("lang"),
          explode(Dedup.tokens(col("text"))).as("token"))
        .groupBy("lang", "token").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("lang")
        .orderBy(col("n").desc, col("token"))
      c.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 10)
        .select(col("lang"), col("rn").cast("int").as("rn"),
          col("token"), col("n").cast("long").as("n"))
        .orderBy("lang", "rn")
    },

    // Jensen–Shannon token drift per language vs the rest of the
    // corpus — the discrete sibling of q172's numeric KS/Wasserstein
    // drift. The dense frame is |langs|×|vocab| (vocabulary-sized,
    // never corpus rows); each token's contribution is computed from
    // the same four BIGINTs in both engines, quantized to 1e-12
    // units, and summed exactly (HUGEINT / DECIMAL(38,0)) — the
    // order-invariant scalable variant of q121's sorted-fold recipe.
    Q("q177_token_js_drift", Some("""
      WITH t AS (
        SELECT lang AS g,
          unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
      pergv AS (
        SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM t GROUP BY 1, 2),
      perv AS (
        SELECT tok, CAST(SUM(c) AS BIGINT) AS cv FROM pergv GROUP BY 1),
      grp AS (
        SELECT g, CAST(SUM(c) AS BIGINT) AS n_a FROM pergv GROUP BY 1),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tot FROM pergv),
      frame AS (
        SELECT grp.g, grp.n_a, tot.n_tot, perv.tok, perv.cv,
          COALESCE(pergv.c, 0) AS c
        FROM perv CROSS JOIN grp CROSS JOIN tot
        LEFT JOIN pergv ON pergv.g = grp.g AND pergv.tok = perv.tok),
      sc AS (
        SELECT g, n_a, n_tot - n_a AS n_rest, c,
          CAST(round((
            CASE WHEN c > 0 THEN
              (CAST(c AS DOUBLE) / CAST(n_a AS DOUBLE)) * ln(
                2.0 * (CAST(c AS DOUBLE) / CAST(n_a AS DOUBLE)) /
                ((CAST(c AS DOUBLE) / CAST(n_a AS DOUBLE)) +
                 (CAST(cv - c AS DOUBLE) /
                  CAST(n_tot - n_a AS DOUBLE))))
            ELSE 0 END +
            CASE WHEN cv - c > 0 THEN
              (CAST(cv - c AS DOUBLE) / CAST(n_tot - n_a AS DOUBLE))
              * ln(
                2.0 * (CAST(cv - c AS DOUBLE) /
                       CAST(n_tot - n_a AS DOUBLE)) /
                ((CAST(c AS DOUBLE) / CAST(n_a AS DOUBLE)) +
                 (CAST(cv - c AS DOUBLE) /
                  CAST(n_tot - n_a AS DOUBLE))))
            ELSE 0 END) * 1000000000000.0) AS BIGINT) AS fp
        FROM frame)
      SELECT g AS lang, n_a AS n_tokens, n_rest,
        CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS vocab,
        CAST(SUM(fp) AS DOUBLE) / 2000000000000.0 AS jsd
      FROM sc GROUP BY g, n_a, n_rest ORDER BY lang""")) { (s, dir) =>
      graft.analytics.Evaluation.tokenJsDrift(
          Tables.load(s, dir, "documents")
            .where(col("lang").isNotNull), "lang", "text")
        .withColumnRenamed("g", "lang")
    },

    // Per-doc boilerplate coverage: token 5-grams shared by >= 3
    // distinct docs are "template" mass; each doc reports how much of
    // its own 5-gram stream they cover. One (doc, gram) aggregation +
    // one vocabulary-sized df table joined back on the gram — never
    // doc×doc. DuckDB's inclusive list slice ws[i:i+4] is the 5-token
    // window; Spark's WordNgrams walks the same whitespace split.
    Q("q183_boilerplate_cov", Some("""
      WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        FROM documents WHERE text IS NOT NULL),
      g AS (
        SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS gram
        FROM w, LATERAL (
          SELECT unnest(generate_series(1, len(ws) - 4)) AS i)),
      pdg AS (
        SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c
        FROM g GROUP BY 1, 2),
      dfs AS (
        SELECT gram, CAST(count(*) AS BIGINT) AS df
        FROM pdg GROUP BY 1)
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
        CAST(SUM(CASE WHEN df >= 3 THEN c ELSE 0 END) AS BIGINT)
          AS n_boiler,
        CAST(SUM(CASE WHEN df >= 3 THEN c ELSE 0 END) AS DOUBLE) /
          SUM(c) AS boiler_share
      FROM pdg JOIN dfs USING (gram)
      GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
      graft.analytics.CorpusOps.boilerplateCoverage(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        n = 5, minDf = 3L)
    },

    // Flesch reading-ease per document (vowel-group syllable proxy):
    // the classic readability quality signal from three exact regex
    // counts — words, sentence breaks ([.!?]+ runs, min 1), vowel
    // groups — with the score one fixed double expression per row
    // (+,−,×,÷ only: literal constants parse to identical doubles,
    // no libm), so raw doubles hash-match.
    Q("q218_readability", Some("""
      WITH c AS (
        SELECT doc_id,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
            AS n_words,
          CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
            AS BIGINT) AS n_sentences,
          CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
            AS BIGINT) AS n_syllables
        FROM documents WHERE text IS NOT NULL)
      SELECT doc_id, n_words, n_sentences, n_syllables,
        CASE WHEN n_words > 0 THEN
          206.835
          - 1.015 * (CAST(n_words AS DOUBLE)
            / CAST(n_sentences AS DOUBLE))
          - 84.6 * (CAST(n_syllables AS DOUBLE)
            / CAST(n_words AS DOUBLE))
        END AS flesch
      FROM c ORDER BY doc_id""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .where(col("text").isNotNull)
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long")
            .as("n_words"),
          greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
            .cast("long").as("n_sentences"),
          regexp_count(lower(col("text")), lit("[aeiouy]+"))
            .cast("long").as("n_syllables"))
      d.select(col("doc_id"), col("n_words"), col("n_sentences"),
          col("n_syllables"),
          when(col("n_words") > 0,
            lit(206.835)
              - lit(1.015) * (col("n_words").cast("double") /
                col("n_sentences").cast("double"))
              - lit(84.6) * (col("n_syllables").cast("double") /
                col("n_words").cast("double"))).as("flesch"))
        .orderBy("doc_id")
    },

    // Differential terms of the English slice vs the rest of the
    // corpus — Monroe et al.'s informed-Dirichlet log-odds z-scores.
    // Every formula input is an exact BIGINT count; the scores are
    // quantized to 1e-12 units on output (JVM vs C libm ln differ in
    // the last ulp even row-locally — measured here); top-40 by
    // (z_fp, term).
    Q("q203_log_odds_terms", Some("""
      WITH c AS (
        SELECT tok,
          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
            AS BIGINT) AS a,
          CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
            AS BIGINT) AS b
        FROM (
          SELECT lang,
            unnest(string_split_regex(trim(text), '\s+')) AS tok
          FROM documents
          WHERE text IS NOT NULL AND lang IS NOT NULL)
        WHERE tok <> '' GROUP BY tok),
      t AS (SELECT CAST(SUM(a) AS DOUBLE) AS na,
        CAST(SUM(b) AS DOUBLE) AS nb FROM c),
      s AS (
        SELECT tok, a, b,
          ln((CAST(a AS DOUBLE) + aw) / (na + 10.0 - CAST(a AS DOUBLE)
              - aw))
          - ln((CAST(b AS DOUBLE) + aw) / (nb + 10.0
              - CAST(b AS DOUBLE) - aw)) AS delta,
          (ln((CAST(a AS DOUBLE) + aw) / (na + 10.0
              - CAST(a AS DOUBLE) - aw))
           - ln((CAST(b AS DOUBLE) + aw) / (nb + 10.0
              - CAST(b AS DOUBLE) - aw)))
          / sqrt(1.0 / (CAST(a AS DOUBLE) + aw)
               + 1.0 / (CAST(b AS DOUBLE) + aw)) AS z
        FROM (
          SELECT tok, a, b, na, nb,
            10.0 * CAST(a + b AS DOUBLE) / (na + nb) AS aw
          FROM c CROSS JOIN t))
      SELECT tok AS term, a AS cnt_target, b AS cnt_rest,
        CAST(round(delta * 1000000000000.0) AS BIGINT) AS delta_fp,
        CAST(round(z * 1000000000000.0) AS BIGINT) AS z_fp
      FROM s
      ORDER BY CAST(round(z * 1000000000000.0) AS BIGINT) DESC, term
      LIMIT 40""")) { (s, dir) =>
      graft.analytics.TextAnalysis.logOddsTerms(
        Tables.load(s, dir, "documents"), "text", "lang", "en",
        mu = 10.0, k = 40)
    },

    // Zipf slope of the token-frequency distribution: OLS of
    // ln(count) on ln(rank) over the top 1000 tokens (rank by
    // (count desc, token) — a total order, no ties). Each ln is
    // quantized to 1e-12 units; all power sums accumulate as
    // HUGEINT/DECIMAL(38,0); slope/intercept are one double division
    // each. Natural text sits near slope −1.
    Q("q194_zipf_slope", Some("""
      WITH cnt AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
          SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
          FROM documents WHERE text IS NOT NULL)
        WHERE tok <> '' GROUP BY tok
        ORDER BY c DESC, tok LIMIT 1000),
      r AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rk
        FROM cnt),
      q AS (
        SELECT
          CAST(round(ln(CAST(rk AS DOUBLE)) * 1000000000000.0)
            AS HUGEINT) AS x,
          CAST(round(ln(CAST(c AS DOUBLE)) * 1000000000000.0)
            AS HUGEINT) AS y
        FROM r),
      s AS (
        SELECT CAST(count(*) AS HUGEINT) AS n, SUM(x) AS sx,
          SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM q)
      SELECT CAST(n AS BIGINT) AS n_terms,
        CASE WHEN n * sxx - sx * sx > 0 THEN
          CAST(n * sxy - sx * sy AS DOUBLE) /
            CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
        CASE WHEN n * sxx - sx * sx > 0 THEN
          (CAST(sy AS DOUBLE) / 1000000000000.0 -
            (CAST(n * sxy - sx * sy AS DOUBLE) /
             CAST(n * sxx - sx * sx AS DOUBLE)) *
            (CAST(sx AS DOUBLE) / 1000000000000.0)) /
            CAST(n AS DOUBLE) END AS intercept
      FROM s""")) { (s, dir) =>
      graft.analytics.TextAnalysis.zipfSlope(
        Tables.load(s, dir, "documents"), "text", k = 1000)
    },

    // RAKE keyword extraction: stopword/punctuation-delimited phrase
    // runs scored by Σ deg(w)/freq(w) — the unsupervised domain-term
    // miner. Both engines build runs from the same per-token cumsum,
    // quantize deg/freq as (deg·1e12) div freq in exact integer
    // arithmetic, and total-order the top 50 by (score, phrase).
    {
      val stops = graft.analytics.TextAnalysis.RakeStopwords
        .map(s => s"'$s'").mkString(", ")
      Q("q186_rake_keywords", Some(s"""
      WITH toks AS (
        SELECT doc_id, i,
          regexp_replace(lower(t[i]), '[^a-z0-9]', '', 'g') AS w
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM documents WHERE text IS NOT NULL),
          LATERAL (SELECT unnest(generate_series(1, len(t))) AS i)
      ), marked AS (
        SELECT doc_id, i, w,
          CASE WHEN w = '' OR w IN ($stops) THEN 1 ELSE 0 END AS br
        FROM toks
      ), runs AS (
        SELECT doc_id, i, w, br,
          SUM(br) OVER (PARTITION BY doc_id ORDER BY i) AS run
        FROM marked
      ), phr AS (
        SELECT doc_id, run, string_agg(w, ' ' ORDER BY i) AS phrase,
          CAST(count(*) AS BIGINT) AS plen
        FROM runs WHERE br = 0 GROUP BY doc_id, run
        HAVING count(*) <= 4
      ), stats AS (
        SELECT w, CAST(count(*) AS BIGINT) AS freq,
          CAST(SUM(plen) AS BIGINT) AS deg
        FROM (SELECT plen, unnest(string_split(phrase, ' ')) AS w
              FROM phr)
        GROUP BY w
      ), ptype AS (
        SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ,
          CAST(MIN(plen) AS BIGINT) AS n_words
        FROM phr GROUP BY 1
      ), scored AS (
        SELECT phrase, MIN(n_words) AS n_words, MIN(n_occ) AS n_occ,
          CAST(SUM(deg * 1000000000000 // freq) AS BIGINT) AS score_fp
        FROM (SELECT phrase, n_words, n_occ,
                unnest(string_split(phrase, ' ')) AS w FROM ptype)
        JOIN stats USING (w) GROUP BY phrase)
      SELECT phrase, n_words, n_occ, score_fp FROM scored
      ORDER BY score_fp DESC, phrase LIMIT 50""")) { (s, dir) =>
        graft.analytics.TextAnalysis.rakeKeywords(
          Tables.load(s, dir, "documents"), "doc_id", "text", k = 50)
      }
    },

    // Unigram (token) entropy per document — the Gopher-family
    // "natural language vs degenerate text" quality signal: low
    // entropy flags repeated/boilerplate docs, which simple length
    // and stopword features miss. Determinism: per-term contributions
    // are quantized to 1e-12 (ln is the only libm call) and summed by
    // an explicit left fold over the SORTED count list, so Spark's
    // `aggregate` and DuckDB's `list_reduce` run the identical IEEE
    // chain in the identical order under any partitioning.
    Q("q121_token_entropy", Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+'))
          AS tok
        FROM documents WHERE text IS NOT NULL),
      cnts AS (
        SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
      arrs AS (
        SELECT doc_id, list_sort(list(CAST(c AS DOUBLE))) AS cs,
          CAST(SUM(c) AS DOUBLE) AS n, COUNT(*) AS n_distinct
        FROM cnts GROUP BY doc_id)
      SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        CAST(n_distinct AS BIGINT) AS n_distinct,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(cs, c ->
            round(((c / n) * ln(n / c)) * 1000000000000.0)
              / 1000000000000.0)),
          (a, b) -> a + b) AS entropy
      FROM arrs ORDER BY doc_id""")) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .where(col("text").isNotNull)
      val cnts = d
        .select(col("doc_id"),
          explode(graft.analytics.Dedup.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      cnts.groupBy("doc_id")
        .agg(array_sort(collect_list(col("c").cast("double"))).as("cs"),
          sum("c").cast("double").as("n"),
          count(lit(1)).as("n_distinct"))
        .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
          col("n_distinct"),
          aggregate(col("cs"), lit(0.0), (a, c) =>
            a + round(((c / col("n")) * log(col("n") / c)) * 1e12)
              / 1e12).as("entropy"))
        .orderBy("doc_id")
    },

    // DSIR hashed-unigram importance weights (Xie et al. 2023):
    // score every document by ln p_target/p_raw under bucketed
    // token distributions — target = the English subset, raw = the
    // whole corpus. The oracle replays the bucket hashing (md5 ->
    // h30 mod B), the add-one-smoothed log-ratio (quantized 1e-12),
    // and the per-doc sorted contribution fold.
    {
      val B = 4096
      Q("q124_dsir_weights", Some(s"""
      WITH docs AS (
        SELECT doc_id, text, lang = 'en' AS is_target FROM documents
        WHERE text IS NOT NULL),
      toks AS (
        SELECT doc_id, is_target,
          CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT)
            % ${Dedup.P} % $B AS bucket
        FROM (SELECT doc_id, is_target,
                unnest(string_split_regex(trim(text), '\\s+')) AS tok
              FROM docs)),
      stats AS (
        SELECT bucket, SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS t_c,
          COUNT(*) AS r_c
        FROM toks GROUP BY bucket),
      tot AS (SELECT SUM(t_c) AS tt, SUM(r_c) AS rt FROM stats),
      lam AS (
        SELECT bucket,
          round((ln(CAST(t_c + 1 AS DOUBLE) / CAST(tt + $B AS DOUBLE))
               - ln(CAST(r_c + 1 AS DOUBLE) / CAST(rt + $B AS DOUBLE)))
            * 1000000000000.0) / 1000000000000.0 AS lam
        FROM stats, tot),
      dc AS (
        SELECT doc_id, is_target, bucket, COUNT(*) AS c
        FROM toks GROUP BY 1, 2, 3),
      contrib AS (
        SELECT doc_id, is_target, c, CAST(c AS DOUBLE) * lam AS x
        FROM dc JOIN lam USING (bucket)),
      agg AS (
        SELECT doc_id, is_target, CAST(SUM(c) AS BIGINT) AS n_tokens,
          list_sort(list(x)) AS xs
        FROM contrib GROUP BY 1, 2)
      SELECT doc_id, is_target, n_tokens,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs),
          (a, b) -> a + b) AS logweight
      FROM agg ORDER BY doc_id""")) { (s, dir) =>
        graft.analytics.Dsir.importanceWeights(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          col("lang") === "en", B)
          .orderBy("doc_id")
      }
    },

    // Language-ID scored against the ground-truth lang column: the
    // multi-class classification report (per-class precision/recall/
    // F1 from exact confusion counts + micro accuracy) — q25's
    // predictions finally graded. Ground truth includes zh, which the
    // stopword profile cannot predict: it surfaces as a class with
    // n_pred = 0 and null precision, exactly what the report is for.
    // Flat key space (|classes|²), every ratio one double division.
    Q("q236_langid_report", Some(s"""
      WITH pr AS (
        SELECT tru, $duckLangCase AS prd FROM (
          SELECT tru,
            $duckLangScores
          FROM (
            SELECT lang AS tru,
              string_split_regex(trim(text), '\\s+') AS t
            FROM documents WHERE lang IS NOT NULL))),
      conf AS (
        SELECT tru, prd, CAST(count(*) AS BIGINT) AS c
        FROM pr WHERE prd IS NOT NULL GROUP BY 1, 2),
      bt AS (
        SELECT tru, CAST(SUM(c) AS BIGINT) AS n_true
        FROM conf GROUP BY 1),
      bp AS (
        SELECT prd, CAST(SUM(c) AS BIGINT) AS n_pred
        FROM conf GROUP BY 1),
      tpc AS (SELECT tru AS cls, c AS tp FROM conf WHERE tru = prd),
      cls AS (SELECT tru AS cls FROM bt UNION SELECT prd FROM bp),
      tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN tru = prd THEN c ELSE 0 END) AS BIGINT)
            AS tps
        FROM conf)
      SELECT cls.cls AS class,
        COALESCE(n_true, 0) AS n_true, COALESCE(n_pred, 0) AS n_pred,
        COALESCE(tp, 0) AS tp,
        CASE WHEN COALESCE(n_pred, 0) > 0 THEN
          CAST(COALESCE(tp, 0) AS DOUBLE) / CAST(n_pred AS DOUBLE)
          END AS "precision",
        CASE WHEN COALESCE(n_true, 0) > 0 THEN
          CAST(COALESCE(tp, 0) AS DOUBLE) / CAST(n_true AS DOUBLE)
          END AS recall,
        CASE WHEN COALESCE(n_true, 0) + COALESCE(n_pred, 0) > 0 THEN
          CAST(COALESCE(tp, 0) * 2 AS DOUBLE)
            / CAST(COALESCE(n_true, 0) + COALESCE(n_pred, 0) AS DOUBLE)
          END AS f1,
        CAST(tps AS DOUBLE) / CAST(n AS DOUBLE) AS accuracy
      FROM cls LEFT JOIN bt ON cls.cls = bt.tru
      LEFT JOIN bp ON cls.cls = bp.prd
      LEFT JOIN tpc ON cls.cls = tpc.cls
      CROSS JOIN tot
      ORDER BY class""")) { (s, dir) =>
      val pred = Tables.load(s, dir, "documents")
        .where(col("lang").isNotNull)
        .select(col("lang"),
          explode(array(TA.langProfile(col("text")))).as("r"))
        .select(col("lang"), col("r.predicted").as("predicted"))
      graft.analytics.Evaluation.classificationReport(pred,
        col("lang"), col("predicted"))
    },

    // Heaps'-law vocabulary growth per source: OLS of ln(types) on
    // ln(tokens) across docs — beta is the vocabulary-growth
    // exponent, the "does this source's vocabulary actually grow or
    // is it template soup" curation signal. Per-doc counts exact,
    // each ln quantized to µln units, OLS power sums exact
    // DECIMAL/HUGEINT integers, one double conversion per statistic.
    Q("q238_heaps_law", Some("""
      WITH t AS (
        SELECT source, string_split_regex(trim(text), '\s+') AS tk
        FROM documents
        WHERE text IS NOT NULL AND source IS NOT NULL),
      c AS (
        SELECT source, CAST(len(tk) AS BIGINT) AS nt,
          CAST(len(list_distinct(tk)) AS BIGINT) AS nv
        FROM t),
      p AS (
        SELECT source,
          CAST(floor(ln(CAST(nt AS DOUBLE)) * 1000000.0 + 0.5)
            AS BIGINT) AS x,
          CAST(floor(ln(CAST(nv AS DOUBLE)) * 1000000.0 + 0.5)
            AS BIGINT) AS y
        FROM c WHERE nt >= 2 AND nv >= 1),
      s AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n,
          SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
          SUM(CAST(x AS HUGEINT) * y) AS sxy,
          SUM(CAST(x AS HUGEINT) * x) AS sxx,
          SUM(CAST(y AS HUGEINT) * y) AS syy
        FROM p GROUP BY source),
      f AS (
        SELECT source, n,
          CAST(n * sxy - sx * sy AS DOUBLE) AS num,
          CAST(n * sxx - sx * sx AS DOUBLE) AS den,
          CAST(n * syy - sy * sy AS DOUBLE) AS deny,
          CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        FROM s)
      SELECT source, n AS n_docs,
        CASE WHEN den > 0 THEN num / den END AS beta,
        CASE WHEN den > 0 THEN
          (syd - (num / den) * sxd) / CAST(n AS DOUBLE) / 1000000.0
          END AS ln_k,
        CASE WHEN den > 0 AND deny > 0 THEN
          num * num / (den * deny) END AS r2
      FROM f ORDER BY source""")) { (s, dir) =>
      TA.heapsLaw(Tables.load(s, dir, "documents"), "source", "text")
    }
  )
}
