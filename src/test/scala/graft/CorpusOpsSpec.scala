package graft

import org.apache.spark.sql.functions._
import graft.analytics.CorpusOps

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces emails, phones, and IPv4s with tags") {
    val in = "mail a.smith+x@corp.example.co, call +44-555-1234 " +
      "or 555-123-4567, host 192.168.0.1 done"
    val got = evalStr(in, CorpusOps.redactPii)
    assert(got ===
      "mail <EMAIL>, call <PHONE> or <PHONE>, host <IP> done")
  }

  test("piiCount counts matches and is 0 on null/clean text") {
    assert(evalStr("a@b.io c@d.org", c =>
      CorpusOps.piiCount(c, CorpusOps.EmailRe)) === 2L)
    assert(evalStr("no pii here", c =>
      CorpusOps.piiCount(c, CorpusOps.EmailRe)) === 0L)
    val nullCount = Seq(Option.empty[String]).toDF("s")
      .select(CorpusOps.piiCount(col("s"), CorpusOps.Ipv4Re))
      .collect()(0).getLong(0)
    assert(nullCount === 0L)
  }

  test("ipv4 pattern respects word boundaries") {
    // version-like dotted numbers with >3-digit runs must not match
    assert(evalStr("build 1.2.3.4567 vs 10.0.0.1", c =>
      CorpusOps.piiCount(c, CorpusOps.Ipv4Re)) === 1L)
  }

  test("repetitionSignals: exact fractions on a known doc") {
    val d = Seq((1L, "a b a b a"), (2L, "x"), (3L, null))
      .toDF("doc_id", "text")
    val got = CorpusOps.repetitionSignals(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.length === 2) // null text dropped
    val r1 = got(0)
    // tokens: a b a b a → 5 tokens, 2 distinct
    assert(r1.getAs[Long]("n_tokens") === 5L)
    assert(r1.getAs[Double]("dup_unigram_frac") === 1.0 - 2.0 / 5.0)
    // bigrams: ab ba ab ba → 4 total, 2 distinct
    assert(r1.getAs[Double]("dup_bigram_frac") === 1.0 - 2.0 / 4.0)
    // trigrams: aba bab aba → 3 total, 2 distinct
    assert(r1.getAs[Double]("dup_trigram_frac") === 1.0 - 2.0 / 3.0)
    // single token: no bigrams/trigrams → 0.0 by definition
    val r2 = got(1)
    assert(r2.getAs[Long]("n_tokens") === 1L)
    assert(r2.getAs[Double]("dup_bigram_frac") === 0.0)
    assert(r2.getAs[Double]("dup_trigram_frac") === 0.0)
  }

  test("contamination: overlap fraction against the bench set") {
    val corpus = Seq((1L, "a b c d e f"), (2L, "z z z z z"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val got = CorpusOps.contamination(corpus, bench, "doc_id", "text", 5)
      .orderBy("doc_id").collect()
    // doc 1 shingles: "a b c d e", "b c d e f" → 1 of 2 in bench
    assert(got(0).getAs[Long]("n_shingles") === 2L)
    assert(got(0).getAs[Long]("n_contaminated") === 1L)
    assert(got(0).getAs[Double]("contamination") === 0.5)
    // doc 2: one distinct shingle, not in bench
    assert(got(1).getAs[Long]("n_contaminated") === 0L)
  }

  test("boilerplateCoverage: shared header grams counted per doc, " +
      "short docs dropped, repeats weighted") {
    val header = "all rights reserved by the site"   // 6 tokens
    val docs = Seq(
      (1L, s"$header alpha beta gamma"),
      (2L, s"$header delta epsilon"),
      (3L, s"$header zeta"),
      (4L, "a wholly different document body here"),
      (5L, "tiny doc"),                              // < n tokens
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = CorpusOps.boilerplateCoverage(docs, "doc_id", "text",
        n = 5, minDf = 3L)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // the 6-token header yields two 5-gram windows shared by docs
    // 1-3 -> df 3; every other gram is unique (df 1)
    assert(got(1L) === ((5L, 2L, 0.4)))
    assert(got(2L) === ((4L, 2L, 0.5)))
    assert(got(3L) === ((3L, 2L, 2.0 / 3)))
    assert(got(4L) === ((2L, 0L, 0.0)))
    assert(!got.contains(5L) && !got.contains(6L))
  }

  test("boilerplateCoverage: within-doc repeats count instances but " +
      "df counts documents") {
    // the gram repeats twice in ONE doc: df stays 1 -> not boiler
    val docs = Seq(
      (1L, "x y z w v x y z w v"),
      (2L, "p q r s t u")).toDF("doc_id", "text")
    val got = CorpusOps.boilerplateCoverage(docs, "doc_id", "text",
        n = 5, minDf = 2L)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((6L, 0L)))
    assert(got(2L) === ((2L, 0L)))
  }

  test("rakeKeywords: hand-computed deg/freq scores on a tiny corpus") {
    import graft.analytics.TextAnalysis
    // phrases after stop/punct splitting ("the", "of" break; "." is
    // stripped making "systems." -> "systems"):
    //   doc 1: "deep learning", "deep learning systems"
    //   doc 2: "deep learning", "neural networks"
    // freq: deep 3, learning 3, systems 1, neural 1, networks 1
    // deg:  deep 2+3+2=7, learning 7, systems 3, neural 2, networks 2
    val docs = Seq(
      (1L, "Deep learning of the deep learning systems."),
      (2L, "deep learning and neural networks"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.rakeKeywords(docs, "doc_id", "text", k = 10)
      .as[(String, Long, Long, Long)].collect()
    val byPhrase = got.map(r => r._1 -> r).toMap
    def fp(num: Long, den: Long) = num * 1000000000000L / den
    assert(byPhrase("deep learning") ===
      (("deep learning", 2L, 2L, fp(7, 3) + fp(7, 3))))
    assert(byPhrase("deep learning systems") ===
      (("deep learning systems", 3L, 1L,
        fp(7, 3) + fp(7, 3) + fp(3, 1))))
    assert(byPhrase("neural networks") ===
      (("neural networks", 2L, 1L, fp(2, 1) + fp(2, 1))))
    // the 3-word domain phrase outranks everything
    assert(got.head._1 === "deep learning systems")
  }

  test("logOddsTerms: target-exclusive terms rank top with the " +
      "hand-computed prior-shrunk z") {
    import graft.analytics.TextAnalysis
    val docs = Seq(
      (1L, "en", "alpha alpha beta"),
      (2L, "en", "alpha shared"),
      (3L, "de", "gamma shared shared"),
      (4L, "de", "gamma delta"))
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.logOddsTerms(docs, "text", "lang", "en",
        mu = 10.0, k = 10)
      .as[(String, Long, Long, Long, Long)].collect()
    val byTerm = got.map(r => r._1 -> r).toMap
    // counts: alpha (3,0), beta (1,0), shared (1,2), gamma (0,2),
    // delta (0,1); nA=5, nB=5, N=10
    def score(a: Long, b: Long): (Double, Double) = {
      val aw = 10.0 * (a + b) / 10.0
      val d = math.log((a + aw) / (5.0 + 10.0 - a - aw)) -
        math.log((b + aw) / (5.0 + 10.0 - b - aw))
      (d, d / math.sqrt(1.0 / (a + aw) + 1.0 / (b + aw)))
    }
    val (d, z) = score(3, 0)
    assert(byTerm("alpha")._2 === 3L && byTerm("alpha")._3 === 0L)
    assert(math.abs(byTerm("alpha")._4 - math.round(d * 1e12)) <= 1)
    assert(math.abs(byTerm("alpha")._5 - math.round(z * 1e12)) <= 1)
    // the most target-leaning term sorts first; anti-target last
    assert(got.head._1 === "alpha")
    assert(got.last._5 < 0)
  }

  test("zipfSlope: an exact Zipf corpus recovers slope -1") {
    import graft.analytics.TextAnalysis
    // token w_r appears floor(1200/r) times: ln(count) ~ ln 1200 - ln r
    val words = (1 to 30).flatMap(r =>
      Seq.fill(1200 / r)(f"w$r%02d"))
    val docs = words.grouped(40).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val row = TextAnalysis.zipfSlope(docs, "text", k = 30).collect()(0)
    assert(row.getLong(0) === 30L)
    val slope = row.getDouble(1)
    assert(math.abs(slope - (-1.0)) < 0.02, s"slope $slope")
    val intercept = row.getDouble(2)
    assert(math.abs(intercept - math.log(1200.0)) < 0.05,
      s"intercept $intercept")
    // repartition invariance (bit-exact, not approximate)
    val again = TextAnalysis.zipfSlope(docs.repartition(7), "text", 30)
      .collect()(0)
    assert(again.getDouble(1) === slope &&
      again.getDouble(2) === intercept)
  }

  test("rakeKeywords: maxLen cap, k cut, and repartition invariance") {
    import graft.analytics.TextAnalysis
    val docs = Seq(
      (1L, "one two three four five six"),   // 6-word run: dropped
      (2L, "alpha beta"), (3L, "alpha beta"), (4L, "gamma"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.rakeKeywords(docs, "doc_id", "text",
        k = 2, maxLen = 4)
      .as[(String, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq("alpha beta", "gamma"))
    assert(got(0)._3 === 2L)
    val shuf = TextAnalysis.rakeKeywords(
        docs.repartition(5), "doc_id", "text", k = 2, maxLen = 4)
      .as[(String, Long, Long, Long)].collect()
    assert(shuf.toSeq === got.toSeq)
  }

  test("chunk: window/stride boundaries and trailing partial chunk") {
    val text = (1 to 40).map(i => s"t$i").mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val got = CorpusOps.chunk(d, "doc_id", "text", window = 32,
        stride = 24).orderBy("chunk_idx").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("chunk_idx") === 0L)
    assert(got(0).getAs[Long]("n_chunk_tokens") === 32L)
    assert(got(1).getAs[Long]("chunk_idx") === 1L)
    // tokens 25..40 → 16-token trailing chunk
    assert(got(1).getAs[Long]("n_chunk_tokens") === 16L)
    // overlap: chunk 1 starts at token 25, inside chunk 0's window
    val h0 = got(0).getAs[String]("chunk_hash")
    val h1 = got(1).getAs[String]("chunk_hash")
    assert(h0 !== h1)
  }

  test("urlFacets: host/tld extraction and blocklist gate") {
    val got = Seq("https://sub.example.org/p?x=1", "https://spam.biz/x",
        "not a url")
      .toDF("url")
      .select(CorpusOps.urlFacets(col("url"), Seq("biz")): _*)
      .collect()
    assert(got(0).getAs[String]("host") === "sub.example.org")
    assert(got(0).getAs[String]("tld") === "org")
    assert(got(0).getAs[Boolean]("blocked") === false)
    assert(got(1).getAs[String]("tld") === "biz")
    assert(got(1).getAs[Boolean]("blocked") === true)
    assert(got(2).getAs[String]("host") === null)
    assert(got(2).getAs[Boolean]("blocked") === true)
  }

  test("urlFacets: blocklist gate is case-insensitive") {
    val got = Seq("https://SPAM.BIZ/x")
      .toDF("url")
      .select(CorpusOps.urlFacets(col("url"), Seq("biz")): _*)
      .collect()
    assert(got(0).getAs[Boolean]("blocked") === true)
  }

  test("contaminationBloom: upper-bounds the exact join, no false negatives") {
    val rnd = new scala.util.Random(3)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def doc() = Seq.fill(12)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val corpus = (1L to 40L).map(i => (i, doc())).toDF("doc_id", "text")
    val bench = (100L to 104L).map(i => (i, doc())).toDF("doc_id", "text")
    val exact = CorpusOps.contamination(corpus, bench, "doc_id", "text", 3)
      .select("doc_id", "n_shingles", "n_contaminated")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val bloom = CorpusOps.contaminationBloom(corpus, bench, "doc_id",
        "text", 3, expectedBenchShingles = 100, fpp = 0.001)
      .select("doc_id", "n_shingles", "n_contaminated")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(bloom.keySet === exact.keySet)
    for ((id, (nSh, nCont)) <- exact) {
      assert(bloom(id)._1 === nSh)
      assert(bloom(id)._2 >= nCont, s"false negative for doc $id")
    }
  }

  test("packSequences: fills to budget, splits at the running sum") {
    // 5 chunks of 30 tokens in one shard (doc_ids ≡ 0 mod 4):
    // cum_excl 0,30,60,90,120 with budget 64 → seqs 0,0,0 | 1,1
    val chunks = Seq(
      (0L, 0L, 30L), (0L, 1L, 30L), (4L, 0L, 30L),
      (8L, 0L, 30L), (8L, 1L, 30L))
      .toDF("doc_id", "chunk_idx", "n_chunk_tokens")
    val got = CorpusOps.packSequences(chunks, budget = 64, shards = 4)
      .orderBy("shard", "seq_id").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("n_chunks") === 3L)
    assert(got(0).getAs[Long]("n_tokens") === 90L)
    assert(got(1).getAs[Long]("n_chunks") === 2L)
    assert(got(1).getAs[Long]("n_docs") === 1L)
  }

  test("packSequences: shards pack independently") {
    val chunks = Seq((0L, 0L, 50L), (1L, 0L, 50L))
      .toDF("doc_id", "chunk_idx", "n_chunk_tokens")
    val got = CorpusOps.packSequences(chunks, budget = 64, shards = 2)
      .collect()
    // different shards → both start at seq 0
    assert(got.length === 2)
    assert(got.forall(_.getAs[Long]("seq_id") === 0L))
  }

  test("chunk: short doc yields exactly one chunk") {
    val d = Seq((1L, "only three tokens")).toDF("doc_id", "text")
    val got = CorpusOps.chunk(d, "doc_id", "text", 32, 24).collect()
    assert(got.length === 1)
    assert(got(0).getAs[Long]("n_chunk_tokens") === 3L)
  }

  test("paragraphDedup: first occurrence survives, later copies drop") {
    val d = Seq(
      (1L, "a b c d e f"),      // chunks: "a b c", "d e f"
      (2L, "a b c x y z"),      // "a b c" repeats doc 1 → dropped
      (3L, "p q r p q r"),      // within-doc repeat → second dropped
      (4L, "d e"),              // short doc, single ragged chunk
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = CorpusOps.paragraphDedup(d, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    assert(got.length === 4) // null text dropped
    val byId = got.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Long]("n_paras") === 2L)
    assert(byId(1L).getAs[Long]("n_kept") === 2L)
    assert(byId(1L).getAs[String]("dedup_text") === "a b c d e f")
    assert(byId(2L).getAs[Long]("n_kept") === 1L)
    assert(byId(2L).getAs[String]("dedup_text") === "x y z")
    assert(byId(3L).getAs[Long]("n_paras") === 2L)
    assert(byId(3L).getAs[Long]("n_kept") === 1L)
    assert(byId(3L).getAs[String]("dedup_text") === "p q r")
    // "d e" is a DIFFERENT paragraph from "d e f" (exact match only)
    assert(byId(4L).getAs[Long]("n_kept") === 1L)
    assert(byId(4L).getAs[String]("dedup_text") === "d e")
  }

  test("bpePairCounts: corpus-weighted adjacent pairs, exact counts") {
    val d = Seq((1L, "ab ab cd"), (2L, "ab abc"), (3L, "x"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = graft.analytics.TextAnalysis
      .bpePairCounts(d, "doc_id", "text")
      .orderBy("pair").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // "ab"×3 + "abc"×1 → pair "ab"=4; "abc" adds "bc"; "cd"×1;
    // single-char "x" and null text contribute nothing
    assert(got === Seq(("ab", 4L), ("bc", 1L), ("cd", 1L)))
  }

  test("paragraphDedup is partitioning-insensitive") {
    val d = (0L until 40L).map(i =>
      (i, if (i % 4 == 0) "dup dup dup tail tail tail"
          else s"u$i v$i w$i")).toDF("doc_id", "text")
    val a = CorpusOps.paragraphDedup(d, "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    val b = CorpusOps.paragraphDedup(d.repartition(7), "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    // only doc 0 keeps the shared paragraphs; docs 4,8,… lose both
    val first = a.find(_.getAs[Long]("doc_id") == 0L).get
    assert(first.getAs[Long]("n_kept") === 2L)
    val later = a.find(_.getAs[Long]("doc_id") == 4L).get
    assert(later.getAs[Long]("n_kept") === 0L)
    assert(later.getAs[String]("dedup_text") === "")
  }

  test("substringDedup: corpus-first survives, spans merge, hand-computed") {
    val d = Seq(
      (1L, "a b c d e f g"),      // all 5 windows are corpus-first
      (2L, "x y a b c d z"),      // "a b c"(pos2) + "b c d"(pos3) dup → 1 span
      (3L, "a b c q q q d e f"),  // "a b c"(0) and "d e f"(6) dup → 2 spans
      (4L, "a b"),                // shorter than k → excluded
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = CorpusOps.substringDedup(d, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L, 3L))
    val byId = got.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Long]("n_windows") === 5L)
    assert(byId(1L).getAs[Long]("n_dup_windows") === 0L)
    assert(byId(1L).getAs[Long]("n_dup_spans") === 0L)
    assert(byId(1L).getAs[Long]("dup_tokens") === 0L)
    // doc 2: dup windows at pos 2 and 3 overlap → one span covering
    // tokens [2, 5] = 4 tokens
    assert(byId(2L).getAs[Long]("n_windows") === 5L)
    assert(byId(2L).getAs[Long]("n_dup_windows") === 2L)
    assert(byId(2L).getAs[Long]("n_dup_spans") === 1L)
    assert(byId(2L).getAs[Long]("dup_tokens") === 4L)
    // doc 3: dup windows at pos 0 and 6 — gap 6 > k → two spans of 3
    assert(byId(3L).getAs[Long]("n_windows") === 7L)
    assert(byId(3L).getAs[Long]("n_dup_windows") === 2L)
    assert(byId(3L).getAs[Long]("n_dup_spans") === 2L)
    assert(byId(3L).getAs[Long]("dup_tokens") === 6L)
  }

  test("substringDedup: within-doc repetition counts as duplication") {
    // "m n o" repeated 3×: windows 0..2 are first occurrences; windows
    // 3..6 all duplicate earlier positions and chain into one span
    // covering tokens [3, 8] = 6 tokens.
    val d = Seq((1L, "m n o m n o m n o")).toDF("doc_id", "text")
    val r = CorpusOps.substringDedup(d, "doc_id", "text", k = 3)
      .collect()(0)
    assert(r.getAs[Long]("n_windows") === 7L)
    assert(r.getAs[Long]("n_dup_windows") === 4L)
    assert(r.getAs[Long]("n_dup_spans") === 1L)
    assert(r.getAs[Long]("dup_tokens") === 6L)
  }

  test("WindowHashes is byte-identical to the transform/slice/md5 chain") {
    import org.apache.spark.sql.graft.ColumnBridge
    val df = Seq(
      Seq("aa", "b", "ccc", "dd", "e"),
      Seq("x"),
      Seq.empty[String]).toDF("w")
    for (k <- Seq(1, 2, 3, 5)) {
      val native = df.select(ColumnBridge.column(
        graft.expressions.WindowHashes(
          ColumnBridge.expression(col("w")), k)).as("h"))
        .collect().map(_.getSeq[String](0)).toSeq
      val hof = df.select(
        when(size(col("w")) >= k, transform(
          sequence(lit(0), size(col("w")) - k),
          i => md5(array_join(slice(col("w"), i + 1, lit(k)), " "))))
          .otherwise(array().cast("array<string>")).as("h"))
        .collect().map(_.getSeq[String](0)).toSeq
      assert(native === hof, s"k=$k")
    }
    // null array → empty, not null
    val nul = Seq(Option.empty[Seq[String]]).toDF("w")
      .select(ColumnBridge.column(graft.expressions.WindowHashes(
        ColumnBridge.expression(col("w")), 2)).as("h"))
      .collect()(0).getSeq[String](0)
    assert(nul === Seq.empty)
  }

  test("substringDedup is partitioning-insensitive") {
    val d = (0L until 30L).map(i =>
      (i, if (i % 3 == 0) s"s$i shared shared shared shared tail$i"
          else s"u$i v$i w$i x$i y$i z$i")).toDF("doc_id", "text")
    val a = CorpusOps.substringDedup(d, "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    val b = CorpusOps.substringDedup(d.repartition(7), "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("heapsLaw: perfect V = N^0.5 source fits beta 0.5, r2 1; " +
      "constant-N source is degenerate") {
    import spark.implicits._
    import graft.analytics.TextAnalysis
    def doc(types: Int, reps: Int): String =
      (0 until types).flatMap(t => Seq.fill(reps)(s"w$t")).mkString(" ")
    val docs = Seq(
      ("a", doc(2, 2)),   // N=4,  V=2
      ("a", doc(4, 4)),   // N=16, V=4
      ("a", doc(8, 8)),   // N=64, V=8
      ("b", doc(3, 1)), ("b", doc(2, 1)), // constant N would be
      ("b", doc(3, 1))) // needed for degenerate; b has N in {3,2}
      .toDF("source", "text")
    val got = TextAnalysis.heapsLaw(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("n_docs") === 3L)
    assert(math.abs(a.getAs[Double]("beta") - 0.5) < 1e-3)
    assert(math.abs(a.getAs[Double]("ln_k")) < 1e-2)
    assert(math.abs(a.getAs[Double]("r2") - 1.0) < 1e-6)
    // truly degenerate source: every doc the same token count
    val deg = TextAnalysis.heapsLaw(
      Seq(("c", doc(2, 2)), ("c", doc(4, 1))).toDF("source", "text"),
      "source", "text").collect()(0)
    assert(deg.getAs[Long]("n_docs") === 2L)
    assert(deg.isNullAt(deg.fieldIndex("beta"))) // N=4 for both docs
  }
  test("pruned semantic decontamination equals the exact tier " +
      "row-for-row (recall 1, zero false negatives)") {
    import graft.analytics.Similarity
    def v(i: Long): Array[Double] =
      Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toDouble)
    // corpus ids 0..12 (13 distinct directions); bench plants exact
    // copies of corpus vectors 5 and 6 plus a near-orthogonal probe
    val corpus = (0L until 13L).map(i => (i, v(i)))
      .toDF("vec_id", "embedding")
    val bench = Seq((1L, v(5)), (2L, v(6)),
      (3L, Array.tabulate(8)(d => if (d == 7) 1e6 else 0.0)))
      .toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("vec_id").collect().toSeq
    for (tau <- Seq(0.35, 0.999)) {
      val exact = rows(CorpusOps.semanticContaminationExact(
        corpus, bench, "vec_id", "embedding", tau))
      val pruned = rows(CorpusOps.semanticContaminationPruned(
        corpus, bench, "vec_id", "embedding", tau, kCells = 4,
        dim = 8))
      assert(pruned === exact, s"pruned != exact at tau=$tau")
      // recall-1 sanity, not just equality of two empty sets: at the
      // tight threshold exactly the planted copies are flagged; the
      // loose threshold legitimately matches more periodic vectors
      val flagged = pruned.filter(_.getAs[Boolean]("contaminated"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("bench_id")))
      if (tau == 0.999) assert(flagged.toSet === Set((5L, 1L), (6L, 2L)))
      else assert(Set((5L, 1L), (6L, 2L)).subsetOf(flagged.toSet))
    }
    // the INDEXED tier (persisted codebook + cellstats + partition-
    // pruned cell scan) returns the identical verdict
    val dir = tmpDir("graft-semdeconidx")
    Similarity.buildIvfIndex(corpus, dir, k = 4, dim = 8,
      iterations = 2)
    for (tau <- Seq(0.35, 0.999)) {
      val exact = rows(CorpusOps.semanticContaminationExact(
        corpus, bench, "vec_id", "embedding", tau))
      val indexed = rows(CorpusOps.semanticContaminationIndexed(
        spark, dir, bench, "vec_id", "embedding", tau))
      assert(indexed === exact, s"indexed != exact at tau=$tau")
    }
    // pruning actually FIRES at the tight threshold: the orthogonal
    // bench probe (id 3) reaches no cell, and the scan plan carries
    // a cell partition filter
    val plan = CorpusOps.semanticContaminationIndexed(spark, dir,
        bench, "vec_id", "embedding", 0.999)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("PartitionFilters: \\[[^\\]]*cell".r
      .findFirstIn(plan).isDefined,
      s"expected a cell partition filter in:\n$plan")
    // an offset-id corpus (ids starting past kCells) trains via the
    // smallest-k init instead of seeding an empty codebook
    val shifted = (100L until 113L).map(i => (i, v(i)))
      .toDF("vec_id", "embedding")
    val bench2 = Seq((1L, v(105)), (2L, v(106))).toDF("vec_id", "embedding")
    assert(rows(CorpusOps.semanticContaminationPruned(shifted, bench2,
        "vec_id", "embedding", 0.999, kCells = 4, dim = 8))
      === rows(CorpusOps.semanticContaminationExact(shifted, bench2,
        "vec_id", "embedding", 0.999)))
  }

  test("semanticContamination flags planted paraphrase leaks only") {
    import graft.analytics.{Dedup, Similarity}
    // corpus: 13 distinct vectors (the generator is periodic mod 13,
    // so a longer range would plant REAL extra copies); bench: copies
    // of corpus vectors 100 and 101 (a "paraphrase leak" at cosine 1)
    // plus one vector near-orthogonal to everything
    def v(i: Long): Array[Double] =
      Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toDouble)
    val corpus = (100L until 113L).map(i => (i, v(i)))
      .toDF("vec_id", "embedding")
    val bench = Seq((1L, v(100)), (2L, v(101)),
      (3L, Array.tabulate(8)(d => if (d == 7) 1e6 else 0.0)))
      .toDF("vec_id", "embedding")
    val got = CorpusOps.semanticContamination(corpus, bench,
        "vec_id", "embedding", threshold = 0.999, bits = 2,
        dim = 8, tables = 4)
      .orderBy("vec_id").collect()
    assert(got.length === 13)
    val flagged = got.filter(_.getAs[Boolean]("contaminated"))
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("bench_id")))
    // identical vectors ALWAYS share every sign bucket, so the
    // planted leaks cannot be missed whatever the table draw
    assert(flagged.toSet === Set((100L, 1L), (101L, 2L)))
    // clean rows carry null match columns
    got.filterNot(_.getAs[Boolean]("contaminated")).foreach { r =>
      assert(r.isNullAt(r.fieldIndex("bench_id")))
      assert(r.isNullAt(r.fieldIndex("score")))
    }
    // auto variant routes through the pinned sizing rules
    val n = corpus.count()
    val bits = Dedup.autoSignBits(n, 32)
    val t = Dedup.autoSignTables(bits, 0.999, 0.8)
    val auto = CorpusOps.semanticContaminationAuto(corpus, bench,
        "vec_id", "embedding", threshold = 0.999, targetRecall = 0.8,
        dim = 8)
      .orderBy("vec_id").collect()
    val pinned = CorpusOps.semanticContamination(corpus, bench,
        "vec_id", "embedding", threshold = 0.999, bits = bits,
        dim = 8, tables = t)
      .orderBy("vec_id").collect()
    assert(auto.toSeq === pinned.toSeq)
    // best-match tie-break: two bench copies of the same vector must
    // resolve to the LOWER bench id
    val bench2 = Seq((7L, v(100)), (4L, v(100))).toDF("vec_id", "embedding")
    val tie = CorpusOps.semanticContamination(corpus, bench2,
        "vec_id", "embedding", threshold = 0.999, bits = 2,
        dim = 8, tables = 2)
      .filter(col("contaminated")).collect()
    assert(tie.map(r => (r.getAs[Long]("vec_id"),
      r.getAs[Long]("bench_id"))).toSet === Set((100L, 4L)))
  }

}
