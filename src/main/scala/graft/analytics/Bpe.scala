package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed training statistics,
  * driver-side merge selection, and a fully codegen'd distributed
  * encoder (Sennrich et al. 2016). Completes the tokenizer story the
  * pair-statistics operator ([[TextAnalysis.bpePairCounts]]) starts:
  * train the merge table, then ENCODE the corpus with it.
  *
  * Scale shape: training aggregates the corpus to (distinct word,
  * frequency) — one corpus-scan + vocabulary-sized shuffle — and
  * collects that table to the driver (budget-gated, like the IVF
  * codebook: the word-frequency table is MODEL STATE, vocabulary-
  * bounded regardless of corpus size; production tokenizer trainers
  * hold exactly this table in memory). The merge loop is then
  * O(merges × vocab) driver-side. Encoding is map-only: a chain of
  * literal string replaces compiled into whole-stage codegen — no
  * UDF, no shuffle, embarrassingly parallel at any corpus size.
  *
  * Symbol representation: a word's symbol sequence is encoded as
  * `·s₁··s₂··…··sₙ·` — every symbol wrapped in the sentinel `·`
  * (U+00B7, asserted absent from the corpus), with `··` as the
  * boundary between adjacent symbols. A merge (A,B) is then the
  * literal replace `·A··B·` → `·AB·`: the leading `·` can only align
  * with a symbol START (symbol interiors never contain `·`) and the
  * trailing `··`/`·` forces A and B to be COMPLETE symbols, so
  * replacement happens exactly at symbol granularity; left-to-right
  * non-overlapping `replace` semantics (identical in Spark, DuckDB,
  * and Java) reproduce the training loop's merge application.
  *
  * Merge semantics: merges apply IN LEARNED ORDER, one pass each —
  * exactly the evolution the training loop itself performs on the
  * corpus, so training-corpus words segment identically to training.
  * (The classic encoder's repeat-until-fixpoint loop differs only on
  * words where a later merge re-creates an earlier merge's pair.)
  */
object Bpe {

  /** Symbol sentinel (kept out of the public pattern surface). */
  private val S = "·"

  /** Whitespace word stream, case preserved (matches
    * [[TextAnalysis.bpePairCounts]]'s vocabulary). */
  private def words(text: Column): Column = split(trim(text), "\\s+")

  /** (word, freq) corpus vocabulary — the distributed half of
    * training. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(explode(words(col(textCol))).as("word"))
      .where(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Train `numMerges` BPE merges. Returns the merge list in learned
    * order, possibly shorter if the vocabulary merges to fixpoint
    * first. Selection per round: highest corpus-weighted adjacent-pair
    * count, ties broken by (left, right) ascending — deterministic for
    * any ASCII-clean corpus in any engine.
    *
    * The collect is budget-gated on vocabulary size
    * (`spark.graft.bpeVocabLimit`, default 2,000,000 distinct words ≈
    * tens of MB of driver state) — the same defensible model-state
    * bound as the IVF codebook; a corpus whose VOCABULARY exceeds it
    * needs pre-normalization, not a bigger driver.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    val limit = spark.conf.getOption("spark.graft.bpeVocabLimit")
      .map(_.toLong).getOrElse(2000000L)
    val wf = wordFreqs(docs, textCol)
    val vocabSize = wf.count()
    require(vocabSize <= limit,
      s"Bpe.train: vocabulary has $vocabSize distinct words, over the " +
        s"driver model-state budget of $limit " +
        "(spark.graft.bpeVocabLimit) — normalize the corpus or raise " +
        "the budget")
    val table = wf.collect().map(r =>
      (r.getString(0), r.getLong(1)))
    require(table.forall(!_._1.contains(S)),
      s"Bpe: corpus contains the symbol sentinel '$S'")
    var vocab: Array[(Vector[String], Long)] =
      table.map { case (w, f) => (w.toVector.map(_.toString), f) }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (best, _) = counts.toSeq.minBy { case ((l, r), c) =>
          (-c, l, r)
        }
        merges += best
        vocab = vocab.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 &&
                syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), f)
        }
      }
      k += 1
    }
    merges.result()
  }

  /** Sentinel-encoded symbol string of one word column: `·c₁··c₂··…·`
    * (initial one-symbol-per-character segmentation). */
  private def wordEnc(word: Column): Column = {
    val body = concat(lit(S), regexp_replace(word, "(.)", "$1" + S + S))
    // drop the final surplus '·' of the trailing '··'
    body.substr(lit(1), length(body) - 1)
  }

  /** Document encoded as space-joined sentinel symbol strings with
    * `merges` applied in order — the distributed encoder. Merge
    * patterns contain no space, so they never match across word
    * boundaries. Pure literal-replace chain: whole-stage codegen, no
    * UDF. */
  def encode(text: Column, merges: Seq[(String, String)]): Column = {
    val base = array_join(
      transform(words(text), w => wordEnc(w)), " ")
    merges.foldLeft(base) { case (acc, (l, r)) =>
      replace(acc, lit(S + l + S + S + r + S), lit(S + l + r + S))
    }
  }

  /** BPE token count of ONE word under `merges`: 1 + internal symbol
    * boundaries after the merge replay. Because merge patterns never
    * span the space between words, summing this over a document's
    * words equals [[tokenCount]] of the whole text — which lets the
    * encoder run once per DISTINCT word (vocabulary-sized work)
    * instead of replaying the merge chain over every document. */
  def wordTokenCount(word: Column, merges: Seq[(String, String)]): Column = {
    val enc = merges.foldLeft(wordEnc(word)) { case (acc, (l, r)) =>
      replace(acc, lit(S + l + S + S + r + S), lit(S + l + r + S))
    }
    (lit(1) + length(enc) - length(replace(enc, lit(S + S), lit(S))))
      .cast("long")
  }

  /** Whitespace word count, 0 for blank text (split of an empty
    * string yields one empty token — guard it). */
  def wordCount(text: Column): Column =
    when(trim(text) === "", lit(0L))
      .otherwise(size(words(text)).cast("long"))

  /** BPE token count of a document under `merges`: number of symbols
    * across all words = word count + symbol-boundary count (`··` runs
    * are exactly the boundaries; length delta under collapsing them
    * counts occurrences). */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column = {
    val enc = encode(text, merges)
    val boundaries = length(enc) - length(replace(enc, lit(S + S), lit(S)))
    when(trim(text) === "", lit(0L))
      .otherwise((size(words(text)) + boundaries).cast("long"))
  }
}
