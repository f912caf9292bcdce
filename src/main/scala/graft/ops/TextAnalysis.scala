package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * language-ID, quality scoring, token accounting, document fingerprinting.
  *
  * Everything is built from codegen'd Catalyst built-ins (split/transform/
  * aggregate/filter higher-order functions) — no UDFs in the hot path, so
  * whole-stage codegen spans the full scan→project pipeline and the work
  * distributes trivially (narrow, no shuffle until the final aggregate).
  * Formulas are deliberately SQL-expressible so DuckDB oracles can replicate
  * them bit-for-bit (integer/ratio arithmetic + round).
  */
object TextAnalysis {

  /** Whitespace tokens. Synthetic corpus is single-space separated; for real
    * corpora swap the pattern for \\s+ — semantics stay the same.
    */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-style pre-tokenizer stand-in (GPT-2's structure without the
    * unicode categories a cross-engine oracle can't mirror): letter runs,
    * digit runs, and single punctuation marks. The regex uses only classes
    * with identical semantics in Java regex (Spark codegen) and RE2
    * (DuckDB), so counts are engine-exact.
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** A small function-word list that exists in the synthetic vocab; the
    * language-ID heuristic is "function-word ratio over threshold".
    */
  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "over")

  def stopwordRatio(text: Column): Column = {
    val w = tokens(text)
    val stops = filter(w, t => t.isin(StopWords: _*))
    size(stops).cast("double") / size(w)
  }

  /** n-gram-heuristic language ID: function-word density. Real corpora would
    * use per-language character n-gram profiles; the decision structure
    * (ratio → argmax/threshold) is identical.
    */
  def langId(text: Column, threshold: Double = 0.04): Column =
    when(stopwordRatio(text) >= threshold, "en").otherwise("other")

  /** Composite quality score in [0,1]: length, function-word density,
    * mean token length, lexical diversity — each capped and equally
    * weighted, rounded for cross-engine stability.
    */
  def qualityScore(text: Column): Column = {
    val w = tokens(text)
    val n = size(w).cast("double")
    val lenScore = least(lit(1.0), n / 100.0)
    val stopScore = least(lit(1.0), stopwordRatio(text) * 5.0)
    val charSum = aggregate(w, lit(0L), (acc, t) => acc + length(t)).cast("double")
    val meanLenScore = least(lit(1.0), charSum / n / 8.0)
    val diversity = size(array_distinct(w)).cast("double") / n
    round((lenScore + stopScore + meanLenScore + diversity) / 4.0, 4)
  }

  /** Engine-neutral 60-bit token hash: the first 15 md5-hex chars as an
    * integer (< 2^60, so it is an exact signed BIGINT in Spark AND DuckDB —
    * 16 chars would overflow the signed range one engine or the other).
    * Built from codegen'd builtins (md5/substring/conv).
    */
  def tokenHash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Rolling document fingerprint: polynomial fold of per-token md5-derived
    * hashes in a 31-bit Mersenne ring. Order-sensitive (same bag of words,
    * different order → different fingerprint), O(tokens), no shuffle, and
    * bit-reproducible in any engine (DuckDB oracle mirrors it exactly).
    */
  def fingerprint(text: Column): Column = {
    // modular rolling hash: ANSI-safe (acc < 2^31, acc*1000003 + h < 2^62)
    val p = 2147483647L // 2^31 - 1
    aggregate(tokens(text), lit(0L),
      (acc, t) => (acc * lit(1000003L) + tokenHash60(t) % lit(p)) % lit(p))
  }

  /** Convenience projection of all per-document text features. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 4))
      .withColumn("lang_pred", langId(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
