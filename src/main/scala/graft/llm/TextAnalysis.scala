package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting. All pure
  * column expressions (codegen'd, no UDFs) so they run at full scan speed
  * over a 100 TB documents table.
  */
object TextAnalysis {

  /** Whitespace tokens (empty strings kept — mirrors plain split). */
  def tokens(text: Column): Column = split(text, " ")

  /** Non-empty whitespace token count. */
  def wordCount(text: Column): Column =
    size(filter(tokens(text), t => t =!= "")).cast("long")

  /** BPE-ish regex token count: runs of letters, digits, or single
    * non-alphanumeric symbols.
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")

  /** Count of tokens belonging to a marker set. */
  def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit): _*))).cast("long")

  /** n-gram-frequency language-ID heuristic: score each language by marker
    * token hits, pick the best with a fixed precedence order (en > es > de >
    * fr > zh) for ties. Deterministic and SQL-expressible by construction.
    */
  val langMarkers: Seq[(String, Seq[String])] =
    graft.functions.LangQualityUtil.defaultMarkers

  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.map { case (l, ms) => l -> markerCount(text, ms) }

  /** Fused counting struct from the native
    * [[graft.functions.LangQualityCounts]] kernel: ONE scan of the text
    * yields word_cnt, char_cnt (non-space), stop_cnt, and every language
    * marker score. This is the full-corpus scoring path — the HOF
    * formulations above stay as the executable spec (the kernel is
    * asserted identical in TextAnalysisSpec), but each of them re-splits
    * the text per call with an interpreted lambda, which is the wrong
    * constant factor for a 100 TB scan. The expression is deterministic,
    * so projections that pull several fields evaluate it once per row via
    * Spark's subexpression elimination.
    */
  def langQualityCounts(spark: org.apache.spark.sql.SparkSession,
      text: Column,
      stopwords: Seq[String] = graft.functions.LangQualityUtil.defaultStopwords): Column = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    call_function("lang_quality_counts", text, array(stopwords.map(lit): _*))
  }

  /** Deterministic greedy-merge (BPE-style) tokenizer counts over a
    * fixture merge table, via the fused [[graft.functions.BpeCounts]]
    * kernel: struct(bpe_tokens, token_chars, ws_words) from one scan.
    * `merges` entries are "left right" pairs, rank = list position —
    * the merge list IS the tokenizer (GPT-2 bpe() application), so token
    * budgets computed with it are reproducible anywhere the list ships.
    */
  def bpeCounts(spark: org.apache.spark.sql.SparkSession,
      text: Column, merges: Seq[String]): Column = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    call_function("bpe_counts", text, array(merges.map(lit): _*))
  }

  /** [[langScores]] from the fused kernel — same (lang, score) shape. */
  def langScoresFused(spark: org.apache.spark.sql.SparkSession,
      text: Column): Seq[(String, Column)] = {
    val c = langQualityCounts(spark, text)
    langMarkers.map { case (l, _) => l -> c.getField(s"s_$l") }
  }

  /** [[qualityComponents]] from the fused kernel — same (name, col) shape. */
  def qualityComponentsFused(spark: org.apache.spark.sql.SparkSession,
      text: Column, stopwords: Seq[String]): Seq[(String, Column)] = {
    val c = langQualityCounts(spark, text, stopwords)
    val wc = c.getField("word_cnt")
    val stopCnt = c.getField("stop_cnt")
    Seq(
      "word_cnt" -> wc,
      "avg_word_len" -> round(c.getField("char_cnt") / wc, 6),
      "stopword_ratio" -> round(stopCnt / wc, 6),
      "quality_score" -> round(least(lit(1.0), wc / 100.0) * (lit(1.0) - stopCnt / wc), 6))
  }

  def predictedLang(scores: Seq[(String, Column)]): Column = {
    // lang wins if its score >= every other score, in precedence order
    val conds = scores.zipWithIndex.map { case ((l, s), i) =>
      val others = scores.zipWithIndex.collect { case ((_, o), j) if j != i => o }
      (l, others.map(o => s >= o).reduce(_ && _))
    }
    conds.dropRight(1).foldRight(lit(conds.last._1)) { case ((l, c), acc) =>
      when(c, lit(l)).otherwise(acc)
    }
  }

  /** Quality score: length saturation × (1 − stopword ratio). Components
    * exposed for auditing (ref pattern: heuristic doc-quality filters in
    * public LLM-data pipelines).
    */
  def qualityComponents(text: Column, stopwords: Seq[String]): Seq[(String, Column)] = {
    val wc = wordCount(text)
    val charsNoSpace = length(regexp_replace(text, " ", "")).cast("long")
    val stopCnt = markerCount(text, stopwords)
    Seq(
      "word_cnt" -> wc,
      "avg_word_len" -> round(charsNoSpace / wc, 6),
      "stopword_ratio" -> round(stopCnt / wc, 6),
      "quality_score" -> round(least(lit(1.0), wc / 100.0) * (lit(1.0) - stopCnt / wc), 6))
  }

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text — the exact-dedup key that is stable under formatting noise.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Deterministic 0–99 content bucket (first 8 hex digits of the
    * fingerprint): the basis for train/val/test splits that survive
    * re-ingestion and keep exact duplicates in the same split.
    */
  def contentBucket(text: Column): Column =
    conv(substring(fingerprint(text), 1, 8), 16, 10).cast("long") % 100

  /** Content-addressed split assignment (default 80/10/10). */
  def contentSplit(text: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = contentBucket(text)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "validation")
      .otherwise("test")
  }

  /** 64-bit rolling content hash over whitespace tokens:
    * h ← rotl(h, 5) XOR xxhash64(token). Pure bitwise ops (rotate + xor), so
    * it wraps without tripping ANSI overflow checks, and it is positional
    * (token order changes the hash). Engine-specific (xxhash64) so it is
    * verified by unit tests, not a SQL oracle.
    */
  def rollingHash(text: Column): Column =
    aggregate(
      filter(tokens(text), t => t =!= ""),
      lit(0L),
      (acc, t) =>
        (shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59))).bitwiseXOR(xxhash64(t)))
}
