package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (BASELINE.json north-star; the reference's text surface is limited to
  * pg_trgm trigram similarity, `wowutil.py:68-71` — these generalize it).
  *
  * Everything here is composed from built-in codegen'd expressions
  * (split / regexp / higher-order array functions) — no UDFs — so the
  * whole column pipeline stays inside whole-stage codegen and scales as
  * a pure map over documents: no shuffle, no state, embarrassingly
  * parallel at 100 TB.
  */
object TextFunctions {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword-ish token count: word pieces + standalone
    * punctuation (a cheap proxy for LLM token budgeting).
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Mean token length (characters). */
  def meanTokenLen(text: Column): Column =
    (length(regexp_replace(text, "\\s+", "")).cast("double") /
      tokenCount(text))

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", "")))
      .cast("double") / length(text)

  private val enStopwords =
    Seq("the", "a", "an", "of", "and", "in", "to", "is", "for", "on")

  /** Count of English stopword occurrences. */
  def stopwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("\\b(" + enStopwords.mkString("|") + ")\\b"), lit(0)))

  /** Stopword density (stopwords per token). */
  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") / tokenCount(text)

  /** Heuristic document-quality score in [0,1] — the standard
    * length / punctuation / stopword-density gates used by web-scale
    * corpus filters, as one deterministic arithmetic expression.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 4, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5, lit(1.0))
    (lenScore * 0.4 + punctPenalty * 0.3 + stopScore * 0.3)
  }

  /** Per-language marker words for the n-gram/stopword lang-ID
    * heuristic (tiny closed-class word lists — the classic cheap
    * signal; real pipelines would use fastText-style models).
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pas", "que"),
    "es" -> Seq("el", "los", "las", "es", "una", "por", "que", "para"),
    "zh" -> Seq("de5", "shi4", "bu4", "wo3", "zai4", "le5", "you3", "he2"))

  def langHits(text: Column, lang: String): Column =
    size(regexp_extract_all(lower(text),
      lit("\\b(" + langMarkers(lang).mkString("|") + ")\\b"), lit(0)))

  /** Predicted language: argmax of marker-hit counts, "und"
    * (undetermined) when nothing matches. Deterministic tie-break by
    * language code (greatest-first comparison on (hits, code)).
    */
  def langId(text: Column): Column = {
    val scored = langMarkers.keys.toSeq.sorted.map { l =>
      struct(langHits(text, l).as("hits"), lit(l).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** PII scrub: redact email addresses, then phone-shaped digit runs
    * (order matters — emails can contain digits). Pure regexp_replace
    * chain: codegen'd, shuffle-free, linear over the corpus.
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(noEmail,
      "\\+?\\d[\\d() .-]{7,}\\d", "<PHONE>")
  }

  /** Line-repetition ratio: 1 - distinct_lines/lines — the standard
    * boilerplate/spam signal (high ratio = repeated lines dominate).
    */
  def lineRepetitionRatio(text: Column): Column = {
    val lines = split(text, "\n")
    lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines)
  }

  /** Order-sensitive document fingerprint over whitespace tokens —
    * an ENGINE-PORTABLE polynomial rolling hash (same cross-engine
    * trick as [[graft.sampling.Sampling.knuthPriority]]):
    *
    *   tokHash(t) = fold(codepoints(t), 0, (a, c) -> (a*31 + c) mod M)
    *   fp         = fold(tokens, 0, (acc, h) -> (acc*131 + h) mod M)
    *
    * with M = 2^31 - 1, so DuckDB/Postgres reproduce the exact value
    * with plain integer SQL (every intermediate stays below 2^38 —
    * ANSI-safe, no Long wrap; the previous xxhash64 chain was
    * engine-specific and uncheckable cross-engine). Order-sensitive
    * like a hash CHAIN, unlike a bag-of-words hash: permuted tokens
    * fingerprint differently.
    */
  def fingerprint(text: Column): Column = {
    aggregate(
      split(trim(text), "\\s+"),
      lit(0L),
      (acc, tok) => (acc * 131L + wordHash(tok)) % PortableM)
  }

  /** Modulus of the portable polynomial hashes (2^31 - 1). */
  val PortableM: Long = 2147483647L

  /** The engine-portable per-token polynomial hash used by
    * [[fingerprint]] (and by content-defined chunking as the boundary
    * signal): fold(codepoints, 0, (a, c) -> (a*31 + c) mod M).
    */
  def wordHash(tok: Column): Column =
    aggregate(split(tok, ""), lit(0L),
      (a, ch) => (a * 31L + ascii(ch)) % PortableM)
}
