package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline surface:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything is built from codegen'd built-ins (`split`, `regexp_replace`,
  * higher-order array functions) — no UDFs — so the expressions fuse into
  * whole-stage codegen and scale linearly over document partitions with no
  * shuffle. Semantics are intentionally mirrorable in ANSI/DuckDB SQL so the
  * driver's oracle can verify them (see SparkEntry.oracleSql).
  */
object TextFunctions {

  /** Whitespace tokens of lowercased, trimmed text; [] for blank text. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(text)), "\\s+"))

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("int")

  /** Distinct-token count. */
  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text))).cast("int")

  /** Mean token length over tokens (0.0 for blank). */
  def avgTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(aggregate(t, lit(0.0), (acc, x) => acc + length(x)) / size(t))
  }

  private val punctClass = "[.,;:!?]"

  /** Fraction of characters that are sentence punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise((length(text) - length(regexp_replace(text, punctClass, ""))).cast("double") / length(text))

  /** Fraction of tokens found in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    val sw = array(stopwords.map(lit): _*)
    when(size(t) === 0, lit(0.0))
      .otherwise(size(filter(t, x => array_contains(sw, x))).cast("double") / size(t))
  }

  /** Stopword lists used by language ID (tiny n-gram-free heuristic). */
  val stopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "que", "por"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "人", "这"))

  /** Number of tokens hitting the given language's stopword list. */
  def langHits(text: Column, lang: String): Column = {
    val sw = array(stopwordsByLang.toMap.apply(lang).map(lit): _*)
    size(filter(tokens(text), x => array_contains(sw, x))).cast("int")
  }

  /** Argmax language by stopword hits; ties resolve in stopwordsByLang order;
    * "und" (undetermined) when zero hits everywhere. */
  def langId(text: Column): Column = {
    val hits = stopwordsByLang.map { case (l, _) => l -> langHits(text, l) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val firstMatch = hits.foldRight(lit("und")) { case ((l, h), acc) =>
      when(h === best && best > 0, lit(l)).otherwise(acc)
    }
    // foldRight builds nested when()s so the FIRST list entry wins ties:
    // when(h_en === best, "en").otherwise(when(h_de === best, ...) ...)
    firstMatch
  }

  /** Composite quality score in [0,1]: rewards moderate length, low punct,
    * presence of stopwords (deterministic, portable formula). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val ntok = tokenCount(text).cast("double")
    val lenScore = least(ntok / lit(20.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 10.0, lit(1.0))
    val swScore = least(stopwordRatio(text, stopwords) * 5.0, lit(1.0))
    round((lenScore + punctScore + swScore) / 3.0, 6)
  }

  /** Rolling-hash document fingerprint: md5 of the normalized token stream.
    * (Content-defined exact-dup fingerprint; whitespace-insensitive.) */
  def fingerprint(text: Column): Column = md5(array_join(tokens(text), " "))

  /** BPE-style pre-tokenization pattern: letter runs, digit runs, and
    * punctuation runs split apart (the GPT-2 pre-tokenizer shape, minus
    * its contraction list and space-prefix lookahead — those need
    * constructs outside the Java-regex/RE2 common subset the oracles
    * require). Unicode categories, so non-ASCII text splits sanely. */
  val bpeishPattern = "\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]+"

  /** BPE-ish pre-tokens of the text, in order. `3.14 isn't x2` ->
    * [3, ., 14, isn, ', t, x, 2] — the unit stream a BPE tokenizer would
    * merge; counting these approximates subword token counts far better
    * than whitespace splitting on punctuation/number-heavy text. */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(bpeishPattern), lit(0))

  /** BPE-ish pre-token count. */
  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text)).cast("int")
}
