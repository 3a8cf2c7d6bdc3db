package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. Pure expression
  * pipelines — everything stays inside whole-stage codegen.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword-ratio
    * language heuristic. Real deployments plug in larger profiles; the
    * operator shape (score per language → argmax) is what matters.
    */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"),
    "es" -> Seq("el", "la", "de", "y", "un", "una", "es", "que", "para", "en"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "zu", "für", "mit"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Characteristic character trigrams per language — the n-gram half of
    * the heuristic (complements whole-word stopword hits; catches
    * morphology on unseen words).
    */
  val trigramProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "ing", "ion", "and", "ent", " th", "he ", "er ", " of", "nd "),
    "fr" -> Seq("es ", "le ", "de ", "ent", "que", " le", "la ", "ait", "eur", "ais"),
    "es" -> Seq("de ", "la ", "os ", "ión", "ente", " de", "el ", "ar ", "que", "ado"),
    "de" -> Seq("en ", "er ", "ch ", "der", "ein", "sch", "ich", "nde", "die", "und"),
    "zh" -> Seq("的", "是", "不了", "在", "人", "有", "我", "他", "这", "中"))

  private def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Fraction of tokens found in `words`. */
  private def stopRatio(text: Column, words: Seq[String]): Column = {
    val t = tokens(text)
    size(array_intersect(t, typedlit(words))).cast("double") /
      greatest(size(t), lit(1))
  }

  /** Fraction of the doc's distinct char trigrams found in `grams`. */
  private def trigramRatio(text: Column, grams: Seq[String]): Column = {
    val t = lower(text)
    val docGrams = array_distinct(transform(
      sequence(lit(1), greatest(length(t) - 2, lit(1))),
      i => t.substr(i, lit(3))))
    size(array_intersect(docGrams, typedlit(grams))).cast("double") /
      greatest(size(docGrams), lit(1))
  }

  /** Predicted language + per-language scores: stopword-hit ratio blended
    * with char-trigram profile overlap; argmax, "und" when nothing
    * matches.
    */
  def withLanguageId(df: DataFrame, textCol: String): DataFrame = {
    val langs = stopwordProfiles.keys.toSeq.sorted
    val scored = langs.foldLeft(df) { (d, l) =>
      d.withColumn(s"score_$l",
        round(stopRatio(col(textCol), stopwordProfiles(l)) +
          trigramRatio(col(textCol), trigramProfiles(l)) * 0.5, 6))
    }
    val best = langs.map(l => struct(col(s"score_$l").as("s"), lit(l).as("l")))
      .reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    scored.withColumn("lang_pred",
      when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und")))
  }

  /** Whitespace token count plus a BPE-ish subword count from a regex that
    * splits on word/punct/digit boundaries (an upper-bound proxy for BPE
    * vocab tokenization without shipping a vocab).
    */
  def withTokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens_ws", size(tokens(col(textCol))))
      .withColumn("n_tokens_bpe", size(split(col(textCol),
        "(?<=\\p{L})(?=\\p{N})|(?<=\\p{N})(?=\\p{L})|\\s+|(?=\\p{Punct})")))

  /** Heuristic quality score in [0,1]: penalizes extreme length, high
    * punctuation/digit density, low stopword ratio, and token repetition
    * (distinct/total) — the standard cheap pre-filters.
    */
  def withQualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = greatest(size(toks), lit(1)).cast("double")
    val lenOk = when(length(t).between(20, 20000), 1.0).otherwise(0.3)
    val punctRatio = (length(t) - length(regexp_replace(t, "\\p{Punct}", ""))).cast("double") /
      greatest(length(t), lit(1))
    val digitRatio = (length(t) - length(regexp_replace(t, "\\p{N}", ""))).cast("double") /
      greatest(length(t), lit(1))
    val stopHit = stopRatio(t, stopwordProfiles("en"))
    val diversity = size(array_distinct(toks)).cast("double") / nTok
    df.withColumn("quality",
      round(lenOk * (lit(1.0) - least(punctRatio * 3, lit(1.0))) *
        (lit(1.0) - least(digitRatio * 3, lit(1.0))) *
        least(stopHit * 5 + 0.5, lit(1.0)) *
        least(diversity * 2, lit(1.0)), 6))
  }

  /** Rolling (Karp–Rabin-style) content fingerprint over tokens — stable
    * under whitespace normalization, order-sensitive; plus an order-free
    * set digest. Both 64-bit, pure expressions.
    */
  def withFingerprints(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    // Rolling hash mod 2^31-1 (overflow-free under ANSI mode): acc·31 + h.
    val m = 2147483647L
    df.withColumn("fp_rolling",
      aggregate(toks, lit(17L),
        (acc, w) => pmod(acc * 31 + pmod(xxhash64(w), lit(m)), lit(m))))
      .withColumn("fp_set",
        aggregate(transform(array_sort(array_distinct(toks)), w => xxhash64(w)),
          lit(0L), (acc, h) => acc.bitwiseXOR(h)))
  }
}
