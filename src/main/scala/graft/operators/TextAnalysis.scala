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

  /** Characteristic character n-grams per language — (gram length, grams).
    * The n-gram half of the heuristic (complements whole-word stopword
    * hits; catches morphology on unseen words). Latin-script languages use
    * trigrams; zh uses single-character grams — Chinese text is
    * unsegmented, so whitespace tokens rarely match the stopword list and
    * 3-char windows straddle character boundaries. Every gram's length
    * must equal its declared size (spec-validated; r2 shipped dead 4-char
    * and CJK 1–2-char entries in a trigram-only table).
    */
  val gramProfiles: Map[String, (Int, Seq[String])] = Map(
    "en" -> ((3, Seq("the", "ing", "ion", "and", "ent", " th", "he ", "er ", " of", "nd "))),
    "fr" -> ((3, Seq("es ", "le ", "de ", "ent", "que", " le", "la ", "ait", "eur", "ais"))),
    "es" -> ((3, Seq("de ", "la ", "os ", "ión", "nte", " de", "el ", "ar ", "que", "ado"))),
    "de" -> ((3, Seq("en ", "er ", "ch ", "der", "ein", "sch", "ich", "nde", "die", "und"))),
    "zh" -> ((1, Seq("的", "是", "不", "在", "人", "有", "我", "他", "这", "中"))))

  private def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Distinct character trigrams (windows shorter than 3 only for texts
    * shorter than 3 chars). Spec-pinned lengths (TextDedupSpec).
    */
  private[graft] def trigrams(t: Column): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(t) - 2, lit(1))),
      i => t.substr(i, lit(3))))

  /** Distinct single characters. split(t, "") keeps one trailing "" (Java
    * split limit -1) — a guaranteed LUT miss that also inflated the zh
    * gram-ratio denominator — so empties are removed. Spec-pinned lengths.
    */
  private[graft] def unigrams(t: Column): Column =
    array_distinct(array_remove(split(t, ""), ""))

  /** Fraction of tokens found in `words`. */
  private def stopRatio(text: Column, words: Seq[String]): Column = {
    val t = tokens(text)
    size(array_intersect(t, typedlit(words))).cast("double") /
      greatest(size(t), lit(1))
  }

  /** token/gram → per-language 0/1 hit vector, in `langs` order. */
  private def hitLut(profiles: Map[String, Seq[String]], langs: Seq[String]): Map[String, Seq[Int]] =
    profiles.values.flatten.toSeq.distinct.map { k =>
      k -> langs.map(l => if (profiles.getOrElse(l, Nil).contains(k)) 1 else 0)
    }.toMap

  /** Predicted language + per-language scores: stopword-hit ratio blended
    * with char-n-gram profile overlap; argmax, "und" when nothing matches.
    *
    * All profile counting happens in ONE compiled kernel pass per document
    * ([[graft.functions.LangProfileKernel]] — hash-probe lookups instead of
    * the HOF fold's linear scans over literal-map keys); the scores and the
    * struct-argmax stay ordinary codegen'd expressions. Bit-identical to
    * [[withLanguageIdHof]], spec-enforced.
    */
  def withLanguageId(df: DataFrame, textCol: String): DataFrame = {
    val langs = stopwordProfiles.keys.toSeq.sorted
    val n = langs.length
    def lut(profiles: Map[String, Seq[String]]): Seq[(String, Seq[Int])] =
      hitLut(profiles, langs).toSeq.sortBy(_._1)
    val spread = widened(df)
    val counted = spread.withColumn("_lid_h",
      graft.functions.LangProfileOps.langHitCounts(
        lower(col(textCol)),
        lut(stopwordProfiles),
        lut(gramProfiles.view.mapValues(_._2).toMap), n))
    def slot(i: Int): Column = element_at(col("_lid_h"), i)
    val nToks = slot(2 * n + 1)
    val nG3 = slot(2 * n + 2)
    val nG1 = slot(2 * n + 3)
    def ratio(hits: Column, total: Column): Column =
      hits.cast("double") / greatest(total, lit(1L))
    val scoreCols = langs.zipWithIndex.map { case (l, i) =>
      val docGrams = if (gramProfiles(l)._1 == 1) nG1 else nG3
      round(
        ratio(slot(i + 1), nToks) + ratio(slot(n + i + 1), docGrams) * 0.5,
        6).as(s"score_$l")
    }
    val scored = counted.select(col("*") +: scoreCols: _*)
    scored.withColumn("lang_pred", argmaxLang(langs))
      .drop("_lid_h")
  }

  /** Argmax over the score_<lang> columns: one array_max over
    * (score, -langIndex) structs (ties → alphabetically-first language),
    * not a when-chain that duplicates the accumulated struct 2^(n-1)
    * times; "und" when no language scores above zero.
    */
  private def argmaxLang(langs: Seq[String]): Column = {
    val best = array_max(array(langs.zipWithIndex.map { case (l, i) =>
      struct(col(s"score_$l").as("s"), lit(-i).as("negl"))
    }: _*))
    when(best.getField("s") > 0,
      element_at(typedlit(langs), -best.getField("negl") + 1))
      .otherwise(lit("und"))
  }

  /** A small input arriving in fewer partitions than cores would serialize
    * per-row work (sf0.1 documents is ONE parquet split → r2 ran
    * single-threaded). Only widen — never shrink a well-partitioned
    * 100 TB input.
    *
    * The partition count is ESTIMATED from logical-plan statistics
    * (bytes / maxPartitionBytes — Spark's own scan bin-packing rule): a
    * `df.rdd.getNumPartitions` probe would force an extra physical-plan +
    * codegen round (~0.6 s per query, measured). Plans with unknown size
    * report huge stats and are left unrepartitioned — the conservative
    * direction at scale (never add a shuffle to data that may be big).
    */
  private[graft] def widened(df: DataFrame): DataFrame = {
    val sess = df.sparkSession
    val p = sess.sparkContext.defaultParallelism.toLong
    val analyzed = df.queryExecution.analyzed
    // bytes/maxPartitionBytes mirrors Spark's scan bin-packing, so it is a
    // valid partition-count proxy ONLY for plans that execute as file
    // scans (projections/filters/aliases over a relation). Derived plans
    // (joins, aggregates — whose partitioning follows shuffle settings,
    // not input bytes) fall back to the exact probe; operator entry
    // points pass raw scans, so the probe's extra plan+codegen round is
    // only ever paid for caller-supplied derived inputs.
    val scanShaped = analyzed.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.LeafNode => p
    }.size == 1 && analyzed.find {
      case _: org.apache.spark.sql.catalyst.plans.logical.Project => false
      case _: org.apache.spark.sql.catalyst.plans.logical.Filter => false
      case _: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => false
      case _: org.apache.spark.sql.catalyst.plans.logical.View => false
      case _: org.apache.spark.sql.catalyst.plans.logical.LeafNode => false
      case _ => true
    }.isEmpty
    val narrow =
      if (scanShaped) {
        val maxBytes = math.max(1L, sess.sessionState.conf.filesMaxPartitionBytes)
        analyzed.stats.sizeInBytes / maxBytes + 1 < p
      } else df.rdd.getNumPartitions < p
    if (narrow) df.repartition(p.toInt) else df
  }

  /** The HOF formulation [[withLanguageId]] compiles — the original
    * expression-only pipeline, kept as the independently-derived spec twin
    * (literal maps + one aggregate fold; element_at on a map literal is a
    * linear key scan, which is why the kernel exists).
    */
  private[graft] def withLanguageIdHof(df: DataFrame, textCol: String): DataFrame = {
    val langs = stopwordProfiles.keys.toSeq.sorted
    val zeros = Seq.fill(langs.length)(0)
    val stopLut = typedlit(hitLut(stopwordProfiles, langs))
    val gramLut = typedlit(hitLut(gramProfiles.view.mapValues(_._2).toMap, langs))
    // Interpreted higher-order functions do the heavy lifting — spread a
    // narrow input across cores first.
    val spread = widened(df)
    val t = lower(col(textCol))
    val toks = tokens(col(textCol))
    val mat = spread.withColumn("_lid_toks", toks)
      .withColumn("_lid_g3", trigrams(t))
      .withColumn("_lid_g1", unigrams(t))

    // Per-language hit counts in one fold: acc[i] += lut(x)[i]. Distinct
    // inputs keep array_intersect's set semantics; 3-char and 1-char gram
    // keys cannot collide, so one merged gram pass serves all languages.
    def hitCounts(arr: Column, lut: Column): Column =
      aggregate(arr, typedlit(zeros), (acc, x) =>
        zip_with(acc, coalesce(element_at(lut, x), typedlit(zeros)),
          (a, b) => a + b))
    val counted = mat
      .withColumn("_lid_stopc", hitCounts(array_distinct(col("_lid_toks")), stopLut))
      .withColumn("_lid_gramc",
        hitCounts(array_distinct(concat(col("_lid_g3"), col("_lid_g1"))), gramLut))

    def ratio(hits: Column, total: Column): Column =
      hits.cast("double") / greatest(total, lit(1))
    val scoreCols = langs.zipWithIndex.map { case (l, i) =>
      val docGrams = if (gramProfiles(l)._1 == 1) col("_lid_g1") else col("_lid_g3")
      round(
        ratio(element_at(col("_lid_stopc"), i + 1), size(col("_lid_toks"))) +
          ratio(element_at(col("_lid_gramc"), i + 1), size(docGrams)) * 0.5,
        6).as(s"score_$l")
    }
    val scored = counted.select(col("*") +: scoreCols: _*)
    val best = array_max(array(langs.zipWithIndex.map { case (l, i) =>
      struct(col(s"score_$l").as("s"), lit(-i).as("negl"))
    }: _*))
    scored.withColumn("lang_pred",
      when(best.getField("s") > 0,
        element_at(typedlit(langs), -best.getField("negl") + 1))
        .otherwise(lit("und")))
      .drop("_lid_toks", "_lid_g3", "_lid_g1", "_lid_stopc", "_lid_gramc")
  }

  /** DuckDB SQL computing the SAME per-document language prediction —
    * generated from the same profile constants so oracle and engine
    * cannot drift. Differential value: tokenization (Java-split semantics
    * with kept empties), char-window grams with the short-text rule, the
    * merged gram namespace, score rounding, and the alphabetical
    * tie-break all re-derived on a second engine (per-doc agreement
    * verified at sf0.001/0.01/0.1). Yields `(lang_pred, n)` rows.
    */
  def langIdOracleSql(table: String = "documents", textCol: String = "text",
      idCol: String = "doc_id"): String =
    "SELECT lang_pred, count(*) AS n FROM (" +
      langIdPerDocOracleSql(table, textCol, idCol) +
      ") GROUP BY 1 ORDER BY 1"

  /** Per-row variant of [[langIdOracleSql]]: (idCol, lang_pred) — the
    * same DuckDB re-derivation of the heuristic from the same profile
    * constants, with the row id threaded through (nested subqueries,
    * not a WITH, so it embeds verbatim as a CTE body inside a larger
    * oracle — see `q_classifier_agreement`).
    */
  def langIdPerDocOracleSql(table: String, textCol: String, idCol: String): String = {
    val langs = stopwordProfiles.keys.toSeq.sorted
    def lst(xs: Seq[String]) =
      xs.map(x => "'" + x.replace("'", "''") + "'").mkString("[", ",", "]")
    val scoreCols = langs.map { l =>
      val dg = if (gramProfiles(l)._1 == 1) "g1" else "g3"
      s"round(len(list_intersect(dtoks, ${lst(stopwordProfiles(l))}))/greatest(len(toks),1) + " +
        s"0.5*len(list_intersect(gall, ${lst(gramProfiles(l)._2)}))/greatest(len($dg),1), 6) AS s_$l"
    }
    val m = langs.map(l => s"s_$l").mkString("greatest(", ",", ")")
    // ELSE 'und' also covers NULL text (all score comparisons NULL fall
    // through every WHEN) — Spark's otherwise("und") does the same.
    val pred = s"CASE WHEN $m <= 0 THEN 'und' " +
      langs.map(l => s"WHEN s_$l = $m THEN '$l'").mkString(" ") + " ELSE 'und' END"
    s"""SELECT _id AS $idCol, $pred AS lang_pred FROM (
       |  SELECT _id, ${scoreCols.mkString(", ")} FROM (
       |    SELECT *, list_distinct(list_concat(g3, g1)) AS gall FROM (
       |      SELECT _id, toks, list_distinct(toks) AS dtoks,
       |        list_distinct(list_transform(range(1, greatest(length(t)-2,1)+1), i -> substring(t, i, 3))) AS g3,
       |        list_distinct(list_filter(list_transform(range(1, length(t)+1), i -> substring(t, i, 1)), c -> c <> '')) AS g1
       |      FROM (SELECT $idCol AS _id, lower($textCol) AS t, string_split_regex(lower($textCol), '\\s+') AS toks
       |            FROM $table))))""".stripMargin
  }

  /** Whitespace token count plus a BPE-ish subword count: letter runs,
    * digit runs, and single other-non-space characters each count one
    * token (an upper-bound proxy for BPE vocab tokenization without
    * shipping a vocab). Counted by token EXTRACTION, not boundary
    * splitting — the r6 formulation split on lookarounds, which only
    * Java regexes support, so no RE2-class engine (DuckDB, Go, Rust)
    * could re-derive it; this pattern means the same thing in both
    * regex families and the pipeline entry hash-checks cross-engine.
    */
  def withTokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens_ws", size(tokens(col(textCol))))
      .withColumn("n_tokens_bpe", size(regexp_extract_all(col(textCol),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))))

  /** Overlapping token-window chunks — the step before embedding: long
    * documents become (doc_id, chunk_idx, chunk_text) rows of
    * `chunkTokens` whitespace tokens, consecutive chunks sharing
    * `overlap` tokens so no context is cut at a boundary. One projection
    * + posexplode, pure expressions: chunk count per doc is
    * ceil(max(n_tokens − overlap, 1) / stride) with
    * stride = chunkTokens − overlap; documents shorter than a chunk
    * yield exactly one chunk (the whole document). No shuffle — at
    * 100 TB chunking fuses into the scan that feeds the embedder.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && chunkTokens > overlap,
      s"chunk: need chunkTokens > overlap >= 0, got $chunkTokens/$overlap")
    val stride = chunkTokens - overlap
    val toks = split(col(textCol), "\\s+") // original case — chunks are payload
    val nChunks = greatest(
      ceil((size(toks) - lit(overlap)).cast("double") / stride).cast("int"),
      lit(1))
    df.select(col(idCol), posexplode(
        transform(sequence(lit(0), nChunks - 1),
          i => concat_ws(" ", slice(toks, i * stride + 1, lit(chunkTokens))))))
      .withColumnsRenamed(Map("pos" -> "chunk_idx", "col" -> "chunk_text"))
      .withColumn("n_chunk_tokens", size(split(col("chunk_text"), "\\s+")))
  }

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
    * set digest. Both 64-bit, computed in one compiled kernel pass
    * ([[graft.functions.TextHashKernel.fingerprints]]); the HOF
    * formulation below is the spec twin.
    */
  def withFingerprints(df: DataFrame, textCol: String): DataFrame = {
    val fp = graft.functions.TextHashOps.fingerprints(lower(col(textCol)))
    df.withColumn("_fp", fp)
      .withColumn("fp_rolling", element_at(col("_fp"), 1))
      .withColumn("fp_set", element_at(col("_fp"), 2))
      .drop("_fp")
  }

  /** The HOF formulation [[withFingerprints]] compiles — spec twin. */
  private[graft] def withFingerprintsHof(df: DataFrame, textCol: String): DataFrame = {
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

  /** PII patterns, RE2-compatible (no lookaround, no backreferences) so
    * the exact same pattern text runs under Java regex (Spark) and RE2
    * (DuckDB, and most scale-out scrubbing stacks). Order matters:
    * redaction applies email → IPv4 → phone, each over the previous
    * step's output, so a match consumed by an earlier rule can't
    * re-match a later one.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b", "<IP>"),
    ("phone", "\\+\\d{1,3}[- ]\\d{3}-\\d{4}", "<PHONE>"))

  /** PII scrubbing — the compliance pass every training-data pipeline
    * runs before anything else sees the text. Adds `n_<kind>` match
    * counts (over the original text) and `redacted` (placeholders
    * substituted, rules applied in [[piiPatterns]] order). Pure
    * regexp_replace / regexp_extract_all expression chain: codegen'd,
    * no shuffle, fuses into the scan at any corpus size.
    */
  def withPiiRedacted(df: DataFrame, textCol: String): DataFrame = {
    val counted = piiPatterns.foldLeft(df) { case (d, (kind, pat, _)) =>
      d.withColumn(s"n_$kind",
        size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long"))
    }
    counted.withColumn("redacted",
      piiPatterns.foldLeft(col(textCol)) { case (c, (_, pat, tag)) =>
        regexp_replace(c, pat, tag)
      })
  }

  /** Corpus-self-trained unigram LM surprisal — the cheap stand-in for
    * the CCNet/Gopher perplexity filter: documents whose tokens are
    * globally rare score high bits-per-token and get routed to a
    * quality review. Two shuffles total: one groupBy over DISTINCT
    * tokens (vocab), one groupBy over doc ids; the token→probability
    * join broadcasts when `maxVocab` bounds the vocabulary (the 100 TB
    * shape — out-of-vocab tokens fall back to count 1, i.e. the rarest
    * observable probability, so the bound changes scores only for the
    * tail the filter would flag anyway).
    *
    * Cross-engine determinism (r14, replacing the r13 6-dp DECIMAL
    * scheme whose sf0.1 audit found one cell one libm-ulp off its
    * rounding boundary): per-token surprisal is the EXACT INTEGER
    * micro-bit difference `microLog2(n_total) - microLog2(n_w)` where
    * microLog2(k) = floor(log2(k)·1e6 + 0.5) of an INTEGER count — a
    * finite lattice whose knife-edge margins are auditable per k
    * (min margin at sf0.01/sf0.1: 7.2e-4 ≈ 3.9e5 ulps, at k=3; the
    * guard inside [[microLog2]] fails LOUDLY if any future count sits
    * within 1e-5 of a boundary instead of silently hash-mismatching).
    * Integer sums are exact and order-free; the final bits-per-token is
    * ONE IEEE division of two exactly-representable integers (< 2^53),
    * which every IEEE-754 engine rounds identically — no transcendental
    * ever crosses the engine boundary unaudited.
    */
  def withUnigramSurprisal(df: DataFrame, idCol: String, textCol: String,
      maxVocab: Int = 0): DataFrame = {
    // The exploded tokens fan out to the vocab aggregate and the join
    // probe — deliberately NOT persisted: the relation is a row blow-up
    // several times the columnar source, so materializing it costs more
    // than the second column-pruned scan + explode it saves (measured
    // 2.5× slower with a persist at sf0.1; the same ratio holds at
    // scale because cache writes are uncompressed rows while the scans
    // are compressed columns). This differs from shingleDF, whose
    // shingle/minhash expressions are interpreted HOFs that cost far
    // more than their storage.
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val vocabAll = toks.groupBy("tok").agg(count(lit(1)).as("n_w"))
    val vocab =
      if (maxVocab > 0)
        broadcast(vocabAll.orderBy(col("n_w").desc, col("tok")).limit(maxVocab))
      else vocabAll
    val total = vocabAll.agg(sum("n_w").as("n_total")) // 1 row — broadcast join
    toks.join(vocab, Seq("tok"), "left")
      .crossJoin(broadcast(total))
      .withColumn("_mb",
        microLog2(col("n_total")) - microLog2(coalesce(col("n_w"), lit(1L))))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum("_mb").as("sum_microbits"))
      .select(col(idCol), col("n_tokens"), col("sum_microbits"),
        microRatio(col("sum_microbits"), col("n_tokens")).as("bits_per_token"))
  }

  /** floor(log2(k)·1e6 + 0.5) as BIGINT — surprisal fixed-point unit.
    * Knife-edge guard: if the scaled value sits within 1e-5 of its floor
    * boundary (where a 1-ulp libm difference between engines could flip
    * the integer), the row RAISES instead of silently diverging from the
    * oracle. 1e-5 ≈ 5×10³ ulps at the largest counts in play and 72×
    * under the smallest margin observed in the committed audit
    * (COVERAGE.md r14: min 7.2e-4 at k=3 over every distinct count at
    * sf0.01 and sf0.1). Stays inside whole-stage codegen (pure
    * arithmetic + conditional).
    */
  private[graft] def microLog2(k: Column): Column = {
    val x = log2(k.cast("double")) * lit(1e6) + lit(0.5)
    val frac = x - floor(x)
    val margin = least(frac, lit(1.0) - frac)
    when(margin >= lit(1e-5), floor(x).cast("long"))
      .otherwise(raise_error(concat(
        lit("lm micro-bit knife-edge: log2("), k.cast("string"),
        lit(")*1e6+0.5 within 1e-5 of a floor boundary - re-audit the precision"))))
  }

  /** sum_microbits / (n · 1e6) as ONE IEEE division of two exactly-
    * representable integers — bit-identical on every IEEE-754 engine,
    * so the human-facing ratio needs no rounding step at all.
    */
  private[graft] def microRatio(sumMicro: Column, n: Column): Column =
    sumMicro.cast("double") / (n * lit(1000000L)).cast("double")

  /** Bigram conditional surprisal — one step closer to the real
    * perplexity filter than [[withUnigramSurprisal]]: each adjacent
    * token pair costs −log2 P(w | prev) = −log2(c(prev,w) / c(prev)),
    * with both counts trained on this corpus's own bigram table.
    * Bigram extraction is SHUFFLE-FREE (slice + arrays_zip + explode —
    * no per-document window, no lag): documents shorter than two
    * tokens produce no bigrams and drop out. Same cross-engine
    * determinism contract as the unigram scorer: per-bigram surprisal
    * is an exact integer micro-bit difference of [[microLog2]] values
    * before the exact order-free document sum (see
    * [[withUnigramSurprisal]] for the knife-edge audit story).
    */
  def withBigramSurprisal(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    // Fans out three ways but deliberately NOT persisted — same
    // exploded-relation reasoning as withUnigramSurprisal's toks.
    val bg = df.select(col(idCol),
        explode(arrays_zip(
          slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1)))
          .as("_p"))
      .select(col(idCol), col("_p.0").as("prev"), col("_p.1").as("tok"))
    val pairCounts = bg.groupBy("prev", "tok").agg(count(lit(1)).as("n_pair"))
    val prevCounts = bg.groupBy("prev").agg(count(lit(1)).as("n_prev"))
    bg.join(pairCounts, Seq("prev", "tok"))
      .join(prevCounts, Seq("prev"))
      .withColumn("_mb", microLog2(col("n_prev")) - microLog2(col("n_pair")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("_mb").as("sum_microbits"))
      .select(col(idCol), col("n_bigrams"), col("sum_microbits"),
        microRatio(col("sum_microbits"), col("n_bigrams")).as("bits_per_bigram"))
  }

  /** Per-document top-`k` TF-IDF keywords: score = tf · idf with
    * idf = log2(N / df) over this corpus (N = document count, df =
    * documents containing the term). idf is an exact integer micro-bit
    * difference of [[microLog2]] values (knife-edge-guarded — see
    * [[withUnigramSurprisal]]), so tf·idf is exact BIGINT arithmetic
    * and the (score desc, term asc) ranking is engine-independent — no
    * float comparison anywhere near the cut; the reported double score
    * is one IEEE division of exact integers.
    * Two aggregations (doc-term tf, term df) + one per-document window
    * partitioned by `idCol`; the df table broadcasts when the
    * vocabulary is bounded, and N rides a 1-row broadcast.
    */
  def withTfIdfTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    require(k > 0, s"withTfIdfTopK: k must be positive, got $k")
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    // tf feeds both the document-frequency aggregate and the scored join
    // — materialize it rather than re-tokenizing the corpus twice.
    val tf = OpCaches.track(
      toks.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("n_docs")) // 1 row
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("score_micro").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_micro", microLog2(col("n_docs")) - microLog2(col("df_t")))
      .withColumn("score_micro", col("tf") * col("idf_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank").cast("long").as("rank"), col("term"),
        microRatio(col("score_micro"), lit(1L)).as("score"))
  }
}
