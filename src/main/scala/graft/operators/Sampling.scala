package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data selection.
  *
  * Seeded RDD sampling (`df.sample`) draws from a per-partition RNG
  * stream: the selected row set changes with partitioning, task retries
  * and engine version — unacceptable when a training corpus must be
  * re-derivable byte-for-byte. These operators hash a KEY instead: a row's
  * fate depends only on its key and the salt, on any engine, at any
  * parallelism. Selection is a pure map-side filter (codegen'd md5 —
  * no shuffle, no state), so at 100 TB it fuses into the scan it feeds on
  * and costs one digest per row.
  *
  * The decision rule compares the first 4 hex digits of
  * `md5(key || '|' || salt)` against `floor(fraction · 16^4)` written as 4
  * hex digits: a plain string comparison both this engine and any SQL
  * oracle evaluate identically (no cross-engine integer-parsing of hex
  * needed). Granularity is 1/65536 ≈ 0.0015 %. The `'|'` separator keeps
  * distinct (key, salt) pairs distinct — without it key `"1"` + salt
  * `"23"` and key `"12"` + salt `"3"` would hash identically, breaking
  * the independent-samples-per-salt contract (keys containing `'|'`
  * could still alias against a salt that itself contains `'|'`; use
  * delimiter-free salts for such keys).
  *
  * NULL-key policy: a null key has no hash, so null-key rows are ALWAYS
  * excluded — at every fraction including 1.0, so `fraction = 1.0` and
  * `fraction = 1.0 - ε` never differ by the whole null-key population.
  * Callers wanting nulls kept must coalesce the key first.
  */
object Sampling {

  /** 4-hex-digit threshold for a fraction; None = keep everything. */
  private[graft] def hexThreshold(fraction: Double): Option[String] = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"sample fraction must be in [0, 1], got $fraction")
    if (fraction >= 1.0) None
    else Some(f"${math.floor(fraction * 65536).toInt}%04x")
  }

  private[operators] def hexOf(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit("|"), lit(salt))), 1, 4)

  /** Bernoulli sample: keeps ~`fraction` of rows, chosen by key hash.
    * Deterministic across engines, partitionings and reruns; different
    * `salt` values draw independent samples from the same corpus.
    * Null-key rows are always excluded (see the policy note above).
    */
  def deterministicSample(
      df: DataFrame, keyCol: String, fraction: Double,
      salt: String = ""): DataFrame = {
    val nonNull = df.filter(col(keyCol).isNotNull)
    hexThreshold(fraction) match {
      case None => nonNull
      case Some(t) => nonNull.filter(hexOf(col(keyCol), salt) < lit(t))
    }
  }

  /** WEIGHTED sample without replacement, fixed size k — the
    * Efraimidis–Spirakis A-Res scheme (Inf. Process. Lett. 97(5), 2006)
    * on public coins: each row draws u ∈ (0,1] from the md5 of
    * (key, salt) — the same engine-portable construction as
    * [[deterministicSample]], here widened to 8 hex digits so the ln
    * below has resolution — and the k rows with the LARGEST u^(1/w)
    * win, which selects each row with probability proportional to its
    * weight among same-draw competitors. Ranking uses the equivalent
    * monotone key ln(u)/w (u ≤ 1 ⇒ ln u ≤ 0; dividing by a bigger w
    * pulls the key toward 0 = better), ROUNDED to 9 dp with the row key
    * as tie-break so another engine computing ln at slightly different
    * float precision selects the identical set.
    *
    * Scale: pure map-side scoring + one global top-k —
    * TakeOrderedAndProject keeps a k-row heap per partition, so a
    * 100 TB corpus never sorts; weights need no normalization pass.
    * Null keys or non-positive weights are excluded (a weight of 0
    * can never win and ln(u)/0 is undefined).
    */
  def weightedSample(
      df: DataFrame, keyCol: String, weightCol: String, k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1, s"sample size must be >= 1, got $k")
    val u32 = conv(substring(
        md5(concat(col(keyCol).cast("string"), lit("|"), lit(salt))), 1, 8),
      16, 10).cast("double")
    val rankKey = round(log((u32 + 1.0d) / 4294967296.0d) / col(weightCol), 9)
    df.filter(col(keyCol).isNotNull && col(weightCol) > 0)
      .withColumn("_wkey", rankKey)
      .orderBy(col("_wkey").desc, col(keyCol))
      .limit(k)
      .drop("_wkey")
  }

  /** Exactly-n-per-group sample (fixed-size, not fixed-rate — "20 docs
    * per language for the eval set"): within each group, keep the n
    * rows with the SMALLEST seeded md5 draws (full 32-hex digest, ties
    * by key), which is a uniform without-replacement draw that is
    * deterministic across engines, partitionings and reruns — the
    * reservoir-sampling contract without reservoir state. Emits
    * `sample_rank` (1..n in draw order) so nested prefixes nest: the
    * rank ≤ 5 rows ARE the n=5 sample of the same salt.
    *
    * Scale: the rank rides the same two-phase salted top-k as
    * [[Skew.topKPerKeySalted]] (inverted to ascending) — a hot group
    * first ranks within `salts` value-hashed sub-keys (each ~1/salts of
    * the group), then exactly over the surviving salts×n candidates, so
    * one giant language never funnels its row mass through one reducer.
    */
  def samplePerGroup(
      df: DataFrame, groupCol: String, keyCol: String, n: Int,
      salts: Int = 16, salt: String = ""): DataFrame = {
    require(n > 0, s"samplePerGroup: n must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    val tagged = df.filter(col(keyCol).isNotNull)
      .withColumn("_draw",
        md5(concat(col(keyCol).cast("string"), lit("|"), lit(salt))))
    val wSalt = Window.partitionBy(col(groupCol), col("_salt"))
      .orderBy(col("_draw"), col(keyCol))
    val candidates = tagged
      .withColumn("_salt", pmod(xxhash64(col(keyCol)), lit(salts)).cast("int"))
      .withColumn("_rs", row_number().over(wSalt))
      .filter(col("_rs") <= n)
      .drop("_salt", "_rs")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("_draw"), col(keyCol))
    candidates
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= n)
      .drop("_draw")
  }

  /** Stratified sample: an independent per-stratum fraction (strata
    * missing from the map keep `defaultFraction`). Same hash rule, so the
    * kept set is the union of per-stratum deterministic samples — still
    * one map-side filter, no shuffle, skew-immune (no per-stratum
    * repartition).
    */
  def stratifiedSample(
      df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      salt: String = ""): DataFrame = {
    val hex = hexOf(col(keyCol), salt)
    def keep(f: Double): Column =
      hexThreshold(f).map(t => hex < lit(t)).getOrElse(lit(true))
    val cond = fractions.foldLeft(when(lit(false), lit(false))) {
      case (acc, (stratum, f)) => acc.when(col(strataCol) === stratum, keep(f))
    }.otherwise(keep(defaultFraction))
    df.filter(col(keyCol).isNotNull).filter(cond)
  }
}
