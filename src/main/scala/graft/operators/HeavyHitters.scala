package graft.operators

import graft.functions.MisraGriesAgg.misra_gries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact top-k by frequency at scale, via a two-pass candidate/verify
  * pipeline — the heavy-hitters query of corpus analytics (boilerplate
  * detection, vocabulary heads, hot-key diagnosis before a skewed join).
  *
  * Pass 1: one shuffle-free scan builds a Misra-Gries summary per
  *   partition (≤ `counters` entries each) and merges them into one
  *   candidate set. Any key with true frequency > n/(counters+1) is
  *   guaranteed present — size `counters` so the k-th frequency clears
  *   that bound (more counters = more headroom, still tiny state).
  * Pass 2: exact counts for the ≤ `counters` candidates only — a
  *   broadcast semi-join prunes the scan's group-by to candidate keys, so
  *   the exchange carries at most `counters` groups instead of every
  *   distinct key.
  *
  * The final (key, cnt) rows are EXACT and deterministic (ties broken by
  * key), even though pass 1 is approximate — the same
  * candidates-then-verify shape as [[TextDedup.minhashNearDups]].
  */
object HeavyHitters {

  def topK(
      df: DataFrame, keyCol: String, k: Int,
      counters: Int = 8192): DataFrame = {
    require(k > 0 && counters >= k,
      s"heavy-hitters: need counters >= k > 0, got k=$k counters=$counters")
    val keyed = df.select(col(keyCol).cast("long").as("_hh_key"))
      .filter(col("_hh_key").isNotNull)
    val candidates = keyed
      .agg(misra_gries(col("_hh_key"), counters).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.key").as("_hh_cand"))
    keyed
      .join(broadcast(candidates), col("_hh_key") === col("_hh_cand"), "left_semi")
      .groupBy(col("_hh_key"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("_hh_key"))
      .limit(k)
      .select(col("_hh_key").as(keyCol), col("cnt"))
  }
}
