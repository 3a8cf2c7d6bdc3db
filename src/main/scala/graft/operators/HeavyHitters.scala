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
  *
  * The MG guarantee is VERIFIED, not assumed: after pass 2 the k-th
  * returned exact count is checked against the n/(counters+1) bound (and
  * pass 1 detects the no-decrement case, where the summary holds every
  * distinct key with exact counts). If neither certificate holds — a flat
  * distribution where `counters` was sized too small — the operator logs
  * a warning and FALLS BACK to a full exact group-by, so the result is
  * exact top-k in every case; under-sizing `counters` costs a full
  * shuffle, never a silently wrong answer.
  */
object HeavyHitters extends org.apache.spark.internal.Logging {

  def topK(
      df: DataFrame, keyCol: String, k: Int,
      counters: Int = 8192): DataFrame = {
    require(k > 0 && counters >= k,
      s"heavy-hitters: need counters >= k > 0, got k=$k counters=$counters")
    val keyed = df.select(col(keyCol).cast("long").as("_hh_key"))
      .filter(col("_hh_key").isNotNull)
    def exactTopK(in: DataFrame): DataFrame = in
      .groupBy(col("_hh_key"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("_hh_key"))
      .limit(k)
      .select(col("_hh_key").as(keyCol), col("cnt"))
    // Pass 1: one shuffle-free scan → MG candidate summary + exact n.
    val first = keyed
      .agg(misra_gries(col("_hh_key"), counters).as("mg"), count(lit(1)).as("n"))
      .head()
    val mg = first.getSeq[org.apache.spark.sql.Row](0)
    val n = first.getLong(1)
    val spark = df.sparkSession
    import spark.implicits._
    val candidates = mg.map(_.getLong(0)).toDF("_hh_cand")
    // Pass 2: exact counts over the ≤ `counters` candidate keys only.
    val verified = exactTopK(
      keyed.join(broadcast(candidates), col("_hh_key") === col("_hh_cand"), "left_semi"))
    // Certificate (a): no decrement ever ran (Σ mg counts == n), so the
    // summary holds EVERY distinct key with exact counts — pass 2's top-k
    // is exact regardless of the frequency bound.
    if (mg.iterator.map(_.getLong(1)).sum == n) return verified
    // Certificate (b): the k-th exact candidate count clears the MG bound
    // — any key absent from the summary has true frequency
    // ≤ n/(counters+1) < k-th count, so no true top-k key was missed.
    val top = verified.collect()
    if (top.length == k && top.last.getLong(1) * (counters + 1L) > n) {
      verified
    } else {
      logWarning(s"heavy-hitters: MG guarantee not met for top-$k " +
        s"(n=$n, counters=$counters, k-th count=" +
        s"${top.lastOption.map(_.getLong(1)).getOrElse(0L)}); " +
        "falling back to a full exact group-by — size `counters` larger " +
        "to keep the two-pass path")
      exactTopK(keyed)
    }
  }
}
