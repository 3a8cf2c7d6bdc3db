package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Salting for hot-key aggregation shapes — the skew technique AQE cannot
  * apply. AQE splits skewed JOIN partitions at runtime (PlanAuditSpec pins
  * that it fires), and plain sum/count group-bys are skew-immune already
  * (map-side partial combine shrinks every hot key before the exchange).
  * What remains exposed at 100 TB are aggregations whose per-key state
  * GROWS with the key's row count — collected sets, per-key top-k — where
  * one hot key funnels its entire row mass through one reducer.
  *
  * Both operators here split each key across `salts` deterministic
  * sub-keys (salt = hash of the VALUE, so a row's sub-key is stable and
  * the phase-1 spread is even), aggregate per (key, salt) in parallel,
  * then combine the per-salt partials per key — correct because both
  * aggregations are associative over value partitions: a distinct set is
  * the union of per-salt distinct sets, and a key's global top-k is
  * contained in the union of its per-salt top-ks. Phase-2 traffic is
  * pre-shrunk (deduped sets / k rows per salt), so the hot key's reducer
  * handles `salts × k`-ish rows, never its raw row count.
  */
object Skew {

  private def saltOf(value: Column, salts: Int): Column =
    pmod(xxhash64(value), lit(salts)).cast("int")

  /** Distinct values per key, hot-key-safe: phase 1 dedups per
    * (key, salt), phase 2 unions the per-salt sets. Output:
    * (key, values sorted array) — sorted so results are deterministic
    * and engine-comparable.
    */
  def collectSetSalted(
      df: DataFrame, keyCol: String, valCol: String,
      salts: Int = 16): DataFrame = {
    val perSalt = df
      .groupBy(col(keyCol), saltOf(col(valCol), salts).as("_salt"))
      .agg(collect_set(col(valCol)).as("_vals"))
    perSalt.groupBy(col(keyCol))
      .agg(array_sort(array_distinct(flatten(collect_list(col("_vals")))))
        .as(s"${valCol}_set"))
  }

  /** Top-k rows per key by `orderCol` descending (ties broken by
    * `tieCol` ascending), hot-key-safe: per-(key, salt) top-k first —
    * every salt partition is ~1/salts of the key's rows — then the exact
    * top-k over the surviving `salts × k` candidates per key. Output
    * matches the plain window formulation row-for-row (SkewSpec pins
    * equality).
    */
  def topKPerKeySalted(
      df: DataFrame, keyCol: String, orderCol: String, tieCol: String,
      k: Int, salts: Int = 16): DataFrame = {
    val wSalt = Window.partitionBy(col(keyCol), col("_salt"))
      .orderBy(col(orderCol).desc, col(tieCol))
    val candidates = df
      .withColumn("_salt", saltOf(col(tieCol), salts))
      .withColumn("_rs", row_number().over(wSalt))
      .filter(col("_rs") <= k)
      .drop("_salt", "_rs")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol).desc, col(tieCol))
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
