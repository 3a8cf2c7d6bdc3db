package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively. Composed from existing
  * relational primitives (the brief's preference order: compose before
  * custom plans) in the shape that survives scale.
  */
object Temporal {

  /** Backward as-of join: for every left row, attach the `carry` columns
    * of the LATEST right row with `right.ts <= left.ts` in the same key
    * group (nulls when no prior right row exists) — the point-in-time
    * lookup of market-data and feature-store pipelines.
    *
    * Plan shape: right rows are deduplicated per (key, ts) (max struct —
    * deterministic), tagged, unioned with the left, and resolved with ONE
    * per-key window pass (`last(_, ignoreNulls)` over rows up to the
    * current one; right rows sort before left rows on ts ties, matching
    * `<=`). That is a single shuffle on the key at any scale — never the
    * O(|L|·|R|) blow-up of the naive range-join formulation. Skewed keys
    * ride on AQE like any other window.
    *
    * `carry` names must not collide with left columns.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, carry: Seq[String]): DataFrame = {
    require(carry.nonEmpty, "asofJoin: nothing to carry")
    require(carry.forall(c => !left.columns.contains(c)),
      s"asofJoin: carry columns ${carry.mkString(",")} collide with the left side")
    val leftCols = left.columns.toSeq
    val r = right
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(struct(carry.map(col): _*)).as("_asof_v"))
      .withColumn("_asof_tag", lit(0))
    val l = left.withColumn("_asof_tag", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("_asof_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("_asof_c", last(col("_asof_v"), ignoreNulls = true).over(w))
      .filter(col("_asof_tag") === 1)
      .select(leftCols.map(col) ++
        carry.map(c => col("_asof_c").getField(c).as(c)): _*)
  }
}
