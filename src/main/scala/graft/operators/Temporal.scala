package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively. Composed from existing
  * relational primitives (the brief's preference order: compose before
  * custom plans) in the shape that survives scale.
  */
object Temporal {

  private val asofInternal =
    Seq("_asof_tag", "_asof_v", "_asof_c", "_asof_s", "_asof_in",
      "_asof_in_k", "_asof_in_s", "_asof_rk", "_asof_rs")

  /** Backward as-of join: for every left row, attach the `carry` columns
    * of the LATEST right row with `right.ts <= left.ts` in the same key
    * group (nulls when no prior right row exists) — the point-in-time
    * lookup of market-data and feature-store pipelines. Right rows with a
    * NULL timestamp never match (the SQL ASOF contract); left rows with a
    * NULL timestamp carry nulls.
    *
    * Plan shape: right rows are tagged, unioned with the left, and
    * resolved with ONE per-key window pass (`last(_, ignoreNulls)` over
    * rows up to the current one). The ordering (ts, tag, carry-struct)
    * makes right rows sort before left rows on ts ties (matching `<=`)
    * and resolves duplicate right timestamps deterministically to the
    * max carry struct — no dedup aggregation, so the only exchange at any
    * scale is the window's hash partition on the key (spec-pinned); never
    * the O(|L|·|R|) blow-up of the naive range-join formulation. Skewed
    * keys ride on AQE like any other window.
    *
    * `carry` names must not collide with left columns.
    *
    * Skew escape hatch: AQE splits skewed JOIN partitions but NOT skewed
    * window partitions, so one key holding most rows serializes into one
    * task. `saltSpanSec` salts each key into contiguous time ranges of
    * that many seconds: the window runs per (key, range), and a tiny
    * per-(key, range) summary relation (one row per non-empty range,
    * broadcast back) supplies the carry-in for left rows whose latest
    * right row lives in an earlier range. Results are identical to the
    * unsalted plan (spec: randomized equivalence under 90 % single-key
    * skew); unsalted keys keep the single-shuffle plan (default).
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, carry: Seq[String],
      saltSpanSec: Option[Long] = None,
      toleranceSec: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(carry.nonEmpty, "asofJoin: nothing to carry")
    require(carry.forall(c => !left.columns.contains(c)),
      s"asofJoin: carry columns ${carry.mkString(",")} collide with the left side")
    require(asofInternal.forall(c =>
      !left.columns.contains(c) && !right.columns.contains(c)),
      s"asofJoin: inputs must not use reserved columns ${asofInternal.mkString(",")}")
    require(saltSpanSec.forall(_ > 0), "asofJoin: saltSpanSec must be positive")
    require(toleranceSec.forall(_ >= 0), "asofJoin: toleranceSec must be >= 0")
    // direction = "forward": EARLIEST following-or-equal right row
    // (merge_asof's direction='forward') — the same single-window plan
    // traversed in descending ts. Only the traversal flips: right rows
    // still sort before left on ts ties (>= includes equal), duplicate
    // right timestamps still resolve to the max carry struct, and the
    // tolerance bound becomes matched.ts − left.ts. The salted summary's
    // carry-in would need a following-ranges formulation — not built yet,
    // so forward requires the unsalted plan.
    require(direction == "backward" || direction == "forward",
      s"asofJoin: direction must be backward|forward, got $direction")
    require(direction == "backward" || saltSpanSec.isEmpty,
      "asofJoin: forward direction does not support saltSpanSec")
    val forward = direction == "forward"
    val leftCols = left.columns.toSeq
    // Tolerance (pandas merge_asof's `tolerance`): the matched right ts
    // rides INSIDE the carry struct (as its first field) so the bound
    // `left.ts - matched.ts <= tol` can be applied AFTER resolution —
    // a match found but out of tolerance yields nulls, exactly like no
    // match. The extra field cannot disturb tie resolution: structs
    // only compare on equal (ts, tag), where the embedded ts is equal
    // too, so ordering falls through to the carry fields as before.
    val carryStruct =
      if (toleranceSec.isDefined)
        struct(col(tsCol).as("_asof_mts") +: carry.map(col): _*)
      else struct(carry.map(col): _*)
    def carryOut(resolved: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] =
      toleranceSec match {
        case Some(tol) =>
          val staleness =
            if (forward)
              resolved.getField("_asof_mts").cast("double") - col(tsCol).cast("double")
            else
              col(tsCol).cast("double") - resolved.getField("_asof_mts").cast("double")
          carry.map(c =>
            when(staleness <= tol.toDouble, resolved.getField(c))
              .otherwise(lit(null)).as(c))
        case None => carry.map(c => resolved.getField(c).as(c))
      }
    val r = right
      .filter(col(tsCol).isNotNull) // NULL ts never matches
      .select(col(keyCol), col(tsCol), carryStruct.as("_asof_v"))
      .withColumn("_asof_tag", lit(0))
    val l = left.withColumn("_asof_tag", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)

    saltSpanSec match {
      case None =>
        val tsOrd = if (forward) col(tsCol).desc else col(tsCol).asc
        val w = Window.partitionBy(keyCol)
          .orderBy(tsOrd, col("_asof_tag"), col("_asof_v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        u.withColumn("_asof_c", last(col("_asof_v"), ignoreNulls = true).over(w))
          .filter(col("_asof_tag") === 1)
          .select(leftCols.map(col) ++ carryOut(col("_asof_c")): _*)

      case Some(span) =>
        // Contiguous time-range salt; NULL left timestamps form their own
        // (empty-carry) group, matching the unsalted nulls-first ordering.
        def saltOf(ts: org.apache.spark.sql.Column) =
          floor(ts.cast("double") / span.toDouble)
        val salted = u.withColumn("_asof_s", saltOf(col(tsCol)))
        val w = Window.partitionBy(col(keyCol), col("_asof_s"))
          .orderBy(col(tsCol), col("_asof_tag"), col("_asof_v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // Summary: one row per OCCUPIED (key, range) — including ranges
        // holding only left rows, which must still receive carry from
        // earlier ranges. Each range's right-side latest (ts, value) comes
        // from a struct max (reproducing the main window's (ts, _asof_v)
        // tie resolution); the running last over strictly-prior ranges is
        // the range's carry-in. |summary| = keys × occupied ranges —
        // broadcastable at any skew.
        val wPrior = Window.partitionBy(keyCol).orderBy(col("_asof_s"))
          .rowsBetween(Window.unboundedPreceding, -1)
        // Null-safe joins throughout: the unsalted Window.partitionBy puts
        // NULL keys in one partition, so NULL-key rows must keep matching
        // their ranges here too (a Seq-using join would drop them).
        val rightLast = r.withColumn("_asof_s", saltOf(col(tsCol)))
          .groupBy(col(keyCol), col("_asof_s"))
          .agg(max(struct(col(tsCol), col("_asof_v"))).as("_bucket_last"))
          .select(col(keyCol).as("_asof_rk"), col("_asof_s").as("_asof_rs"),
            col("_bucket_last"))
        val summary = salted.select(col(keyCol), col("_asof_s")).distinct()
          .join(rightLast,
            col(keyCol) <=> col("_asof_rk") && col("_asof_s") <=> col("_asof_rs"),
            "left")
          .withColumn("_asof_in",
            last(col("_bucket_last"), ignoreNulls = true).over(wPrior)
              .getField("_asof_v"))
          .select(col(keyCol).as("_asof_in_k"), col("_asof_s").as("_asof_in_s"),
            col("_asof_in"))
        // Null-safe key compare: the unsalted Window.partitionBy groups NULL
        // keys into one partition, so NULL-key left rows must still receive
        // cross-range carry-in here.
        salted
          .withColumn("_asof_c", last(col("_asof_v"), ignoreNulls = true).over(w))
          .filter(col("_asof_tag") === 1)
          .join(broadcast(summary),
            col(keyCol) <=> col("_asof_in_k") &&
              col("_asof_s") <=> col("_asof_in_s"),
            "left")
          // Struct-level coalesce: a chosen in-range row whose carry FIELD
          // is null must yield null, not an earlier range's value.
          .select(leftCols.map(col) ++
            carryOut(coalesce(col("_asof_c"), col("_asof_in"))): _*)
    }
  }

  /** Range (interval) join: candidate pairs where
    * `left.ts - lookbackSec < right.ts <= left.ts` within the same key —
    * the sliding-lookback join of sessionized feature pipelines.
    *
    * Plan shape: both sides bucket their timestamps into lookback-sized
    * windows; a left row's matches can only live in its own or the
    * previous bucket, so candidates come from an EQUI-join on
    * (key, bucket) followed by the exact interval filter. One hash
    * shuffle at any scale — Spark's native plan for this predicate is a
    * nested-loop/cartesian per key. Returns INNER candidates (left
    * columns + `carry` from the right); callers add left-ness as needed.
    */
  private val rangeInternal = Seq("_rj_b", "_rj_k", "_rj_ts")

  def rangeJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, lookbackSec: Long,
      carry: Seq[String]): DataFrame = {
    require(lookbackSec > 0, "rangeJoin: lookbackSec must be positive")
    require(carry.forall(c => !left.columns.contains(c)),
      s"rangeJoin: carry columns ${carry.mkString(",")} collide with the left side")
    require(rangeInternal.forall(c =>
      !left.columns.contains(c) && !right.columns.contains(c)),
      s"rangeJoin: inputs must not use reserved columns ${rangeInternal.mkString(",")}")
    val leftCols = left.columns.toSeq
    val w = lit(lookbackSec.toDouble)
    val lsec = col(tsCol).cast("double")
    val l = left.withColumn("_rj_b",
      explode(array_distinct(array(floor((lsec - w) / w), floor(lsec / w)))))
    val r = right.select(
      col(keyCol).as("_rj_k") +: col(tsCol).as("_rj_ts") +: carry.map(col): _*)
      .withColumn("_rj_b", floor(col("_rj_ts").cast("double") / w))
    l.join(r,
        col(keyCol) === col("_rj_k") && l("_rj_b") === r("_rj_b"))
      .filter(col("_rj_ts") <= col(tsCol) &&
        col("_rj_ts") > col(tsCol) - expr(s"INTERVAL '$lookbackSec' SECOND"))
      .select((leftCols ++ carry).map(col): _*)
  }

  /** Weekly retention cohorts: each key's cohort is the epoch-week of
    * its first `anchorType` event; for every (cohort_week, week_offset)
    * cell, the number of DISTINCT keys with ANY activity in that offset
    * week at or after their anchor. Pure integer epoch arithmetic —
    * engine-portable with no timezone or calendar dependence (cohorts
    * are epoch-week buckets, not calendar weeks).
    *
    * Shape: one per-key min-aggregate for anchors, one key-equi join to
    * tag activity, a (key, cohort, offset) distinct, and one final
    * partial-aggregated count — every shuffle keyed on the key or the
    * small (cohort, offset) pair.
    */
  def retention(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, anchorType: String,
      bucketSec: Long = 604800L): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    val anchors = events.filter(col(typeCol) === anchorType)
      .groupBy(keyCol).agg(min(col(tsCol)).as("_t0"))
    events.join(anchors, keyCol)
      .filter(col(tsCol) >= col("_t0"))
      .select(col(keyCol),
        floor(col("_t0").cast("long") / bucketSec).cast("long").as("cohort_week"),
        floor((col(tsCol).cast("long") - col("_t0").cast("long")) / bucketSec)
          .cast("long").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered event funnel with GREEDY-EARLIEST semantics: per key, step
    * 1's match is the earliest step-1 event, step i's match is the
    * earliest step-i event strictly after step i−1's match, and the key
    * CONVERTS iff the last match lands within `withinSec` of the first.
    * Greedy-earliest is deterministic and engine-replayable (the same
    * chain falls out of any SQL re-derivation); it can under-count
    * against an optimal-window matcher when a later step-1 event starts
    * a tighter chain — the standard funnel-analytics trade, documented
    * here rather than hidden.
    *
    * Returns one row per key that reached step 1:
    * (key, t_1 … t_n, converted). Shape: n−1 per-key min-aggregates,
    * each one partial-aggregated shuffle on the key followed by a
    * key-equi join — no windows, no per-key sort, state per key is one
    * timestamp per stage regardless of event volume.
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], withinSec: Long): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    require(withinSec > 0, s"withinSec must be positive, got $withinSec")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(keyCol).agg(min(col(tsCol)).as("t_1"))
    // One relation per reached stage; each left-joins back so DROP-OFF
    // keys (reached stage i, never stage i+1) survive with null tails.
    val stageRels = scala.collection.mutable.ArrayBuffer(first)
    steps.zipWithIndex.tail.foreach { case (step, i) =>
      val prev = s"t_$i"; val cur = s"t_${i + 1}"
      stageRels += stageRels.last
        .join(events.filter(col(typeCol) === step)
          .select(col(keyCol), col(tsCol).as("_ft")), keyCol)
        .filter(col("_ft") > col(prev))
        .groupBy((keyCol +: (1 to i).map(j => s"t_$j")).map(col): _*)
        .agg(min(col("_ft")).as(cur))
    }
    // Stage i+1 carries stage i's full column set with identical values
    // (same deterministic chain), so the using-columns left join attaches
    // each deeper stage exactly to its own prefix.
    val full = stageRels.tail.foldLeft(first) { (res, st) =>
      res.join(st, res.columns.toSeq, "left")
    }
    full.withColumn("converted",
      col(s"t_${steps.size}").isNotNull &&
        col(s"t_${steps.size}").cast("long") - col("t_1").cast("long")
          <= withinSec)
  }
}
