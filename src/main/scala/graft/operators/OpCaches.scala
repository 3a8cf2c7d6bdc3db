package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry for DataFrames the pipeline operators persist internally
  * (shingle/signature relations, LSH bucket relations). The persists are
  * load-bearing — downstream fan-outs must read a materialized column, not
  * recompute interpreted higher-order expressions per branch — but a
  * long-lived session must be able to drop them once the query's action
  * has completed (r2 kept them pinned for the life of the SparkSession;
  * the reference frees its per-query temporaries).
  *
  * Tracking is PER SparkSession (weakly keyed — an abandoned session's
  * entries become collectable), so releasing one session's caches never
  * unpersists relations another live session is still computing with.
  * Usage: operators wrap `persist()` in [[track]]; harnesses
  * (Verify/Bench/GraftSession) call [[releaseAll]] between queries.
  * Releasing never breaks a returned DataFrame — it just recomputes.
  */
object OpCaches {
  private val tracked =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Buffer[DataFrame]]()

  def track(df: DataFrame): DataFrame = tracked.synchronized {
    var buf = tracked.get(df.sparkSession)
    if (buf == null) {
      buf = scala.collection.mutable.Buffer.empty[DataFrame]
      tracked.put(df.sparkSession, buf)
    }
    buf += df
    df
  }

  def trackedCount(spark: SparkSession): Int = tracked.synchronized {
    Option(tracked.get(spark)).map(_.size).getOrElse(0)
  }

  /** Unpersist every cache the operators pinned under `spark`. */
  def releaseAll(spark: SparkSession): Unit = tracked.synchronized {
    val buf = tracked.remove(spark)
    if (buf != null) buf.foreach(_.unpersist(false))
  }
}
