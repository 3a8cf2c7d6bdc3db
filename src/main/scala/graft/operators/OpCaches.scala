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
  * Tracking is PER SparkSession, so releasing one session's caches never
  * unpersists relations another live session is still computing with.
  * References are STRONG — a weak key could never be collected anyway
  * (a Dataset value strongly references its own SparkSession, the
  * self-reference WeakHashMap's javadoc warns about), and a weak VALUE
  * could let the wrapper be collected while its RDD stays cached,
  * making the cache unreleasable. Instead, entries for STOPPED sessions
  * (whose cached RDDs are already gone) are swept on every call, so an
  * abandoned-then-stopped session cannot leak for the JVM's life.
  * Usage: operators wrap `persist()` in [[track]]; harnesses
  * (Verify/Bench/GraftSession) call [[releaseAll]] between queries.
  * Releasing never breaks a returned DataFrame — it just recomputes.
  */
object OpCaches {
  private val tracked = scala.collection.mutable.Map
    .empty[SparkSession, scala.collection.mutable.Buffer[DataFrame]]

  private def sweepStopped(): Unit =
    tracked.filterInPlace((s, _) => !s.sparkContext.isStopped)

  def track(df: DataFrame): DataFrame = tracked.synchronized {
    sweepStopped()
    tracked.getOrElseUpdate(df.sparkSession,
      scala.collection.mutable.Buffer.empty[DataFrame]) += df
    df
  }

  def trackedCount(spark: SparkSession): Int = tracked.synchronized {
    tracked.get(spark).map(_.size).getOrElse(0)
  }

  /** Unpersist every cache the operators pinned under `spark`. */
  def releaseAll(spark: SparkSession): Unit = tracked.synchronized {
    sweepStopped()
    tracked.remove(spark).foreach(_.foreach(_.unpersist(false)))
  }
}
