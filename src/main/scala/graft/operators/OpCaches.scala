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
  // Checkpointed relations (r22, ADVICE): Dataset.unpersist() is a
  // CacheManager no-op for a checkpoint-backed Dataset — its blocks
  // belong to the internal RDD behind the LogicalRDD leaf — and the temp
  // view it registers pins that RDD in the session catalog for the
  // session's life. Both are released here: dropTempView frees the
  // catalog reference, and the LogicalRDD's RDD is unpersisted directly
  // so the MEMORY_AND_DISK blocks go now, not at an eventual GC.
  private val checkpointed = scala.collection.mutable.Map
    .empty[SparkSession, scala.collection.mutable.Buffer[(Option[String], DataFrame)]]

  private def sweepStopped(): Unit = {
    tracked.filterInPlace((s, _) => !s.sparkContext.isStopped)
    checkpointed.filterInPlace((s, _) => !s.sparkContext.isStopped)
  }

  def track(df: DataFrame): DataFrame = tracked.synchronized {
    sweepStopped()
    tracked.getOrElseUpdate(df.sparkSession,
      scala.collection.mutable.Buffer.empty[DataFrame]) += df
    df
  }

  /** Register a checkpoint-backed DataFrame (and the temp view that pins
    * it, if any) for release between entries — same discipline as
    * [[track]], different release mechanics (see `checkpointed` above).
    */
  def trackCheckpoint(df: DataFrame, viewName: Option[String] = None): DataFrame =
    tracked.synchronized {
      sweepStopped()
      checkpointed.getOrElseUpdate(df.sparkSession,
        scala.collection.mutable.Buffer.empty[(Option[String], DataFrame)]) +=
        ((viewName, df))
      df
    }

  def trackedCount(spark: SparkSession): Int = tracked.synchronized {
    tracked.get(spark).map(_.size).getOrElse(0) +
      checkpointed.get(spark).map(_.size).getOrElse(0)
  }

  /** Unpersist every cache the operators pinned under `spark`. */
  def releaseAll(spark: SparkSession): Unit = tracked.synchronized {
    sweepStopped()
    tracked.remove(spark).foreach(_.foreach(_.unpersist(false)))
    checkpointed.remove(spark).foreach(_.foreach { case (view, df) =>
      view.foreach(v => df.sparkSession.catalog.dropTempView(v): Unit)
      df.queryExecution.logical match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(false): Unit
        case _ => () // reliable (dir-based) checkpoint: no blocks to drop
      }
    })
  }
}
