package graft.operators

import org.apache.spark.sql.DataFrame

/** Registry for DataFrames the pipeline operators persist internally
  * (shingle/signature relations, LSH bucket relations). The persists are
  * load-bearing — downstream fan-outs must read a materialized column, not
  * recompute interpreted higher-order expressions per branch — but a
  * long-lived session must be able to drop them once the query's action
  * has completed (r2 kept them pinned for the life of the SparkSession;
  * the reference frees its per-query temporaries).
  *
  * Usage: operators wrap `persist()` in [[track]]; harnesses
  * (Verify/Bench/GraftSession) call [[releaseAll]] between queries.
  * Releasing never breaks a returned DataFrame — it just recomputes.
  */
object OpCaches {
  private val tracked = scala.collection.mutable.Buffer.empty[DataFrame]

  def track(df: DataFrame): DataFrame = synchronized { tracked += df; df }

  def trackedCount: Int = synchronized(tracked.size)

  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist(false))
    tracked.clear()
  }
}
