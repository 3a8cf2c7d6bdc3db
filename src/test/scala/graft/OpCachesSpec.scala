package graft

import graft.operators.OpCaches
import org.scalatest.funsuite.AnyFunSuite

/** The r22 checkpoint-release discipline (ADVICE): a
  * `Queries.checkpointedView` must not outlive its entry — the temp view
  * pins the localCheckpoint RDD's MEMORY_AND_DISK blocks in the session
  * catalog, and before r22 a full Bench/Verify lap accumulated ~14 such
  * relations for the JVM's life.
  */
class OpCachesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("checkpointedView releases its view AND its checkpoint blocks on releaseAll") {
    OpCaches.releaseAll(spark) // start from a clean slate
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = Queries.checkpointedView(spark, "graft_opcaches_probe",
      "SELECT id, id * 2 AS y FROM range(100)")
    assert(df.count() == 100)
    // The view resolves and the checkpoint's blocks are persisted.
    assert(spark.catalog.tableExists("graft_opcaches_probe"))
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "localCheckpoint must persist its internal RDD")
    assert(OpCaches.trackedCount(spark) > 0)

    OpCaches.releaseAll(spark)
    assert(!spark.catalog.tableExists("graft_opcaches_probe"),
      "the temp view must be dropped between entries")
    val remaining = spark.sparkContext.getPersistentRDDs.keySet intersect added
    assert(remaining.isEmpty,
      s"checkpoint blocks still pinned after releaseAll: $remaining")
    assert(OpCaches.trackedCount(spark) == 0)
  }

  test("releaseAll tolerates a view already dropped by the entry itself") {
    OpCaches.releaseAll(spark)
    Queries.checkpointedView(spark, "graft_opcaches_probe2",
      "SELECT id FROM range(10)")
    spark.catalog.dropTempView("graft_opcaches_probe2")
    OpCaches.releaseAll(spark) // must not throw
    assert(OpCaches.trackedCount(spark) == 0)
  }
}
