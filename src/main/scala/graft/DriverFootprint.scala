package graft

import java.lang.management.{ManagementFactory, MemoryType}
import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Driver-side memory accounting for the bench laps (r19 verdict #2:
  * "18 bounded collect() sites" was a contractual claim, not a measured
  * one). Two complementary signals per entry:
  *
  *   - `resultBytes`: task-result bytes shipped to the driver, summed
  *     from every task's `resultSize` metric via a SparkListener. This
  *     is the precise O(n)-vs-O(k) discriminator: an operator whose
  *     driver ingress scales with the corpus is collecting data, not
  *     `O(centroids + top-k)` summaries — and the signal is immune to
  *     the executor-side heap noise that a plain used-heap poll picks
  *     up in local mode (driver and executors share one JVM here).
  *   - `heapPeakBytes`: JVM heap high-water over the lap, from
  *     per-pool peak-usage counters (reset before each lap). Coarse in
  *     local mode for the reason above, but it is the number that
  *     actually OOMs, so it belongs in the record alongside the clean
  *     signal.
  *
  * Listener events are delivered asynchronously; `snapshot()` settles
  * by polling the event counter until it stops moving.
  */
object DriverFootprint {
  private val resultBytes = new LongAdder
  private val bcastBytes = new LongAdder
  private val taskEvents = new LongAdder
  // Stages belonging to broadcast-exchange build jobs (their task
  // results ARE the broadcast relation shipped to the driver — a
  // legitimate, autoBroadcastJoinThreshold-bounded ingress class that
  // must not be conflated with a collect() regression). Keyed by
  // stageId; cleared on reset.
  private val bcastStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  @volatile private var installed = false

  private object listener extends SparkListener {
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      // A broadcast build job carries the BroadcastExchange RDD scope
      // (measured on Spark 4.1: the description property is NOT set on
      // these jobs — the scope is the reliable marker).
      val scope = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.rdd.scope")))
        .getOrElse("")
      if (scope.contains("\"BroadcastExchange\""))
        j.stageIds.foreach(id => bcastStages.add(id): Unit)
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      taskEvents.increment()
      Option(t.taskMetrics).foreach { m =>
        if (bcastStages.contains(t.stageId)) bcastBytes.add(m.resultSize)
        else resultBytes.add(m.resultSize)
      }
    }
  }

  def install(s: SparkSession): Unit = synchronized {
    if (!installed) {
      s.sparkContext.addSparkListener(listener)
      installed = true
    }
  }

  private def heapPools = {
    import scala.jdk.CollectionConverters._
    ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.isValid && p.getType == MemoryType.HEAP)
  }

  /** Zero the counters and the per-pool peaks. Call before a lap. */
  def reset(): Unit = {
    settle()
    resultBytes.reset()
    bcastBytes.reset()
    bcastStages.clear()
    taskEvents.reset()
    heapPools.foreach(p =>
      try p.resetPeakUsage()
      catch { case _: UnsupportedOperationException => () })
  }

  /** Wait for the async listener bus to drain: poll the event counter
    * until it holds still for two consecutive 50 ms windows (bounded at
    * 2 s — a lap's stragglers land within that or the lap itself was
    * still running).
    */
  private def settle(): Unit = {
    var last = taskEvents.sum()
    var stable = 0
    var waited = 0
    while (stable < 2 && waited < 2000) {
      Thread.sleep(50)
      waited += 50
      val now = taskEvents.sum()
      if (now == last) stable += 1 else { stable = 0; last = now }
    }
  }

  /** (task-result bytes shipped to the driver, heap high-water bytes)
    * since the last `reset()`.
    */
  def snapshot(): (Long, Long) = {
    settle()
    val peak = heapPools.map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L)).sum
    (resultBytes.sum(), peak)
  }

  /** Tasks completed since the last `reset()` — the denominator that
    * separates "more tasks, each shipping ~KBs of metrics" (iterative
    * fan-out, harmless: bytes arrive, are folded into listener state,
    * and are garbage) from "each task shipping more data" (a collect
    * whose per-task payload grows with the corpus — the real driver-OOM
    * shape). `reset()` zeroes it AFTER settling, so the count is
    * lap-scoped like the byte counters.
    */
  def tasks(): Long = { settle(); taskEvents.sum() }

  /** Broadcast-exchange build bytes shipped to the driver since the
    * last `reset()` — the class bounded by autoBroadcastJoinThreshold
    * (Spark plans a shuffle join instead once a side outgrows it), kept
    * separate so the collect()-regression gate doesn't false-positive
    * on iterative loops whose small-side relations auto-broadcast each
    * round.
    */
  def broadcastBytes(): Long = { settle(); bcastBytes.sum() }
}
