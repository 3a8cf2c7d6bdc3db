package graft

import org.scalatest.funsuite.AnyFunSuite

/** Measured driver-memory gate (r19 verdict #2): the "every collect()
  * site is contractually bounded" claim becomes a number. For each
  * entry that funds an internal driver-side collect (centroid seeds,
  * PQ codebooks, BPE merge rounds, component convergence checks,
  * heavy-hitter summaries), run the REAL entry at sf0.01 and sf0.1
  * (10× documents / 10× events / 4× embeddings) with the same
  * executor-evaluating materialization the bench uses, and assert the
  * task-result bytes shipped to the driver grow SUBLINEARLY — an
  * O(centroids + top-k) contract means ingress is roughly flat; a
  * regression to O(n) tracks the input growth and trips the ratio
  * bound. An absolute ceiling rides along because a ratio alone would
  * pass two equally-pathological laps.
  */
class DriverIngressGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Entries funding the audited collect sites. q_cusum rides along as
    * the pure-SQL control: its OUTPUT scales with events, so it proves
    * the materializer itself (toRdd evaluation on executors, no
    * driver collect) keeps ingress flat even when results are large.
    */
  private val gated = Seq("q_kmeans", "q_ann_ivf", "q_ann_pq", "q_semdedup",
    "q_dedup_components", "q_bpe_merges", "q_heavy_hitters", "q_cusum")

  private def materialize(df: org.apache.spark.sql.DataFrame): Unit = {
    df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
  }

  private def ingress(name: String, dir: String): (Long, Long, Long) = {
    DriverFootprint.install(spark)
    DriverFootprint.reset()
    materialize(Queries.queryMap(name)(spark, dir))
    graft.operators.OpCaches.releaseAll(spark)
    (DriverFootprint.snapshot()._1, DriverFootprint.broadcastBytes(),
      DriverFootprint.tasks())
  }

  test("collect-site driver ingress grows sublinearly with the corpus") {
    val rows = gated.map { n =>
      val (small, smallBc, _) = ingress(n, "/root/testdata/sf0.01")
      val (big, bigBc, bigTasks) = ingress(n, "/root/testdata/sf0.1")
      val ratio = if (small > 0) big.toDouble / small else 0.0
      val perTask = if (bigTasks > 0) big / bigTasks else 0L
      info(f"$n%-20s collect-ingress ${small >> 10}%6d KB -> ${big >> 10}%6d KB " +
        f"(x$ratio%.2f on x10 input, ${perTask >> 10}%d KB/task), " +
        f"broadcast-ingress ${smallBc >> 10}%d -> ${bigBc >> 10}%d KB")
      (n, big, bigBc, ratio, perTask)
    }
    rows.foreach { case (n, big, bigBc, ratio, perTask) =>
      // Ingress is split into two classes with different contracts:
      //   - broadcast-exchange builds (small-side relations shipped to
      //     the driver to build a broadcast): LEGITIMATELY scale with
      //     their relation up to autoBroadcastJoinThreshold, past which
      //     Spark plans a shuffle join instead — bounded per build by
      //     config, so the gate only caps the per-entry total (iterative
      //     loops rebuild each round).
      //   - everything else: the audited collect() sites. O(centroids +
      //     top-k) contracts mean this class stays roughly FLAT on 10×
      //     input; growth that decomposes into task fan-out (more
      //     rounds × partitions, each task shipping ~KBs of metrics,
      //     folded into listener state on arrival) is also fine. What
      //     must fail is per-task payload growth — the driver-OOM shape.
      assert(ratio <= 4.0 || perTask <= (16L << 10),
        s"$n non-broadcast driver ingress scaled with the corpus " +
          s"(x$ratio total, ${perTask >> 10} KB/task) — an internal " +
          "collect() site lost its O(centroids + top-k) bound")
      assert(big <= (64L << 20),
        s"$n shipped ${big >> 20} MB of non-broadcast results to the " +
          "driver at sf0.1 — over the 64 MB ceiling for a bounded-collect entry")
      assert(bigBc <= (48L << 20),
        s"$n built ${bigBc >> 20} MB of broadcasts in one lap at sf0.1 — " +
          "over the 48 MB budget (≈ threshold × a handful of rounds); " +
          "an iterative loop is broadcasting a relation that grows with the corpus")
    }
  }
}
