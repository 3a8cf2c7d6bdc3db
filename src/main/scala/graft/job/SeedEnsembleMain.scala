package graft.job

import graft.enumerate.Enumerator
import graft.planner.{CompassSession, OptimizerQuality}
import org.apache.spark.sql.SparkSession

/** ESTIMATES §8 — seed-ensemble re-estimation of the enumerator's known
  * losing families (r19 verdict #6). The COMPASS estimator's variance
  * story: each Fast-AGMS estimate is a median over 73 independent rows,
  * but ONE seed-set still leaves correlated error across the prefixes of
  * one search — a family where the chosen order loses to the best-found
  * order may be mis-ranked by seed luck. This harness re-enumerates ONLY
  * the losing families (8a, 18a, 12a, 19a, 29a — ESTIMATES §6-7, plus
  * 13a/23a as the calibration-fixable controls) with K independent
  * seed-sets, taking the MEDIAN estimate per prefix (median of medians),
  * and A/Bs the chosen orders by Σ TRUE intermediate rows (spine-executed
  * numOutputRows, the §1-§3 methodology). Per-family it also prints the
  * cross-seed estimate spread of the shipping order's full prefix — the
  * measured variance the verdict asked for either way.
  *
  * Ship rule (from the verdict): flip a family at acceptable planning
  * cost (K× sketch jobs) with no family worse → wire the ensemble in;
  * otherwise this prints the negative result for ESTIMATES §8.
  *
  * Usage: `sbt "runMain graft.job.SeedEnsembleMain [K]"` (default K=5,
  * x1 JOB data — the scale the compass entry runs at).
  */
object SeedEnsembleMain {

  val LosingFamilies: Seq[String] =
    Seq("8a", "18a", "12a", "19a", "29a", "13a", "23a")

  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 5
    require(k >= 3 && k % 2 == 1, "K must be odd and >= 3 (median)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, k)
    finally spark.stop()
  }

  def run(spark: SparkSession, k: Int): Unit = {
    JobCorpus.ensureData(spark, 1)
    JobCorpus.registerViews(spark, 1)
    val byName = JobCorpus.queries.toMap
    // Distinct bases: index 0 is the shipping base so the ship-order
    // column reproduces the §6 choices exactly.
    val bases = CompassSession.DefaultSeedBase +:
      (1 until k).map(i => 0xA11CE000L + i * 0x9E3779B9L)
    val sessions = bases.map(b => new CompassSession(spark, seedBase = b))

    println(s"\n### §8 — seed-ensemble (K=$k) on the losing families\n")
    println("| q | ship order Σ true | ensemble order Σ true | flipped | " +
      "worst per-prefix cross-seed spread | plan ms 1-seed | plan ms K-seed |")
    println("|---|---|---|---|---|---|---|")

    var anyFlip = false
    var anyWorse = false
    LosingFamilies.foreach { fam =>
      val df = spark.sql(byName(fam))
      // K sketch sets over the same graph; time set 0 alone (the
      // shipping cost) and the whole ensemble build (the K-seed cost).
      val t0 = System.nanoTime()
      val (g, nodes0, edges) = sessions.head.sketchGraph(df)
      val oneSeedMs = (System.nanoTime() - t0) / 1000000
      val rest = sessions.tail.map { cs =>
        val (_, n, _) = cs.sketchGraph(spark.sql(byName(fam)))
        n
      }
      val kSeedMs = (System.nanoTime() - t0) / 1000000
      val nodeSets = nodes0 +: rest
      val enums = nodeSets.map(n => new Enumerator(n, edges))
      val shipOrder = enums.head.optimalOrder()._1
      val ensemble = new Enumerator(nodes0, edges, ensembleOf = enums)
      val ensOrder = ensemble.optimalOrder()._1

      val shipSum = OptimizerQuality.prefixRows(spark, g, shipOrder).sum
      val ensSum =
        if (ensOrder == shipOrder) shipSum
        else OptimizerQuality.prefixRows(spark, g, ensOrder).sum
      // Cross-seed estimate variance along the SHIP order — the number
      // the verdict asked to record either way. For each prefix
      // (sizes 2..n-1), the max/min estimate ratio across seed-sets;
      // the row reports the WORST prefix (size, min..max).
      val prefixSpreads = (2 until shipOrder.size).map { sz =>
        val p = shipOrder.take(sz)
        val xs = enums.map(e => math.max(e.estimate(p), 1.0)).sorted
        (sz, xs.head, xs.last, xs.last / xs.head)
      }
      // maxByOption (r21, ADVICE): a 2-table order has no interior
      // prefixes and the plain maxBy would throw on the empty seq.
      val spread = prefixSpreads.maxByOption(_._4)
        .map { case (wSz, wMin, wMax, wRatio) =>
          f"worst prefix $wSz: $wMin%.0f..$wMax%.0f (x$wRatio%.1f)" }
        .getOrElse("worst prefix: n/a (2-table order)")
      val flipped = ensOrder != shipOrder
      anyFlip ||= flipped && ensSum < shipSum
      anyWorse ||= ensSum > shipSum
      println(s"| $fam | $shipSum | $ensSum | ${if (flipped) "YES" else "no"} " +
        s"| $spread | $oneSeedMs | $kSeedMs |")
    }
    println()
    println(
      if (anyWorse) "VERDICT: ensemble made a family WORSE — do not ship."
      else if (anyFlip) "VERDICT: ensemble flipped a family to a better order " +
        "with none worse — candidate to ship (check planning cost column)."
      else "VERDICT: no family flipped — the losses are not seed variance; " +
        "negative result recorded.")
  }
}
