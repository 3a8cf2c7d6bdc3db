package graft

import graft.planner.{CompassSession, OptimizerQuality, SketchTemplateCache}
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer-quality contract behind q_compass_quality: on JOB-shaped
  * workloads the sketch-chosen order's TRUE intermediate-row sum must not
  * exceed the stock size-descending baseline's.
  */
class OptimizerQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // One source of truth with the driver entry (q_compass_quality) plus
  // the 9-way diamond regression pin — see OptimizerQuality.specFamilies.
  private val families = OptimizerQuality.specFamilies

  test("full-shape battery: no catastrophic order on ANY compass workload shape") {
    // Query-over-query guard across the whole entry workload, not just the
    // structural families: near-tie shapes (a 3-table filtered chain, the
    // nation triangle) may legitimately land slightly above the stock
    // baseline under estimator noise, so the bound here is 2x — loose
    // enough for ties, tight enough that a degenerate-estimate regression
    // (the 9-way diamond measured 8x) fails loudly.
    val shapes = Seq(
      "star" -> ("SELECT count(*) AS n FROM lineitem, orders, part, supplier " +
        "WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey " +
        "AND l_suppkey = s_suppkey AND o_orderpriority = '1-URGENT' AND p_size <= 10"),
      "filtered3" -> ("SELECT count(*) AS n FROM lineitem, orders, customer " +
        "WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey " +
        "AND o_totalprice > 200000 AND c_mktsegment = 'BUILDING' AND l_quantity > 10"),
      "cycle5" -> ("SELECT count(*) AS n FROM lineitem, orders, customer, nation, supplier " +
        "WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey " +
        "AND c_nationkey = n_nationkey AND s_nationkey = n_nationkey " +
        "AND l_suppkey = s_suppkey AND o_totalprice > 150000"),
      "tri" -> ("SELECT count(*) AS n FROM supplier, customer, nation " +
        "WHERE s_nationkey = n_nationkey AND c_nationkey = n_nationkey " +
        "AND s_nationkey = c_nationkey AND n_name LIKE 'A%' AND s_acctbal > 0"),
      "sixway" -> ("SELECT count(*) AS n FROM lineitem, orders, customer, nation, region, supplier " +
        "WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey " +
        "AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey " +
        "AND l_suppkey = s_suppkey AND o_totalprice > 250000 AND s_acctbal > 2000"),
      "eightway" -> ("SELECT count(*) AS n FROM lineitem, orders, customer, " +
        "nation n1, supplier, nation n2, region, part " +
        "WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey " +
        "AND c_nationkey = n1.n_nationkey AND l_suppkey = s_suppkey " +
        "AND s_nationkey = n2.n_nationkey " +
        "AND n1.n_regionkey = r_regionkey AND n2.n_regionkey = r_regionkey " +
        "AND l_partkey = p_partkey " +
        "AND o_totalprice > 200000 AND p_size <= 15 AND r_name = 'ASIA'"))
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val cs = new CompassSession(spark,
      templateCache = Some(SketchTemplateCache.default()))
    try {
      val reports = shapes.map { case (shape, text) =>
        val r = OptimizerQuality.compare(spark, cs, shape, text)
        info(s"$shape: compass=${r.compassSum} naive=${r.naiveSum}")
        r
      }
      val bad = reports.filter(r => r.compassSum > 2L * r.naiveSum + 100)
      assert(bad.isEmpty, s"catastrophic orders: ${bad.map(r =>
        s"${r.family} ${r.compassSum} vs ${r.naiveSum}")}")
      // And across the battery compass must WIN in aggregate, not merely
      // avoid catastrophe.
      assert(reports.map(_.compassSum).sum <= reports.map(_.naiveSum).sum,
        "compass lost to stock in aggregate across the battery")
    } finally cs.close()
  }

  test("estimator telemetry: prefix estimates track true rows on chain5/snowflake4") {
    // The order comparison can stay green while the estimator silently
    // rots (both orders mis-ranked by the same decaying numbers) — this
    // pins the ACCURACY itself. chain5/snowflake4 are the stable
    // seed-aligned pairwise + cascade shapes; per-prefix est/true ratios
    // (floored at 1 row on both sides) must stay inside a band wide
    // enough for the independence assumption, narrow enough that clamp
    // noise (~0 estimates) or a broken plane (10^3x off) fails loudly.
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val cs = new CompassSession(spark,
      templateCache = Some(SketchTemplateCache.default()))
    try {
      Seq("chain5", "snowflake4").foreach { fam =>
        val text = OptimizerQuality.families.toMap.apply(fam)
        val pts = OptimizerQuality.estimateTelemetry(spark, cs, fam, text)
        info(s"$fam: " + pts.map(p =>
          f"|${p.prefixSize}|: est=${p.estimate}%.1f true=${p.trueRows} r=${p.ratio}%.3f").mkString(" "))
        assert(pts.nonEmpty, s"$fam: no prefix telemetry")
        // Liveness: a dead metrics read (all-zero trueRows) must fail.
        assert(pts.map(_.trueRows).sum > 0,
          s"$fam: all prefixes measured 0 rows — metrics not read from the executed plan?")
        val ratios = pts.map(_.ratio).sorted
        val median = ratios(ratios.size / 2)
        assert(median >= 0.02 && median <= 50.0,
          s"$fam: median est/true ratio $median outside [0.02, 50] — estimator drift")
        ratios.foreach { r =>
          assert(r >= 1e-3 && r <= 1e3,
            s"$fam: a prefix ratio $r outside [1e-3, 1e3] — clamp noise or broken plane")
        }
      }
    } finally cs.close()
  }

  test("compass order's true intermediate sum <= stock order's, per family") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val cs = new CompassSession(spark,
      templateCache = Some(SketchTemplateCache.default()))
    try {
      families.foreach { case (fam, text) =>
        val r = OptimizerQuality.compare(spark, cs, fam, text)
        info(s"$fam: compass=${r.compassSum} naive=${r.naiveSum} " +
          s"order=${cs.lastPlan.map(_.order.mkString("->")).getOrElse("?")}")
        assert(r.compassLeNaive,
          s"$fam: compass ${r.compassSum} > naive ${r.naiveSum}")
        // The measurement must be LIVE: every family's naive order has
        // non-empty intermediates at sf0.001, so an all-zero sum means
        // the join metrics were read from an unexecuted plan (the
        // r7 regression this guards) — compassLeNaive would then pass
        // vacuously on 0 <= 0.
        assert(r.naiveSum > 0,
          s"$fam: naive prefix sum is zero — metrics not read from the executed plan?")
      }
    } finally cs.close()
  }
}
