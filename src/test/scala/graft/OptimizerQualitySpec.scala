package graft

import graft.planner.{CompassSession, OptimizerQuality, SketchTemplateCache}
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer-quality contract behind q_compass_quality: on JOB-shaped
  * workloads the sketch-chosen order's TRUE intermediate-row sum must not
  * exceed the stock size-descending baseline's.
  */
class OptimizerQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val families = Seq(
    "chain5" -> ("SELECT count(*) AS n FROM lineitem " +
      "JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'"),
    "snowflake4" -> ("SELECT count(*) AS n FROM orders, customer, nation, region " +
      "WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey " +
      "AND n_regionkey = r_regionkey AND r_name IN ('EUROPE', 'ASIA') " +
      "AND o_totalprice > 50000"),
    "job7cycle" -> ("SELECT count(*) AS n FROM lineitem, orders, customer, nation, region, supplier, part " +
      "WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey " +
      "AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey " +
      "AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey " +
      "AND l_partkey = p_partkey " +
      "AND o_totalprice > 250000 AND p_size <= 25 AND r_name <> 'AFRICA'"),
    // The 9-way region diamond — the shape where degenerate multiway
    // estimates once picked an 8x-worse-than-stock order (fixed by the
    // cascade fallback; this row is the regression pin).
    "nine" -> ("SELECT count(*) AS n FROM lineitem l1, lineitem l2, orders, customer, " +
      "nation n1, supplier, nation n2, region, part " +
      "WHERE l1.l_orderkey = l2.l_orderkey AND l1.l_orderkey = o_orderkey " +
      "AND l2.l_orderkey = o_orderkey AND o_custkey = c_custkey " +
      "AND c_nationkey = n1.n_nationkey AND l1.l_suppkey = s_suppkey " +
      "AND s_nationkey = n2.n_nationkey " +
      "AND n1.n_regionkey = r_regionkey AND n2.n_regionkey = r_regionkey " +
      "AND l1.l_partkey = p_partkey AND l1.l_linenumber < l2.l_linenumber " +
      "AND o_totalprice > 150000 AND p_size <= 25"))

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
      }
    } finally cs.close()
  }
}
