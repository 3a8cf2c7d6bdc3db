package graft

import graft.functions.GraftExtensions
import org.scalatest.funsuite.AnyFunSuite

/** SQL-facing sketch functions registered through the extensions path. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    GraftExtensions.register(s)
    s
  }

  test("fagms_sketch/fagms_pairwise in pure SQL estimate a real join size") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val est = spark.sql(
      """SELECT fagms_pairwise(
        |  (SELECT fagms_sketch('ok_class', l_orderkey) FROM lineitem),
        |  (SELECT fagms_sketch('ok_class', o_orderkey) FROM orders)) AS est""".stripMargin)
      .head().getDouble(0)
    val truth = spark.sql(
      "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0)
    assert(est > truth / 2.0 && est < truth * 2.0, s"est $est vs true $truth")
  }

  test("fagms_count carries the surviving-row count") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      "SELECT fagms_count((SELECT fagms_sketch('c', o_orderkey) FROM orders WHERE o_totalprice > 100000)) AS n")
      .head().getLong(0)
    val truth = spark.sql(
      "SELECT count(*) FROM orders WHERE o_totalprice > 100000").head().getLong(0)
    assert(n == truth)
  }

  test("fagms_selfjoin estimates the self-join size in pure SQL") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val est = spark.sql(
      "SELECT fagms_selfjoin((SELECT fagms_sketch('sj', l_orderkey) FROM lineitem)) AS est")
      .head().getDouble(0)
    val truth = spark.sql(
      "SELECT count(*) FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey")
      .head().getLong(0)
    assert(est > truth / 2.0 && est < truth * 2.0, s"self-join est $est vs true $truth")
  }

  test("mismatched seed classes produce garbage estimates (contract matters)") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val matched = spark.sql(
      """SELECT fagms_pairwise(
        |  (SELECT fagms_sketch('same', l_orderkey) FROM lineitem),
        |  (SELECT fagms_sketch('same', o_orderkey) FROM orders)) AS est""".stripMargin)
      .head().getDouble(0)
    val mismatched = spark.sql(
      """SELECT fagms_pairwise(
        |  (SELECT fagms_sketch('classA', l_orderkey) FROM lineitem),
        |  (SELECT fagms_sketch('classB', o_orderkey) FROM orders)) AS est""".stripMargin)
      .head().getDouble(0)
    val truth = spark.sql(
      "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0)
    // matched seeds track truth; mismatched seeds cannot
    assert(math.abs(matched - truth).toDouble / truth <
      math.abs(mismatched - truth).toDouble / truth)
  }

  test("non-literal seed class is rejected") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val e = intercept[Exception] {
      spark.sql("SELECT fagms_sketch(o_orderstatus, o_orderkey) FROM orders").collect()
    }
    assert(e.getMessage.contains("string literal") || e.getMessage.contains("fagms_sketch"))
  }
}
