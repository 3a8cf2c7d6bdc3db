package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scalar-surface odds and ends that cannot carry a DuckDB oracle:
  * wall-clock functions (reference: NOW/DATETIME —
  * mapd-core/QueryEngine/RelAlgTranslator.cpp translateNow) and
  * name-equivalence between DATEPART-style and EXTRACT-style spellings.
  */
class ScalarFnsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("now()/current_date track the wall clock and are query-constant") {
    val before = System.currentTimeMillis()
    val row = spark.sql(
      "SELECT CAST(now() AS LONG) AS epoch_s, now() AS t1, now() AS t2, current_date() AS d")
      .head()
    val after = System.currentTimeMillis()
    val epochMs = row.getLong(0) * 1000
    assert(epochMs >= before - 2000 && epochMs <= after + 2000,
      s"now()=$epochMs outside [$before, $after]")
    // both now() calls in one query must observe the same instant
    assert(row.getTimestamp(1) == row.getTimestamp(2))
  }

  test("date_part spelling agrees with extract on every field") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT count(*) AS n FROM orders
        |WHERE date_part('year', o_orderdate) <> extract(year FROM o_orderdate)
        |   OR date_part('month', o_orderdate) <> extract(month FROM o_orderdate)
        |   OR date_part('day', o_orderdate) <> extract(day FROM o_orderdate)
        |   OR date_part('quarter', o_orderdate) <> extract(quarter FROM o_orderdate)""".stripMargin)
      .head().getLong(0)
    assert(n == 0)
  }
}
