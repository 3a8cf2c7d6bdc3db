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
    // Wide window: currentTimeMillis is not monotone (NTP steps) — this
    // pins "tracks the wall clock", not sub-second agreement.
    assert(epochMs >= before - 60000 && epochMs <= after + 60000,
      s"now()=$epochMs outside [$before, $after]")
    // both now() calls in one query must observe the same instant
    assert(row.getTimestamp(1) == row.getTimestamp(2))
  }

  test("approx_percentile tracks the exact percentile within 2%") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val rows = spark.sql(
      """SELECT l_returnflag,
        |  approx_percentile(l_extendedprice, 0.5, 10000) AS pa,
        |  percentile(l_extendedprice, 0.5) AS pe
        |FROM lineitem GROUP BY l_returnflag""".stripMargin).collect()
    rows.foreach { r =>
      val (pa, pe) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(pa - pe) / pe <= 0.02, s"${r.getString(0)}: approx $pa vs exact $pe")
    }
  }

  test("approx_count_distinct tracks the exact NDV within 10%") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val r = spark.sql(
      """SELECT approx_count_distinct(l_partkey) AS a,
        |count(DISTINCT l_partkey) AS e FROM lineitem""".stripMargin).head()
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e <= 0.10, s"HLL estimate $a vs exact $e")
  }

  test("vec_dot is SQL-callable through the extensions") {
    graft.functions.GraftExtensions.register(spark)
    val v = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head().getDouble(0)
    assert(v == 11.0)
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
