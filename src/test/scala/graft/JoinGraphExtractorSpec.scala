package graft

import graft.plans.JoinGraphExtractor
import org.scalatest.funsuite.AnyFunSuite

/** Join-graph extraction from real analyzed Catalyst plans over the
  * TESTDATA schema (VERDICT r1 next-step #3).
  */
class JoinGraphExtractorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def analyzed(sqlText: String) = {
    Tables.registerAll(spark, dir)
    spark.sql(sqlText).queryExecution.analyzed
  }

  test("5-table JOB-shaped query: edges, filters, instances") {
    val plan = analyzed(
      """SELECT count(*) AS n FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_totalprice > 1000""".stripMargin)
    val Some((g, _)) = JoinGraphExtractor.extract(plan)
    assert(g.instances.map(_.name) ==
      Seq("lineitem", "orders", "customer", "nation", "region"))
    assert(g.edges.size == 4)
    val edgeNames = g.edges.map { case ((_, a), (_, b)) => (a.name, b.name) }.toSet
    assert(edgeNames == Set(
      ("l_orderkey", "o_orderkey"), ("o_custkey", "c_custkey"),
      ("c_nationkey", "n_nationkey"), ("n_regionkey", "r_regionkey")))
    // single-table conjuncts land on their instance
    val filterNames = g.instanceFilters.map { case (i, fs) =>
      g.instances(i).name -> fs.map(_.sql).mkString(";")
    }
    assert(filterNames.keySet == Set("region", "orders"))
    assert(g.residual.isEmpty)
  }

  test("implicit comma-join with WHERE equi-predicates (JOB style)") {
    val plan = analyzed(
      """SELECT count(*) AS n FROM supplier, nation, region
        |WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |AND r_name = 'EUROPE'""".stripMargin)
    val Some((g, _)) = JoinGraphExtractor.extract(plan)
    assert(g.instances.size == 3)
    assert(g.edges.size == 2)
  }

  test("self-join: two instances of the same table stay distinct") {
    val plan = analyzed(
      """SELECT count(*) AS n FROM lineitem l1
        |JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
        |JOIN orders ON l1.l_orderkey = o_orderkey""".stripMargin)
    val Some((g, _)) = JoinGraphExtractor.extract(plan)
    assert(g.instances.map(_.name) == Seq("l1", "l2", "orders"))
    // l1 and l2 outputs must not be conflated
    assert(g.instances(0).outputSet.intersect(g.instances(1).outputSet).isEmpty)
    assert(g.edges.size == 2)
  }

  test("non-inner joins become opaque instances (outer stays pinned)") {
    val plan = analyzed(
      "SELECT count(*) AS n FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey")
    val Some((g, _)) = JoinGraphExtractor.extract(plan)
    // the LEFT-join subtree is ONE instance; nation is the other
    assert(g.instances.size == 2)
    assert(g.edges.size == 1)
  }

  test("inner chain under a LEFT-joined lookup is still extracted") {
    val plan = analyzed(
      """SELECT count(*) AS n FROM
        |(SELECT o_custkey FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | WHERE o_totalprice > 100000) t
        |LEFT JOIN nation ON t.o_custkey = n_nationkey""".stripMargin)
    val Some((g, _)) = JoinGraphExtractor.extract(plan)
    assert(g.instances.map(_.name).toSet == Set("lineitem", "orders", "customer"))
    assert(g.edges.size == 2)
  }

  test("no join: nothing to extract") {
    assert(JoinGraphExtractor.extract(analyzed("SELECT count(*) AS n FROM lineitem")).isEmpty)
  }

  test("non-equi and OR'd predicates become residual/filters, not edges") {
    val plan = analyzed(
      """SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_quantity < o_totalprice
        |AND (o_orderstatus = 'F' OR o_totalprice > 500)""".stripMargin)
    val Some((g, _)) = JoinGraphExtractor.extract(plan)
    assert(g.edges.size == 1)
    assert(g.residual.size == 1) // the cross-table non-equi
    assert(g.instanceFilters.values.flatten.size == 1) // the OR'd single-table
  }

  test("cast-wrapped equalities are residual, never edges") {
    // Rebuilding CAST(x) = y as bare x = y changes semantics (e.g.
    // day-granularity vs instant equality) and a mixed-type edge would
    // sketch incompatible key domains — so any cast in the conjunct keeps
    // it OUT of the graph; it survives as residual and is applied
    // verbatim above the splice.
    val plan = analyzed(
      """SELECT count(*) AS n FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON CAST(o_custkey AS STRING) = CAST(c_custkey AS STRING)""".stripMargin)
    val Some((g, _)) = JoinGraphExtractor.extract(plan)
    assert(g.edges.size == 1, s"cast equality must not form an edge: ${g.edges}")
    assert(g.residual.size == 1, s"cast equality must survive as residual: ${g.residual}")
  }
}
