package graft

import graft.planner.{CompassSession, SketchTemplateCache}
import org.apache.spark.sql.SparkSession

/** COMPASS optimizer-driven query entries: the same JOB-shaped workloads as
  * the plain SQL surface, but executed through the full sketch pipeline —
  * filtered sketch jobs → join-order enumeration → spliced left-deep plan.
  * The DuckDB oracle is the equivalent plain SQL, so a green row proves the
  * reordered plan is semantics-preserving end-to-end.
  */
object CompassQueries {
  import Queries._

  // One session wrapper per SparkSession (cheap; keeps lastPlan per use).
  private def compass(s: SparkSession): CompassSession =
    new CompassSession(s, templateCache = Some(SketchTemplateCache.default()))

  private def viaCompass(name: String, text: String): Entry =
    dfq(name, text) { (s, dir) =>
      Tables.registerAll(s, dir)
      compass(s).sql(text)
    }

  def entries: Seq[Entry] = Seq(
    // The headline COMPASS shape: 5-table chain + selective dim filter
    // (reference workload: /root/reference/queries/1a.sql.sq.cnt).
    viaCompass("q_compass_multiway",
      "SELECT n_name, count(*) AS n FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name"),

    // Filters on several fact/dim tables at once — the case where online
    // (post-filter) sketches beat static statistics.
    viaCompass("q_compass_filtered",
      "SELECT count(*) AS n FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "WHERE o_totalprice > 200000 AND c_mktsegment = 'BUILDING' " +
        "AND l_quantity > 10"),

    // Implicit-join JOB syntax through the same pipeline.
    viaCompass("q_compass_implicit",
      "SELECT count(*) AS n FROM lineitem, part, supplier " +
        "WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey " +
        "AND p_type = 'SMALL' AND s_acctbal > 0"),
  )
}
