package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real surface lives in [[Queries]] / [[CompassQueries]] /
  * [[PipelineQueries]]; this object just adapts it to the driver's shape.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the COMPASS headline shape — a multi-way equi-join chain with a
    * selective filter, reduced to a grouped count
    * (reference workload: /root/reference/queries/1a.sql.sq.cnt).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.queryMap("q_compass_multiway")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queryMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleMap
}
