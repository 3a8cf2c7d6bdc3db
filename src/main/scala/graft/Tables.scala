package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver's parquet test data (TESTDATA.md).
  *
  * Mirrors the reference's fixed-schema catalog
  * (reference: mapd-core/Catalog/Catalog.cpp) but Spark-native: a table is
  * a parquet directory; schemas come from parquet footers; chunk min/max
  * fragment skipping (reference: mapd-core/QueryEngine/Execute.cpp
  * `skipFragment`) maps to Parquet row-group stats, which Spark applies
  * automatically when filters are pushed down.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables small enough to broadcast at any scale factor (dimension-like).
    * At 100 TB, region/nation stay tiny (fixed cardinality); broadcasting
    * them removes a shuffle per join.
    */
  val broadcastable: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register all tables as temp views named after the table, so
    * `spark.sql` text matches the DuckDB oracle SQL.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach { t =>
      load(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
