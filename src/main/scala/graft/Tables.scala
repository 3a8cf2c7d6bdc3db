package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    // reader rejects; read the raw int64 nanos and convert to µs-precision
    // TimestampType (Spark's native precision — same values DuckDB sees
    // after its own µs cast).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  // One registration per session while the dir is unchanged: repeated
  // per-query registerAll calls would re-read every parquet footer
  // (10 tables × N queries). Tracking the CURRENT dir (not a seen-set)
  // means switching dirs re-registers — a seen-set would silently leave
  // the views pointing at the previous dir.
  // Keyed on the session itself, weakly: values are plain Strings (no
  // back-reference to the key, unlike the OpCaches/CompassQueries values),
  // so dead sessions' entries really are collectable — an identityHashCode
  // key would neither be unique (hash collisions silently skip
  // registration for a NEW session) nor ever retire.
  private val currentDir = new java.util.WeakHashMap[SparkSession, String]()

  /** Register all tables as temp views named after the table, so
    * `spark.sql` text matches the DuckDB oracle SQL.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = synchronized {
    if (currentDir.get(spark) != sfDir) {
      all.foreach { t => load(spark, sfDir, t).createOrReplaceTempView(t) }
      // The engine's SQL surface includes its functions and optimizer
      // rules — any session that gets the catalog gets the full engine.
      graft.functions.GraftExtensions.register(spark)
      currentDir.put(spark, sfDir)
    }
  }
}
