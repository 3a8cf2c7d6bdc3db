package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-layout writers: cluster data on disk so scans can skip.
  *
  * [[writeZOrdered]] is the production face of the `interleave_bits`
  * expression ([[graft.functions.ZOrderKernel]]): global RANGE partition
  * on the z code (balanced via Spark's sampled RangePartitioner — no
  * driver-side sort, no single-task funnel) + within-partition sort, so
  * every output file covers a compact segment of the Z-curve and its
  * parquet row-group min/max stats are tight on BOTH clustered columns.
  * A box predicate `x BETWEEN a AND b AND y BETWEEN c AND d` then prunes
  * most row groups at scan time — the 100 TB fact-table layout for
  * two-column filter workloads. (The differential entry
  * `q_zorder_layout` proves the clustering property end-to-end with a
  * deterministic shard rule DuckDB replays; this writer swaps that rule
  * for the sampled range partitioner, which balances skew at scale but
  * is not bit-reproducible across runs — layout placement never changes
  * query RESULTS, only scan cost.)
  */
object Layout {

  /** Write `df` to `path` as `numFiles` parquet files clustered by the
    * z-order of (`xCol`, `yCol`). Column values must fit the low 32 bits
    * (see ZOrderKernel); the z column is internal and not written.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    graft.functions.GraftExtensions.register(df.sparkSession)
    df.withColumn("_z",
        expr(s"interleave_bits(CAST($xCol AS BIGINT), CAST($yCol AS BIGINT))"))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
