package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema contract between the driver-generated test data and this
  * engine's operator assumptions. Driver-side regeneration has changed
  * column physical types between rounds (r10: events.ts went from
  * nanos-as-int64 to a true TIMESTAMP(MICROS), silently breaking every
  * events consumer at analysis time); this spec turns any such drift into
  * ONE named assertion failure instead of 65 cryptic downstream reds.
  *
  * Asserts the NORMALIZED schema ([[Tables.load]] output), i.e. what every
  * operator actually sees — on-disk representation is allowed to vary as
  * long as load() keeps normalizing it to this contract.
  */
class SchemaContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def fieldTypes(table: String): Map[String, DataType] =
    Tables.load(spark, sfDir, table).schema.fields
      .map(f => f.name -> f.dataType).toMap

  /** Timestamp-valued columns may load as LTZ or NTZ depending on parquet
    * logical-type flags and Spark's inferTimestampNTZ; both are µs-precision
    * and hash identically under the UTC session timezone the entrypoints
    * set, so the contract accepts either — EXCEPT events.ts, which
    * operators cast to raw micros and therefore pin to TimestampType.
    */
  private def isTimestamp(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  test("events normalizes to the operator contract (ts pinned to TimestampType)") {
    val t = fieldTypes("events")
    assert(t("ts") == TimestampType,
      s"events.ts must normalize to TimestampType, got ${t("ts")} — fix Tables.load, not the operators")
    assert(t("event_id") == LongType && t("user_id") == LongType)
    assert(t("event_type") == StringType && t("props") == StringType)
    assert(t("value") == DoubleType)
  }

  test("embeddings carries vec_id:long, embedding:array<float>, label:int") {
    val t = fieldTypes("embeddings")
    assert(t("vec_id") == LongType)
    assert(t("embedding") == ArrayType(FloatType, containsNull = true) ||
           t("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding must be array<float> (Similarity kernels assume 4-byte floats), got ${t("embedding")}")
    assert(t("label") == IntegerType)
  }

  test("documents carries doc_id:long, text/lang/source:string, n_chars:long") {
    val t = fieldTypes("documents")
    assert(t("doc_id") == LongType)
    assert(t("text") == StringType && t("lang") == StringType && t("source") == StringType)
    assert(t("n_chars") == LongType)
  }

  test("TPC-H fact tables keep 64-bit keys and timestamp date columns") {
    val o = fieldTypes("orders")
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType)
    assert(o("o_totalprice") == DoubleType)
    assert(isTimestamp(o("o_orderdate")), s"o_orderdate: ${o("o_orderdate")}")
    val l = fieldTypes("lineitem")
    assert(l("l_orderkey") == LongType && l("l_partkey") == LongType &&
      l("l_suppkey") == LongType)
    assert(l("l_linenumber") == IntegerType)
    assert(Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .forall(c => l(c) == DoubleType))
    assert(isTimestamp(l("l_shipdate")), s"l_shipdate: ${l("l_shipdate")}")
  }

  test("dimension tables keep 32-bit keys (broadcast-size contract)") {
    assert(fieldTypes("region")("r_regionkey") == IntegerType)
    val n = fieldTypes("nation")
    assert(n("n_nationkey") == IntegerType && n("n_regionkey") == IntegerType)
    assert(fieldTypes("customer")("c_nationkey") == IntegerType)
    assert(fieldTypes("supplier")("s_nationkey") == IntegerType)
    assert(fieldTypes("part")("p_size") == IntegerType)
  }
}
