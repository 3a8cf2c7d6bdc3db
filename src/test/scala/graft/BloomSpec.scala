package graft

import graft.functions.BloomOps._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom build + probe (BloomOps): the NO-FALSE-NEGATIVE contract (the
  * correctness half the `q_bloom_semijoin` differential rests on), the
  * sized false-positive rate, merge determinism across partitionings,
  * string keys, and the SQL registration.
  */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bloomOf(keys: Seq[Long], parts: Int,
      items: Long = 10000L, fpp: Double = 0.03): Array[Byte] =
    keys.toDF("k").repartition(parts)
      .agg(bloom_agg(col("k"), items, fpp))
      .head().getAs[Array[Byte]](0)

  test("no false negatives, ever — across a multi-partition build") {
    val keys = (0L until 500L).map(_ * 7919L)
    val bytes = bloomOf(keys, parts = 7)
    val missed = keys.toDF("k")
      .filter(!bloom_might_contain(lit(bytes), col("k")))
      .count()
    assert(missed == 0, s"bloom dropped $missed inserted keys")
  }

  test("false-positive rate stays near the sized bound") {
    val keys = (0L until 2000L)
    val bytes = bloomOf(keys, parts = 4, items = 2000L, fpp = 0.03)
    // Probe 10k keys guaranteed absent.
    val fps = (1000000L until 1010000L).toDF("k")
      .filter(bloom_might_contain(lit(bytes), col("k")))
      .count()
    val rate = fps / 10000.0
    assert(rate < 0.09, s"false-positive rate $rate ≫ sized 0.03")
  }

  test("partial merge is exact: any partitioning yields the identical bitset") {
    val keys = (0L until 300L).map(i => i * i + 3)
    val one = bloomOf(keys, parts = 1)
    val many = bloomOf(keys, parts = 8)
    assert(java.util.Arrays.equals(one, many),
      "OR-merged partial bitsets differ from the single-partition build")
  }

  test("string keys round-trip") {
    val words = Seq("alpha", "beta", "gamma", "delta")
    val bytes = words.toDF("s")
      .agg(bloom_agg(col("s"), 100L, 0.01)).head().getAs[Array[Byte]](0)
    val got = (words ++ Seq("absent-1", "absent-2")).toDF("s")
      .withColumn("hit", bloom_might_contain(lit(bytes), col("s")))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    words.foreach(w => assert(got(w), s"inserted string $w reported absent"))
  }

  test("null keys are skipped on build and probe") {
    val df = Seq(Some(1L), None, Some(2L)).toDF("k")
    val bytes = df.agg(bloom_agg(col("k"), 10L, 0.01)).head().getAs[Array[Byte]](0)
    val rows = df.withColumn("hit", bloom_might_contain(lit(bytes), col("k")))
      .collect()
    assert(rows.count(r => !r.isNullAt(1) && r.getBoolean(1)) == 2)
    assert(rows.exists(r => r.isNullAt(1)), "null key should probe to null")
  }

  test("SQL surface: bloom_agg / bloom_might_contain registered") {
    graft.functions.GraftExtensions.register(spark)
    (1L to 50L).toDF("k").createOrReplaceTempView("bloom_keys")
    val n = spark.sql(
      """SELECT count(*) AS n FROM bloom_keys
        |WHERE bloom_might_contain(
        |  (SELECT bloom_agg(k, 1000) FROM bloom_keys), k)""".stripMargin)
      .head().getLong(0)
    assert(n == 50L, s"SQL bloom semi-filter kept $n of 50 true keys")
  }
}
