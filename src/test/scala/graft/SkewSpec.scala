package graft

import graft.operators.Skew
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.Skew]]: the salted formulations must equal their
  * naive single-reducer twins on PLANTED-HOT-KEY data (one key carrying
  * ~80% of all rows — the regime the operators exist for), and the
  * phase-1 spread must be live (the hot key really splits across salts).
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** 20k rows; key 7 holds ~80%, values collide across keys. */
  private def skewed = {
    import spark.implicits._
    (1 to 20000).map { i =>
      val k = if (i % 10 < 8) 7L else (i % 97).toLong
      (k, (i % 500).toLong, i.toLong)
    }.toDF("k", "v", "tie")
  }

  test("collectSetSalted equals the plain collect_set on hot-key data") {
    val df = skewed
    val got = Skew.collectSetSalted(df, "k", "v", salts = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val expected = df.groupBy("k")
      .agg(array_sort(collect_set(col("v"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(got == expected)
    assert(got(7L).size > 400, "hot key should carry most distinct values")
  }

  test("topKPerKeySalted equals the plain window top-k on hot-key data") {
    val df = skewed
    val got = Skew.topKPerKeySalted(df, "k", "v", "tie", k = 5, salts = 8)
      .select("k", "v", "tie", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("tie"))
    val expected = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("k", "v", "tie", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(got.toSeq == expected.toSeq)
  }

  test("phase-1 spread is live: the hot key splits across multiple salts") {
    val df = skewed
    val nSaltGroups = df.filter(col("k") === 7)
      .select(pmod(xxhash64(col("v")), lit(8)).as("s"))
      .distinct().count()
    assert(nSaltGroups >= 6, s"hot key landed in only $nSaltGroups salt groups")
  }

  test("k larger than a key's row count returns all rows") {
    import spark.implicits._
    val tiny = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 5L, 3L)).toDF("k", "v", "tie")
    val got = Skew.topKPerKeySalted(tiny, "k", "v", "tie", k = 5, salts = 4)
    assert(got.count() == 3)
  }
}
