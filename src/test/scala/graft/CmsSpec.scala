package graft

import graft.functions.CmsOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Count-Min read path: estimates never under-count, respect the
  * ε·N bound on this data, are partition-invariant (the aggregate's
  * merge is additive), and cover string keys. Complements SketchSpec's
  * FAGMS coverage — two sketch families, same contracts.
  */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def sketchOf(df: org.apache.spark.sql.DataFrame, colName: String): Array[Byte] =
    df.agg(expr(s"count_min_sketch($colName, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
      .head().getAs[Array[Byte]](0)

  test("estimates bound true counts and are identical at any partitioning") {
    import spark.implicits._
    val rows = (0 until 5000).map(i => i % 97L)
    val df = rows.toDF("k")
    val bytes1 = sketchOf(df.repartition(1), "k")
    val bytes13 = sketchOf(df.repartition(13), "k")
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = df.distinct()
      .withColumn("est", CmsOps.cms_estimate(lit(bytes13), col("k")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS under-estimated $k: ${est(k)} < $n")
      assert(est(k) <= n + math.ceil(0.001 * 5000).toLong,
        s"CMS blew the eps*N bound on $k: ${est(k)} vs $n")
    }
    // Additive merge: the 13-partition sketch answers exactly like the
    // 1-partition build.
    val est1 = df.distinct()
      .withColumn("est", CmsOps.cms_estimate(lit(bytes1), col("k")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est1 == est)
  }

  test("string keys estimate; absent keys stay within slack of zero") {
    import spark.implicits._
    val df = Seq.fill(100)("alpha").zipWithIndex
      .map { case (s, i) => if (i % 4 == 0) "beta" else s }.toDF("s")
    val bytes = sketchOf(df, "s")
    val est = Seq("alpha", "beta", "never-seen").toDF("s")
      .withColumn("est", CmsOps.cms_estimate(lit(bytes), col("s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") >= 75 && est("beta") >= 25)
    assert(est("never-seen") <= math.ceil(0.001 * 100).toLong,
      s"phantom mass on an absent key: ${est("never-seen")}")
  }

  test("a row-varying sketch column still evaluates (per-row deserialize path)") {
    import spark.implicits._
    val base = Seq(7L, 7L, 9L).toDF("k")
    val bytes = sketchOf(base, "k")
    val df = Seq((bytes, 7L), (bytes, 9L)).toDF("b", "k")
    val est = df.select(col("k"), CmsOps.cms_estimate(col("b"), col("k")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est(7L) >= 2 && est(9L) >= 1)
  }
}
