package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen dot product must be bit-identical to the
  * higher-order-function formula it replaced (q_ann_exact's DuckDB oracle
  * depends on the exact left-fold double arithmetic), work in both
  * codegen and interpreted modes, and propagate nulls like the HOF.
  */
class VectorOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the aggregate/zip_with formula on float arrays") {
    import spark.implicits._
    val rng = new scala.util.Random(99)
    val rows = (1L to 200L).map(i =>
      (i, Seq.fill(64)(rng.nextGaussian().toFloat), Seq.fill(64)(rng.nextGaussian().toFloat)))
    val df = rows.toDF("id", "a", "b").repartition(5)
    val out = df.select(
      VectorOps.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    assert(out.forall(r => r.getDouble(0) == r.getDouble(1)),
      "native dot must be bit-identical to the HOF fold")
  }

  test("works on double arrays and under forced codegen") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val v = df.select(VectorOps.dot(col("a"), col("b"))).head().getDouble(0)
      assert(v == 32.0)
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null array, null element, or length mismatch yields null") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
      (null, Seq[java.lang.Double](1.0, 2.0)),
      // dimension mismatch must NOT produce a plausible prefix dot
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](4.0, 5.0)))
      .toDF("a", "b")
    val out = df.select(VectorOps.dot(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("ANN cosine paths produce identical results through the native dot") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val out = graft.operators.Similarity.bruteForceTopK(
      emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3)
      .collect()
    assert(out.length == 15)
    assert(out.forall(r => math.abs(r.getDouble(3)) <= 1.000001))
  }
}
