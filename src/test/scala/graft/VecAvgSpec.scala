package graft

import graft.functions.VecAvgAgg.vec_avg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecAvgSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("element-wise mean matches the scalar definition") {
    val df = Seq((1L, Seq(1.0, 2.0, 3.0)), (1L, Seq(3.0, 4.0, 5.0)),
      (2L, Seq(10.0, 0.0, -10.0))).toDF("g", "v")
    val got = df.groupBy("g").agg(vec_avg(col("v")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) == Seq(2.0, 3.0, 4.0))
    assert(got(2L) == Seq(10.0, 0.0, -10.0))
  }

  test("distributed partials merge to the local result (13 partitions)") {
    val rng = new scala.util.Random(5)
    val rows = Seq.tabulate(400)(i => (i % 3).toLong -> Seq.fill(8)(rng.nextDouble()))
    val df = rows.toDF("g", "v")
    val local = rows.groupBy(_._1).map { case (g, rs) =>
      g -> (0 until 8).map(j => rs.map(_._2(j)).sum / rs.size)
    }
    val dist = df.repartition(13).groupBy("g").agg(vec_avg(col("v")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    local.foreach { case (g, expected) =>
      dist(g).zip(expected).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-12, s"group $g differs") }
    }
  }

  test("float inputs widen to double; the embeddings table pools") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val pooled = emb.agg(vec_avg(col("embedding")).as("m"))
      .select(size(col("m")).as("d")).head().getInt(0)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    assert(pooled == dim)
  }

  test("null vectors are skipped; empty group yields null") {
    val df = Seq((1L, Some(Seq(2.0, 4.0))), (1L, None), (2L, None))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(vec_avg(col("v")).as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).contains(Seq(2.0, 4.0)))
    assert(got(2L).isEmpty)
  }

  test("mixed vector lengths fail loudly, never truncate") {
    val df = Seq((1L, Seq(1.0, 2.0)), (1L, Seq(1.0, 2.0, 3.0))).toDF("g", "v")
    val e = intercept[Exception](df.groupBy("g").agg(vec_avg(col("v"))).collect())
    assert(e.getMessage != null)
  }

  test("SQL registration: vec_avg usable from pure SQL") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val d = spark.sql(
      "SELECT size(vec_avg(embedding)) AS d FROM embeddings").head().getInt(0)
    assert(d > 0)
  }
}
