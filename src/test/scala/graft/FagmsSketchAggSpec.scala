package graft

import graft.functions.SketchFunctions.fagms_sketch
import graft.sketch.{SeedRegistry, SketchGroup, Xi}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integration test: the fagms_sketch aggregate inside a real SparkSession
  * with multi-partition input — exercises update (map-side), serialize,
  * merge (partial aggregation), deserialize, eval. The resulting sketch
  * must be bit-identical to a driver-side sketch of the same rows
  * (sketches are linear, so partition order must not matter).
  */
class FagmsSketchAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("distributed sketch equals driver-side sketch of the same rows") {
    import spark.implicits._
    val rows = 11; val buckets = 101
    val reg = new SeedRegistry(rows)
    val seeds = Seq(reg.seedsFor(("t", "k1")), reg.seedsFor(("t", "k2")))
    val data: Seq[(Long, Long)] =
      (0 until 5000).map(i => ((i % 700).toLong, (i % 350).toLong))

    val df = data.toDF("k1", "k2").repartition(13)
    val bytes = df
      .agg(fagms_sketch(rows, buckets, Seq("k1", "k2"), seeds, col("k1"), col("k2")))
      .head().getAs[Array[Byte]](0)
    val distributed = SketchGroup.deserialize(bytes)

    val local = new SketchGroup(rows, buckets, Array("k1", "k2"), seeds.toArray)
    data.foreach { case (a, b) => local.update(Array(Xi.fold64(a), Xi.fold64(b))) }

    assert(distributed.count == local.count)
    (0 until 2).foreach { c =>
      assert(distributed.planes(c).sameElements(local.planes(c)),
        s"plane $c differs between distributed and local build")
    }
  }

  test("IntegerType keys are accepted (no blind Long cast)") {
    import spark.implicits._
    val rows = 7; val buckets = 31
    val reg = new SeedRegistry(rows)
    val seeds = Seq(reg.seedsFor(("t", "k")))
    val df = (0 until 1000).map(i => i % 50).toDF("k").repartition(5)
    val bytes = df.agg(fagms_sketch(rows, buckets, Seq("k"), seeds, col("k")))
      .head().getAs[Array[Byte]](0)
    assert(SketchGroup.deserialize(bytes).count == 1000L)
  }

  test("NULL keys are skipped, not counted") {
    import spark.implicits._
    val rows = 7; val buckets = 31
    val reg = new SeedRegistry(rows)
    val seeds = Seq(reg.seedsFor(("t", "k")))
    val df = (0 until 100).map(i => if (i % 10 == 0) None else Some(i.toLong))
      .toDF("k").repartition(3)
    val bytes = df.agg(fagms_sketch(rows, buckets, Seq("k"), seeds, col("k")))
      .head().getAs[Array[Byte]](0)
    assert(SketchGroup.deserialize(bytes).count == 90L)
  }

  test("estimate on real TESTDATA join within 2x of truth") {
    import org.apache.spark.sql.functions.col
    val rows = 73; val buckets = 1021
    val reg = new SeedRegistry(rows)
    reg.addPredicate(("lineitem", "l_orderkey"), ("orders", "o_orderkey"))
    val dir = "/root/testdata/sf0.001"
    def sk(table: String, keyCol: String) = SketchGroup.deserialize(
      Tables.load(spark, dir, table)
        .agg(fagms_sketch(rows, buckets, Seq(keyCol),
          Seq(reg.seedsFor((table, keyCol))), col(keyCol)))
        .head().getAs[Array[Byte]](0))
    val sl = sk("lineitem", "l_orderkey")
    val so = sk("orders", "o_orderkey")
    val est = sketch.Estimator.pairwise(sl.planes(0), so.planes(0), rows, buckets)
    val truth = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(est > truth / 2.0 && est < truth * 2.0, s"est $est vs true $truth")
  }

  test("distributed pairwise estimate tracks true join size") {
    import spark.implicits._
    val rows = 73; val buckets = 1021
    val reg = new SeedRegistry(rows)
    reg.addPredicate(("a", "k"), ("b", "k"))
    val sa = Seq(reg.seedsFor(("a", "k")))
    val sb = Seq(reg.seedsFor(("b", "k")))
    val rng = new scala.util.Random(5)
    val da = Seq.fill(20000)(rng.nextInt(300).toLong)
    val db = Seq.fill(15000)(rng.nextInt(300).toLong)
    def build(d: Seq[Long], s: Seq[graft.sketch.ColumnSeeds]) =
      SketchGroup.deserialize(
        d.toDF("k").repartition(7)
          .agg(fagms_sketch(rows, buckets, Seq("k"), s, col("k")))
          .head().getAs[Array[Byte]](0))
    val ga = build(da, sa); val gb = build(db, sb)
    val trueSize = {
      val ca = da.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cb = db.groupBy(identity).view.mapValues(_.size.toLong).toMap
      ca.map { case (k, n) => n * cb.getOrElse(k, 0L) }.sum
    }
    val est = sketch.Estimator.pairwise(ga.planes(0), gb.planes(0), rows, buckets)
    assert(math.abs(est - trueSize) / trueSize < 0.15, s"est $est vs true $trueSize")
  }
}
