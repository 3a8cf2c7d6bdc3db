package graft

import graft.planner.{CompassSession, OptimizerQuality, SketchTemplateCache}
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer-quality contract behind q_compass_quality: on JOB-shaped
  * workloads the sketch-chosen order's TRUE intermediate-row sum must not
  * exceed the stock size-descending baseline's.
  */
class OptimizerQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // One source of truth with the driver entry (q_compass_quality) plus
  // the 9-way diamond regression pin — see OptimizerQuality.specFamilies.
  private val families = OptimizerQuality.specFamilies

  test("compass order's true intermediate sum <= stock order's, per family") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val cs = new CompassSession(spark,
      templateCache = Some(SketchTemplateCache.default()))
    try {
      families.foreach { case (fam, text) =>
        val r = OptimizerQuality.compare(spark, cs, fam, text)
        info(s"$fam: compass=${r.compassSum} naive=${r.naiveSum} " +
          s"order=${cs.lastPlan.map(_.order.mkString("->")).getOrElse("?")}")
        assert(r.compassLeNaive,
          s"$fam: compass ${r.compassSum} > naive ${r.naiveSum}")
      }
    } finally cs.close()
  }
}
