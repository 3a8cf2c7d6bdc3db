package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler (Test/runMain graft.ProfileSlow) — phase timings for
  * the bench's slowest entries. Not part of the driver contract.
  */
object ProfileSlow {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val cs = new graft.planner.CompassSession(spark,
      templateCache = Some(graft.planner.SketchTemplateCache.default()))
    time("warmTemplates")(cs.warmTemplates(
      graft.planner.OptimizerQuality.families.map(f => spark.sql(f._2))))
    (1 to 2).foreach { lap =>
      graft.planner.OptimizerQuality.families.foreach { case (fam, text) =>
        time(s"compare($fam) lap$lap")(
          graft.planner.OptimizerQuality.compare(spark, cs, fam, text))
      }
    }
    spark.stop()
  }
}
