package graft.job

import org.apache.spark.sql.SparkSession

/** Probe (r17): is the corpus warm-lap slowdown the LPT submit order?
  * Lap A: cold (natural order). Lap B: warm with LPT (latencies kept).
  * Lap C: warm with latencies CLEARED (natural order again). If B > C
  * repeatedly, LPT's heavy-first concurrency is the inversion.
  */
object LptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    JobCorpus.ensureData(spark, JobCorpus.scaleFor(dir))
    def lap(label: String, clear: Boolean): Unit = {
      if (clear) JobCorpus.lastCorpusLatencies = Map.empty
      val t0 = System.nanoTime()
      JobCorpus.runAll(spark, dir).collect()
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    lap("cold natural", clear = true)
    lap("warm LPT    ", clear = false)
    lap("warm natural", clear = true)
    lap("warm LPT    ", clear = false)
    lap("warm natural", clear = true)
    spark.stop()
  }
}
