package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round helper: write `.explain("formatted")` of named
  * entries to files (plans/r21/<name>_<tag>.txt) so plan-shape claims in
  * OPTIMIZATION_r21.md are checkable without running Spark. Entries whose
  * bodies run driver-side actions (iterative loops, seed lookups) dump the
  * FINAL DataFrame's plan — loop internals checkpoint and are documented
  * in prose instead.
  *
  * usage: runMain graft.PlanDump <tag> <entry...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <tag> <entry...>")
    val tag = args(0)
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Mirror Bench's join policy so dumped plans match the timed ones.
      .config("spark.sql.join.preferSortMergeJoin",
        (sys.env.get("GRAFT_PREFER_SMJ").contains("1")).toString)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("GRAFT_AQE_SHJ_THRESHOLD", "128m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = Paths.get("plans/r21")
    Files.createDirectories(outDir)
    val byName = Queries.all.map(e => e.name -> e).toMap
    names.foreach { n =>
      val e = byName.getOrElse(n, sys.error(s"unknown entry: $n"))
      val df = e.run(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${n}_$tag.txt"), plan)
      graft.operators.OpCaches.releaseAll(spark)
      println(s"dumped $n -> plans/r21/${n}_$tag.txt")
    }
    spark.stop()
  }
}
