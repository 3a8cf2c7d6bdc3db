package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    def mat(df: org.apache.spark.sql.DataFrame): Long = df.queryExecution.toRdd.count()

    (1 to 2).foreach { lap =>
      val docs = Tables.load(spark, sfDir, "documents")
      val pairs = time(s"lap$lap minhashNearDups (build plan)")(
        operators.TextDedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8))
      val nPairs = time(s"lap$lap pairs materialize")(pairs.count())
      println(s"  pairs = $nPairs")
      val grouped = time(s"lap$lap dedupGroups total")(
        operators.Components.dedupGroups(docs, "doc_id", pairs, "id_a", "id_b"))
      time(s"lap$lap final orderBy+materialize")(mat(grouped.orderBy("doc_id")))
      operators.OpCaches.releaseAll(spark)
    }
    spark.stop()
  }
}
