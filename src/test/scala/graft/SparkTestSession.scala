package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-backed specs (JVM-wide — Spark
  * sessions are expensive; specs must not stop() it).
  *
  * SEQUENTIAL-ONLY contract: several suites mutate JVM-global state of
  * this shared session — OpCaches tracked counts and releaseAll,
  * session confs (VectorOpsSpec's codegen factory mode, PlanAuditSpec's
  * broadcast threshold), registered SQL functions and temp views. The
  * sbt build runs suites sequentially in one forked JVM; enabling
  * testForkedParallel (or a parallel IDE runner) would race those
  * assertions. Parallelize only after giving each suite its own
  * session (newSession()) and session-scoped caches.
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
