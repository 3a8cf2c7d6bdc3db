package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [entry...]")
    val (sfDir, outDir) = (args(0), args(1))
    // Optional entry-name subset for fast local iteration; the driver
    // always calls with two args → full run.
    val subset = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Same engine join policy as Bench (guide §3.1): the correctness
      // gate must exercise the plans the bench times. preferSortMergeJoin
      // back at its default since r22 (the static flip had no runtime
      // size fallback — r21 verdict #1); only the runtime-size-gated AQE
      // SHJ threshold stays on. GRAFT_PREFER_SMJ=0 re-flips for A/B.
      .config("spark.sql.join.preferSortMergeJoin",
        (!sys.env.get("GRAFT_PREFER_SMJ").contains("0")).toString)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("GRAFT_AQE_SHJ_THRESHOLD", "128m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, outDir, subset)
    spark.stop()
  }

  /** Session-injected body so a spec can drive the harness (e.g. against
    * a deliberately corrupted table dir) without stopping the shared
    * test session.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          subset: Set[String] = Set.empty): Unit = {
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => subset.isEmpty || subset(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // Surface the failure in the round record: r10 showed that an
        // entry that writes nothing is indistinguishable from one never
        // declared (111 entries silently vanished). A sibling marker file
        // makes every broken entry a visible err row downstream.
        try Files.writeString(Paths.get(s"$outDir/${name}._error.txt"),
          Option(e.getMessage).getOrElse(e.getClass.getName))
        catch { case _: Throwable => () }
      }
      // Bound memory across the run: operator-internal persists are only
      // useful within one query's action.
      graft.operators.OpCaches.releaseAll(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Partial-soundness oracles (ANN / signature entries) re-derive the
    // checkable columns of the SPARK RESULT: the SQL reads this run's
    // dump via read_parquet, so the output dir is substituted here, at
    // dump time, as an absolute path (DuckDB runs from an unknown cwd).
    val absOut = Paths.get(outDir).toAbsolutePath.toString
    // Scale-matched JOB data dir: the corpus entry executes the sf-scaled
    // IMDb, so its oracle's table reads must point at the SAME scale
    // (x1-vs-x1 at the driver's sf0.01; x10-vs-x10 under an sf0.1 audit).
    val jobDir = graft.job.JobCorpus.dataPathFor(
      graft.job.JobCorpus.scaleFor(sfDir))
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(Queries.VerifyOutToken, absOut)
          .replace(graft.job.JobCorpus.JobDataToken, jobDir))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json): Unit
  }
}
