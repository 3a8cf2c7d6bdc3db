package graft.job

import org.apache.spark.sql.SparkSession
import graft.planner.{CompassSession, SketchTemplateCache}

/** r17 verdict #1/#2 — the scale campaign: RUN the volume-gated claims
  * instead of arguing them. Facets (one per invocation so each runs in
  * a fresh JVM with no cross-facet warmth):
  *
  *   profiles <m>   — the 113-query corpus on a DEFAULT-conf session vs
  *                    the interactive-trimmed child, cold + warm laps,
  *                    counts compared. The trim (AQE/codegen/constraint
  *                    off) is gated on "driver work dominates"; at data-
  *                    dominated scale the dial must REVERSE (defaults
  *                    win) or the gate threshold is wrong.
  *   compass <m>    — all 113 queries through the full COMPASS path on a
  *                    PRODUCTION CompassSession (user-session conf: AQE,
  *                    codegen, constraint propagation all ON) over the
  *                    scaled IMDb: counts equal to the vanilla corpus,
  *                    planning fraction recorded, splice exercised
  *                    against real exchanges + AQE re-planning.
  *   skip <m>       — measureSkipPolicyAt: the all-broadcastable skip
  *                    heuristic must DECLINE to skip once the scaled
  *                    fact tables exceed the broadcast threshold.
  *
  * Output: one JSON line per facet (stdout), consumed into SCALE.md.
  */
object ScaleCampaignMain {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleCampaignMain <profiles|compass|skip> <m>")
    val facet = args(0)
    val m = args(1).toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      facet match {
        case "profiles" => profiles(spark, m)
        case "chooser" => chooser(spark, m)
        case "compass" => compass(spark, m)
        case "skip" => skip(spark, m)
        case "capouts" => capouts(spark, m)
        case other => sys.error(s"unknown facet $other")
      }
    } finally spark.stop()
  }

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def counts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** One corpus lap with a PER-QUERY job-group cap: the x100 campaign's
    * first uncapped run sat 25+ minutes inside ONE broadcast-probe task
    * (a vanilla-join-order intermediate explosion — at data scale a bad
    * order stops being "slower" and becomes a runaway). Capping turns a
    * straggler into a MEASUREMENT (name + cap recorded) instead of a
    * sunk lap; completed queries keep exact counts and latencies.
    */
  final case class Lap(counts: Map[String, Long], latMs: Map[String, Long],
      timeouts: Seq[String], wallS: Double)

  private val lapCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  private def cappedLap(exec: SparkSession, capSec: Int): Lap = {
    import scala.util.control.NonFatal
    // Group ids must be unique PER LAP: cancelJobGroupAndFutureJobs marks
    // the id cancelled permanently, so reusing the bare query name would
    // insta-kill the next lap's run of the same query.
    val lapId = lapCounter.incrementAndGet()
    val threads = math.max(1, sys.env.get("GRAFT_JOB_THREADS")
      .flatMap(_.toIntOption).getOrElse(4))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val results = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    val timeouts = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val t0 = System.nanoTime()
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val futures = JobCorpus.queries.map { case (name, text) =>
        scala.concurrent.Future {
          val sc = exec.sparkContext
          val group = s"$name#$lapId"
          sc.setJobGroup(group, name, interruptOnCancel = true)
          val timer = new java.util.Timer(true)
          val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
          timer.schedule(new java.util.TimerTask {
            // AndFutureJobs: a cancel landing BETWEEN a query's jobs (AQE
            // runs several per query) must also kill the next one, or the
            // cap silently leaks.
            def run(): Unit = { fired.set(true); sc.cancelJobGroupAndFutureJobs(group) }
          }, capSec * 1000L)
          val q0 = System.nanoTime()
          try {
            val n = exec.sql(text).head().getLong(0)
            results.put(name, (n, (System.nanoTime() - q0) / 1000000))
          } catch {
            case NonFatal(e) =>
              if (fired.get) timeouts.add(name)
              else throw e
          } finally { timer.cancel(); sc.clearJobGroup() }
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(180, "min"))
    } finally pool.shutdown()
    import scala.jdk.CollectionConverters._
    Lap(results.asScala.view.mapValues(_._1).toMap,
      results.asScala.view.mapValues(_._2).toMap,
      timeouts.asScala.toSeq.sorted, (System.nanoTime() - t0) / 1e9)
  }

  private def lapJson(l: Lap): String = {
    val v = l.latMs.values.toSeq.sorted
    val top = l.latMs.toSeq.sortBy(-_._2).take(5)
      .map { case (q, t) => s""""$q":$t""" }.mkString(",")
    // Per-family [n, median_ms, sum_ms] (r22, verdict #4): the routing
    // decision is per FAMILY, so the facet must attribute latency at
    // that grain — the p50/p90 summary hides which families would win
    // under the other profile.
    val fams = l.latMs.groupBy { case (q, _) => q.takeWhile(_.isDigit) }
      .toSeq.sortBy { case (f, _) => f.toIntOption.getOrElse(Int.MaxValue) }
      .map { case (f, qs) =>
        val xs = qs.values.toSeq.sorted
        s""""$f":[${xs.size},${xs(xs.size / 2)},${xs.sum}]"""
      }.mkString("{", ",", "}")
    val stats =
      if (v.isEmpty) """"p50_ms":0,"p90_ms":0,"max_ms":0,"top5":{}"""
      else s""""p50_ms":${v(v.size / 2)},"p90_ms":${v((v.size * 9) / 10)},""" +
        s""""max_ms":${v.last},"top5":{$top}"""
    s"""{"wall_s":${f"${l.wallS}%.1f"},"completed":${l.counts.size},""" +
      s""""timeouts":${l.timeouts.map("\"" + _ + "\"").mkString("[", ",", "]")},$stats,""" +
      s""""families_n_med_sum_ms":$fams}"""
  }

  /** Corpus on default conf vs the interactive trim, cold + warm. */
  private def profiles(spark: SparkSession, m: Int): Unit = {
    JobCorpus.ensureData(spark, m)
    // Default-profile child: PRODUCTION conf (nothing trimmed).
    val dflt = spark.newSession()
    JobCorpus.registerViews(dflt, m)
    val trimmed = JobCorpus.interactiveSession(spark, m)

    val cap = sys.env.get("GRAFT_QUERY_CAP_SEC")
      .flatMap(_.toIntOption).getOrElse(120)
    // Alternate cold laps (each profile's first lap pays its own JIT/
    // codegen), then a warm lap each.
    val coldD = cappedLap(dflt, cap)
    val coldT = cappedLap(trimmed, cap)
    val warmD = cappedLap(dflt, cap)
    val warmT = cappedLap(trimmed, cap)
    // Counts must agree on every query that completed under BOTH
    // profiles; a timeout is a latency fact, not a correctness pass.
    val common = coldD.counts.keySet intersect coldT.counts.keySet
    val diverging = common.filter(q => coldD.counts(q) != coldT.counts(q))
    require(diverging.isEmpty,
      s"profile counts diverge at x$m on: ${diverging.take(5)}")
    println(s"""{"facet":"profiles","m":$m,"queries":113,""" +
      s""""cap_sec":$cap,"counts_equal_on":${common.size},""" +
      s""""default_cold":${lapJson(coldD)},"trim_cold":${lapJson(coldT)},""" +
      s""""default_warm":${lapJson(warmD)},"trim_warm":${lapJson(warmT)}}""")
  }

  /** Chooser-routed corpus lap (r19 verdict #5): where the r18 profiles
    * facet measured both profiles via EXPLICIT sessions, this routes one
    * side through `JobCorpus.executionSession(spark, m)` — the exact
    * code path `runAll` (and hence the bench entry) takes — and laps the
    * OTHER profile as the counterfactual, so the record shows the gate
    * picking the measured winner on its own routing, each side of the
    * ×20 boundary. Counts must agree wherever both complete.
    */
  private def chooser(spark: SparkSession, m: Int): Unit = {
    JobCorpus.ensureData(spark, m)
    val routed = JobCorpus.executionSession(spark, m)
    val routedProfile =
      if (JobCorpus.useInteractiveProfile(m)) "interactive-trim" else "default"
    // executionSession's interactive child registers views itself via
    // interactiveSession; the default child is a plain newSession that
    // needs them. registerViews is idempotent per (session, m).
    JobCorpus.registerViews(routed, m)
    val other =
      if (JobCorpus.useInteractiveProfile(m)) {
        val d = spark.newSession(); JobCorpus.registerViews(d, m); d
      } else JobCorpus.interactiveSession(spark, m)
    val cap = sys.env.get("GRAFT_QUERY_CAP_SEC")
      .flatMap(_.toIntOption).getOrElse(120)
    val coldR = cappedLap(routed, cap)
    val coldO = cappedLap(other, cap)
    val warmR = cappedLap(routed, cap)
    val warmO = cappedLap(other, cap)
    val common = coldR.counts.keySet intersect coldO.counts.keySet
    val diverging = common.filter(q => coldR.counts(q) != coldO.counts(q))
    require(diverging.isEmpty,
      s"chooser-facet counts diverge at x$m on: ${diverging.take(5)}")
    println(s"""{"facet":"chooser","m":$m,"routed_profile":"$routedProfile",""" +
      s""""cap_sec":$cap,"counts_equal_on":${common.size},""" +
      s""""routed_cold":${lapJson(coldR)},"other_cold":${lapJson(coldO)},""" +
      s""""routed_warm":${lapJson(warmR)},"other_warm":${lapJson(warmO)}}""")
  }

  /** Full corpus through COMPASS on a PRODUCTION-conf session. Counts
    * are PRINTED in full and checked offline against an independent
    * DuckDB twin over the same scaled parquet — at x100 a vanilla-Spark
    * comparison lap is not available as a truth source (the profiles
    * facet measured ~20% of the corpus exploding past a 90 s/query cap
    * without sketch-informed ordering).
    */
  private def compass(spark: SparkSession, m: Int): Unit = {
    JobCorpus.ensureData(spark, m)
    val prod = spark.newSession() // user conf untouched: AQE + codegen ON
    val cs = new CompassSession(prod,
      templateCache = Some(SketchTemplateCache.default()))
    try {
      // PRE_PROCESSING (untimed, the reference's own shape).
      val nTemplates = JobCorpus.warmCompassAt(spark, cs, m)
      val (cCmp, tCold) = timed(counts(JobCorpus.runCompassFull(spark, cs, m)))
      val runsCold = JobCorpus.lastCompassRuns
      val (_, tWarm) = timed(counts(JobCorpus.runCompassFull(spark, cs, m)))
      val runsWarm = JobCorpus.lastCompassRuns
      def split(rs: Seq[JobCorpus.CompassRun]): (Long, Long, Long) =
        (rs.map(_.sketchMs).sum, rs.map(_.enumerateMs).sum, rs.map(_.execMs).sum)
      val (skC, enC, exC) = split(runsCold)
      val (skW, enW, exW) = split(runsWarm)
      val execTop = runsCold.sortBy(-_.execMs).take(5)
        .map(r => s""""${r.name}":${r.execMs}""").mkString(",")
      val countsJson = cCmp.toSeq.sorted
        .map { case (q, n) => s""""$q":$n""" }.mkString(",")
      println(s"""{"facet":"compass","m":$m,"queries":${cCmp.size},""" +
        s""""templates":$nTemplates,""" +
        s""""compass_cold_s":${f"$tCold%.1f"},"compass_warm_s":${f"$tWarm%.1f"},""" +
        s""""cold_ms":{"sketch":$skC,"enumerate":$enC,"exec":$exC},""" +
        s""""warm_ms":{"sketch":$skW,"enumerate":$enW,"exec":$exW},""" +
        s""""planning_fraction_cold":${f"${(skC + enC).toDouble / math.max(1, skC + enC + exC)}%.3f"},""" +
        s""""planning_fraction_warm":${f"${(skW + enW).toDouble / math.max(1, skW + enW + exW)}%.3f"},""" +
        s""""exec_top5_ms":{$execTop},"counts":{$countsJson}}""")
    } finally cs.close()
  }

  /** r21 verdict #7 — adjudicate the ×100 cap-outs at plan level: ONE
    * capped cold lap on the winning (default/AQE) profile names the
    * queries that hit the cap, then each cap-out's static physical plan
    * is summarized (join strategies, exchange count, estimated sizes) so
    * the record says WHAT they wait on, not just that they time out.
    */
  private def capouts(spark: SparkSession, m: Int): Unit = {
    JobCorpus.ensureData(spark, m)
    val dflt = spark.newSession()
    JobCorpus.registerViews(dflt, m)
    val cap = sys.env.get("GRAFT_QUERY_CAP_SEC")
      .flatMap(_.toIntOption).getOrElse(120)
    val lap = cappedLap(dflt, cap)
    val byName = JobCorpus.queries.toMap
    val planSummaries = lap.timeouts.map { q =>
      val plan = dflt.sql(byName(q)).queryExecution.executedPlan.toString
      def n(pat: String) = pat.r.findAllIn(plan).size
      s""""$q":{"smj":${n("SortMergeJoin")},"bhj":${n("BroadcastHashJoin")},""" +
        s""""shj":${n("ShuffledHashJoin")},"exchanges":${n("Exchange ")},""" +
        s""""nested_loop":${n("NestedLoop")}}"""
    }.mkString("{", ",", "}")
    println(s"""{"facet":"capouts","m":$m,"cap_sec":$cap,""" +
      s""""completed":${lap.counts.size},"wall_s":${f"${lap.wallS}%.1f"},""" +
      s""""timeouts":${lap.timeouts.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""timeout_plans":$planSummaries,"lap":${lapJson(lap)}}""")
  }

  private def skip(spark: SparkSession, m: Int): Unit = {
    val f = JobCorpus.measureSkipPolicyAt(spark, m)
    println(s"""{"facet":"skip","m":$m,"off_plan_ms":${f.offPlanMs},""" +
      s""""on_plan_ms":${f.onPlanMs},"n_skipped":${f.nSkipped},""" +
      s""""families":${f.families},"all_equal":${f.allEqual}}""")
  }
}
