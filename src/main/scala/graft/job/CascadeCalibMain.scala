package graft.job

import graft.enumerate.Enumerator
import graft.planner.{CompassSession, OptimizerQuality, SketchTemplateCache}
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable
import scala.util.control.NonFatal

/** Cascade-cost-model calibration harness (r17 verdict #5; ESTIMATES §7).
  *
  * The §4-addendum proved every remaining hybrid-vs-best loss (8a, 18a,
  * 12a, 19a, 29a) is the cascade MODEL mis-ranking orders — not a search
  * artifact — so portfolio rescoring under the same model inherits the
  * same errors. The prescribed next step: fit a correction against the
  * (cascade-estimate, measured-true-rows) pairs the quality harness
  * already produces, A/B the calibrated model on plan CHOICE over both
  * workloads, and ship only if it wins BOTH with no family worse.
  *
  * Phase 1 collects per-prefix points from every distinct candidate
  * order (reference / cascade / hybrid / stock) of every family: the raw
  * cascade estimate, the spine-measured true rows, and the features
  * (prefix size k, excess internal edges x beyond a spanning tree — the
  * independence products the cascade multiplies beyond what an acyclic
  * join needs). Phase 2 fits three OLS variants on
  * y = ln(true) − ln(est): intercept+x, intercept+k, intercept+x+k.
  * Phase 3 re-enumerates every family under each calibrated model
  * (cascade and hybrid search modes) and measures the chosen orders'
  * Σ true intermediates against the shipping hybrid.
  *
  * Usage: `sbt "runMain graft.job.CascadeCalibMain"`.
  */
object CascadeCalibMain {

  final case class Point(workload: String, family: String, src: String,
      k: Int, x: Int, est: Double, trueRows: Long) {
    def y: Double =
      math.log(math.max(trueRows.toDouble, 1.0)) - math.log(math.max(est, 1.0))
  }

  /** One family's reusable evaluation context: the sketch graph stays
    * valid after collection, so calibrated re-enumerations and their
    * spine measurements run against identical inputs.
    */
  final case class Fam(workload: String, name: String,
      g: graft.plans.ExtractedJoinGraph,
      nodes: IndexedSeq[graft.enumerate.GraphNode],
      edges: Seq[((Int, String), (Int, String))],
      rowsByOrder: mutable.Map[Seq[Int], Seq[Long]],
      hybOrder: Seq[Int]) {
    def hybSum: Long = rowsByOrder(hybOrder).sum
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cs = new CompassSession(spark,
      templateCache = Some(SketchTemplateCache.default()))
    JobCorpus.warmCompass(spark, cs)

    // The same two workloads as the §4 A/B: JOB 33 families at x1 and
    // the TPC-H quality battery at sf0.01.
    JobCorpus.ensureData(spark, 1)
    JobCorpus.registerViews(spark, 1)
    val jobByName = JobCorpus.queries.toMap
    val jobFams: Seq[(String, String, DataFrame)] =
      JobCorpus.compassSubset.map(n => ("job", n, spark.sql(jobByName(n))))
    graft.Tables.registerAll(spark, "/root/testdata/sf0.01")
    val tpchFams: Seq[(String, String, DataFrame)] =
      OptimizerQuality.specFamilies.map { case (f, t) =>
        ("tpch", f, spark.sql(t))
      }

    // ---- Phase 1: collect (feature, estimate, true) points ----------
    val points = mutable.Buffer.empty[Point]
    val fams = mutable.Buffer.empty[Fam]
    (jobFams ++ tpchFams).foreach { case (workload, name, df) =>
      val (g, nodes, edges) = cs.sketchGraph(df)
      val casEn = new Enumerator(nodes, edges,
        estimator = Enumerator.ModeCascade)
      def orderUnder(mode: String): Seq[Int] =
        new Enumerator(nodes, edges, estimator = mode).optimalOrder()._1
      val cand: Seq[(String, Seq[Int])] = Seq(
        "ref" -> orderUnder(Enumerator.ModeReference),
        "cas" -> orderUnder(Enumerator.ModeCascade),
        "hyb" -> orderUnder(Enumerator.ModeHybrid),
        "stock" -> casEn.stockOrder())
      val rowsByOrder = mutable.Map.empty[Seq[Int], Seq[Long]]
      def rowsOf(o: Seq[Int]): Seq[Long] =
        rowsByOrder.getOrElseUpdate(o, OptimizerQuality.prefixRows(spark, g, o))
      cand.distinctBy(_._2).foreach { case (src, o) =>
        val rows = rowsOf(o)
        (2 until o.size).foreach { k =>
          val prefix = o.take(k)
          val estOpt =
            try Some(casEn.estimate(prefix))
            catch { case NonFatal(_) => None }
          estOpt.foreach { est =>
            val (sz, x) = casEn.prefixFeatures(prefix)
            points += Point(workload, name, src, sz, x, est, rows(k - 2))
          }
        }
      }
      val hybO = cand.find(_._1 == "hyb").get._2
      rowsOf(hybO): Unit
      fams += Fam(workload, name, g, nodes, edges, rowsByOrder, hybO)
      System.err.println(s"[calib] $workload/$name: ${rowsByOrder.size} " +
        s"distinct orders, ${points.size} points so far")
    }

    // ---- Phase 2: fit OLS variants on y = ln(true) - ln(est) --------
    // A singular system (e.g. a feature constant across every collected
    // point — all prefixes at x=0 excess edges) skips THAT variant with
    // a report instead of aborting the whole harness and losing the
    // other variants' results (r18 advice).
    def fitOpt(label: String, ps: Seq[Point],
        features: Point => Seq[Double]): Option[(String, Array[Double], Double)] =
      if (ps.isEmpty) {
        println(s"fit $label: SKIPPED — no points"); None
      } else try Some(fit(label, ps, features)) catch {
        case e: IllegalArgumentException
            if Option(e.getMessage).exists(_.contains("singular")) =>
          println(s"fit $label: SKIPPED — ${e.getMessage}"); None
      }

    def fit(label: String, ps: Seq[Point],
        features: Point => Seq[Double]): (String, Array[Double], Double) = {
      val xs = ps.map(p => 1.0 +: features(p))
      val ys = ps.map(_.y)
      val d = xs.head.size
      val ata = Array.ofDim[Double](d, d)
      val aty = Array.ofDim[Double](d)
      xs.zip(ys).foreach { case (row, y) =>
        var i = 0
        while (i < d) {
          aty(i) += row(i) * y
          var j = 0
          while (j < d) { ata(i)(j) += row(i) * row(j); j += 1 }
          i += 1
        }
      }
      // Gaussian elimination with partial pivoting on the d x d system.
      val m = ata.map(_.clone())
      val b = aty.clone()
      var col = 0
      while (col < d) {
        var piv = col
        var r = col + 1
        while (r < d) { if (math.abs(m(r)(col)) > math.abs(m(piv)(col))) piv = r; r += 1 }
        val tmp = m(col); m(col) = m(piv); m(piv) = tmp
        val tb = b(col); b(col) = b(piv); b(piv) = tb
        require(math.abs(m(col)(col)) > 1e-12, s"singular normal equations in $label")
        r = 0
        while (r < d) {
          if (r != col) {
            val f = m(r)(col) / m(col)(col)
            var j = 0
            while (j < d) { m(r)(j) -= f * m(col)(j); j += 1 }
            b(r) -= f * b(col)
          }
          r += 1
        }
        col += 1
      }
      val beta = Array.tabulate(d)(i => b(i) / m(i)(i))
      val mean = ys.sum / ys.size
      val ssTot = ys.map(y => (y - mean) * (y - mean)).sum
      val ssRes = xs.zip(ys).map { case (row, y) =>
        val pred = row.zip(beta).map { case (a2, c) => a2 * c }.sum
        (y - pred) * (y - pred)
      }.sum
      val r2 = if (ssTot > 0) 1.0 - ssRes / ssTot else 0.0
      (label, beta, r2)
    }

    val pooled = points.toSeq
    println(s"\n### §7 cascade-model calibration — ${pooled.size} " +
      s"(estimate, true) prefix points from ${fams.size} families\n")
    // Interpretable residual structure: mean log-ratio by excess edges
    // and by prefix size, with counts — the shape the fit summarizes.
    println("| feature | value | n | mean ln(true/est) |")
    println("|---|---|---|---|")
    pooled.groupBy(_.x).toSeq.sortBy(_._1).foreach { case (x, ps) =>
      println(f"| excess edges | $x | ${ps.size} | ${ps.map(_.y).sum / ps.size}%.3f |")
    }
    pooled.groupBy(_.k).toSeq.sortBy(_._1).foreach { case (k, ps) =>
      println(f"| prefix size | $k | ${ps.size} | ${ps.map(_.y).sum / ps.size}%.3f |")
    }

    val variants: Seq[(String, Enumerator.CascadeCalib)] = {
      val fx = fitOpt("excess", pooled, p => Seq(p.x.toDouble))
      val fk = fitOpt("size", pooled, p => Seq(p.k.toDouble))
      val ff = fitOpt("full", pooled,
        p => Seq(p.x.toDouble, p.k.toDouble))
      fx.foreach { case (_, bx, r2x) =>
        println(f"\nfit excess: y = ${bx(0)}%.4f + ${bx(1)}%.4f·x (R²=$r2x%.3f)") }
      fk.foreach { case (_, bk, r2k) =>
        println(f"fit size:   y = ${bk(0)}%.4f + ${bk(1)}%.4f·k (R²=$r2k%.3f)") }
      ff.foreach { case (_, bf, r2f) =>
        println(f"fit full:   y = ${bf(0)}%.4f + ${bf(1)}%.4f·x + ${bf(2)}%.4f·k (R²=$r2f%.3f)") }
      // Per-workload coefficient stability (reported, not shipped).
      Seq("job", "tpch").foreach { w =>
        val ps = pooled.filter(_.workload == w)
        fitOpt(s"full/$w", ps, p => Seq(p.x.toDouble, p.k.toDouble)).foreach {
          case (_, bw, r2w) =>
            println(f"fit full [$w only]: y = ${bw(0)}%.4f + ${bw(1)}%.4f·x + " +
              f"${bw(2)}%.4f·k (R²=$r2w%.3f, n=${ps.size})")
        }
      }
      Seq(
        fx.map { case (_, b, _) => "excess" -> Enumerator.CascadeCalib(b(0), b(1), 0.0) },
        fk.map { case (_, b, _) => "size" -> Enumerator.CascadeCalib(b(0), 0.0, b(1)) },
        ff.map { case (_, b, _) => "full" -> Enumerator.CascadeCalib(b(0), b(1), b(2)) }
      ).flatten
    }

    // ---- Phase 3: plan-choice A/B of each calibrated model ----------
    variants.foreach { case (label, calib) =>
      println(s"\n### variant '$label' — calib = $calib\n")
      println("| workload | family | Σ hyb (ship) | Σ hyb+cal | Σ cas+cal | hyb+cal vs ship |")
      println("|---|---|---|---|---|---|")
      var shipTotJob, calTotJob, shipTotTpch, calTotTpch = 0L
      var worse = 0; var better = 0
      fams.foreach { f =>
        def sumOf(o: Seq[Int]): Long =
          f.rowsByOrder.getOrElseUpdate(o,
            OptimizerQuality.prefixRows(spark, f.g, o)).sum
        def orderUnder(mode: String): Seq[Int] =
          new Enumerator(f.nodes, f.edges, estimator = mode,
            calib = Some(calib)).optimalOrder()._1
        val calHyb = sumOf(orderUnder(Enumerator.ModeHybrid))
        val calCas = sumOf(orderUnder(Enumerator.ModeCascade))
        val ship = f.hybSum
        val verdict =
          if (calHyb < ship) { better += 1; "BETTER" }
          else if (calHyb > ship) { worse += 1; "WORSE" }
          else "="
        if (f.workload == "job") { shipTotJob += ship; calTotJob += calHyb }
        else { shipTotTpch += ship; calTotTpch += calHyb }
        if (verdict != "=")
          println(s"| ${f.workload} | ${f.name} | $ship | $calHyb | $calCas | $verdict |")
      }
      println(s"\nvariant '$label': JOB Σ ship=$shipTotJob cal=$calTotJob; " +
        s"TPC-H Σ ship=$shipTotTpch cal=$calTotTpch; " +
        s"families better=$better worse=$worse " +
        s"(ties omitted from the table)")
      val wins = calTotJob <= shipTotJob && calTotTpch <= shipTotTpch &&
        worse == 0 && (calTotJob < shipTotJob || calTotTpch < shipTotTpch)
      println(s"ship decision for '$label': " +
        (if (wins) "WINS both workloads, no family worse" else "DO NOT SHIP"))
    }
    spark.stop()
  }
}
