package graft

import graft.operators.{Similarity, TextDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Standing gate over the three ×1000-campaign scale defects fixed in
  * r18 (SCALE.md) — sf-small reproducers in the default test run, so
  * none of them can silently regress:
  *
  *  1. cosineNearDups wide-exchange spill: every candidate pair used to
  *     shuffle BOTH dim-wide vector payloads into the dedup exchange
  *     (~1 TB spill at 2 M vectors, died). Fixed by running cosine +
  *     threshold inside the bucket join's stage so only narrow
  *     (id_a, id_b, cos) survivors cross. Gated on the LOGICAL plan: the
  *     Deduplicate node's child must output no array column.
  *  2. MinHash hub recall: oversized LSH buckets used to be DROPPED, so
  *     a replicated near-dup family (the web-crawl shape ScaleGen
  *     plants) lost every candidate — 448k bogus survivors at ×1000.
  *     Gated by survivor-count INVARIANCE across replica multipliers on
  *     real ScaleGen output (replicas are near-dups of their base, so
  *     scaling k must not change the kept set beyond the per-family
  *     keeper), plus SkewGuardRecallSpec's adversarial recall gate.
  *  3. SemDeDup quadratic clustering: nCentroids pinned at 16 made the
  *     per-cluster self-join Σ|cluster|² quadratic in n (1.25 G cosines
  *     at 200k vectors). Gated on the sizing rule the entry uses.
  */
class ScaleDefectGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("cosineNearDups: only narrow survivors cross the dedup exchange") {
    import spark.implicits._
    val df = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 7 + d * 13).toFloat))
    }.toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDups(df, "vec_id", "embedding",
      threshold = 0.8, bits = 4, tables = 2, dim = 8)
    // dropDuplicates(subset) optimizes to Aggregate(group = subset,
    // first(rest)) — that aggregate's grouping induces the exchange.
    val dedup = pairs.queryExecution.optimizedPlan.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.size == 2 => a
    }.getOrElse(fail("no dedup Aggregate node — operator shape changed, re-pin the gate"))
    val childOut = dedup.child.output
    assert(childOut.forall(a =>
        !a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]),
      s"vector payloads cross the dedup exchange again (the ×1000 spill " +
        s"defect): ${childOut.map(a => s"${a.name}:${a.dataType.simpleString}")}")
    assert(childOut.map(_.name).toSet == Set("id_a", "id_b", "cos"),
      s"dedup input widened beyond the survivor triple: ${childOut.map(_.name)}")
    // And the threshold filter sits BELOW the dedup (survivors-only).
    // The optimizer pushes the threshold predicate all the way INTO the
    // bucket join's condition (alias `cos` inlined by CollapseProject) —
    // accept it in a Filter or the Join itself, anywhere below the dedup.
    val hasFilterBelow = dedup.child.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.toString.contains("0.8") => f
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.toString.contains("0.8")) => j
    }.isDefined
    assert(hasFilterBelow,
      "cosine threshold no longer runs below the dedup — candidates " +
        "would materialize before filtering")
  }

  test("minhash hub recall: survivors invariant across ScaleGen replica multipliers") {
    // Real ScaleGen output (FK remap + per-replica near-dup text), the
    // exact generator the ×100/×1000 campaign ran — at sf0.001 so the
    // gate costs seconds. Replicas append a per-replica token to the
    // base text: every replica is a near-dup of its base (and of its
    // sibling replicas), so under the keep-min rule each base doc's
    // family collapses to ONE keeper regardless of k ≥ 2 — the kept
    // COUNT must be identical at ×2 and ×4. The r18 defect (dropping
    // oversized buckets) broke exactly this: families lost all
    // candidates and the count exploded with k.
    val base = "/root/testdata/sf0.001"
    def survivorCount(dir: String): Long = {
      val docs = Tables.load(spark, dir, "documents")
      val dups = TextDedup.minhashNearDups(docs, "doc_id", "text",
        threshold = 0.8)
      try docs.join(dups.select(col("id_b").as("doc_id")),
          Seq("doc_id"), "left_anti").count()
      finally graft.operators.OpCaches.releaseAll(spark)
    }
    val counts = Seq(2, 4).map { k =>
      val dest = s"target/scale_gate_x$k"
      ScaleGen.generate(spark, base, dest, k)
      k -> survivorCount(dest)
    }
    val baseCount = survivorCount(base)
    info(s"survivors: x1=$baseCount ${counts.map { case (k, c) => s"x$k=$c" }.mkString(" ")}")
    assert(counts.map(_._2).distinct.size == 1,
      s"survivor count varies with replica multiplier — hub recall " +
        s"regressed: $counts")
    // The scaled keeper set can exceed the base count only by the
    // SHORT-document families whose replica token shifts Jaccard below
    // threshold (bounded, k-independent); it must never scale with k.
    assert(counts.head._2 < 2 * baseCount,
      s"scaled survivors ${counts.head._2} vs base $baseCount — families " +
        "are not collapsing")
  }

  test("semDedup centroid sizing stays linear (no pinned cluster count)") {
    assert(Similarity.semDedupCentroids(2000) == 16)   // driver scale: floor
    assert(Similarity.semDedupCentroids(200000) == 200) // the ×1000 fix
    assert(Similarity.semDedupCentroids(2000000) == 2000)
    // Linearity: doubling n doubles clusters (past the floor), keeping
    // Σ|cluster|² ≈ n·1000 instead of n²/16.
    val a = Similarity.semDedupCentroids(500000)
    val b = Similarity.semDedupCentroids(1000000)
    assert(b == 2 * a, s"sizing rule no longer linear: $a vs $b")
  }
}
