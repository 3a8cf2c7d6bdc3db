package graft

import graft.sketch.{ColumnSeeds, Estimator, SketchGroup}
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 verdict item 4: does the REFERENCE's multi-way estimate
  * survive a join chain whose edges live in DIFFERENT seed equivalence
  * classes (A⋈B on x, B⋈C on y)?
  *
  * The reference composes, per traversal node, a working plane as the
  * element-wise min-|v| over the node's own join-column planes toward the
  * other members (RelAlgExecutor.cpp:2143-2169 driving
  * Sketch/Sketches.h:96-113), then takes the per-(row,bucket) product
  * summed over buckets, median over rows (Sketches.h:178-204). Its seed
  * assignment gives each join-attribute equivalence class its OWN seeds
  * (FilterPushDownSketch.cpp:1313-1350 shares seeds transitively across
  * predicate sides — two unrelated attributes never share). So on a
  * cross-class chain the product multiplies counters hashed by UNRELATED
  * ξ functions. AGMS theory (Dobra et al., SIGMOD'02) makes the product
  * unbiased only when the connecting relation is sketched with the
  * per-tuple PRODUCT ξ_x(t.x)·ξ_y(t.y) into one plane — the min-|v|
  * overlay of two independently-seeded single-attribute planes is not
  * that, and its expectation telescopes to zero-mean noise.
  *
  * This spec replicates the reference composition EXACTLY (same
  * composedMinPlane, same product-median, reference dims 73×1021, fixed
  * seeds) on data engineered so the true sizes are closed-form, and pins
  * the measured outcome:
  *   - single-class 3-chain (all edges on x): accurate — the regime the
  *     port keeps on the reference path via the alignment guard;
  *   - cross-class 3-chain: degenerate by orders of magnitude — the
  *     regime the guard routes to the independence cascade, whose error
  *     is ALSO pinned here (exact on this data, independence holds by
  *     construction).
  *
  * Committed numbers live in ESTIMATES.md §"Cross-class multi-way:
  * reference-math replication".
  */
class MultiwayDivergenceSpec extends AnyFunSuite {
  private val R = 73
  private val B = 1021

  // Two seed classes, fixed: x-class and y-class (the reference persists
  // per-class seeds the same way — sketch_templates_seeds.txt).
  private val seedX = ColumnSeeds.deterministic(R, 0xC0FFEE01L)
  private val seedY = ColumnSeeds.deterministic(R, 0xBEEF0002L)

  /** A: x ∈ 0..199 ×5 (1000 rows); B: (x, y=(13x)%50) once per x (200
    * rows); C: y ∈ 0..49 ×10 (500 rows).
    * True |A⋈B| = 1000; |B⋈C| = 2000; |A⋈B⋈C| = 200·5·10 = 10000.
    */
  private def buildChain(): (SketchGroup, SketchGroup, SketchGroup) = {
    val a = new SketchGroup(R, B, Array("x"), Array(seedX))
    val b = new SketchGroup(R, B, Array("x", "y"), Array(seedX, seedY))
    val c = new SketchGroup(R, B, Array("y"), Array(seedY))
    for (x <- 0 until 200; _ <- 0 until 5) a.update(Array(x))
    for (x <- 0 until 200) b.update(Array(x, (13 * x) % 50))
    for (y <- 0 until 50; _ <- 0 until 10) c.update(Array(y))
    (a, b, c)
  }

  /** Reference multi-way on the chain: A's x-plane, B's min-|v|(x,y)
    * composite, C's y-plane → product-median. Exactly what
    * estimate_join_size does for tree_size == 3 on this shape.
    */
  private def referenceChainEstimate(
      a: SketchGroup, b: SketchGroup, c: SketchGroup): Double =
    Estimator.multiway(Array(
      a.planes(0),
      b.composedMinPlane(Seq(0, 1)),
      c.planes(0)), R, B)

  test("single-class 3-chain (all edges one seed class): reference multi-way is accurate") {
    // A(x) ×5, B(x) ×1, C(x) ×2 over x ∈ 0..199 — every edge on x, one
    // seed class. True 3-way = Σ_x 5·1·2 = 2000.
    val a = new SketchGroup(R, B, Array("x"), Array(seedX))
    val b = new SketchGroup(R, B, Array("x"), Array(seedX))
    val c = new SketchGroup(R, B, Array("x"), Array(seedX))
    for (x <- 0 until 200; _ <- 0 until 5) a.update(Array(x))
    for (x <- 0 until 200) b.update(Array(x))
    for (x <- 0 until 200; _ <- 0 until 2) c.update(Array(x))
    val est = Estimator.multiway(
      Array(a.planes(0), b.planes(0), c.planes(0)), R, B)
    val qerr = math.max(est / 2000.0, 2000.0 / est)
    info(f"single-class: est=$est%.1f true=2000 q-error=$qerr%.2f")
    assert(qerr < 2.0,
      s"aligned multi-way should be accurate; est=$est (q-error $qerr)")
  }

  test("CROSS-class 3-chain: the reference composition structurally " +
      "UNDERestimates (measured ~20x) while its pairwise inputs are accurate") {
    val (a, b, c) = buildChain()
    // Pairwise (both edges single-class) stays accurate — the inputs are
    // healthy; only the multi-way composition is at issue.
    val estAB = Estimator.pairwise(a.planes(0), b.planes(0), R, B)
    val estBC = Estimator.pairwise(b.planes(1), c.planes(0), R, B)
    assert(math.max(estAB / 1000.0, 1000.0 / estAB) < 2.0, s"|A⋈B| est=$estAB")
    assert(math.max(estBC / 2000.0, 2000.0 / estBC) < 2.0, s"|B⋈C| est=$estBC")

    val est = referenceChainEstimate(a, b, c)
    val qerr = math.max(est / 10000.0, 10000.0 / est)
    info(f"cross-class: est=$est%.4g true=10000 q-error=$qerr%.4g")
    // The committed negative result (measured here: est≈450, ~22x UNDER):
    // cross-bucket mass survives the cross-class product only when the
    // two UNRELATED hash families happen to land a matching (x, y) pair
    // in the same bucket (~1/buckets of it), so the estimate is a
    // structural underestimate, not noise around truth. If a future
    // change makes this accurate (< 10x), this fails loudly and the
    // alignment guard should be re-evaluated (ESTIMATES.md).
    assert(qerr >= 10.0,
      f"expected structural cross-class degeneracy; est=$est%.4g is within " +
        f"$qerr%.1fx of true 10000 — re-evaluate the alignment guard")
    assert(est < 10000.0, f"degeneracy is an UNDERestimate by theory; got $est%.4g")

    // The cascade the port uses instead: Π counts × Π edge selectivities
    // (pairwise sketch estimates). Independence holds by construction on
    // this data, so it must land close.
    val counts = 1000.0 * 200.0 * 500.0
    val cascade = counts * (estAB / (1000.0 * 200.0)) * (estBC / (200.0 * 500.0))
    val cascadeQ = math.max(cascade / 10000.0, 10000.0 / cascade)
    info(f"cascade: est=$cascade%.1f true=10000 q-error=$cascadeQ%.2f")
    assert(cascadeQ < 2.0,
      f"the guard's cascade must stay accurate where independence holds; got $cascade%.1f")
  }

  test("CROSS-class 4-chain: the degeneracy COMPOUNDS with depth (>= 100x) — " +
      "the ESTIMATES.md est->1 collapse reproduced in vitro") {
    // A(x)×5, B(x,y), C(y,z)×10 with z=(3y)%25, D(z)×4.
    // True |A⋈B⋈C⋈D| = Σ_x 5·1·10·4 = 200·200 = 40000.
    val seedZ = ColumnSeeds.deterministic(R, 0xD00D0003L)
    val a = new SketchGroup(R, B, Array("x"), Array(seedX))
    val b = new SketchGroup(R, B, Array("x", "y"), Array(seedX, seedY))
    val c = new SketchGroup(R, B, Array("y", "z"), Array(seedY, seedZ))
    val d = new SketchGroup(R, B, Array("z"), Array(seedZ))
    for (x <- 0 until 200; _ <- 0 until 5) a.update(Array(x))
    for (x <- 0 until 200) b.update(Array(x, (13 * x) % 50))
    for (y <- 0 until 50; _ <- 0 until 10) c.update(Array(y, (3 * y) % 25))
    for (z <- 0 until 25; _ <- 0 until 4) d.update(Array(z))
    val est = Estimator.multiway(Array(
      a.planes(0),
      b.composedMinPlane(Seq(0, 1)),
      c.composedMinPlane(Seq(0, 1)),
      d.planes(0)), R, B)
    val qerr = math.max(est / 40000.0, 40000.0 / est)
    info(f"4-chain: est=$est%.4g true=40000 q-error=$qerr%.4g")
    assert(qerr >= 100.0 && est < 40000.0,
      f"each extra cross-class hop multiplies another ~1/buckets capture " +
        f"factor; est=$est%.4g q-error=$qerr%.1f")

    // The cascade stays accurate at depth 4 on the same data.
    val estAB = Estimator.pairwise(a.planes(0), b.planes(0), R, B)
    val estBC = Estimator.pairwise(b.planes(1), c.planes(0), R, B)
    val estCD = Estimator.pairwise(c.planes(1), d.planes(0), R, B)
    val cascade = (1000.0 * 200.0 * 500.0 * 100.0) *
      (estAB / (1000.0 * 200.0)) * (estBC / (200.0 * 500.0)) *
      (estCD / (500.0 * 100.0))
    val cascadeQ = math.max(cascade / 40000.0, 40000.0 / cascade)
    info(f"4-chain cascade: est=$cascade%.1f true=40000 q-error=$cascadeQ%.2f")
    assert(cascadeQ < 2.0, f"cascade at depth 4: $cascade%.1f")
  }

  test("cross-class degeneracy is seed-robust (5 seed pairs, all >= 10x under)") {
    // One unlucky seed pair could fake the negative result; five
    // independent draws pin it as structural.
    (1 to 5).foreach { trial =>
      val sx = ColumnSeeds.deterministic(R, 1000L + trial)
      val sy = ColumnSeeds.deterministic(R, 2000L + trial)
      val a = new SketchGroup(R, B, Array("x"), Array(sx))
      val b = new SketchGroup(R, B, Array("x", "y"), Array(sx, sy))
      val c = new SketchGroup(R, B, Array("y"), Array(sy))
      for (x <- 0 until 200; _ <- 0 until 5) a.update(Array(x))
      for (x <- 0 until 200) b.update(Array(x, (13 * x) % 50))
      for (y <- 0 until 50; _ <- 0 until 10) c.update(Array(y))
      val est = referenceChainEstimate(a, b, c)
      val qerr = math.max(est / 10000.0, 10000.0 / est)
      info(f"trial $trial: est=$est%.4g q-error=$qerr%.4g")
      assert(qerr >= 10.0 && est < 10000.0,
        f"trial $trial: est=$est%.4g q-error=$qerr%.2f")
    }
  }
}
