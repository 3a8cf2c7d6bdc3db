package graft

import graft.enumerate.{Enumerator, GraphNode}
import graft.sketch.{SeedRegistry, SketchGroup}
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the join-order enumerator on graphs with hand-computable
  * optimal orders (VERDICT r1 next-step #4).
  */
class EnumeratorSpec extends AnyFunSuite {
  private val rows = 73
  private val buckets = 1021

  /** Build a sketch group for one table instance from key tuples. */
  private def mkSketch(
      reg: SeedRegistry, inst: String, cols: Seq[String],
      data: Seq[Seq[Int]]): SketchGroup = {
    val g = new SketchGroup(rows, buckets, cols.toArray,
      cols.map(c => reg.seedsFor((inst, c))).toArray)
    data.foreach(t => g.update(t.toArray))
    g
  }

  test("chain graph: enumerator picks the selective end first") {
    // Chain: big(k) - mid(k, j) - small(j). `small` is tiny (selective
    // filter survivor), so starting from it minimizes intermediates.
    val reg = new SeedRegistry(rows)
    reg.addPredicate(("0", "k"), ("1", "k"))
    reg.addPredicate(("1", "j"), ("2", "j"))
    val rng = new scala.util.Random(3)
    val big = mkSketch(reg, "0", Seq("k"), Seq.fill(20000)(Seq(rng.nextInt(500))))
    val mid = mkSketch(reg, "1", Seq("k", "j"),
      Seq.fill(8000)(Seq(rng.nextInt(500), rng.nextInt(400))))
    val small = mkSketch(reg, "2", Seq("j"), Seq.fill(50)(Seq(rng.nextInt(400))))

    val en = new Enumerator(
      IndexedSeq(GraphNode(0, big), GraphNode(1, mid), GraphNode(2, small)),
      Seq(((0, "k"), (1, "k")), ((1, "j"), (2, "j"))))
    val (order, cost) = en.optimalOrder()
    // Connected prefix constraint: the chain end {2} must be followed by 1.
    assert(order.head == 2, s"expected to start from the small end, got $order")
    assert(order(1) == 1, s"chain order must be connected: $order")
    assert(cost > 0)
    // Cost of starting small must beat starting big: est(2,1) < est(0,1).
    assert(en.estimate(Seq(2, 1)) < en.estimate(Seq(0, 1)))
  }

  test("estimates are memoized per node set, not per order") {
    val reg = new SeedRegistry(rows)
    reg.addPredicate(("0", "k"), ("1", "k"))
    val rng = new scala.util.Random(9)
    val a = mkSketch(reg, "0", Seq("k"), Seq.fill(3000)(Seq(rng.nextInt(100))))
    val b = mkSketch(reg, "1", Seq("k"), Seq.fill(2000)(Seq(rng.nextInt(100))))
    val en = new Enumerator(
      IndexedSeq(GraphNode(0, a), GraphNode(1, b)),
      Seq(((0, "k"), (1, "k"))))
    assert(en.estimate(Seq(0, 1)) == en.estimate(Seq(1, 0)))
  }

  test("pairwise estimates track true sizes closely enough to rank orders") {
    // star: center(k1,k2) joins left(k1), right(k2); left tiny, right huge.
    val reg = new SeedRegistry(rows)
    reg.addPredicate(("0", "k1"), ("1", "k1"))
    reg.addPredicate(("0", "k2"), ("2", "k2"))
    val rng = new scala.util.Random(17)
    val center = mkSketch(reg, "0", Seq("k1", "k2"),
      Seq.fill(5000)(Seq(rng.nextInt(200), rng.nextInt(200))))
    val left = mkSketch(reg, "1", Seq("k1"), Seq.fill(100)(Seq(rng.nextInt(200))))
    val right = mkSketch(reg, "2", Seq("k2"), Seq.fill(30000)(Seq(rng.nextInt(200))))
    val en = new Enumerator(
      IndexedSeq(GraphNode(0, center), GraphNode(1, left), GraphNode(2, right)),
      Seq(((0, "k1"), (1, "k1")), ((0, "k2"), (2, "k2"))))
    val (order, _) = en.optimalOrder()
    // The only intermediate is the first pair; center⋈left (~2.5k) beats
    // center⋈right (~750k), so the traversal must not start with right.
    assert(order.take(2).toSet == Set(0, 1), s"expected center+left first, got $order")
  }

  test("no-edge fallback: descending cardinality (MapD stock order)") {
    val reg = new SeedRegistry(rows)
    val a = mkSketch(reg, "0", Seq("k"), Seq.fill(10)(Seq(1)))
    val b = mkSketch(reg, "1", Seq("k"), Seq.fill(500)(Seq(1)))
    val en = new Enumerator(
      IndexedSeq(GraphNode(0, a), GraphNode(1, b)), Seq.empty)
    assert(en.optimalOrder()._1 == Seq(1, 0))
  }

  test("traversal bound keeps dense graphs tractable") {
    // complete graph K7 — unbounded enumeration is 7! orders; the 100-step
    // bound per start must cap the work while still returning an order.
    val reg = new SeedRegistry(rows)
    val n = 7
    for (i <- 0 until n; j <- i + 1 until n)
      reg.addPredicate((i.toString, "k"), (j.toString, "k"))
    val rng = new scala.util.Random(23)
    val nodes = (0 until n).map { i =>
      GraphNode(i, mkSketch(reg, i.toString, Seq("k"),
        Seq.fill(100 * (i + 1))(Seq(rng.nextInt(50)))))
    }
    val edges = for (i <- 0 until n; j <- i + 1 until n)
      yield ((i, "k"), (j, "k"))
    val en = new Enumerator(nodes.toIndexedSeq, edges)
    val t0 = System.nanoTime()
    val (order, _) = en.optimalOrder()
    val ms = (System.nanoTime() - t0) / 1e6
    assert(order.toSet == (0 until n).toSet)
    assert(ms < 5000, s"enumeration took ${ms}ms — bound not effective")
  }
}
