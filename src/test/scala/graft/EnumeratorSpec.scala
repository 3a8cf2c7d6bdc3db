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

  test("composite-key edges estimate from the FIRST column pair only (pinned divergence)") {
    // Reference-faithful: `join_cols_info.find` takes the first entry
    // (mapd-core/QueryEngine/RelAlgExecutor.cpp:2104-2118), and
    // Enumerator.joinCols mirrors it — a two-column composite edge is
    // estimated as if only its first column joined, systematically
    // OVER-estimating (the second predicate's selectivity is dropped).
    // This golden pins the behavior so a future "improvement" (min over
    // pairs, product of selectivities, …) cannot silently change plan
    // choices that the K-goldens and the quality battery were tuned
    // against; change it only together with this spec and a COVERAGE
    // note update (§2.8).
    val reg = new SeedRegistry(rows)
    reg.addPredicate(("0", "k"), ("1", "k"))
    reg.addPredicate(("0", "j"), ("1", "j"))
    val rng = new scala.util.Random(23)
    val aData = Seq.fill(4000)(Seq(rng.nextInt(100), rng.nextInt(500)))
    val bData = Seq.fill(3000)(Seq(rng.nextInt(100), rng.nextInt(500)))
    val a = mkSketch(reg, "0", Seq("k", "j"), aData)
    val b = mkSketch(reg, "1", Seq("k", "j"), bData)
    val en = new Enumerator(
      IndexedSeq(GraphNode(0, a), GraphNode(1, b)),
      Seq(((0, "k"), (1, "k")), ((0, "j"), (1, "j"))))
    // EXACTLY the k-only pairwise estimate — bit-equal, not approximately.
    val kOnly = graft.sketch.Estimator.pairwise(
      a.planes(a.columnIndex("k")), b.planes(b.columnIndex("k")),
      rows, buckets)
    assert(en.estimate(Seq(0, 1)) == kOnly,
      "composite edge no longer estimates from the first column pair")
    // And that number over-estimates the composite truth by ~|j-domain|:
    // true |a ⋈(k,j) b| is ~500x smaller than |a ⋈(k) b|.
    val trueComposite = {
      val bSet = bData.groupBy(identity).view.mapValues(_.size)
      aData.iterator.map(t => bSet.getOrElse(t, 0)).sum
    }
    assert(kOnly > 10.0 * math.max(trueComposite, 1),
      s"expected the pinned over-estimate: est=$kOnly true=$trueComposite")
  }

  test("no-edge fallback: descending cardinality (MapD stock order)") {
    val reg = new SeedRegistry(rows)
    val a = mkSketch(reg, "0", Seq("k"), Seq.fill(10)(Seq(1)))
    val b = mkSketch(reg, "1", Seq("k"), Seq.fill(500)(Seq(1)))
    val en = new Enumerator(
      IndexedSeq(GraphNode(0, a), GraphNode(1, b)), Seq.empty)
    assert(en.optimalOrder()._1 == Seq(1, 0))
  }

  test("K8 golden: two-cycle 8-node graph picks the selective component first") {
    // Mirrors q_compass_8way's topology: a chain fact(0)-orders(1)-cust(2)-
    // n1(3)-region(6), a branch fact-supp(4)-n2(5)-region(6) closing the
    // cycle, and a part(7) branch. region is a 2-row filter survivor, so
    // every good order grows outward from {6}; the fact table (20k rows)
    // must come LAST or next-to-last.
    val reg = new SeedRegistry(rows)
    val edgeSpec = Seq(
      ((0, "ok"), (1, "ok")), ((1, "ck"), (2, "ck")), ((2, "nk"), (3, "nk")),
      ((0, "sk"), (4, "sk")), ((4, "nk2"), (5, "nk2")),
      ((3, "rk"), (6, "rk")), ((5, "rk"), (6, "rk")),
      ((0, "pk"), (7, "pk")))
    edgeSpec.foreach { case ((i, a), (j, b)) =>
      reg.addPredicate((i.toString, a), (j.toString, b))
    }
    val rng = new scala.util.Random(29)
    def tab(i: Int, cols: Seq[String], n: Int, dom: Int): GraphNode =
      GraphNode(i, mkSketch(reg, i.toString, cols,
        Seq.fill(n)(cols.map(_ => rng.nextInt(dom)))))
    val nodes = IndexedSeq(
      tab(0, Seq("ok", "sk", "pk"), 20000, 400),
      tab(1, Seq("ok", "ck"), 5000, 400),
      tab(2, Seq("ck", "nk"), 1500, 400),
      tab(3, Seq("nk", "rk"), 25, 25),
      tab(4, Seq("sk", "nk2"), 100, 400),
      tab(5, Seq("nk2", "rk"), 25, 25),
      tab(6, Seq("rk"), 2, 25), // selective filter survivor
      tab(7, Seq("pk"), 2000, 400))
    val en = new Enumerator(nodes, edgeSpec)
    val t0 = System.nanoTime()
    val (order, cost) = en.optimalOrder()
    val ms = (System.nanoTime() - t0) / 1e6
    assert(order.toSet == (0 to 7).toSet, s"incomplete order: $order")
    assert(ms < 30000, s"K8 enumeration took ${ms}ms")
    assert(cost > 0 && cost.isFinite)
    // Prefixes must stay connected under the two-cycle adjacency.
    val adj = edgeSpec.flatMap { case ((i, _), (j, _)) => Seq(i -> j, j -> i) }
      .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
    order.indices.drop(1).foreach { k =>
      assert(order.take(k).exists(p => adj(order(k)).contains(p)),
        s"disconnected prefix at $k: $order")
    }
    // The search legitimately places the fact mid-order (joining the two
    // dim branches THROUGH it avoids a branch cross-product), but a good
    // order never STARTS from the big tables.
    assert(!Set(0, 1, 7).contains(order.head),
      s"order starts from a large table: $order")
    // And the chosen order must beat the naive size-descending connected
    // order on the enumerator's own estimates (sanity of the search, not
    // just the bound).
    val naive = Seq(0, 1, 7, 2, 4, 3, 5, 6) // size-desc, connected
    val naiveCost = (2 until naive.size).map(k => en.estimate(naive.take(k))).sum
    assert(cost <= naiveCost,
      s"chosen cost $cost worse than naive $naiveCost")
  }

  test("K9 golden: dense two-cycle graph under the 100-step bound stays optimal-shaped") {
    // 9 nodes: K8 plus a second fact instance (self-join) sharing edges
    // with nodes 0 and 1 — the shape of q_compass_9way. The bound must
    // cap the work yet still produce a connected order that defers both
    // 20k-row facts past the midpoint.
    val reg = new SeedRegistry(rows)
    val edgeSpec = Seq(
      ((0, "ok"), (1, "ok")), ((8, "ok"), (1, "ok")), ((0, "ok"), (8, "ok")),
      ((1, "ck"), (2, "ck")), ((2, "nk"), (3, "nk")),
      ((0, "sk"), (4, "sk")), ((4, "nk2"), (5, "nk2")),
      ((3, "rk"), (6, "rk")), ((5, "rk"), (6, "rk")),
      ((0, "pk"), (7, "pk")))
    edgeSpec.foreach { case ((i, a), (j, b)) =>
      reg.addPredicate((i.toString, a), (j.toString, b))
    }
    val rng = new scala.util.Random(31)
    def tab(i: Int, cols: Seq[String], n: Int, dom: Int): GraphNode =
      GraphNode(i, mkSketch(reg, i.toString, cols,
        Seq.fill(n)(cols.map(_ => rng.nextInt(dom)))))
    val nodes = IndexedSeq(
      tab(0, Seq("ok", "sk", "pk"), 20000, 400),
      tab(1, Seq("ok", "ck"), 5000, 400),
      tab(2, Seq("ck", "nk"), 1500, 400),
      tab(3, Seq("nk", "rk"), 25, 25),
      tab(4, Seq("sk", "nk2"), 100, 400),
      tab(5, Seq("nk2", "rk"), 25, 25),
      tab(6, Seq("rk"), 2, 25),
      tab(7, Seq("pk"), 2000, 400),
      tab(8, Seq("ok"), 20000, 400))
    val en = new Enumerator(nodes, edgeSpec)
    val t0 = System.nanoTime()
    val (order, cost) = en.optimalOrder()
    val ms = (System.nanoTime() - t0) / 1e6
    assert(order.toSet == (0 to 8).toSet, s"incomplete order: $order")
    assert(ms < 30000, s"K9 enumeration took ${ms}ms")
    assert(cost > 0 && cost.isFinite)
    val adj = edgeSpec.flatMap { case ((i, _), (j, _)) => Seq(i -> j, j -> i) }
      .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
    order.indices.drop(1).foreach { k =>
      assert(order.take(k).exists(p => adj(order(k)).contains(p)),
        s"disconnected prefix at $k: $order")
    }
    assert(order.indexOf(0) + order.indexOf(8) >= 9,
      s"both 20k-row facts placed too early: $order")
  }

  test("K17 golden: reference-workload-scale graph (17 nodes, 19 edges, 3 diamonds) under the bound") {
    // Mirrors q_compass_17way's topology: a 3-node lineitem clique closed
    // through two orders instances, two customer and two part branches,
    // four nations, two suppliers, two regions (r1 = 2-row survivor hub of
    // three diamonds). 0=l1 1=l2 2=l3 3=o1 4=o2 5=c1 6=c2 7=n1 8=n2 9=n3
    // 10=n4 11=s1 12=s2 13=p1 14=p2 15=r1 16=r2.
    val reg = new SeedRegistry(rows)
    val edgeSpec = Seq(
      ((0, "ok"), (1, "ok")), ((1, "ok"), (2, "ok")), ((0, "ok"), (3, "ok")),
      ((2, "ok"), (3, "ok")), ((1, "ok"), (4, "ok")),
      ((3, "ck"), (5, "ck")), ((4, "ck2"), (6, "ck2")),
      ((5, "nk"), (7, "nk")), ((6, "nk4"), (10, "nk4")),
      ((0, "sk"), (11, "sk")), ((11, "nk2"), (8, "nk2")),
      ((1, "sk2"), (12, "sk2")), ((12, "nk3"), (9, "nk3")),
      ((7, "rk"), (15, "rk")), ((8, "rk"), (15, "rk")), ((10, "rk"), (15, "rk")),
      ((9, "rk2"), (16, "rk2")),
      ((0, "pk"), (13, "pk")), ((1, "pk2"), (14, "pk2")))
    edgeSpec.foreach { case ((i, a), (j, b)) =>
      reg.addPredicate((i.toString, a), (j.toString, b))
    }
    val rng = new scala.util.Random(41)
    val dom = Map("ok" -> 4000, "ck" -> 1000, "ck2" -> 1000, "sk" -> 400,
      "sk2" -> 400, "pk" -> 2000, "pk2" -> 2000, "nk" -> 25, "nk2" -> 25,
      "nk3" -> 25, "nk4" -> 25, "rk" -> 5, "rk2" -> 5)
    def tab(i: Int, cols: Seq[String], n: Int): GraphNode =
      GraphNode(i, mkSketch(reg, i.toString, cols,
        Seq.fill(n)(cols.map(c => rng.nextInt(dom(c))))))
    val nodes = IndexedSeq(
      tab(0, Seq("ok", "sk", "pk"), 4000), tab(1, Seq("ok", "sk2", "pk2"), 4000),
      tab(2, Seq("ok"), 4000), tab(3, Seq("ok", "ck"), 2500),
      tab(4, Seq("ok", "ck2"), 4000), tab(5, Seq("ck", "nk"), 1000),
      tab(6, Seq("ck2", "nk4"), 1000), tab(7, Seq("nk", "rk"), 25),
      tab(8, Seq("nk2", "rk"), 25), tab(9, Seq("nk3", "rk2"), 25),
      tab(10, Seq("nk4", "rk"), 25), tab(11, Seq("sk", "nk2"), 400),
      tab(12, Seq("sk2", "nk3"), 400), tab(13, Seq("pk"), 1000),
      tab(14, Seq("pk2"), 1600), tab(15, Seq("rk"), 2), tab(16, Seq("rk2"), 4))
    val en = new Enumerator(nodes, edgeSpec)
    val t0 = System.nanoTime()
    val (order, cost) = en.optimalOrder()
    val ms = (System.nanoTime() - t0) / 1e6
    // The 100-step bound must still find a COMPLETE connected order at the
    // reference workload's top size — this is the claim the bound's value
    // (reference variables_details.txt:13-14) rests on.
    assert(order.toSet == (0 to 16).toSet, s"incomplete order: $order")
    assert(ms < 30000, s"K17 enumeration took ${ms}ms")
    assert(cost > 0 && cost.isFinite)
    val adj = edgeSpec.flatMap { case ((i, _), (j, _)) => Seq(i -> j, j -> i) }
      .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
    order.indices.drop(1).foreach { k =>
      assert(order.take(k).exists(p => adj(order(k)).contains(p)),
        s"disconnected prefix at $k: $order")
    }
    // No 4000-row fact instance may LEAD the order.
    assert(!Set(0, 1, 2, 4).contains(order.head),
      s"order starts from a large table: $order")
    // And the choice must beat the stock size-descending connected order
    // on the enumerator's own estimate scale (greedy largest-adjacent,
    // computed — 17 nodes is too error-prone to hand-write).
    val sizes = nodes.map(n => n.id -> n.sketch.count).toMap
    var naive = Vector(sizes.maxBy(_._2)._1)
    while (naive.size < nodes.size) {
      val remaining = nodes.map(_.id).filterNot(naive.contains)
      val connected = remaining.filter(i => adj(i).exists(naive.contains))
      val pool = if (connected.nonEmpty) connected else remaining
      naive :+= pool.maxBy(sizes)
    }
    val naiveCost = (2 until naive.size).map(k => en.estimate(naive.take(k))).sum
    assert(cost <= naiveCost, s"chosen cost $cost worse than naive $naiveCost: $order")
  }

  test("degenerate multiway estimates fall back to the cascade (region-diamond golden)") {
    // The shape that exposed the no-signal regime: two branches
    // (customer-nation and supplier-nation) meeting at a tiny shared dim
    // (region), connected through a big fact. With several distinct join
    // attributes the product-median telescopes to ~0 for deep prefixes;
    // without the cascade fallback the search picked orders that cross
    // the two branches BEFORE the fact connects them — measured 8x worse
    // true intermediates than stock on the 9-way entry.
    val reg = new SeedRegistry(rows)
    val edgeSpec = Seq(
      ((0, "ck"), (1, "ck")), ((1, "nk"), (2, "nk")), ((2, "rk"), (3, "rk")),
      ((0, "sk"), (4, "sk")), ((4, "nk2"), (5, "nk2")), ((5, "rk"), (3, "rk")))
    edgeSpec.foreach { case ((i, a), (j, b)) =>
      reg.addPredicate((i.toString, a), (j.toString, b))
    }
    val rng = new scala.util.Random(37)
    // Per-attribute domains must be CONSISTENT across the edge (TPC-H-ish:
    // every customer/supplier matches a nation, every nation a region) or
    // the branches go empty and deferring the fact is legitimately optimal.
    def tab(i: Int, cols: Seq[(String, Int)], n: Int): GraphNode =
      GraphNode(i, mkSketch(reg, i.toString, cols.map(_._1),
        Seq.fill(n)(cols.map(c => rng.nextInt(c._2)))))
    val nodes = IndexedSeq(
      tab(0, Seq("ck" -> 1000, "sk" -> 400), 30000), // fact
      tab(1, Seq("ck" -> 1000, "nk" -> 25), 1500),   // customer
      tab(2, Seq("nk" -> 25, "rk" -> 5), 25),        // nation (customer side)
      tab(3, Seq("rk" -> 5), 5),                     // region hub
      tab(4, Seq("sk" -> 400, "nk2" -> 25), 400),    // supplier
      tab(5, Seq("nk2" -> 25, "rk" -> 5), 25))       // nation (supplier side)
    val en = new Enumerator(nodes, edgeSpec)
    val (order, _) = en.optimalOrder()
    assert(order.toSet == (0 to 5).toSet)
    // The fatal prefix is {customer-branch} ∪ {supplier-branch} with NO
    // fact: customers x suppliers of the same region. The chosen order
    // must place the fact before completing both branches.
    val factAt = order.indexOf(0)
    val branchEnds = Seq(order.indexOf(1), order.indexOf(4)) // customer, supplier
    assert(factAt <= branchEnds.max,
      s"order crosses both branches before the fact joins: $order")
    // The cascade must be INFORMATIVE (the broken regime estimated ~0 for
    // every deep prefix) and the accumulated choice must beat the naive
    // size-descending connected order on the same estimate scale.
    val prefixEsts = (2 until order.size).map(k => en.estimate(order.take(k)))
    assert(prefixEsts.forall(_ >= 1.0),
      s"deep-prefix estimates degenerated again: $prefixEsts")
    val naive = Seq(0, 1, 4, 2, 5, 3) // size-desc, connected
    val naiveCost = (2 until naive.size).map(k => en.estimate(naive.take(k))).sum
    val chosenCost = prefixEsts.sum
    assert(chosenCost <= naiveCost,
      s"chosen $chosenCost worse than naive $naiveCost: $order")
    // Sanity of the cascade numbers themselves (hand-computable truths:
    // region-aligned customer x supplier cross ≈ 1500·400/5 = 120k).
    val crossBranch = en.estimate(Seq(3, 2, 1, 5, 4))
    assert(crossBranch > 5e4 && crossBranch < 5e5,
      s"cascade cross-branch estimate far from truth (~120k): $crossBranch")
  }

  test("cascade counts cycle-closing edges (mixed-attribute triangle golden)") {
    // Three 1000-row nodes joined pairwise on THREE DISTINCT attributes
    // (mixed seed classes → the cascade path), each with domain 100 →
    // each pairwise selectivity ≈ 1/100. Truth of the triangle ≈
    // 1000³/100³ = 1000; a spanning-forest cascade (the r5-r6
    // formulation) multiplies only two edges and reports ~100 000 — the
    // 100× inflation that made cycle-closing orders look bad and let the
    // 17-instance family pick a 25 %-worse-than-stock order.
    val reg = new SeedRegistry(rows)
    val edgeSpec = Seq(
      ((0, "x"), (1, "x")), ((0, "y"), (2, "y")), ((1, "z"), (2, "z")))
    edgeSpec.foreach { case ((i, a), (j, b)) =>
      reg.addPredicate((i.toString, a), (j.toString, b))
    }
    val rng = new scala.util.Random(43)
    val nodes = IndexedSeq(
      GraphNode(0, mkSketch(reg, "0", Seq("x", "y"),
        Seq.fill(1000)(Seq(rng.nextInt(100), rng.nextInt(100))))),
      GraphNode(1, mkSketch(reg, "1", Seq("x", "z"),
        Seq.fill(1000)(Seq(rng.nextInt(100), rng.nextInt(100))))),
      GraphNode(2, mkSketch(reg, "2", Seq("y", "z"),
        Seq.fill(1000)(Seq(rng.nextInt(100), rng.nextInt(100))))))
    val en = new Enumerator(nodes, edgeSpec)
    val tri = en.estimate(Seq(0, 1, 2))
    assert(tri > 200 && tri < 5000,
      s"triangle estimate $tri far from truth (~1000) — cycle edge dropped?")
  }

  test("cascade calibration: identity when absent, exact exp factor when present, features pinned") {
    // Same mixed-attribute triangle as above (cascade path on every
    // >2-way estimate). The §7 calibration was measured and REJECTED
    // (ESTIMATES.md §7) — the machinery stays for future rounds, so pin
    // its arithmetic: calib=None is byte-identical to before, and a
    // CascadeCalib multiplies by exactly exp(base + b·x + c·k) with
    // x = internal edges beyond a spanning tree, k = prefix size.
    val reg = new SeedRegistry(rows)
    val edgeSpec = Seq(
      ((0, "x"), (1, "x")), ((0, "y"), (2, "y")), ((1, "z"), (2, "z")))
    edgeSpec.foreach { case ((i, a), (j, b)) =>
      reg.addPredicate((i.toString, a), (j.toString, b))
    }
    val rng = new scala.util.Random(43)
    val nodes = IndexedSeq(
      GraphNode(0, mkSketch(reg, "0", Seq("x", "y"),
        Seq.fill(1000)(Seq(rng.nextInt(100), rng.nextInt(100))))),
      GraphNode(1, mkSketch(reg, "1", Seq("x", "z"),
        Seq.fill(1000)(Seq(rng.nextInt(100), rng.nextInt(100))))),
      GraphNode(2, mkSketch(reg, "2", Seq("y", "z"),
        Seq.fill(1000)(Seq(rng.nextInt(100), rng.nextInt(100))))))
    val plain = new Enumerator(nodes, edgeSpec)
    val calib = Enumerator.CascadeCalib(0.5, 0.25, 0.125)
    val cal = new Enumerator(nodes, edgeSpec, calib = Some(calib))
    // Triangle prefix: k=3, 3 edges, spanning tree needs 2 → x=1.
    assert(plain.prefixFeatures(Seq(0, 1, 2)) == ((3, 1)))
    assert(plain.prefixFeatures(Seq(0, 1)) == ((2, 0)))
    val base = plain.estimate(Seq(0, 1, 2))
    val expected = base * math.exp(0.5 + 0.25 * 1 + 0.125 * 3)
    assert(math.abs(cal.estimate(Seq(0, 1, 2)) - expected) < 1e-6 * expected,
      s"calibrated=${cal.estimate(Seq(0, 1, 2))} expected=$expected")
    // A calibrated enumeration still returns a full valid order.
    val (order, _) = cal.optimalOrder()
    assert(order.toSet == Set(0, 1, 2))
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
    assert(ms < 30000, s"enumeration took ${ms}ms — bound not effective")
  }

  test("estimator modes: unknown rejected; hybrid ≡ reference on a single-class clique") {
    val reg = new SeedRegistry(rows)
    reg.addPredicate(("0", "k"), ("1", "k"))
    reg.addPredicate(("1", "k"), ("2", "k"))
    val rng = new scala.util.Random(41)
    val nodes = IndexedSeq(
      GraphNode(0, mkSketch(reg, "0", Seq("k"), Seq.fill(5000)(Seq(rng.nextInt(200))))),
      GraphNode(1, mkSketch(reg, "1", Seq("k"), Seq.fill(800)(Seq(rng.nextInt(200))))),
      GraphNode(2, mkSketch(reg, "2", Seq("k"), Seq.fill(40)(Seq(rng.nextInt(200))))))
    val edges = Seq(((0, "k"), (1, "k")), ((1, "k"), (2, "k")), ((0, "k"), (2, "k")))
    intercept[IllegalArgumentException] {
      new Enumerator(nodes, edges, estimator = "bogus")
    }
    // One seed class (every edge on "k") → the alignment guard passes and
    // hybrid IS the reference math: identical estimates on every subset.
    val hyb = new Enumerator(nodes, edges, estimator = Enumerator.ModeHybrid)
    val ref = new Enumerator(nodes, edges, estimator = Enumerator.ModeReference)
    val sets = Seq(Seq(0, 1), Seq(0, 2), Seq(1, 2), Seq(0, 1, 2))
    sets.foreach(t => assert(hyb.estimate(t) == ref.estimate(t),
      s"aligned traversal $t: hybrid must equal reference math"))
    assert(hyb.optimalOrder()._1 == ref.optimalOrder()._1)
  }

  test("estimator modes: cascade multiplies survivor counts by clamped edge selectivities") {
    // Two disconnected-in-class edges (k and j are different predicates)
    // → hybrid routes >2-way traversals to the cascade; forcing cascade
    // must agree with hybrid exactly, and both differ from reference.
    val reg = new SeedRegistry(rows)
    reg.addPredicate(("0", "k"), ("1", "k"))
    reg.addPredicate(("1", "j"), ("2", "j"))
    val rng = new scala.util.Random(43)
    val nodes = IndexedSeq(
      GraphNode(0, mkSketch(reg, "0", Seq("k"), Seq.fill(4000)(Seq(rng.nextInt(300))))),
      GraphNode(1, mkSketch(reg, "1", Seq("k", "j"),
        Seq.fill(2000)(Seq(rng.nextInt(300), rng.nextInt(250))))),
      GraphNode(2, mkSketch(reg, "2", Seq("j"), Seq.fill(60)(Seq(rng.nextInt(250))))))
    val edges = Seq(((0, "k"), (1, "k")), ((1, "j"), (2, "j")))
    val hyb = new Enumerator(nodes, edges, estimator = Enumerator.ModeHybrid)
    val cas = new Enumerator(nodes, edges, estimator = Enumerator.ModeCascade)
    assert(hyb.estimate(Seq(0, 1, 2)) == cas.estimate(Seq(0, 1, 2)),
      "cross-class traversal: hybrid must BE the cascade")
    // Cascade closed form: Π counts × Π clamped pairwise selectivities.
    val selK = math.min(1.0, hyb.estimate(Seq(0, 1)) / (4000.0 * 2000.0))
    val selJ = math.min(1.0, hyb.estimate(Seq(1, 2)) / (2000.0 * 60.0))
    val expected = math.max(4000.0 * 2000.0 * 60.0 * selK * selJ, 1.0)
    assert(math.abs(cas.estimate(Seq(0, 1, 2)) - expected) < 1e-6 * expected)
  }

  test("adjustPlanForMapD port: golden rewrites on hand graphs") {
    // Star: 0 is the hub, 1..3 are leaves (adjacency mirrors the
    // reference's graph shape — node -> adjacent list).
    val star = Map(0 -> Seq(1, 2, 3), 1 -> Seq(0), 2 -> Seq(0), 3 -> Seq(0))
    // Internal-first connected order: the pass is a NO-OP (every leaf's
    // parent is placed, the trailing node is a leaf so the kept prefix
    // is the whole traversal).
    assert(Enumerator.adjustPlanForMapD(star, Seq(0, 1, 2, 3)) == Seq(0, 1, 2, 3))
    // Leaf-first start: the reference swaps positions 0 and 1
    // (:2338-2343) — parent first, identical prefix SETS.
    assert(Enumerator.adjustPlanForMapD(star, Seq(1, 0, 2, 3)) == Seq(0, 1, 2, 3))
    // Chain 0-1-2-3, order (0, 1, 3, 2): the leaf-start swap fires at
    // i=0 AND AGAIN at i=2 (leaf 3's parent unplaced — the reference
    // swaps positions 0/1 regardless of where the orphan leaf sits), the
    // two cancel, and the tail reinsertion puts 2 back after its
    // latest-placed neighbor 3 — a hand-traced NO-OP overall.
    val chain = Map(0 -> Seq(1), 1 -> Seq(0, 2), 2 -> Seq(1, 3), 3 -> Seq(2))
    assert(Enumerator.adjustPlanForMapD(chain, Seq(0, 1, 3, 2)) == Seq(0, 1, 3, 2))
    // Genuine rewrite: star 0-(1,2,3) with tail 3-4. Order
    // (0, 1, 4, 2, 3): orphan leaf 4 at i=2 swaps the FRONT pair
    // (1, 0, ...), the kept prefix runs through last leaf 2, and
    // internal node 3 is re-inserted after its latest-placed neighbor
    // (4, index 2) — ahead of leaf 2. Hand-traced against the C++.
    val starTail = Map(0 -> Seq(1, 2, 3), 1 -> Seq(0), 2 -> Seq(0),
      3 -> Seq(0, 4), 4 -> Seq(3))
    assert(Enumerator.adjustPlanForMapD(starTail, Seq(0, 1, 4, 2, 3)) ==
      Seq(1, 0, 4, 3, 2))
    // Leafless cycle: the kept prefix is empty and the first node has no
    // placed neighbor — the reference DROPS nodes here (documented quirk
    // the parity A/B asserts never fires on leaf-bearing JOB graphs).
    val cycle = Map(0 -> Seq(1, 2), 1 -> Seq(0, 2), 2 -> Seq(0, 1))
    val adjusted = Enumerator.adjustPlanForMapD(cycle, Seq(0, 1, 2))
    assert(adjusted.size < 3, s"leafless-cycle drop quirk vanished: $adjusted")
    // Short orders pass through untouched.
    assert(Enumerator.adjustPlanForMapD(star, Seq(1)) == Seq(1))
  }
}
