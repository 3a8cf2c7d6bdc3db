package graft.sketch

/** Pseudo-random ±1 / bucket hash schemes used by Fast-AGMS sketches.
  *
  * The schemes (EH3 3-wise-independent ±1 generator, Carter–Wegman 2-universal
  * bucket hash with the Mersenne-prime mod trick) are from the published
  * papers "Fast Range-Summable Random Variables for Efficient Aggregate
  * Estimation" and "Pseudo-Random Number Generation for Sketch-Based
  * Estimations" (F. Rusu, A. Dobra).
  *
  * Reference behavior being matched:
  * mapd-core/QueryEngine/Sketch/RandomGenScheme.h:31-128 (seq_xor, hash31,
  * EH3, CW2B) and mapd-core/QueryEngine/Sketch/XIS.h:77-121,168-215
  * (Xi_EH3 / Xi_CW2B seed mixing). All arithmetic is 32/64-bit unsigned in
  * the reference; Scala's wrapping Int/Long ops are bit-identical, with
  * logical shifts (`>>>`) where the reference shifts unsigned values.
  */
object Xi {
  final val Mod: Long = 2147483647L // 2^31 - 1 (Mersenne)

  /** Parity of the 32 bits of x (reference: RandomGenScheme.h:31-39). */
  @inline def seqXor(x0: Int): Int = {
    var x = x0
    x ^= (x >>> 16)
    x ^= (x >>> 8)
    x ^= (x >>> 4)
    x ^= (x >>> 2)
    x ^= (x >>> 1)
    x & 1
  }

  /** Carter–Wegman hash with Mersenne mod trick
    * (reference: RandomGenScheme.h:45-54). a, b, x are unsigned 32-bit
    * values carried in Longs.
    */
  @inline def hash31(a: Long, b: Long, x: Long): Long = {
    val r = a * x + b
    ((r >>> 31) + r) & Mod
  }

  /** EH3 ±1, 3-wise independent (reference: RandomGenScheme.h:65-71). */
  @inline def eh3(i0: Int, i1: Int, j: Int): Int = {
    val mask = 0xAAAAAAAA
    val pRes = (i1 & j) ^ (j & (j << 1) & mask)
    if (((i0 ^ seqXor(pRes)) & 1) == 1) 1 else -1
  }

  /** CW 2-universal bucket hash (reference: RandomGenScheme.h:121-128). */
  @inline def cw2b(a: Long, b: Long, x: Long, buckets: Int): Int = {
    val p = hash31(a, b, x & 0xFFFFFFFFL)
    if (buckets.toLong == Mod) p.toInt else (p % buckets).toInt
  }

  /** Seed mixing shared by every Xi_* constructor
    * (reference: XIS.h:86-94 and identical blocks). Returns the two mixed
    * 32-bit seeds derived from raw inputs (i1, i2).
    */
  def mixSeeds(i1Raw: Int, i2Raw: Int): (Int, Int) = {
    var i1 = i1Raw
    var i2 = i2Raw
    val s0 = (i1 << 16) ^ (i2 & 0xFFFF)
    i1 = 36969 * (i1 & 0xFFFF) + (i1 >>> 16)
    i2 = 18000 * (i2 & 0xFFFF) + (i2 >>> 16)
    val s1 = (i1 << 16) ^ (i2 & 0xFFFF)
    (s0, s1)
  }

  /** Fold a 64-bit key to the 32-bit domain the schemes operate on,
    * preserving equality (the reference truncates via implicit unsigned
    * conversion; xor-folding keeps high bits relevant for 64-bit ids).
    */
  @inline def fold64(k: Long): Int = (k ^ (k >>> 32)).toInt
}

/** One (CW2B, EH3) seed pair — the per-(row, column) hash instance.
  * `cwA`/`cwB` are the mixed CW2B seeds as unsigned-in-Long;
  * `ehS0`/`ehS1` the mixed EH3 seeds.
  */
final case class SeedPair(cwA: Long, cwB: Long, ehS0: Int, ehS1: Int) {
  @inline def bucket(key: Int, buckets: Int): Int = Xi.cw2b(cwA, cwB, key.toLong & 0xFFFFFFFFL, buckets)
  @inline def sign(key: Int): Int = Xi.eh3(ehS0, ehS1, key)
}

object SeedPair {
  /** Build from raw 32-bit inputs, applying the reference's seed mixing. */
  def fromRaw(cwI1: Int, cwI2: Int, ehI1: Int, ehI2: Int): SeedPair = {
    val (ca, cb) = Xi.mixSeeds(cwI1, cwI2)
    val (e0, e1) = Xi.mixSeeds(ehI1, ehI2)
    SeedPair(ca.toLong & 0xFFFFFFFFL, cb.toLong & 0xFFFFFFFFL, e0, e1)
  }
}
