package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels for the text-dedup hot path.
  *
  * The HOF formulations in [[graft.operators.TextDedup]] (aggregate /
  * transform / zip_with) are CodegenFallback: every row pays interpreted
  * dispatch per array element × per hash function — the r3 bench's single
  * slowest entry (`q_dedup_minhash`, 64-hash fold). These kernels compute
  * the identical values in one compiled pass per row; the Expressions call
  * them via `defineCodeGen`, so the enclosing operator stays inside
  * WholeStageCodegen (same pattern as [[VectorDot]]).
  *
  * Bit-identity with the HOF formulas is spec-enforced (TextDedupSpec):
  * tokenization goes through the same `UTF8String.split`, joining through
  * `UTF8String.concatWs`, hashing through the same `XXH64` with Spark's
  * default seed 42, and the minhash modular arithmetic reproduces
  * `pmod(pmod(x,p)·a + b, p)` exactly.
  */
object TextHashKernel {
  final val P: Long = 2147483647L // Mersenne 2^31-1, matches the HOF fold
  private val WS = UTF8String.fromString("\\s+")
  private val SPACE = UTF8String.fromString(" ")

  /** xxhash64 of a string's UTF-8 bytes with Spark's default seed. */
  def xx64(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  /** = array_distinct(transform(idx, i => xxhash64(concat_ws(" ", slice(tokens, i, k))))) */
  def shingleHashes(text: UTF8String, k: Int): ArrayData = {
    val toks = text.split(WS, -1)
    val n = toks.length
    val wins = math.max(n - (k - 1), 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    var i = 0
    while (i < wins) {
      val end = math.min(i + k, n)
      val joined =
        if (end - i == 1) toks(i)
        else UTF8String.concatWs(SPACE, java.util.Arrays.copyOfRange(toks, i, end): _*)
      seen.add(xx64(joined))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** = aggregate(shingles, [p]*m, (acc,x) => zip_with(acc, h(x), least));
    * `ab` packs the hash params as [a0,b0,a1,b1,…]. Null elements are
    * skipped — the HOF formulation maps them to a null hash which `least`
    * ignores, so a caller-supplied array with nulls must not perturb the
    * signature here either.
    */
  def minhashSig(shingles: ArrayData, ab: Array[Long]): ArrayData = {
    val m = ab.length / 2
    val sig = Array.fill(m)(P)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val x = shingles.getLong(i)
        val xm = ((x % P) + P) % P
        var j = 0
        while (j < m) {
          val h = (xm * ab(2 * j) + ab(2 * j + 1)) % P
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** = the two HOF fingerprint folds in one tokenization pass:
    * `[0]` rolling Karp-Rabin (acc·31 + pmod(xx64(tok), p) mod p, seed 17,
    * order-sensitive), `[1]` XOR over DISTINCT token hashes (order-free).
    */
  def fingerprints(text: UTF8String): ArrayData = {
    val toks = text.split(WS, -1)
    var rolling = 17L
    var setHash = 0L
    // Distinct by TOKEN (not by hash): two distinct tokens colliding on
    // xx64 would XOR twice in the HOF (cancelling) but once under
    // hash-dedup — bit-identity demands token-level distinctness.
    val seen = new java.util.HashSet[UTF8String]
    var i = 0
    while (i < toks.length) {
      val h = xx64(toks(i))
      rolling = (rolling * 31 + ((h % P) + P) % P) % P
      if (seen.add(toks(i))) setHash ^= h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(rolling, setHash))
  }

  /** = the two-fold HOF simhash: bit j of the result is sign(Σ_terms ±1). */
  def simhash(text: UTF8String): Long = {
    val toks = text.split(WS, -1)
    val sums = new Array[Long](64)
    var i = 0
    while (i < toks.length) {
      val h = xx64(toks(i))
      var j = 0
      while (j < 64) {
        sums(j) += (if (((h >> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** = array_distinct(transform(sequence(1, max(len-(n-1),1)), i => xxhash64(substr(c, i, n))))
    *
    * One pass computes every char's byte offset, then each window hashes
    * its byte range in place — `substringSQL` per window re-walks from
    * byte 0 AND copies (O(len²) + an allocation per gram; 20× slower at
    * ~300-char docs).
    */
  def ngramHashes(text: UTF8String, n: Int): ArrayData = {
    val numChars = text.numChars
    val nb = text.numBytes
    val offs = new Array[Int](numChars + 1)
    var c = 0
    var b = 0
    while (b < nb) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(text.getByte(b))
      c += 1
    }
    offs(numChars) = nb
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val wins = math.max(numChars - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    var i = 0
    while (i < wins) {
      val s = offs(i)
      val e = offs(math.min(i + n, numChars))
      seen.add(XXH64.hashUnsafeBytes(base, off + s, e - s, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Base for unary kernel-backed expressions: interpreted eval and codegen
  * both route to the same static kernel method, so there is exactly one
  * implementation of the semantics.
  */
sealed abstract class TextHashExpr extends UnaryExpression {
  /** Java call with `c` spliced in as the child variable. */
  protected def kernelCall(ctx: CodegenContext, c: String): String
  /** Accepted child type (AbstractDataType is private[sql] in Spark 4). */
  protected def accepts(t: DataType): Boolean
  override def checkInputDataTypes(): TypeCheckResult =
    if (accepts(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName cannot accept input of type ${child.dataType.simpleString}")
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => kernelCall(ctx, c))
}

case class ShingleHashesExpr(child: Expression, k: Int) extends TextHashExpr {
  override protected def accepts(t: DataType): Boolean = t == StringType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextHashKernel.shingleHashes(t.asInstanceOf[UTF8String], k)
  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.functions.TextHashKernel.shingleHashes($c, $k)"
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

/** `ab` is an immutable IndexedSeq (not Array) so two expressions with the
  * same params compare structurally equal — Array fields compare by
  * reference, which would defeat canonicalization / semanticEquals / CSE
  * for repeated minhash calls.
  */
case class MinhashSigExpr(child: Expression, ab: IndexedSeq[Long]) extends TextHashExpr {
  @transient private lazy val abArr: Array[Long] = ab.toArray
  override protected def accepts(t: DataType): Boolean =
    t match { case ArrayType(LongType, _) => true; case _ => false }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextHashKernel.minhashSig(t.asInstanceOf[ArrayData], abArr)
  override protected def kernelCall(ctx: CodegenContext, c: String): String = {
    val abRef = ctx.addReferenceObj("minhashAB", abArr, "long[]")
    s"graft.functions.TextHashKernel.minhashSig($c, $abRef)"
  }
  override protected def withNewChildInternal(c: Expression): MinhashSigExpr = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

case class Simhash64Expr(child: Expression) extends TextHashExpr {
  override protected def accepts(t: DataType): Boolean = t == StringType
  override def dataType: DataType = LongType
  override protected def nullSafeEval(t: Any): Any =
    TextHashKernel.simhash(t.asInstanceOf[UTF8String])
  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.functions.TextHashKernel.simhash($c)"
  override protected def withNewChildInternal(c: Expression): Simhash64Expr = copy(child = c)
  override def prettyName: String = "simhash64"
}

case class FingerprintsExpr(child: Expression) extends TextHashExpr {
  override protected def accepts(t: DataType): Boolean = t == StringType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextHashKernel.fingerprints(t.asInstanceOf[UTF8String])
  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.functions.TextHashKernel.fingerprints($c)"
  override protected def withNewChildInternal(c: Expression): FingerprintsExpr = copy(child = c)
  override def prettyName: String = "text_fingerprints"
}

case class NgramHashesExpr(child: Expression, n: Int) extends TextHashExpr {
  override protected def accepts(t: DataType): Boolean = t == StringType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    TextHashKernel.ngramHashes(t.asInstanceOf[UTF8String], n)
  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.functions.TextHashKernel.ngramHashes($c, $n)"
  override protected def withNewChildInternal(c: Expression): NgramHashesExpr = copy(child = c)
  override def prettyName: String = "ngram_hashes"
}

object TextHashOps {
  def shingleHashes(text: Column, k: Int): Column =
    Bridge.column(ShingleHashesExpr(Bridge.expr(text), k))
  def minhashSig(shingles: Column, ab: Array[Long]): Column =
    Bridge.column(MinhashSigExpr(Bridge.expr(shingles), ab.toIndexedSeq))
  def simhash64(text: Column): Column =
    Bridge.column(Simhash64Expr(Bridge.expr(text)))
  def fingerprints(text: Column): Column =
    Bridge.column(FingerprintsExpr(Bridge.expr(text)))
  def ngramHashes(text: Column, n: Int): Column =
    Bridge.column(NgramHashesExpr(Bridge.expr(text), n))
}
