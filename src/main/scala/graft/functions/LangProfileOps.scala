package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernel for the language-ID hot path.
  *
  * The HOF formulation ([[graft.operators.TextAnalysis.withLanguageIdHof]])
  * folds token/gram arrays against LITERAL MAPS — and Catalyst's
  * `element_at` on a map literal is a linear scan over the keys, so every
  * document pays |grams| x |profile keys| interpreted UTF8String
  * comparisons. This kernel makes each lookup an O(1) hash probe and
  * computes every profile count in ONE compiled pass over the text
  * (same `defineCodeGen` pattern as [[TextHashKernel]]).
  *
  * Output layout (array<long>, one element per slot):
  * `[stopHits(0..L-1), gramHits(0..L-1), nTokens, nTrigramsDistinct,
  * nUnigramsDistinct]` for L languages. Bit-identity with the HOF
  * formulation is spec-enforced (TextDedupSpec/LangIdSpec), including the
  * subtle cases: tokens counted RAW but matched DISTINCT; the 3-char and
  * 1-char gram namespaces share one distinct-union for hit counting
  * (short texts produce <3-char "trigram" windows that can collide with
  * unigrams — the HOF's `array_distinct(concat(g3, g1))` counts those
  * once); texts shorter than 3 chars emit one whole-text trigram window,
  * empty text included.
  */
object LangProfileKernel {
  private val WS = UTF8String.fromString("\\s+")

  /** One pass over an ALREADY-LOWERCASED text: tokenize, build distinct
    * token/gram sets, count profile hits via hash lookups.
    */
  def hitCounts(
      t: UTF8String,
      stopMap: java.util.HashMap[UTF8String, Array[Long]],
      gramMap: java.util.HashMap[UTF8String, Array[Long]],
      nLangs: Int): ArrayData = {
    val out = new Array[Long](2 * nLangs + 3)
    // Tokens: raw count for the denominator, distinct for hit matching.
    val toks = t.split(WS, -1)
    out(2 * nLangs) = toks.length.toLong
    val seenToks = new java.util.HashSet[UTF8String]
    var i = 0
    while (i < toks.length) {
      if (seenToks.add(toks(i))) {
        val vec = stopMap.get(toks(i))
        if (vec != null) {
          var l = 0
          while (l < nLangs) { out(l) += vec(l); l += 1 }
        }
      }
      i += 1
    }
    // Grams: trigram windows (whole text when shorter than 3 chars, one
    // empty window for empty text — mirroring sequence(1, max(len-2, 1)))
    // and unigrams; hits counted once per gram across BOTH namespaces.
    // Char→byte offsets are computed in ONE pass and windows sliced by
    // byte range — UTF8String.substring re-walks from byte 0 per call,
    // O(len²) per document (the trap ngramHashes' docstring measures).
    val bytes = t.getBytes
    val numChars = t.numChars
    val offs = new Array[Int](numChars + 1)
    var c = 0
    var b = 0
    while (b < bytes.length) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(numChars) = bytes.length
    def slice(fromChar: Int, untilChar: Int): UTF8String =
      UTF8String.fromBytes(bytes, offs(fromChar), offs(untilChar) - offs(fromChar))
    val g3 = new java.util.HashSet[UTF8String]
    val g1 = new java.util.HashSet[UTF8String]
    val merged = new java.util.HashSet[UTF8String]
    def hit(g: UTF8String): Unit = if (merged.add(g)) {
      val vec = gramMap.get(g)
      if (vec != null) {
        var l = 0
        while (l < nLangs) { out(nLangs + l) += vec(l); l += 1 }
      }
    }
    val wins = math.max(numChars - 2, 1)
    i = 0
    while (i < wins) {
      val g = slice(i, math.min(i + 3, numChars))
      if (g3.add(g)) hit(g)
      i += 1
    }
    i = 0
    while (i < numChars) {
      val g = slice(i, i + 1)
      if (g1.add(g)) hit(g)
      i += 1
    }
    out(2 * nLangs + 1) = g3.size.toLong
    out(2 * nLangs + 2) = g1.size.toLong
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Profile Seq (immutable, structural-equality-friendly) → lookup map. */
  private[functions] def toMap(
      lut: Seq[(String, Seq[Int])]): java.util.HashMap[UTF8String, Array[Long]] = {
    val m = new java.util.HashMap[UTF8String, Array[Long]]
    lut.foreach { case (k, vec) =>
      m.put(UTF8String.fromString(k), vec.map(_.toLong).toArray)
    }
    m
  }
}

/** `stopLut`/`gramLut` are immutable Seqs (not Arrays/Maps) so identical
  * profiles give structural equality — see MinhashSigExpr.
  */
case class LangHitCountsExpr(
    child: Expression,
    stopLut: Seq[(String, Seq[Int])],
    gramLut: Seq[(String, Seq[Int])],
    nLangs: Int) extends UnaryExpression {

  @transient private lazy val stopMap = LangProfileKernel.toMap(stopLut)
  @transient private lazy val gramMap = LangProfileKernel.toMap(gramLut)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(t: Any): Any =
    LangProfileKernel.hitCounts(t.asInstanceOf[UTF8String], stopMap, gramMap, nLangs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("langStopMap", stopMap, "java.util.HashMap")
    val gRef = ctx.addReferenceObj("langGramMap", gramMap, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LangProfileKernel.hitCounts($c, $sRef, $gRef, $nLangs)")
  }
  override protected def withNewChildInternal(c: Expression): LangHitCountsExpr =
    copy(child = c)
  override def prettyName: String = "lang_hit_counts"
}

object LangProfileOps {
  def langHitCounts(loweredText: Column, stopLut: Seq[(String, Seq[Int])],
      gramLut: Seq[(String, Seq[Int])], nLangs: Int): Column =
    Bridge.column(LangHitCountsExpr(Bridge.expr(loweredText), stopLut, gramLut, nLangs))
}
