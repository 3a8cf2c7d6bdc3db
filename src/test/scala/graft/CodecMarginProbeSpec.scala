package graft

import org.scalatest.funsuite.AnyFunSuite

/** Committed reproducer for the MJPEG decode-error-bound margins
  * (r17 verdict #2): `q_video_decode_mjpeg`'s oracle accepts a decoded
  * frame when its total |Δr|+|Δg|+|Δb| vs the SQL-regenerated source
  * stays under per-channel MAE 5 — a threshold that is only honest if
  * (a) the JDK's lossy JPEG codec never gets NEAR it on the fixture and
  * (b) every real defect the bound exists to catch lands WELL above it.
  * The load-bearing numbers were first measured with an uncommitted
  * jshell probe (worst codec error 1.62; channel-swap signal 11.8;
  * frame-misalignment signal 30.0, 2026-08-15). This spec IS that probe,
  * committed and gated: a JDK codec change that erodes the separation
  * now fails the build instead of silently hollowing out the oracle.
  *
  * The sweep is exhaustive over the fixture's parameter space: the
  * raster depends on doc_id only through doc_id mod 3 (frame count),
  * mod 9 (width), mod 7 (height) and mod 8 (green offset), so doc_id
  * 0..503 (lcm = 504) covers every distinct frame any scale factor can
  * generate — stronger than probing whichever doc_ids one parquet
  * happens to contain. Encode goes through the identical JDK path the
  * engine uses (ImageIO "jpg" writer, MODE_EXPLICIT quality 0.95,
  * TYPE_INT_RGB — Multimodal.encodeJpeg's exact calls), so the codec
  * under test is the codec in production.
  */
class CodecMarginProbeSpec extends AnyFunSuite {

  /** q_video_decode_mjpeg's generator, closed form
    * (PipelineQueries.scala — keep in lockstep): 0xRRGGBB raster. */
  private def raster(docId: Int, f: Int, w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((60 + x * 6 + f * 34) << 16) |
        ((64 + y * 9 + (docId % 8) * 2) << 8) |
        (12 + x * 6 + y * 3 + f * 34)
    }

  private def encodeDecode(px: Array[Int], w: Int, h: Int,
      writer: javax.imageio.ImageWriter,
      param: javax.imageio.ImageWriteParam): Array[Int] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < px.length) { img.setRGB(i % w, i / w, px(i)); i += 1 }
    val baos = new java.io.ByteArrayOutputStream(1 << 12)
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(baos))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(baos.toByteArray))
    Array.tabulate(w * h)(i => back.getRGB(i % w, i / w) & 0xffffff)
  }

  /** Per-channel MAE between two equal-size 0xRRGGBB rasters: the
    * entry's exact acceptance metric (tot |Δ| ≤ 15·n_px ⇔ MAE ≤ 5). */
  private def mae(a: Array[Int], b: Array[Int]): Double = {
    var tot = 0L
    var i = 0
    while (i < a.length) {
      val p = a(i); val q = b(i)
      tot += math.abs((p >> 16) - (q >> 16)) +
        math.abs(((p >> 8) & 255) - ((q >> 8) & 255)) +
        math.abs((p & 255) - (q & 255))
      i += 1
    }
    tot.toDouble / (3L * a.length)
  }

  private def swapRB(px: Array[Int]): Array[Int] =
    px.map(p => ((p & 255) << 16) | (p & 0xff00) | ((p >> 16) & 255))

  test("MAE-5 bound separates codec noise from defect signals by >2x both ways") {
    javax.imageio.ImageIO.setUseCache(false)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.95f)

    val bound = 5.0
    var worstCodec = 0.0          // max over frames: honest decode vs source
    var minSwap = Double.MaxValue // min over frames: channel-swapped decode vs source
    var minMisalign = Double.MaxValue // min: decode of frame f+1 vs source frame f

    for (docId <- 0 until 504) {
      val nf = 2 + docId % 3
      val w = 8 + docId % 9
      val h = 6 + docId % 7
      // The entry samples every=2 → frames {0, 2}∩[0,nf); margins must
      // hold for every frame the oracle can see.
      val sampled = (0 until nf by 2)
      val decoded = sampled.map(f =>
        f -> encodeDecode(raster(docId, f, w, h), w, h, writer, param)).toMap
      for ((f, dec) <- decoded) {
        val src = raster(docId, f, w, h)
        worstCodec = math.max(worstCodec, mae(dec, src))
        minSwap = math.min(minSwap, mae(swapRB(dec), src))
        // Misalignment defect: the decoder hands back the NEXT frame's
        // content under this frame's index (off-by-one seek) — compare
        // an honest decode of frame f+1 against source frame f.
        if (f + 1 < nf) {
          val wrong = encodeDecode(raster(docId, f + 1, w, h), w, h, writer, param)
          minMisalign = math.min(minMisalign, mae(wrong, src))
        }
      }
    }

    info(f"worst codec MAE      = $worstCodec%.2f (bound $bound%.1f; need < ${bound / 2}%.1f)")
    info(f"min channel-swap MAE = $minSwap%.2f (need > ${bound * 2}%.1f)")
    info(f"min misalign MAE     = $minMisalign%.2f (need > ${bound * 2}%.1f)")

    // >2x separation on BOTH sides of the bound: codec noise must stay
    // under bound/2, every defect signal must stay over 2*bound.
    assert(worstCodec < bound / 2,
      f"codec noise $worstCodec%.2f too close to the MAE-$bound%.0f bound — " +
        "the oracle would start flagging honest decodes; re-derive the bound")
    assert(minSwap > bound * 2,
      f"channel-swap signal $minSwap%.2f too close to the MAE-$bound%.0f bound — " +
        "the oracle could wave a channel-order bug through")
    assert(minMisalign > bound * 2,
      f"frame-misalignment signal $minMisalign%.2f too close to the MAE-$bound%.0f bound — " +
        "the oracle could wave an off-by-one seek through")
  }
}
