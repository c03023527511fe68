package graft.operators

import java.awt.image.BufferedImage
import java.awt.{Color, RenderingHints}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.config.DownloadConfig

/** Image decode / filter / resize / re-encode (T3–T9, F3–F5) —
  * reference `resizer.py:137-228`, re-expressed as a pure
  * `Array[Byte] => ResizeResult` function applied through a UDF.
  *
  * Correctness contract is the reference's *size/metadata* contract
  * (`tests/fixtures.py:116-151`), not pixel equality: JVM
  * interpolation (bilinear here vs OpenCV lanczos/area) produces
  * different bytes by construction (SURVEY §7 "hard parts").
  *
  * Filters F3–F5 tag, not drop: failed rows return a null payload and
  * an error string; original dimensions are always reported.
  *
  * Scale: the UDF runs on the task thread (1 decode/resize per core —
  * the reference throttles OpenCV identically, `resizer.py:146`,
  * README.md:352-357); downloads saturate the I/O pool in
  * [[Downloader]] while decode stays CPU-bound per-core.
  */
object Resizer {

  /** Mirror of the resizer's 6-tuple contract (`resizer.py:137-141`). */
  case class ResizeResult(
      payload: Array[Byte],
      width: Option[Int],
      height: Option[Int],
      originalWidth: Option[Int],
      originalHeight: Option[Int],
      error: Option[String])

  private def err(e: String, ow: Option[Int] = None, oh: Option[Int] = None) =
    ResizeResult(null, None, None, ow, oh, Some(e))

  /** Sniff whether bytes already carry the target format (T8's
    * `imghdr` sniff, `resizer.py:148`) — magic-number check.
    */
  def sniffFormat(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 12) None
    else if ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) Some("jpg")
    else if ((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') Some("png")
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
             bytes(8) == 'W' && bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P') {
      // flavor-precise so skip_reencode passthrough only fires when
      // the payload already matches the REQUESTED webp flavor (the
      // reference's imghdr cannot distinguish them; ours can)
      if (bytes.length > 15 && bytes(12) == 'V' && bytes(13) == 'P' &&
          bytes(14) == '8' && bytes(15) == 'L') Some("webp-lossless")
      else Some("webp")
    }
    else None
  }

  /** T4: flatten RGBA onto a white background (resizer.py:154-159). */
  private def flattenAlpha(img: BufferedImage): BufferedImage = {
    if (!img.getColorModel.hasAlpha && img.getType == BufferedImage.TYPE_3BYTE_BGR) img
    else {
      val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_3BYTE_BGR)
      val g = out.createGraphics()
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, img.getWidth, img.getHeight)
      g.drawImage(img, 0, 0, null)
      g.dispose()
      out
    }
  }

  /** Reference interpolation names (`resizer.py:10-18`) mapped to the
    * JVM's nearest RenderingHints equivalent. Java2D has no area or
    * lanczos kernels: area (box-average) maps to BILINEAR — the
    * closest smoothing filter — and lanczos/cubic map to BICUBIC (the
    * JVM's widest kernel). Pixel parity with OpenCV is out of scope
    * (class scaladoc); the CONFIG surface is the reference's.
    */
  def interpolationHint(name: String): Object = name.toLowerCase match {
    case "nearest"                            => RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR
    case "linear" | "bilinear" | "area"       => RenderingHints.VALUE_INTERPOLATION_BILINEAR
    case "cubic" | "bicubic" | "lanczos" | "lanczos4" => RenderingHints.VALUE_INTERPOLATION_BICUBIC
    case other => throw new IllegalArgumentException(s"Invalid option for interpolation: $other")
  }

  private def scaleTo(img: BufferedImage, w: Int, h: Int, upscale: Boolean,
                      cfg: DownloadConfig): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val g = out.createGraphics()
    // Reference picks the up/down interpolation per direction
    // (main.py:80-81, defaults lanczos-up / area-down); both knobs are
    // user-settable with the reference's names.
    g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
      interpolationHint(if (upscale) cfg.upscaleInterpolation else cfg.downscaleInterpolation))
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    out
  }

  /** Encode to jpg/png at quality (T8). */
  def encode(img: BufferedImage, format: String, quality: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    format match {
      case "jpg" =>
        val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(quality / 100.0f)
        val ios = new MemoryCacheImageOutputStream(out)
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), param)
        ios.flush(); writer.dispose()
      case "png" =>
        ImageIO.write(img, "png", out)
      case "webp" =>
        // lossy VP8 at encode_quality (reference parity with Pillow's
        // default webp behavior, resizer.py:224-227) — see Vp8Codec;
        // written from the public spec, no JVM webp codec exists offline
        out.write(Vp8Codec.encodeLossy(img, quality))
      case "webp-lossless" =>
        // lossless VP8L — see WebpCodec; quality has no effect here
        out.write(WebpCodec.encodeLossless(img))
    }
    out.toByteArray
  }

  /** The full T3–T9 / F3–F5 kernel over raw bytes, with optional T10
    * bbox blur applied on the SINGLE decoded image (reference
    * ordering: decode → blur → resize, `resizer.py:150-161`) — no
    * intermediate lossy re-encode, raw bytes left untouched for
    * hash/exif.
    */
  def resizeBytes(bytes: Array[Byte], cfg: DownloadConfig,
                  bboxes: Seq[Seq[Double]] = null): ResizeResult = {
    if (bytes == null) return err("no payload")
    if (cfg.disableAllReencoding)                      // T9 passthrough
      return ResizeResult(bytes, None, None, None, None, None)
    try {
      // T3 decode; ImageIO has no webp reader, so fall back to the
      // from-scratch VP8L decoder for lossless webp payloads. A webp
      // outside the subset (transforms/LZ77/lossy) must land in the
      // same "image decode failed" row as any other undecodable image,
      // not in the resize-failure bucket.
      val viaImageIO = ImageIO.read(new ByteArrayInputStream(bytes))
      val raw =
        if (viaImageIO != null) viaImageIO
        else if (WebpCodec.isLosslessWebp(bytes))
          // NonFatal only: an OOM/interrupt must fail the task, not be
          // miscategorized as a decode failure
          try WebpCodec.decodeLossless(bytes)
          catch { case scala.util.control.NonFatal(_) => null }
        else if (Vp8Codec.isLossyWebp(bytes))
          try Vp8Codec.decodeLossy(bytes)
          catch { case scala.util.control.NonFatal(_) => null }
        else null
      if (raw == null) return err("image decode failed")
      val blurredIn =
        if (bboxes != null && bboxes.nonEmpty) Blurrer.blurImage(raw, bboxes) else raw
      val img0 = flattenAlpha(blurredIn)                       // T4
      val (ow, oh) = (img0.getWidth, img0.getHeight)
      // F3/F4/F5 — resizer.py:162-168
      if (math.min(oh, ow) < cfg.minImageSize) return err("image too small", Some(ow), Some(oh))
      if (oh.toLong * ow > cfg.maxImageArea) return err("image area too large", Some(ow), Some(oh))
      if (math.max(oh, ow).toDouble / math.min(oh, ow) > cfg.maxAspectRatio)
        return err("aspect ratio too large", Some(ow), Some(oh))

      val ts = cfg.imageSize
      val (img, w, h): (BufferedImage, Int, Int) = cfg.resizeMode match {
        case "no" => (img0, ow, oh)
        case "keep_ratio" | "center_crop" =>                   // T5: smallest side → ts
          val small = math.min(ow, oh)
          if (cfg.resizeOnlyIfBigger && small <= ts) (img0, ow, oh)
          else {
            val scale = ts.toDouble / small
            val (nw, nh) = (math.round(ow * scale).toInt.max(1), math.round(oh * scale).toInt.max(1))
            val scaled = scaleTo(img0, nw, nh, scale > 1, cfg)
            if (cfg.resizeMode == "center_crop") {
              val cropped = scaled.getSubimage((nw - ts) / 2, (nh - ts) / 2, ts.min(nw), ts.min(nh))
              // getSubimage shares the raster; copy for encoders.
              (copyOf(cropped), cropped.getWidth, cropped.getHeight)
            } else (scaled, nw, nh)
          }
        case "border" | "keep_ratio_largest" =>                // T6: largest side → ts
          val big = math.max(ow, oh)
          if (cfg.resizeOnlyIfBigger && big <= ts) (img0, ow, oh)
          else {
            val scale = ts.toDouble / big
            val (nw, nh) = (math.round(ow * scale).toInt.max(1), math.round(oh * scale).toInt.max(1))
            val scaled = scaleTo(img0, nw, nh, scale > 1, cfg)
            if (cfg.resizeMode == "border") {
              val padded = new BufferedImage(ts, ts, BufferedImage.TYPE_3BYTE_BGR)
              val g = padded.createGraphics()
              g.setColor(Color.WHITE); g.fillRect(0, 0, ts, ts)
              g.drawImage(scaled, (ts - nw) / 2, (ts - nh) / 2, null)
              g.dispose()
              (padded, ts, ts)
            } else (scaled, nw, nh)
          }
      }
      // T8/T9: skip re-encode when unchanged (incl. no blur applied AND
      // no alpha flatten — the reference sets encode_needed after alpha
      // matting, `resizer.py:191-199`) and the format already matches.
      val unchanged = (img eq img0) && (blurredIn eq raw) && (img0 eq blurredIn) &&
        sniffFormat(bytes).contains(cfg.encodeFormat)
      val outBytes =
        if (cfg.skipReencode && unchanged) bytes
        else encode(img, cfg.encodeFormat, cfg.encodeQuality)
      ResizeResult(outBytes, Some(w), Some(h), Some(ow), Some(oh), None)
    } catch {
      // NonFatal only — consistent with the decode guard above: a
      // decompression-bomb OOM or an interrupt must FAIL the task, not
      // masquerade as a tagged 'resize failed' row on a corrupted JVM
      case scala.util.control.NonFatal(e) =>
        err(s"resize failed: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}")
    }
  }

  private def copyOf(img: BufferedImage): BufferedImage = {
    val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_3BYTE_BGR)
    val g = out.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose()
    out
  }

  /** Column form: binary → struct(payload, width, height,
    * original_width, original_height, error). Deterministic pure
    * function, safe for Catalyst to reorder.
    */
  def resizeUdf(cfg: DownloadConfig): Column => Column = {
    val f = udf((bytes: Array[Byte]) => resizeBytes(bytes, cfg))
    (payload: Column) => f(payload)
  }

  /** Apply to a downloaded frame: adds payload/width/height/original_*
    * columns + `_resize_error`. When `cfg.bboxCol` is set, the blur
    * runs inside the same decode (T10).
    */
  def resize(df: DataFrame, cfg: DownloadConfig): DataFrame = {
    val res = cfg.bboxCol match {
      case Some(bc) =>
        val f = udf((bytes: Array[Byte], bboxes: Seq[Seq[Double]]) =>
          resizeBytes(bytes, cfg, bboxes))
        f(col(Downloader.PayloadCol), col(bc))
      case None => resizeUdf(cfg)(col(Downloader.PayloadCol))
    }
    df.withColumn("_rr", res)
      .withColumn("_resized_payload", col("_rr.payload"))
      .withColumn("width", col("_rr.width"))
      .withColumn("height", col("_rr.height"))
      .withColumn("original_width", col("_rr.originalWidth"))
      .withColumn("original_height", col("_rr.originalHeight"))
      .withColumn("_resize_error", col("_rr.error"))
      .drop("_rr")
  }
}
