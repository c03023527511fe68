package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Minimal EXIF extraction (T11) — reference `downloader.py:324-336`
  * dumps all EXIF tags as a JSON object of strings. This is a compact
  * from-scratch TIFF/EXIF parser (JPEG APP1 segment → IFD0 + Exif
  * sub-IFD) covering the common scalar tag types; unknown tags are
  * emitted under their numeric id, mirroring the reference's
  * "dump everything stringly" behavior.
  */
object ExifExtractor {

  private val TagNames: Map[Int, String] = Map(
    0x010E -> "ImageDescription", 0x010F -> "Make", 0x0110 -> "Model",
    0x0112 -> "Orientation", 0x011A -> "XResolution", 0x011B -> "YResolution",
    0x0128 -> "ResolutionUnit", 0x0131 -> "Software", 0x0132 -> "DateTime",
    0x013B -> "Artist", 0x8298 -> "Copyright",
    0x829A -> "ExposureTime", 0x829D -> "FNumber", 0x8827 -> "ISOSpeedRatings",
    0x9003 -> "DateTimeOriginal", 0x9004 -> "DateTimeDigitized",
    0x920A -> "FocalLength", 0xA002 -> "PixelXDimension", 0xA003 -> "PixelYDimension",
    0xA405 -> "FocalLengthIn35mmFilm", 0x8769 -> "ExifIFDPointer",
    0x8825 -> "GPSInfoIFDPointer")

  /** GPS IFD tags live in their own id namespace (they collide with
    * IFD0 ids), keyed like PIL's GPSTAGS.
    */
  private val GpsTagNames: Map[Int, String] = Map(
    0x0000 -> "GPSVersionID", 0x0001 -> "GPSLatitudeRef", 0x0002 -> "GPSLatitude",
    0x0003 -> "GPSLongitudeRef", 0x0004 -> "GPSLongitude", 0x0005 -> "GPSAltitudeRef",
    0x0006 -> "GPSAltitude", 0x0007 -> "GPSTimeStamp", 0x0008 -> "GPSSatellites",
    0x0009 -> "GPSStatus", 0x0010 -> "GPSImgDirectionRef", 0x0011 -> "GPSImgDirection",
    0x0012 -> "GPSMapDatum", 0x001D -> "GPSDateStamp")

  /** Vendor MakerNote tag names (ids from the public exiftool tag
    * tables). Each vendor IFD has its own id namespace; entries are
    * emitted under a `MakerNote.` prefix to avoid collisions.
    */
  private val CanonTagNames: Map[Int, String] = Map(
    0x0001 -> "CanonCameraSettings", 0x0004 -> "CanonShotInfo",
    0x0006 -> "CanonImageType", 0x0007 -> "CanonFirmwareVersion",
    0x0008 -> "FileNumber", 0x0009 -> "OwnerName", 0x0010 -> "CanonModelID",
    0x0013 -> "ThumbnailImageValidArea", 0x0095 -> "LensModel")
  private val NikonTagNames: Map[Int, String] = Map(
    0x0001 -> "MakerNoteVersion", 0x0002 -> "ISO", 0x0004 -> "Quality",
    0x0005 -> "WhiteBalance", 0x0007 -> "FocusMode", 0x0008 -> "FlashSetting",
    0x0084 -> "Lens", 0x009E -> "RetouchHistory")
  private val OlympusTagNames: Map[Int, String] = Map(
    0x0200 -> "SpecialMode", 0x0201 -> "Quality", 0x0202 -> "Macro",
    0x0204 -> "DigitalZoom", 0x0207 -> "CameraType", 0x0209 -> "CameraID")

  /** Parse EXIF from JPEG bytes; None when absent/corrupt. */
  def parse(bytes: Array[Byte]): Option[Map[String, String]] = {
    try {
      if (bytes == null || bytes.length < 4 ||
          (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
      // Walk JPEG segments to APP1/Exif.
      var i = 2
      var tiffOff = -1
      while (i + 4 < bytes.length && tiffOff < 0) {
        if ((bytes(i) & 0xFF) != 0xFF) return None
        val marker = bytes(i + 1) & 0xFF
        val len = ((bytes(i + 2) & 0xFF) << 8) | (bytes(i + 3) & 0xFF)
        if (marker == 0xE1 && i + 10 < bytes.length &&
            bytes(i + 4) == 'E' && bytes(i + 5) == 'x' && bytes(i + 6) == 'i' &&
            bytes(i + 7) == 'f' && bytes(i + 8) == 0 && bytes(i + 9) == 0) {
          tiffOff = i + 10
        } else if (marker == 0xDA) { // start of scan — no EXIF
          return None
        } else i += 2 + len
      }
      if (tiffOff < 0) return None
      val bb = ByteBuffer.wrap(bytes, tiffOff, bytes.length - tiffOff).slice()
      val order = (bb.get(0), bb.get(1)) match {
        case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
        case ('M', 'M') => ByteOrder.BIG_ENDIAN
        case _ => return None
      }
      bb.order(order)
      if (bb.getShort(2) != 42) return None
      val out = scala.collection.mutable.LinkedHashMap[String, String]()
      def readIfd(buf: ByteBuffer, off: Int, depth: Int,
                  names: Map[Int, String], prefix: String): Unit = {
        if (depth > 3 || off < 0 || off + 2 > buf.limit()) return
        val n = buf.getShort(off) & 0xFFFF
        var e = 0
        while (e < n) {
          val base = off + 2 + e * 12
          if (base + 12 <= buf.limit()) {
            val tag = buf.getShort(base) & 0xFFFF
            val tpe = buf.getShort(base + 2) & 0xFFFF
            val count = buf.getInt(base + 4)
            val tsize = tpe match {
              case 1 | 2 | 6 | 7 => 1; case 3 => 2; case 4 | 9 => 4; case 5 | 10 => 8; case _ => 0
            }
            val total = tsize * count
            val voff = if (total <= 4) base + 8 else buf.getInt(base + 8)
            if (tsize > 0 && voff >= 0 && voff + total <= buf.limit()) {
              val value: String = tpe match {
                case 2 => // ASCII
                  val arr = new Array[Byte](math.max(0, count - 1))
                  var j = 0; while (j < arr.length) { arr(j) = buf.get(voff + j); j += 1 }
                  new String(arr, "ISO-8859-1").trim
                case 1 | 7 => (0 until math.min(count, 16)).map(j => (buf.get(voff + j) & 0xFF).toString).mkString(",")
                case 6 => (0 until math.min(count, 16)).map(j => buf.get(voff + j).toString).mkString(",")
                case 3 => (0 until math.min(count, 16)).map(j => (buf.getShort(voff + 2 * j) & 0xFFFF).toString).mkString(",")
                case 4 => (0 until math.min(count, 16)).map(j => (buf.getInt(voff + 4 * j) & 0xFFFFFFFFL).toString).mkString(",")
                case 9 => (0 until math.min(count, 16)).map(j => buf.getInt(voff + 4 * j).toString).mkString(",")
                case 5 | 10 =>
                  // rational arrays in full (GPSLatitude is rational[3],
                  // GPSTimeStamp rational[3]) — PIL prints every element
                  (0 until math.min(count, 16)).map { j =>
                    val num = buf.getInt(voff + 8 * j); val den = buf.getInt(voff + 8 * j + 4)
                    if (den == 0) "0" else s"$num/$den"
                  }.mkString(",")
                case _ => s"<$tpe:$count>"
              }
              if (tag == 0x8769 && (names eq TagNames))
                readIfd(buf, buf.getInt(base + 8), depth + 1, TagNames, prefix)   // Exif sub-IFD
              else if (tag == 0x8825 && (names eq TagNames))
                readIfd(buf, buf.getInt(base + 8), depth + 1, GpsTagNames, prefix) // GPS IFD
              else if (tag == 0x927C && prefix.isEmpty)
                readMakerNote(buf, voff, total, depth, value)
              else out(prefix + names.getOrElse(tag, tag.toString)) = value
            }
          }
          e += 1
        }
      }
      // Vendor MakerNote dispatch (DEVIATIONS #4): the common vendor
      // layouts are structurally parsed as sub-IFDs; anything else
      // keeps the byte-dump fallback. Formats per the public exiftool
      // MakerNote notes:
      //  - Nikon "type 3": "Nikon\0\x02..." then a fully self-contained
      //    embedded TIFF (own byte order, offsets relative to itself)
      //  - Olympus: "OLYMP\0" + 2 bytes, then an IFD whose offsets are
      //    relative to the MAIN TIFF header
      //  - Canon: no signature — a bare IFD relative to the main TIFF,
      //    identified by Make == "Canon" from IFD0 (parsed first)
      def readMakerNote(buf: ByteBuffer, voff: Int, total: Int, depth: Int,
                        fallback: String): Unit = {
        def sig(s: Seq[Byte]): Boolean =
          total >= s.length + 2 &&
            s.zipWithIndex.forall { case (c, j) => buf.get(voff + j) == c }
        val nikonSig = Seq[Byte]('N', 'i', 'k', 'o', 'n', 0)
        val olympSig = Seq[Byte]('O', 'L', 'Y', 'M', 'P', 0)
        if (sig(nikonSig) && total >= 18) {
          val sub = ByteBuffer.wrap(bytes, tiffOff + voff + 10, total - 10).slice()
          val subOrder = (sub.get(0), sub.get(1)) match {
            case ('I', 'I') => Some(ByteOrder.LITTLE_ENDIAN)
            case ('M', 'M') => Some(ByteOrder.BIG_ENDIAN)
            case _ => None
          }
          subOrder match {
            case Some(o) if { sub.order(o); sub.getShort(2) == 42 } =>
              readIfd(sub, sub.getInt(4), depth + 1, NikonTagNames, "MakerNote.")
            case _ => out("MakerNote") = fallback
          }
        } else if (sig(olympSig))
          readIfd(buf, voff + 8, depth + 1, OlympusTagNames, "MakerNote.")
        else if (out.get("Make").exists(_.startsWith("Canon")))
          readIfd(buf, voff, depth + 1, CanonTagNames, "MakerNote.")
        else out("MakerNote") = fallback
      }
      readIfd(bb, bb.getInt(4), 0, TagNames, "")
      Some(out.toMap)
    } catch { case _: Throwable => None }
  }

  /** JSON-string form, like the reference's `json.dumps(exif_dict)`. */
  def parseToJson(bytes: Array[Byte]): String =
    parse(bytes) match {
      case None => "{}"
      case Some(m) =>
        m.map { case (k, v) =>
          "\"" + esc(k) + "\": \"" + esc(v) + "\""
        }.mkString("{", ", ", "}")
    }

  private def esc(s: String): String = graft.util.JsonEscape.esc(s)

  val exifJsonUdf: Column => Column = {
    val f = udf((bytes: Array[Byte]) => if (bytes == null) null else parseToJson(bytes))
    (payload: Column) => f(payload)
  }
}
