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
      def readIfd(off: Int, depth: Int, names: Map[Int, String]): Unit = {
        if (depth > 2 || off < 0 || off + 2 > bb.limit()) return
        val n = bb.getShort(off) & 0xFFFF
        var e = 0
        while (e < n) {
          val base = off + 2 + e * 12
          if (base + 12 <= bb.limit()) {
            val tag = bb.getShort(base) & 0xFFFF
            val tpe = bb.getShort(base + 2) & 0xFFFF
            val count = bb.getInt(base + 4)
            val tsize = tpe match {
              case 1 | 2 | 6 | 7 => 1; case 3 => 2; case 4 | 9 => 4; case 5 | 10 => 8; case _ => 0
            }
            val total = tsize * count
            val voff = if (total <= 4) base + 8 else bb.getInt(base + 8)
            if (tsize > 0 && voff >= 0 && voff + total <= bb.limit()) {
              val value: String = tpe match {
                case 2 => // ASCII
                  val arr = new Array[Byte](math.max(0, count - 1))
                  var j = 0; while (j < arr.length) { arr(j) = bb.get(voff + j); j += 1 }
                  new String(arr, "ISO-8859-1").trim
                case 1 | 7 => (0 until math.min(count, 16)).map(j => (bb.get(voff + j) & 0xFF).toString).mkString(",")
                case 6 => (0 until math.min(count, 16)).map(j => bb.get(voff + j).toString).mkString(",")
                case 3 => (0 until math.min(count, 16)).map(j => (bb.getShort(voff + 2 * j) & 0xFFFF).toString).mkString(",")
                case 4 => (0 until math.min(count, 16)).map(j => (bb.getInt(voff + 4 * j) & 0xFFFFFFFFL).toString).mkString(",")
                case 9 => (0 until math.min(count, 16)).map(j => bb.getInt(voff + 4 * j).toString).mkString(",")
                case 5 | 10 =>
                  // rational arrays in full (GPSLatitude is rational[3],
                  // GPSTimeStamp rational[3]) — PIL prints every element
                  (0 until math.min(count, 16)).map { j =>
                    val num = bb.getInt(voff + 8 * j); val den = bb.getInt(voff + 8 * j + 4)
                    if (den == 0) "0" else s"$num/$den"
                  }.mkString(",")
                case _ => s"<$tpe:$count>"
              }
              if (tag == 0x8769 && (names eq TagNames))
                readIfd(bb.getInt(base + 8), depth + 1, TagNames)   // Exif sub-IFD
              else if (tag == 0x8825 && (names eq TagNames))
                readIfd(bb.getInt(base + 8), depth + 1, GpsTagNames) // GPS IFD
              else out(names.getOrElse(tag, tag.toString)) = value
            }
          }
          e += 1
        }
      }
      readIfd(bb.getInt(4), 0, TagNames)
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
