package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.TfRecordCodec

/** Cross-validation of the hand-rolled TFRecord codec against
  * independent references, so it is not only self-verified:
  *
  *  - CRC32C checked against the published RFC 3720 test vectors via
  *    an independently written bitwise implementation (reflected
  *    polynomial 0x82F63B78) — the codec itself uses
  *    java.util.zip.CRC32C, so the two implementations are disjoint.
  *  - The masked-CRC framing (`[len u64le][mask(crc(len))][data]
  *    [mask(crc(data))]`, mask(c) = rotr15(c) + 0xa282ead8) recomputed
  *    from the soft CRC.
  *  - Example proto bytes against a hand-derived golden from the
  *    public protobuf wire format.
  */
class TfRecordGoldenSpec extends AnyFunSuite {

  /** Bitwise reflected CRC32C — written straight from the polynomial
    * definition, sharing no code with java.util.zip.CRC32C.
    */
  private def softCrc32c(bytes: Array[Byte]): Int = {
    var crc = 0xFFFFFFFF
    bytes.foreach { b =>
      crc ^= (b & 0xFF)
      var i = 0
      while (i < 8) {
        crc = if ((crc & 1) != 0) (crc >>> 1) ^ 0x82F63B78 else crc >>> 1
        i += 1
      }
    }
    ~crc
  }

  private def mask(crc: Int): Int = ((crc >>> 15) | (crc << 17)) + 0xa282ead8

  test("soft CRC32C matches the published RFC 3720 vectors") {
    assert(softCrc32c("123456789".getBytes("US-ASCII")) == 0xE3069283)
    assert(softCrc32c(Array.fill[Byte](32)(0)) == 0x8A9136AA)
    assert(softCrc32c(Array.fill[Byte](32)(0xFF.toByte)) == 0x62A8AB43)
  }

  test("TFRecord framing: length + masked CRCs byte-exact vs the independent CRC") {
    val data = "123456789".getBytes("US-ASCII")
    val bos = new java.io.ByteArrayOutputStream()
    TfRecordCodec.writeRecord(bos, data)
    val rec = bos.toByteArray
    assert(rec.length == 8 + 4 + data.length + 4)
    val bb = java.nio.ByteBuffer.wrap(rec).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val len = bb.getLong()
    assert(len == data.length.toLong)
    val lenBytes = java.util.Arrays.copyOfRange(rec, 0, 8)
    assert(bb.getInt() == mask(softCrc32c(lenBytes)), "masked CRC of the length word")
    val body = new Array[Byte](data.length)
    bb.get(body)
    assert(body.toSeq == data.toSeq)
    assert(bb.getInt() == mask(softCrc32c(data)), "masked CRC of the payload")
  }

  test("Example proto: byte-exact vs hand-derived wire-format golden") {
    // Example { features(1) { feature(1) map entry { key(1)="k",
    // value(2)=Feature{ bytes_list(1){ value(1)="ab" } } } } }
    val got = TfRecordCodec.example(Seq("k" -> TfRecordCodec.bytesFeature("ab".getBytes("US-ASCII"))))
    val golden = Array[Int](
      0x0A, 0x0D,                   // features: len 13
      0x0A, 0x0B,                   //   map entry: len 11
      0x0A, 0x01, 'k',              //     key "k"
      0x12, 0x06,                   //     value: Feature, len 6
      0x0A, 0x04,                   //       bytes_list: len 4
      0x0A, 0x02, 'a', 'b'          //         value "ab"
    ).map(_.toByte)
    assert(got.toSeq == golden.toSeq)
  }

  test("typedFeature: per-column reference layout (writer.py:204-243 dispatch)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // row shaped like a meta record: url(str), width(int), score(double),
    // tags(array<str>), ids(array<long>), height(int, NULL)
    val r = Row("u", 320, 0.5, Seq("a", "b"), Seq(1L, 2L), null)
    def hex(b: Array[Byte]) = b.map("%02X".format(_)).mkString(" ")
    // string → bytes_list: Feature{ bytes_list(1){ value(1)="u" } }
    assert(hex(TfRecordCodec.typedFeature(r, 0, StringType)) == "0A 03 0A 01 75")
    // int 320 → int64_list packed varint C0 02
    assert(hex(TfRecordCodec.typedFeature(r, 1, IntegerType)) == "1A 04 0A 02 C0 02")
    // double 0.5 → float_list fixed32 LE of 0.5f = 00 00 00 3F
    assert(hex(TfRecordCodec.typedFeature(r, 2, DoubleType)) == "12 06 0A 04 00 00 00 3F")
    // list<str> → bytes_list with two values
    assert(hex(TfRecordCodec.typedFeature(r, 3, ArrayType(StringType))) ==
      "0A 06 0A 01 61 0A 01 62")
    // list<long> [1,2] → int64_list packed 01 02
    assert(hex(TfRecordCodec.typedFeature(r, 4, ArrayType(LongType))) == "1A 04 0A 02 01 02")
    // NULL of ANY type → empty bytes_list (reference types by VALUE:
    // _feature(None) is bytes_feature(b""), even for an int column)
    assert(hex(TfRecordCodec.typedFeature(r, 5, IntegerType)) == "0A 02 0A 00")
    // NULL elements INSIDE typed lists → 0 (TF's Int64List/FloatList
    // cannot represent null; the sink must not crash on them)
    val rn = Row(Seq(1L, null), Seq(0.5, null))
    assert(hex(TfRecordCodec.typedFeature(rn, 0, ArrayType(LongType))) == "1A 04 0A 02 01 00")
    assert(hex(TfRecordCodec.typedFeature(rn, 1, ArrayType(DoubleType))) ==
      "12 0A 0A 08 00 00 00 3F 00 00 00 00")
  }

  test("int64/float features: wire-format golden") {
    // int64_list [3, 300]: field3 { field1 packed varints 03, AC 02 }
    val i64 = TfRecordCodec.int64Feature(Seq(3L, 300L))
    assert(i64.toSeq == Array[Int](0x1A, 0x05, 0x0A, 0x03, 0x03, 0xAC, 0x02).map(_.toByte).toSeq)
    // float_list [1.0]: field2 { field1 packed fixed32 00 00 80 3F }
    val f = TfRecordCodec.floatFeature(Seq(1.0f))
    assert(f.toSeq == Array[Int](0x12, 0x06, 0x0A, 0x04, 0x00, 0x00, 0x80, 0x3F).map(_.toByte).toSeq)
  }
}
