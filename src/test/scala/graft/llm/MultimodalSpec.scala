package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The array-producing batched-inference form (the shape a real model
  * integration keeps) and the native IVF assignment's degenerate-input
  * behavior — both outside the DuckDB oracle's reach. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("embedStub: fixed-size per-partition batches, vectors of byte stats") {
    val rows = Multimodal.embedStub(spark, dir, batchSize = 16).collect()
    assert(rows.nonEmpty)
    // every "model call" saw at most batchSize rows, and at least 1
    val sizes = rows.map(_.getAs[Int]("batch_size"))
    assert(sizes.forall(s => s >= 1 && s <= 16))
    // a full batch exists somewhere (documents outnumber 16 per partition)
    assert(sizes.contains(16))
    // 4-dim embedding; first component is the byte length, which for
    // ASCII text equals n_chars
    val byLen = Multimodal.decodeMeta(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("byte_len")).toMap
    rows.take(50).foreach { r =>
      val e = r.getSeq[Float](r.fieldIndex("embedding"))
      assert(e.length === 4)
      assert(e.head === byLen(r.getAs[Long]("doc_id")).toFloat)
    }
  }

  test("decode stub is deterministic in the payload bytes") {
    val a = Multimodal.FakeDecoder.decode(7L, "hello world".getBytes("UTF-8"))
    val b = Multimodal.FakeDecoder.decode(7L, "hello world".getBytes("UTF-8"))
    assert(a === b)
    assert(a.byte_len === 11L)
    assert(a.width >= 64 && a.width < 64 + 1024)
    assert(a.channels >= 1 && a.channels <= 4)
  }

  private def imageBytes(w: Int, h: Int, fmt: String, imgType: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    (0 until math.min(w, 8)).foreach(x => img.setRGB(x, 0, 0x123456 + x))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"ImageIO cannot write $fmt")
    out.toByteArray
  }

  test("HeaderDecoder parses real PNG/JPEG/GIF bytes synthesized by ImageIO") {
    import java.awt.image.BufferedImage._
    // PNG truecolor (color type 2 -> 3 channels) and gray (type 0 -> 1)
    assert(Multimodal.HeaderDecoder.parse(imageBytes(320, 200, "png", TYPE_INT_RGB))
      === Some((320, 200, 3)))
    assert(Multimodal.HeaderDecoder.parse(imageBytes(17, 43, "png", TYPE_BYTE_GRAY))
      === Some((17, 43, 1)))
    // JPEG: 3-component color, 1-component gray (ncomp from the SOF)
    assert(Multimodal.HeaderDecoder.parse(imageBytes(640, 480, "jpg", TYPE_INT_RGB))
      === Some((640, 480, 3)))
    assert(Multimodal.HeaderDecoder.parse(imageBytes(31, 9, "jpg", TYPE_BYTE_GRAY))
      === Some((31, 9, 1)))
    // GIF: LE dims, palette RGB -> 3
    assert(Multimodal.HeaderDecoder.parse(imageBytes(300, 1000, "gif", TYPE_INT_RGB))
      === Some((300, 1000, 3)))
  }

  test("property: header parse equals ImageIO's own dimensions across random sizes/formats") {
    import java.awt.image.BufferedImage._
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 25) {
      val w = 1 + rnd.nextInt(2000)
      val h = 1 + rnd.nextInt(2000)
      val (fmt, typ, ch) = rnd.nextInt(4) match {
        case 0 => ("png", TYPE_INT_RGB, 3)
        case 1 => ("png", TYPE_BYTE_GRAY, 1)
        case 2 => ("jpg", TYPE_INT_RGB, 3)
        case 3 => ("gif", TYPE_INT_RGB, 3)
      }
      val bytes = imageBytes(w, h, fmt, typ)
      assert(Multimodal.HeaderDecoder.parse(bytes) === Some((w, h, ch)),
        s"$fmt ${w}x$h type=$typ")
    }
  }

  test("HeaderDecoder rejects non-container bytes (text falls back to the fake)") {
    val text = "not an image at all, just prose".getBytes("UTF-8")
    assert(Multimodal.HeaderDecoder.parse(text).isEmpty)
    assert(Multimodal.HeaderDecoder.decode(5L, text)
      === Multimodal.FakeDecoder.decode(5L, text))
    // truncated/corrupt headers must not throw
    for (n <- Seq(0, 1, 3, 8, 12, 20)) {
      val png = imageBytes(20, 20, "png", java.awt.image.BufferedImage.TYPE_INT_RGB)
      Multimodal.HeaderDecoder.decode(1L, png.take(n))
    }
    val junkJpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0x07)
    Multimodal.HeaderDecoder.decode(2L, junkJpeg)
  }

  test("HeaderDecoder never throws on arbitrary bytes (fuzz)") {
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 2000) {
      val n = rnd.nextInt(64)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      // bias some payloads toward magic prefixes so the parsers' inner
      // branches get fuzzed too, not just the signature rejects
      if (n >= 2 && rnd.nextBoolean()) { b(0) = 0xff.toByte; b(1) = 0xd8.toByte }
      else if (n >= 8 && rnd.nextBoolean()) {
        Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
          .map(_.toByte).copyToArray(b)
      } else if (n >= 6 && rnd.nextBoolean()) {
        "GIF89a".getBytes.copyToArray(b)
      }
      Multimodal.HeaderDecoder.decode(1L, b) // must not throw
    }
  }

  test("decodeFrame runs real image bytes through the partition-wise Spark path") {
    import java.awt.image.BufferedImage._
    import spark.implicits._
    val rows = Seq(
      (1L, imageBytes(320, 200, "png", TYPE_INT_RGB)),
      (2L, imageBytes(64, 32, "jpg", TYPE_INT_RGB)),
      (3L, imageBytes(12, 7, "gif", TYPE_INT_RGB)),
      (4L, "plain text payload".getBytes("UTF-8")),
    )
    val out = Multimodal.decodeFrame(rows.toDF("doc_id", "payload"),
        Multimodal.HeaderDecoder.decode)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(out(0) === ((1L, 320, 200, 3)))
    assert(out(1) === ((2L, 64, 32, 3)))
    assert(out(2) === ((3L, 12, 7, 3)))
    // text row took the deterministic fake path
    val f = Multimodal.FakeDecoder.decode(4L, "plain text payload".getBytes("UTF-8"))
    assert(out(3) === ((4L, f.width, f.height, f.channels)))
  }

  // ground truth computed straight from ImageIO's BufferedImage, the
  // same source of truth the decoder must agree with
  private def imageIoTruth(bytes: Array[Byte]): (Int, Int, Int, Double, Double, Double) = {
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    for (y <- 0 until bi.getHeight; x <- 0 until bi.getWidth) {
      val rgb = bi.getRGB(x, y)
      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
    }
    val n = bi.getWidth.toDouble * bi.getHeight
    (bi.getWidth, bi.getHeight, bi.getColorModel.getNumComponents, sr / n, sg / n, sb / n)
  }

  test("PixelDecoder decodes real PNG/JPEG/GIF pixels: dims, channels and stats match ImageIO") {
    import java.awt.image.BufferedImage._
    for ((fmt, typ, ch) <- Seq(("png", TYPE_INT_RGB, 3), ("png", TYPE_BYTE_GRAY, 1),
        ("jpg", TYPE_INT_RGB, 3), ("gif", TYPE_INT_RGB, 3))) {
      val bytes = imageBytes(48, 27, fmt, typ)
      val (w, h, c, mr, mg, mb) = imageIoTruth(bytes)
      val s = Multimodal.PixelDecoder.stats(bytes).getOrElse(fail(s"$fmt not decoded"))
      assert((s.width, s.height, s.channels) === ((w, h, c)), fmt)
      assert((s.width, s.height, s.channels) === ((48, 27, ch)), fmt)
      // exact agreement: both sides sum the same sRGB pixels
      assert(s.meanR === mr && s.meanG === mg && s.meanB === mb, fmt)
      assert(s.stdLuma >= 0.0)
      // a non-uniform image (setRGB painted 8 pixels) has positive spread
      if (typ == TYPE_INT_RGB) assert(s.stdLuma > 0.0, fmt)
    }
  }

  test("PixelDecoder agrees with HeaderDecoder on container dims and channels") {
    import java.awt.image.BufferedImage._
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 10) {
      val w = 1 + rnd.nextInt(300); val h = 1 + rnd.nextInt(300)
      val (fmt, typ) = rnd.nextInt(3) match {
        case 0 => ("png", TYPE_INT_RGB); case 1 => ("jpg", TYPE_BYTE_GRAY)
        case 2 => ("gif", TYPE_INT_RGB)
      }
      val bytes = imageBytes(w, h, fmt, typ)
      val hd = Multimodal.HeaderDecoder.decode(1L, bytes)
      val px = Multimodal.PixelDecoder.decode(1L, bytes)
      assert((px.width, px.height, px.channels) === ((hd.width, hd.height, hd.channels)),
        s"$fmt ${w}x$h")
    }
  }

  test("PixelDecoder falls back to the deterministic fake on non-image and corrupt payloads") {
    val text = "still not an image".getBytes("UTF-8")
    assert(Multimodal.PixelDecoder.stats(text).isEmpty)
    assert(Multimodal.PixelDecoder.decode(9L, text) === Multimodal.FakeDecoder.decode(9L, text))
    // truncated containers: ImageIO throws internally; decode must not
    val png = imageBytes(20, 20, "png", java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (n <- Seq(0, 10, 30, png.length / 2))
      Multimodal.PixelDecoder.decode(1L, png.take(n))
  }

  test("PixelDecoder refuses decompression bombs before allocating the raster") {
    // a real PNG with its IHDR width/height patched to declare a
    // 60000x60000 image (3.6 G pixels ~ 14 GB ARGB raster): the
    // dimension pre-check must refuse it without ever calling read(0)
    val png = imageBytes(20, 20, "png", java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bomb = png.clone()
    val dim = 60000
    for (i <- 0 until 4) {
      bomb(16 + i) = ((dim >> (8 * (3 - i))) & 0xff).toByte // IHDR width  (BE)
      bomb(20 + i) = ((dim >> (8 * (3 - i))) & 0xff).toByte // IHDR height (BE)
    }
    assert(Multimodal.HeaderDecoder.parse(bomb).exists { case (w, h, _) =>
      w == dim && h == dim }) // the patch really declares huge dims
    assert(Multimodal.PixelDecoder.stats(bomb).isEmpty)
    assert(Multimodal.PixelDecoder.decode(5L, bomb)
      === Multimodal.FakeDecoder.decode(5L, bomb))
    // an in-budget image still decodes with an explicit cap just above it
    assert(Multimodal.PixelDecoder.stats(png, maxPixels = 400L).isDefined)
    assert(Multimodal.PixelDecoder.stats(png, maxPixels = 399L).isEmpty)
  }

  test("PixelDecoder reports palette channels=3 for GIFs with transparency") {
    // ARGB image with a transparent pixel -> GIF writer emits a palette
    // with a transparent entry; the color model then has an alpha
    // component, but channels must stay 3 (HeaderDecoder's palette
    // convention), not drift to 4
    val img = new java.awt.image.BufferedImage(10, 6,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    (0 until 10).foreach(x => img.setRGB(x, 0, 0xff123456 + x))
    img.setRGB(0, 1, 0x00000000) // fully transparent pixel
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", out))
    val bytes = out.toByteArray
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(bi.getColorModel.isInstanceOf[java.awt.image.IndexColorModel])
    val s = Multimodal.PixelDecoder.stats(bytes).getOrElse(fail("gif not decoded"))
    assert((s.width, s.height, s.channels) === ((10, 6, 3)))
    assert(s.channels === Multimodal.HeaderDecoder.decode(1L, bytes).channels)
  }

  test("embedFrame runs real pixels through the batched partition-wise Spark path") {
    import java.awt.image.BufferedImage._
    import spark.implicits._
    val png = imageBytes(32, 16, "png", TYPE_INT_RGB)
    val rows = Seq(
      (1L, png),
      (2L, imageBytes(8, 4, "gif", TYPE_INT_RGB)),
      (3L, "plain text payload".getBytes("UTF-8")),
    )
    val out = Multimodal.embedFrame(rows.toDF("doc_id", "payload"), batchSize = 2)
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    val e1 = out(0).getSeq[Float](out(0).fieldIndex("embedding"))
    assert(e1.length === 8)
    // dims/channels ride in the first three components
    assert((e1(0), e1(1), e1(2)) === ((32f, 16f, 3f)))
    // and the stats equal the direct decoder call (same code, via Spark)
    assert(e1 === Multimodal.PixelDecoder.vector(png).toSeq)
    // text row took the byte-statistics fallback, zero-padded to 8
    val e3 = out(2).getSeq[Float](out(2).fieldIndex("embedding"))
    assert(e3.length === 8 && e3(0) === "plain text payload".length.toFloat && e3(7) === 0f)
    // batch sizes bounded by the configured batchSize
    assert(out.map(_.getAs[Int]("batch_size")).forall(s => s >= 1 && s <= 2))
  }

  test("NearestCell ranks non-finite sims below finite ones and never crashes") {
    import graft.expressions.CellMath
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    def arr(xs: Double*): ArrayData = ArrayData.toArrayData(xs.toArray)
    def cell(cid: Long, cv: ArrayData, cn: Double): InternalRow =
      InternalRow(cid, cv, cn)
    val cells = ArrayData.toArrayData(Array[Any](
      cell(0L, arr(1.0, 0.0), 0.0), // zero norm -> sim = Inf/NaN
      cell(5L, arr(0.0, 1.0), 1.0),
      cell(9L, arr(1.0, 0.0), 1.0),
    ))
    // v = (1, 0), nrm = 1: cid 9 has sim 1.0, cid 5 sim 0.0, cid 0 NaN
    assert(CellMath.nearest(arr(1.0, 0.0), 1.0, cells) === 9L)
    // zero-norm input vector: every sim non-finite -> min cid fallback
    assert(CellMath.nearest(arr(0.0, 0.0), 0.0, cells) === 0L)
  }

  // ---- perceptual hash -------------------------------------------

  /** Block-pattern image (2 colors, GIF-safe): left half dark, right
    * half bright, optionally lifted by `boost` on every channel. */
  private def blockImage(w: Int, h: Int, fmt: String, boost: Int = 0,
      invert: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val bright = (x >= w / 2) != invert
      val base = (if (bright) 200 else 40) + boost
      val v = math.min(255, base)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"ImageIO cannot write $fmt")
    out.toByteArray
  }

  test("PHash: real-pixel aHash — format-stable, brightness-invariant, pattern-sensitive") {
    val png = Multimodal.PHash.ahash(blockImage(64, 48, "png"))
    // same pixels through a different lossless container: identical hash
    assert(Multimodal.PHash.ahash(blockImage(64, 48, "gif")) === png)
    // +20 brightness on every channel: mean shifts with the blocks, the
    // relative comparison (and so the hash) is exactly invariant
    assert(Multimodal.PHash.ahash(blockImage(64, 48, "png", boost = 20)) === png)
    // the inverted pattern flips every non-tied block
    val inv = Multimodal.PHash.ahash(blockImage(64, 48, "png", invert = true))
    assert(java.lang.Long.bitCount(png ^ inv) >= 40,
      s"inverted pattern should flip most of the 48 bits, got ${java.lang.Long.bitCount(png ^ inv)}")
    // a resize of the same pattern stays within a small Hamming distance
    val small = Multimodal.PHash.ahash(blockImage(32, 24, "png"))
    assert(java.lang.Long.bitCount(png ^ small) <= 8,
      s"resized twin too far: ${java.lang.Long.bitCount(png ^ small)}")
  }

  test("PHash: byte-stripe fallback is deterministic and matches the hand model") {
    val payload = "abcdefgh".getBytes("UTF-8")
    val got = Multimodal.PHash.ahashBytes(payload)
    // hand model: stripe i of 48 gets byte j where i = j*48/8 = 6j —
    // each byte its own stripe, empty stripes contribute 0; bit set
    // when byte > mean ('e'..'h' > mean of 'a'..'h')
    var expected = 0L
    val bytes = payload.map(_ & 0xff)
    val total = bytes.sum
    for (j <- bytes.indices)
      if (bytes(j).toLong * bytes.length > total.toLong) expected |= 1L << (j * 48 / bytes.length)
    assert(got === expected)
    assert(Multimodal.PHash.ahashBytes(Array.emptyByteArray) === 0L)
    // non-image payloads route through the fallback in the dispatcher
    assert(Multimodal.PHash.ahash(payload) === got)
  }

  test("phashPairs matches a brute-force fallback-hash model on the fixture") {
    val rows = Multimodal.phashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val docs = graft.ops.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sigs = docs.map { case (id, text) =>
      (id, Multimodal.PHash.ahashBytes(text.getBytes("UTF-8")))
    }
    val expected = (for {
      i <- sigs.indices; j <- i + 1 until sigs.length
      (a, ha) = sigs(i); (b, hb) = sigs(j)
      if (ha >> 36) == (hb >> 36)
      hd = java.lang.Long.bitCount(ha ^ hb).toLong
      if hd <= 12
      key = if (a < b) (a, b) else (b, a)
    } yield key -> hd).toMap
    assert(rows === expected)
  }

  test("stripe vote comparison is exact past the Long-overflow line") {
    import Multimodal.PHash.prodGt
    // agrees with plain Long arithmetic in the safe range
    assert(prodGt(7L, 11L, 5L, 13L) === (7L * 11L > 5L * 13L))
    assert(!prodGt(5L, 13L, 5L, 13L))
    // a multi-GB payload keeps the vote exact: one luma-unit above an
    // even split must still vote 1 (sums·n = total·cnts + n there)
    val n = 8000000000L // 8 GB
    val stripeCnt = n / 48
    val total = 255L * n
    assert(prodGt(255L * stripeCnt + 1L, n, total, stripeCnt))
    assert(!prodGt(255L * stripeCnt, n, total, stripeCnt))
    // and a case where the wrapped Long comparison demonstrably flips
    // (2⁶²·4 = 2⁶⁴ wraps to 0, losing to 3·2⁶¹): the 128-bit form must
    // answer from the true products
    assert(prodGt(1L << 62, 4L, 3L, 1L << 61))
    assert((1L << 62) * 4L < 3L * (1L << 61),
      "guard: plain Long must overflow on this fixture, else the test is vacuous")
  }

  test("wav codec: build/parse round trip, golden header bytes, malformed rejection") {
    import MultimodalAudio.WavCodec
    val data = Array.tabulate[Byte](320)(i => (i % 251).toByte)
    val wav = WavCodec.build(data)
    // golden: the canonical 44-byte header, byte-exact
    assert(new String(wav.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 16), "US-ASCII") === "WAVEfmt ")
    assert(new String(wav.slice(36, 40), "US-ASCII") === "data")
    assert(wav.length === 44 + data.length)
    // RIFF size field = 36 + dataLen, little-endian
    def u32(off: Int) = (0 to 3).map(k => (wav(off + k) & 0xffL) << (8 * k)).sum
    assert(u32(4) === 36L + data.length)
    assert(u32(24) === 16000L, "sample rate field")
    assert(u32(40) === data.length.toLong, "data chunk size")
    val meta = WavCodec.parse(wav).get
    assert(meta.sampleRate === 16000 && meta.channels === 1 &&
      meta.bitsPerSample === 8 && meta.dataLen === data.length.toLong)
    assert(meta.durationMs === data.length * 1000L / 16000)
    // malformed: truncated header, bad magic, data-length mismatch
    assert(WavCodec.parse(wav.take(43)).isEmpty)
    val badMagic = wav.clone(); badMagic(0) = 'X'.toByte
    assert(WavCodec.parse(badMagic).isEmpty)
    assert(WavCodec.parse(wav.dropRight(1)).isEmpty,
      "declared data length must match the actual payload")
    // stereo/16-bit variant round-trips its own fields
    val st = WavCodec.build(Array.fill[Byte](64)(1), sampleRate = 44100,
      channels = 2, bitsPerSample = 16)
    val m2 = WavCodec.parse(st).get
    assert(m2.sampleRate === 44100 && m2.channels === 2 && m2.bitsPerSample === 16)
    assert(m2.durationMs === 64 * 1000L / (44100L * 2 * 2))
  }

  test("audio fold: exact integer features match a hand computation") {
    // text "AZ a" codepoints: 65 90 32 97 -> s = -63 -38 -96 -31
    val r = MultimodalAudio.fold(7L, "en", "AZ a")
    assert(r.n_samples === 4L)
    assert(r.sum_sq === 63L * 63 + 38L * 38 + 96L * 96 + 31L * 31)
    assert(r.flips === 0L, "all samples negative: no sign flips")
    assert(r.silent === 0L)
    assert(r.peak === 96)
    assert(r.data_len === 4L, "ASCII utf-8 bytes")
    // a genuine sign flip: 'z' (122-128=-6, silent) then 'Ä' (196-128=68)
    val r2 = MultimodalAudio.fold(8L, "de", "zÄ")
    assert(r2.flips === 1L && r2.silent === 1L && r2.peak === 68)
    assert(r2.data_len === 3L, "two-byte UTF-8 for the umlaut")
    assert(r2.n_samples === 2L, "codepoints, not bytes")
  }

  test("audio fingerprint: energy-delta bits match a direct model; dups collide at 0") {
    // direct model over a synthetic ramp: frame energies strictly rise,
    // so every delta bit inside the covered frames must be set
    // samples s = 2f+1 (codepoint 129+2f): |s| strictly rises by frame
    val rising = (0 until 33).flatMap(f => Seq.fill(16)((129 + 2 * f).toChar)).mkString
    val fpRising = MultimodalAudio.audioFp(rising)
    (0 until 32).foreach { f =>
      assert((fpRising >> (31 - f) & 1L) === 1L, s"rising energies: bit $f")
    }
    // constant samples: no strict increase anywhere -> fingerprint 0
    assert(MultimodalAudio.audioFp("b" * 600) === 0L)
    // identical text -> identical fingerprint (exact dups collide at 0)
    val t = "the quick brown fox jumps over the lazy dog " * 8
    assert(MultimodalAudio.audioFp(t) === MultimodalAudio.audioFp(t))
    // multiplicative gain preserves the fingerprint (the chromaprint
    // rationale): doubling |s| scales every frame energy by the same
    // factor, so all strict comparisons survive
    def fpOf(samples: Seq[Int]): Long = {
      val e = new Array[Long](33)
      samples.zipWithIndex.foreach { case (s, i) =>
        if (i / 16 < 33) e(i / 16) += s.toLong * s
      }
      (0 until 32).foldLeft(0L)((acc, f) =>
        if (e(f + 1) > e(f)) acc | (1L << (31 - f)) else acc)
    }
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(400)(rnd.nextInt(61) - 30)
    assert(fpOf(base) === fpOf(base.map(_ * 2)), "gain invariance")
    // and the query's pairs all sit inside the hamming gate
    val rows = graft.SparkEntry.queries("multimodal_audio_fingerprint")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.forall(_.getLong(2) <= 6L))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)), "ordered pairs, no self-pairs")
  }
}
