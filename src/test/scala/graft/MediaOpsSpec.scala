package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.GraftSession
import graft.operators.MediaOps

class MediaOpsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(cores = 4, appName = "graft-media-test")

  test("8-bit mono WAV roundtrip: header fields and channel stats") {
    val samples = Array(0, 255, 128, 7)
    val m = MediaOps.decodeWav(MediaOps.wavBytes(8000, 1, 8, samples))
    assert(m.sampleRate == 8000 && m.channels == 1 && m.bitsPerSample == 8)
    assert(m.nFrames == 4)
    assert(m.durationUs == 4L * 1000000 / 8000)
    assert(m.channelSums.toSeq == Seq(390L))
    assert(m.channelPeaks.toSeq == Seq(255L))
  }

  test("16-bit stereo WAV roundtrip: signed samples deinterleave per channel") {
    // frames: (L,R) = (-32768, 32767), (100, -1), (0, 5)
    val samples = Array(-32768, 32767, 100, -1, 0, 5)
    val m = MediaOps.decodeWav(MediaOps.wavBytes(44100, 2, 16, samples))
    assert(m.sampleRate == 44100 && m.channels == 2 && m.bitsPerSample == 16)
    assert(m.nFrames == 3)
    assert(m.channelSums.toSeq == Seq(-32668L, 32771L))
    assert(m.channelPeaks.toSeq == Seq(100L, 32767L))
  }

  test("frame sampling: stride fold visits exactly frames 0, e, 2e, ...") {
    // stereo, 5 frames: (L,R) = (10,11),(20,21),(30,31),(40,41),(50,51)
    val samples = Array(10, 11, 20, 21, 30, 31, 40, 41, 50, 51)
    val m = MediaOps.sampleWavFrames(MediaOps.wavBytes(8000, 2, 8, samples), every = 2)
    assert(m.nFrames == 5 && m.nSampled == 3)          // frames 0, 2, 4
    assert(m.channelSums.toSeq == Seq(10L + 30 + 50, 11L + 31 + 51))
    assert(m.channelPeaks.toSeq == Seq(50L, 51L))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(m.sampleMd5 == md5hex("10,11,30,31,50,51"))
    // stride 1 degenerates to the full decode's stats
    val full = MediaOps.decodeWav(MediaOps.wavBytes(8000, 2, 8, samples))
    val s1 = MediaOps.sampleWavFrames(MediaOps.wavBytes(8000, 2, 8, samples), every = 1)
    assert(s1.nSampled == full.nFrames)
    assert(s1.channelSums.toSeq == full.channelSums.toSeq)
    // 16-bit signed path: negative values print with '-' in the md5 string
    val m16 = MediaOps.sampleWavFrames(
      MediaOps.wavBytes(44100, 1, 16, Array(-5, 7, -9)), every = 2)
    assert(m16.channelSums.toSeq == Seq(-14L))
    assert(m16.sampleMd5 == md5hex("-5,-9"))
  }

  test("unknown chunks (LIST/INFO) between fmt and data are skipped") {
    val base = MediaOps.wavBytes(16000, 1, 8, Array(1, 2, 3))
    // splice a 7-byte LIST chunk (odd length -> 1 pad byte) before data
    val dataIdx = {
      // find the "data" tag after the 12-byte RIFF/WAVE header
      val s = new String(base.map(b => (b & 0xff).toChar))
      s.indexOf("data", 12)
    }
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](7, 0, 0, 0) ++ "INFOxyz".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = base.take(dataIdx) ++ list ++ base.drop(dataIdx)
    val m = MediaOps.decodeWav(spliced)
    assert(m.nFrames == 3 && m.channelSums.toSeq == Seq(6L))
  }

  test("malformed payloads are rejected, not mis-parsed") {
    intercept[IllegalArgumentException](MediaOps.decodeWav("nonsense".getBytes))
    intercept[IllegalArgumentException](
      MediaOps.decodeWav(MediaOps.wavBytes(8000, 1, 8, Array(1)).take(20)))
  }

  test("BMP roundtrip: header, bottom-up padded rows, per-channel BGR stats") {
    // 3x2, BGR triples top-down: row0 = (1,2,3),(4,5,6),(7,8,9); row1 = (10..18)
    val pixels = (1 to 18).toArray
    val bytes = MediaOps.bmpBytes(3, 2, pixels)
    // row size 3*3=9 -> padded to 12; 54-byte header
    assert(bytes.length == 54 + 24)
    val m = MediaOps.decodeBmp(bytes)
    assert(m.width == 3 && m.height == 2 && m.bitsPerPixel == 24)
    assert(m.channelSums.toSeq == Seq(1L + 4 + 7 + 10 + 13 + 16,
      2L + 5 + 8 + 11 + 14 + 17, 3L + 6 + 9 + 12 + 15 + 18))
    assert(m.channelPeaks.toSeq == Seq(16L, 17L, 18L))
  }

  test("malformed BMPs are rejected") {
    intercept[IllegalArgumentException](MediaOps.decodeBmp("XXnotabmp".getBytes))
    intercept[IllegalArgumentException](
      MediaOps.decodeBmp(MediaOps.bmpBytes(3, 2, (1 to 18).toArray).take(40)))
  }

  test("PNG roundtrip: hand-rolled encoder vs the JDK's ImageIO decoder") {
    // 3x2, RGB triples top-down — same pixel values as the BMP test but
    // RGB order; decode goes through an INDEPENDENT implementation
    // (javax.imageio), so this proves both sides of the roundtrip
    val pixels = (1 to 18).toArray
    val m = MediaOps.decodePng(MediaOps.pngBytes(3, 2, pixels))
    assert(m.width == 3 && m.height == 2 && m.bitDepth == 8)
    assert(m.channelSums.toSeq == Seq(1L + 4 + 7 + 10 + 13 + 16,
      2L + 5 + 8 + 11 + 14 + 17, 3L + 6 + 9 + 12 + 15 + 18))
    assert(m.channelPeaks.toSeq == Seq(16L, 17L, 18L))
  }

  test("PNG encoder output matches ImageIO's own encoder, stat-for-stat") {
    // encode the same image twice — our spec encoder and ImageIO.write —
    // and require identical decoded stats: pins pngBytes to the format,
    // not just to whatever ImageIO.read tolerates
    val (w, h) = (5, 4)
    val pixels = Array.tabulate(w * h * 3)(j => (j * 41 + 3) % 256)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      img.setRGB(x, y, (pixels(i) << 16) | (pixels(i + 1) << 8) | pixels(i + 2))
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val viaImageIO = MediaOps.decodePng(out.toByteArray)
    val viaSpec = MediaOps.decodePng(MediaOps.pngBytes(w, h, pixels))
    assert(viaSpec.width == viaImageIO.width && viaSpec.height == viaImageIO.height)
    assert(viaSpec.channelSums.toSeq == viaImageIO.channelSums.toSeq)
    assert(viaSpec.channelPeaks.toSeq == viaImageIO.channelPeaks.toSeq)
  }

  test("non-image payloads are rejected by decodePng") {
    intercept[IllegalArgumentException](MediaOps.decodePng("not a png".getBytes))
  }

  /** Decode a GIF with ImageIO and return the palette-resolved pixels
    * as RGB triples, row-major top-down — byte-exact comparison hook. */
  private def gifPixels(bytes: Array[Byte]): Array[Int] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not read the GIF")
    val argb = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
    argb.flatMap(p => Array((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff))
  }

  test("GIF roundtrip: hand-rolled LZW encoder vs ImageIO, pixel-exact") {
    val nc = 16
    val palette = Array.tabulate(nc * 3)(j => (j * 37 + 11) % 256)
    val (w, h) = (7, 5)
    val indices = Array.tabulate(w * h)(p => (p * 5 + 3) % nc)
    val bytes = MediaOps.gifBytes(w, h, palette, indices)
    val expected = indices.flatMap(i =>
      Array(palette(i * 3), palette(i * 3 + 1), palette(i * 3 + 2)))
    assert(gifPixels(bytes).toSeq == expected.toSeq)
    val m = MediaOps.decodeGif(bytes)
    assert(m.width == w && m.height == h)
  }

  test("GIF LZW: code-width growth and 4096-entry dictionary resets decode pixel-exact") {
    // 16 colors, 200x150 = 30k pixels with a pattern that defeats long
    // runs: the dictionary blows through every width step 5..12 bits
    // and hits the 4096-entry reset path several times — the exact
    // conventions (grow-after-emit, clear-at-full) a decoder must agree
    // on, proven against the JDK's independent implementation
    val nc = 16
    val palette = Array.tabulate(nc * 3)(j => (j * 29 + 5) % 256)
    val (w, h) = (200, 150)
    val indices = Array.tabulate(w * h)(p => ((p * p) ^ (p >> 3)) % nc)
    val bytes = MediaOps.gifBytes(w, h, palette, indices)
    val expected = indices.flatMap(i =>
      Array(palette(i * 3), palette(i * 3 + 1), palette(i * 3 + 2)))
    assert(gifPixels(bytes).toSeq == expected.toSeq)
  }

  test("GIF: 256-color palette and 2-color palette edge sizes roundtrip") {
    for (nc <- Seq(2, 256)) {
      val palette = Array.tabulate(nc * 3)(j => (j * 97 + 13) % 256)
      val (w, h) = (9, 6)
      val indices = Array.tabulate(w * h)(p => (p * 7 + 1) % nc)
      val expected = indices.flatMap(i =>
        Array(palette(i * 3), palette(i * 3 + 1), palette(i * 3 + 2)))
      assert(gifPixels(MediaOps.gifBytes(w, h, palette, indices)).toSeq == expected.toSeq,
        s"palette size $nc")
    }
  }

  test("resizeBmpNearest matches a brute-force logical-grid reference") {
    val (w, h, tw, th) = (7, 5, 3, 2)
    val pixels = Array.tabulate(w * h * 3)(j => (j * 11 + 3) % 256)
    val m = MediaOps.resizeBmpNearest(MediaOps.bmpBytes(w, h, pixels), tw, th)
    // reference: sample the LOGICAL top-down array directly
    val ref = for (ty <- 0 until th; tx <- 0 until tw; c <- 0 until 3)
      yield pixels(((ty * h / th) * w + (tx * w / tw)) * 3 + c).toLong
    val refMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(ref.mkString(",").getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(m.width == w && m.height == h)
    assert(m.pxMd5 == refMd5, "resized BGR byte string must be pixel-exact")
    (0 until 3).foreach { c =>
      val chan = ref.zipWithIndex.collect { case (v, i) if i % 3 == c => v }
      assert(m.channelSums(c) == chan.sum && m.channelPeaks(c) == chan.max)
    }
  }

  test("resizeBmpNearest honors top-down (negative height) row order") {
    val (w, h) = (4, 3)
    val pixels = Array.tabulate(w * h * 3)(j => (j * 5 + 1) % 256)
    val bottomUp = MediaOps.bmpBytes(w, h, pixels)
    // rebuild as a top-down file: negate height, un-flip the stored rows
    val rowSize = (w * 3 + 3) / 4 * 4
    val topDown = bottomUp.clone()
    val bb = java.nio.ByteBuffer.wrap(topDown).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -h)
    for (y <- 0 until h; i <- 0 until rowSize)
      topDown(54 + y * rowSize + i) = bottomUp(54 + (h - 1 - y) * rowSize + i)
    val a = MediaOps.resizeBmpNearest(bottomUp, 2, 2)
    val b = MediaOps.resizeBmpNearest(topDown, 2, 2)
    assert(a.pxMd5 == b.pxMd5, "same logical image → same resized pixels")
  }

  test("decodeWavDF decodes a binary column partition-batched") {
    import spark.implicits._
    val rows = (0L until 10L).map { id =>
      (id, MediaOps.wavBytes(8000, 1, 8, Array.tabulate(5)(j => (id + j).toInt)))
    }
    val out = MediaOps.decodeWavDF(rows.toDF("doc_id", "payload"), "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(5)).forall(_ == 5L)) // n_frames
    assert(out(3).getSeq[Long](7) == Seq(3L + 4 + 5 + 6 + 7)) // sums for id=3
  }

  test("jpeg: EXHAUSTIVE lattice roundtrip — every even value decodes to itself") {
    // hand-rolled T.81 encoder vs the JDK's independent decoder: a
    // flat 8x8 tile on the Q=16 DC lattice survives the full
    // DCT→quantize→Huffman→decode pipeline EXACTLY, for all 128 values
    (0 to 254 by 2).foreach { v =>
      val m = MediaOps.decodeJpegGray(MediaOps.jpegBytes(1, 1, Array(v)))
      assert(m.width == 8 && m.height == 8, s"v=$v dims")
      assert(m.graySum == 64L * v && m.grayMax == v,
        s"v=$v decoded sum=${m.graySum} max=${m.grayMax}")
    }
  }

  test("jpeg: multi-tile DC difference chain, both signs, boundary values") {
    val vals = Array(200, 10, 254, 0, 128, 64)
    val m = MediaOps.decodeJpegGray(MediaOps.jpegBytes(3, 2, vals))
    assert(m.width == 24 && m.height == 16)
    assert(m.graySum == 64L * vals.sum)
    assert(m.grayMax == 254L)
    // off-lattice values are rejected up-front: the fixture contract
    // (exactness) is enforced, not silently approximated
    intercept[IllegalArgumentException] {
      MediaOps.jpegBytes(1, 1, Array(101))
    }
  }
}
