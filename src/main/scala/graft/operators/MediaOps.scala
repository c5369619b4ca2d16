package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Real (non-stub) media decode for the multimodal pipeline: RIFF/WAVE
  * PCM parses in pure JVM — no codec library needed — so the audio
  * modality's metadata + per-channel stats are genuinely extracted
  * from the payload bytes (SURVEY §2c mm43; the reference treats media
  * as opaque blobs, graft upgrades the contract to a working decoder
  * for the container formats that don't need codecs).
  *
  * Decode runs partition-batched over the binary column with a fixed
  * output schema — the same shape a mapInPandas/codec-backed decoder
  * drops into for JPEG/MP3/video.
  */
object MediaOps {

  /** Parsed WAV: format fields from the `fmt ` chunk plus per-channel
    * integer stats over the `data` chunk. `channelSums`/`channelPeaks`
    * are raw sample-value sums and maxima (8-bit PCM is unsigned
    * 0..255, 16-bit is signed little-endian) — integer-exact, so the
    * whole decode is oracle-checkable bit-for-bit. */
  final case class WavMeta(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Long, durationUs: Long,
      channelSums: Array[Long], channelPeaks: Array[Long])

  /** Encode interleaved PCM samples as a RIFF/WAVE byte payload
    * (8-bit unsigned / 16-bit signed LE) — the fixture/test encoder
    * proving [[decodeWav]] against independently constructed files. */
  def wavBytes(sampleRate: Int, channels: Int, bits: Int, samples: Array[Int]): Array[Byte] = {
    require(bits == 8 || bits == 16, s"PCM bits must be 8 or 16, got $bits")
    val bps = bits / 8
    val dataLen = samples.length * bps
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * bps) // byte rate
      .putShort((channels * bps).toShort)  // block align
      .putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach { s =>
      if (bits == 8) buf.put((s & 0xff).toByte) else buf.putShort(s.toShort)
    }
    buf.array()
  }

  /** Shared RIFF/WAVE chunk walk: (sampleRate, channels, bits, data).
    * Real files interleave LIST/INFO/fact chunks — unknown chunks are
    * skipped, with the spec's odd-length pad byte honored. */
  private def wavChunks(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def str4(): String = {
      val a = new Array[Byte](4); buf.get(a); new String(a, "US-ASCII")
    }
    require(bytes.length >= 12 && str4() == "RIFF", "not a RIFF payload")
    buf.getInt // RIFF size (unreliable in the wild; chunk walk instead)
    require(str4() == "WAVE", "RIFF payload is not WAVE")
    var sampleRate = 0; var channels = 0; var bits = 0; var fmtSeen = false
    var data: Array[Byte] = null
    while (buf.remaining >= 8 && (data == null || !fmtSeen)) {
      val id = str4()
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining, s"chunk $id overruns payload")
      val next = buf.position() + len + (len & 1) // odd chunks pad 1 byte
      id match {
        case "fmt " =>
          val fmt = buf.getShort
          require(fmt == 1, s"only PCM supported, got format $fmt")
          channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align (derived)
          bits = buf.getShort
          require(bits == 8 || bits == 16, s"unsupported bit depth $bits")
          require(channels > 0 && sampleRate > 0, "degenerate fmt chunk")
          fmtSeen = true
        case "data" =>
          data = new Array[Byte](len); buf.get(data)
        case _ => // LIST, fact, cue, ... — skip
      }
      buf.position(math.min(next, buf.limit()))
    }
    require(fmtSeen, "missing fmt chunk")
    require(data != null, "missing data chunk")
    (sampleRate, channels, bits, data)
  }

  /** Parse a RIFF/WAVE PCM payload: chunk-walk to `fmt ` and `data`
    * ([[wavChunks]]), then fold per-channel sum/peak over the
    * interleaved frames. */
  def decodeWav(bytes: Array[Byte]): WavMeta = {
    val (sampleRate, channels, bits, data) = wavChunks(bytes)
    val bps = bits / 8
    val frames = data.length / (channels * bps)
    val sums = new Array[Long](channels)
    val peaks = Array.fill(channels)(Long.MinValue)
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) {
        val i = (f * channels + c) * bps
        val v: Long =
          if (bits == 8) (data(i) & 0xff).toLong
          else ((data(i) & 0xff) | (data(i + 1) << 8)).toShort.toLong
        sums(c) += v
        if (v > peaks(c)) peaks(c) = v
        c += 1
      }
      f += 1
    }
    if (frames == 0) java.util.Arrays.fill(peaks, 0L)
    WavMeta(sampleRate, channels, bits, frames,
      frames * 1000000L / sampleRate, sums, peaks)
  }

  /** Parsed BMP: dimensions from the BITMAPINFOHEADER plus per-channel
    * (B, G, R) integer sums/maxima over the pixel array. */
  final case class BmpMeta(
      width: Int, height: Int, bitsPerPixel: Int,
      channelSums: Array[Long], channelPeaks: Array[Long])

  /** Encode a 24-bpp BI_RGB BMP: `pixels` are BGR-interleaved,
    * row-major TOP-DOWN; storage is the format's bottom-up order with
    * rows padded to 4-byte boundaries. */
  def bmpBytes(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == width * height * 3, "need w*h BGR triples")
    val rowSize = (width * 3 + 3) / 4 * 4
    val dataLen = rowSize * height
    val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54) // reserved, pixel-data offset
      .putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER, bottom-up
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1
    while (y >= 0) { // bottom-up rows
      var i = y * width * 3
      val end = i + width * 3
      while (i < end) { buf.put((pixels(i) & 0xff).toByte); i += 1 }
      var pad = rowSize - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse a 24-bpp uncompressed BMP payload: validates the BM magic,
    * honors the header's pixel-data offset, row padding and bottom-up
    * vs top-down (negative height) row order, then folds per-channel
    * sum/peak over the BGR pixel array. */
  def decodeBmp(bytes: Array[Byte]): BmpMeta = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && buf.get() == 'B'.toByte && buf.get() == 'M'.toByte,
      "not a BMP payload")
    buf.getInt; buf.getInt // file size, reserved
    val dataOffset = buf.getInt
    val dibSize = buf.getInt
    require(dibSize >= 40, s"unsupported DIB header size $dibSize")
    val width = buf.getInt
    val rawHeight = buf.getInt
    val height = math.abs(rawHeight) // negative = top-down (row order
    buf.getShort                     //   doesn't change channel stats)
    val bpp = buf.getShort
    val compression = buf.getInt
    require(bpp == 24 && compression == 0,
      s"only 24-bpp BI_RGB supported, got bpp=$bpp compression=$compression")
    require(width > 0 && height > 0, "degenerate dimensions")
    val rowSize = (width * 3 + 3) / 4 * 4
    require(dataOffset + rowSize.toLong * height <= bytes.length,
      "pixel array overruns payload")
    val sums = new Array[Long](3)
    val peaks = new Array[Long](3)
    var y = 0
    while (y < height) {
      var x = 0
      val row = dataOffset + y * rowSize
      while (x < width) {
        var c = 0
        while (c < 3) {
          val v = (bytes(row + x * 3 + c) & 0xff).toLong
          sums(c) += v
          if (v > peaks(c)) peaks(c) = v
          c += 1
        }
        x += 1
      }
      y += 1
    }
    BmpMeta(width, height, bpp, sums, peaks)
  }

  private val bmpDecodeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("bpp", LongType),
    StructField("channel_sums", ArrayType(LongType)),
    StructField("channel_peaks", ArrayType(LongType))))

  /** Partition-batched BMP decode over a binary column (same contract
    * as [[decodeWavDF]]). */
  def decodeBmpDF(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(df.col(idCol), df.col(payloadCol)).mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        val m = decodeBmp(payload)
        Row(r.getLong(0), payload.length.toLong, m.width.toLong, m.height.toLong,
          m.bitsPerPixel.toLong, m.channelSums.toSeq, m.channelPeaks.toSeq)
      }
    }(Encoders.row(bmpDecodeSchema))

  /** Nearest-neighbor BMP downsample: source pixel for target (tx, ty)
    * is (floor(tx*w/tw), floor(ty*h/th)) in the LOGICAL top-down grid
    * (file rows un-flip through the header's bottom-up/top-down sign),
    * the standard box-corner NN mapping. Returns the resized image's
    * per-channel (B, G, R) sums/maxima plus an md5 of the resized
    * BGR byte string — the decode→transform step of an image training
    * pipeline, with the transform output small and bounded (tw·th
    * pixels) no matter how large the source payload. */
  final case class BmpResizedMeta(
      width: Int, height: Int,
      channelSums: Array[Long], channelPeaks: Array[Long], pxMd5: String)

  def resizeBmpNearest(bytes: Array[Byte], tw: Int, th: Int): BmpResizedMeta = {
    require(tw > 0 && th > 0, "degenerate target dimensions")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && buf.get() == 'B'.toByte && buf.get() == 'M'.toByte,
      "not a BMP payload")
    buf.getInt; buf.getInt // file size, reserved
    val dataOffset = buf.getInt
    val dibSize = buf.getInt
    require(dibSize >= 40, s"unsupported DIB header size $dibSize")
    val width = buf.getInt
    val rawHeight = buf.getInt
    val height = math.abs(rawHeight)
    buf.getShort
    val bpp = buf.getShort
    val compression = buf.getInt
    require(bpp == 24 && compression == 0,
      s"only 24-bpp BI_RGB supported, got bpp=$bpp compression=$compression")
    require(width > 0 && height > 0, "degenerate dimensions")
    val rowSize = (width * 3 + 3) / 4 * 4
    require(dataOffset + rowSize.toLong * height <= bytes.length,
      "pixel array overruns payload")
    val sums = new Array[Long](3)
    val peaks = new Array[Long](3)
    val sb = new StringBuilder
    var ty = 0
    while (ty < th) {
      val sy = ty * height / th
      val fileRow = if (rawHeight < 0) sy else height - 1 - sy
      var tx = 0
      while (tx < tw) {
        val sx = tx * width / tw
        var c = 0
        while (c < 3) {
          val v = (bytes(dataOffset + fileRow * rowSize + sx * 3 + c) & 0xff).toLong
          sums(c) += v
          if (v > peaks(c)) peaks(c) = v
          if (sb.nonEmpty) sb.append(',')
          sb.append(v)
          c += 1
        }
        tx += 1
      }
      ty += 1
    }
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    BmpResizedMeta(width, height, sums, peaks, md5)
  }

  private val bmpResizeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("channel_sums", ArrayType(LongType)),
    StructField("channel_peaks", ArrayType(LongType)),
    StructField("px_md5", StringType)))

  /** Partition-batched BMP nearest-neighbor resize over a binary
    * column (same contract as [[decodeBmpDF]]). */
  def resizeBmpDF(df: DataFrame, idCol: String, payloadCol: String,
      tw: Int, th: Int): DataFrame =
    df.select(df.col(idCol), df.col(payloadCol)).mapPartitions { rows =>
      rows.map { r =>
        val m = resizeBmpNearest(r.getAs[Array[Byte]](1), tw, th)
        Row(r.getLong(0), m.width.toLong, m.height.toLong,
          m.channelSums.toSeq, m.channelPeaks.toSeq, m.pxMd5)
      }
    }(Encoders.row(bmpResizeSchema))

  /** Parsed PNG: dimensions plus per-channel (R, G, B) integer sums and
    * maxima. Unlike [[decodeWav]]/[[decodeBmp]], the parse side here is
    * the JDK's own ImageIO PNG reader — an independent implementation
    * from [[pngBytes]] — so the roundtrip proves the encoder and the
    * decoder against each other across two codebases. */
  final case class PngMeta(
      width: Int, height: Int, bitDepth: Int,
      channelSums: Array[Long], channelPeaks: Array[Long])

  /** Encode an 8-bit truecolor PNG from `pixels` (RGB-interleaved,
    * row-major top-down) — hand-rolled from the PNG spec: signature,
    * IHDR, one IDAT holding the zlib-deflated filter-0 scanlines, IEND,
    * with CRC32 per chunk. Deflater and CRC32 ship in `java.util.zip`,
    * so the fixture needs no codec library and its DECODED stats are
    * closed-form in the input pixels (PNG is lossless). */
  def pngBytes(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == width * height * 3, "need w*h RGB triples")
    val stride = 1 + width * 3
    val raw = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      raw(y * stride) = 0 // per-row filter byte: None
      var i = 0
      while (i < width * 3) {
        raw(y * stride + 1 + i) = (pixels(y * width * 3 + i) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val zBuf = new Array[Byte](8192)
    while (!deflater.finished()) zOut.write(zBuf, 0, deflater.deflate(zBuf))
    deflater.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(12 + data.length).order(ByteOrder.BIG_ENDIAN)
      val t = typ.getBytes("US-ASCII")
      b.putInt(data.length).put(t).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(t)
      crc.update(data)
      b.putInt(crc.getValue.toInt)
      b.array()
    }
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter 0, no interlace
      .array()
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zOut.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Decode a PNG payload via `javax.imageio` (the PNG reader every JVM
    * ships) and fold per-channel R/G/B sums/maxima. 8-bit PNG decode is
    * lossless and gamma-free here, so `getRGB`'s sRGB ints are exact
    * byte passthrough — the stats are oracle-checkable bit-for-bit. */
  def decodePng(bytes: Array[Byte]): PngMeta = {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    val sums = new Array[Long](3)
    val peaks = new Array[Long](3)
    var i = 0
    while (i < argb.length) {
      var c = 0
      while (c < 3) {
        val v = ((argb(i) >> (16 - 8 * c)) & 0xff).toLong
        sums(c) += v
        if (v > peaks(c)) peaks(c) = v
        c += 1
      }
      i += 1
    }
    PngMeta(w, h, 8, sums, peaks)
  }

  private val pngDecodeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("bit_depth", LongType),
    StructField("channel_sums", ArrayType(LongType)),
    StructField("channel_peaks", ArrayType(LongType))))

  /** Partition-batched PNG decode over a binary column (same contract
    * as [[decodeWavDF]]/[[decodeBmpDF]]). */
  def decodePngDF(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(df.col(idCol), df.col(payloadCol)).mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        val m = decodePng(payload)
        Row(r.getLong(0), payload.length.toLong, m.width.toLong, m.height.toLong,
          m.bitDepth.toLong, m.channelSums.toSeq, m.channelPeaks.toSeq)
      }
    }(Encoders.row(pngDecodeSchema))

  /** Encode a GIF89a image: `palette` is nc*3 R,G,B bytes (nc a power
    * of two in [2,256]), `indices` are w*h palette indices, row-major
    * top-down. The pixel stream is LZW-compressed with the compress(1)
    * convention every GIF writer descends from: variable code width
    * starting at minCodeSize+1, LSB-first bit packing, width grows
    * after the emitted code when the next free slot exceeds the
    * current width's ceiling, dictionary reset via a CLEAR code at
    * 4096 entries. GIF's LZW is lossless, so a decoded image's
    * per-channel stats are closed-form in (palette, indices) — which
    * makes the decode oracle-checkable like [[pngBytes]]'s. */
  def gifBytes(width: Int, height: Int, palette: Array[Int], indices: Array[Int]): Array[Byte] = {
    val nc = palette.length / 3
    require(nc >= 2 && nc <= 256 && Integer.bitCount(nc) == 1,
      s"palette size $nc must be a power of two in [2,256]")
    require(indices.length == width * height, "need w*h palette indices")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(width); u16(height)
    val gctBits = 31 - Integer.numberOfLeadingZeros(nc) // log2(nc)
    out.write(0x80 | 0x70 | (gctBits - 1)) // GCT present, 8-bit color res
    out.write(0); out.write(0)             // background index, aspect
    palette.foreach(v => out.write(v & 0xff))
    out.write(0x2c); u16(0); u16(0); u16(width); u16(height); out.write(0)
    val minCode = math.max(2, gctBits) // spec floor: min LZW code size 2
    out.write(minCode)
    val clear = 1 << minCode
    val eof = clear + 1
    var free = clear + 2
    var nBits = minCode + 1
    var maxCode = (1 << nBits) - 1
    val table = new java.util.HashMap[Integer, Integer]()
    val data = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += nBits
      while (bitCnt >= 8) { data.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8 }
      // width grows AFTER the code that filled the smaller space — the
      // decoder mirrors this when its next-free counter crosses the
      // same ceiling
      if (free > maxCode && nBits < 12) { nBits += 1; maxCode = (1 << nBits) - 1 }
    }
    emit(clear)
    var ent = indices(0)
    var i = 1
    while (i < indices.length) {
      val c = indices(i)
      require(c >= 0 && c < nc, s"index $c out of palette range")
      val key: Integer = (ent << 8) | c
      val hit = table.get(key)
      if (hit != null) ent = hit
      else {
        emit(ent)
        if (free < 4096) { table.put(key, free); free += 1 }
        else { // dictionary full: reset, decoder resets on CLEAR too
          emit(clear)
          table.clear()
          free = clear + 2; nBits = minCode + 1; maxCode = (1 << nBits) - 1
        }
        ent = c
      }
      i += 1
    }
    emit(ent); emit(eof)
    if (bitCnt > 0) data.write((bitBuf & 0xff).toInt)
    val lz = data.toByteArray
    var off = 0
    while (off < lz.length) { // image data rides in <=255-byte sub-blocks
      val n = math.min(255, lz.length - off)
      out.write(n); out.write(lz, off, n); off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF payloads decode through the same ImageIO path as PNG (the
    * reader auto-detects the container); palette lookups are exact, so
    * the stats are oracle-checkable bit-for-bit. */
  def decodeGif(bytes: Array[Byte]): PngMeta = decodePng(bytes)

  /** Partition-batched GIF decode over a binary column. */
  def decodeGifDF(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    decodePngDF(df, idCol, payloadCol)

  private val decodeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", LongType),
    StructField("sample_rate", LongType),
    StructField("channels", LongType),
    StructField("bits", LongType),
    StructField("n_frames", LongType),
    StructField("duration_us", LongType),
    StructField("channel_sums", ArrayType(LongType)),
    StructField("channel_peaks", ArrayType(LongType))))

  /** Partition-batched WAV decode over a binary column: bounded memory
    * per executor batch, explicit output schema — the real multimodal
    * operator contract (decode never touches the driver). */
  def decodeWavDF(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(df.col(idCol), df.col(payloadCol)).mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        val m = decodeWav(payload)
        Row(r.getLong(0), payload.length.toLong, m.sampleRate.toLong,
          m.channels.toLong, m.bitsPerSample.toLong, m.nFrames, m.durationUs,
          m.channelSums.toSeq, m.channelPeaks.toSeq)
      }
    }(Encoders.row(decodeSchema))

  /** Frame-SAMPLED WAV decode: per-channel stats over every `every`-th
    * frame only — the frame-sampling stage a multimodal training
    * pipeline runs before feature extraction (audio decimation; the
    * same access pattern as video frame sampling). Fused into the
    * decode pass: one parse, one stride-`every` fold — the sampled
    * subset is never materialized as an array or column, and the
    * per-row output is bounded regardless of payload length.
    * `sampleMd5` is the md5 of the sampled values themselves
    * (comma-joined decimal, frame-major across channels), so the
    * oracle verifies the decimation arithmetic sample-exact, not just
    * statistically. */
  final case class WavSampleMeta(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Long, nSampled: Long,
      channelSums: Array[Long], channelPeaks: Array[Long],
      sampleMd5: String)

  def sampleWavFrames(bytes: Array[Byte], every: Int): WavSampleMeta = {
    require(every > 0, s"sampling stride must be positive, got $every")
    val (sampleRate, channels, bits, data) = wavChunks(bytes)
    val bps = bits / 8
    val frames = data.length / (channels * bps)
    val sums = new Array[Long](channels)
    val peaks = Array.fill(channels)(Long.MinValue)
    val sb = new java.lang.StringBuilder
    var nSampled = 0L
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) {
        val i = (f * channels + c) * bps
        val v: Long =
          if (bits == 8) (data(i) & 0xff).toLong
          else ((data(i) & 0xff) | (data(i + 1) << 8)).toShort.toLong
        sums(c) += v
        if (v > peaks(c)) peaks(c) = v
        if (sb.length > 0) sb.append(',')
        sb.append(v)
        c += 1
      }
      nSampled += 1
      f += every
    }
    if (nSampled == 0) java.util.Arrays.fill(peaks, 0L)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(sb.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    WavSampleMeta(sampleRate, channels, bits, frames, nSampled,
      sums, peaks, md5)
  }

  private val sampleSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", LongType),
    StructField("channels", LongType),
    StructField("n_frames", LongType),
    StructField("n_sampled", LongType),
    StructField("channel_sums", ArrayType(LongType)),
    StructField("channel_peaks", ArrayType(LongType)),
    StructField("sample_md5", StringType)))

  /** Partition-batched frame-sampled WAV decode over a binary column
    * (same contract as [[decodeWavDF]]). */
  def sampleWavDF(df: DataFrame, idCol: String, payloadCol: String,
      every: Int): DataFrame =
    df.select(df.col(idCol), df.col(payloadCol)).mapPartitions { rows =>
      rows.map { r =>
        val m = sampleWavFrames(r.getAs[Array[Byte]](1), every)
        Row(r.getLong(0), m.sampleRate.toLong, m.channels.toLong,
          m.nFrames, m.nSampled, m.channelSums.toSeq, m.channelPeaks.toSeq,
          m.sampleMd5)
      }
    }(Encoders.row(sampleSchema))
}
