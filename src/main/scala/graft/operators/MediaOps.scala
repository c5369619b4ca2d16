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
  * drops into for MP3/video.
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

  // ---------------------------------------------------------------- JPEG

  /** Standard Huffman tables from the public JPEG spec (ITU T.81
    * Annex K, tables K.3/K.5): (BITS counts for code lengths 1..16,
    * HUFFVAL symbol list). Codes are derived canonically, so only
    * these public constants are embedded. */
  private val JpegDcBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val JpegDcVals = (0 to 11).toArray
  private val JpegAcBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val JpegAcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical Huffman code assignment (T.81 C.2): symbols get
    * consecutive codes within each length, lengths ascending. */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var vi = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += vals(vi) -> (code, len)
        code += 1
        vi += 1
        i += 1
      }
      code <<= 1
      len += 1
    }
    out.result()
  }

  /** Encode a baseline grayscale JFIF JPEG whose image is flat 8×8
    * tiles (`tilesW`×`tilesH` tiles, `tileVals` row-major, each an
    * EVEN value in [0, 254]) — hand-rolled from the public JPEG spec
    * (T.81): SOI/APP0/DQT/SOF0/DHT/SOS markers, uniform quant table
    * (all 16), Annex-K Huffman tables, MSB-first entropy coding with
    * 0xFF byte stuffing, DC coded as a category + ones'-complement
    * difference chain, each block closed with EOB.
    *
    * A flat block's DCT has ONE nonzero coefficient: F(0,0) =
    * 8·(v−128). With Q[0,0] = 16 the quantized DC is (v−128)/2 —
    * exact for even v — and the decoder's dequantize+IDCT returns
    * exactly v: the values sit on the quantization lattice, so the
    * lossy pipeline is exactly lossless and the decoded stats stay
    * closed-form for the oracle (the mm_png/mm_gif discipline,
    * extended to a transform codec). */
  def jpegBytes(tilesW: Int, tilesH: Int, tileVals: Array[Int]): Array[Byte] = {
    require(tilesW >= 1 && tilesH >= 1 && tilesW * 8 <= 65535 && tilesH * 8 <= 65535,
      s"dimensions ${tilesW}x$tilesH tiles outside JPEG's 16-bit frame size")
    require(tileVals.length == tilesW * tilesH, "need one value per tile")
    require(tileVals.forall(v => v >= 0 && v <= 254 && v % 2 == 0),
      "tile values must be even in [0, 254] (the Q=16 DC lattice)")
    val w = tilesW * 8
    val h = tilesH * 8
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(m)
      out.write((payload.length + 2) >> 8); out.write((payload.length + 2) & 0xff)
      out.write(payload, 0, payload.length)
    }
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    marker(0xdb, (Array(0x00) ++ Array.fill(64)(16)).map(_.toByte)) // DQT, table 0
    marker(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff,
      1, 1, 0x11, 0).map(_.toByte)) // SOF0: 8-bit, 1 component, 1x1
    marker(0xc4, (Array(0x00) ++ JpegDcBits ++ JpegDcVals).map(_.toByte))
    marker(0xc4, (Array(0x10) ++ JpegAcBits ++ JpegAcVals).map(_.toByte))
    marker(0xda, Array(1, 1, 0x00, 0, 63, 0).map(_.toByte)) // SOS

    val dcCodes = canonicalCodes(JpegDcBits, JpegDcVals)
    val acCodes = canonicalCodes(JpegAcBits, JpegAcVals)
    var acc = 0L
    var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nbits += len
      while (nbits >= 8) {
        val b = ((acc >> (nbits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nbits -= 8
      }
    }
    var prevDc = 0
    tileVals.foreach { v =>
      val dc = (v - 128) / 2
      val diff = dc - prevDc
      prevDc = dc
      val mag = math.abs(diff)
      val cat = 32 - Integer.numberOfLeadingZeros(mag) // bits in |diff|
      val (c, l) = dcCodes(cat)
      put(c, l)
      if (cat > 0) put(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
      val (ec, el) = acCodes(0x00) // EOB: all 63 AC coefficients zero
      put(ec, el)
    }
    if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits) // pad with 1s
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Decoded grayscale stats: dimensions + sum and max of the raw
    * RASTER samples (no ColorModel conversion — `getRGB` on a gray
    * image applies a gray↔sRGB color-space transform that is not the
    * identity; the raster holds the decoder's actual output). */
  final case class JpegMeta(width: Int, height: Int, graySum: Long, grayMax: Long)

  /** Decode a JPEG payload via `javax.imageio` (an independent decoder
    * implementation — the JDK's libjpeg-derived plugin) and fold
    * gray-sample sum/max from the raster. */
  def decodeJpegGray(bytes: Array[Byte]): JpegMeta = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val raster = img.getRaster
    require(raster.getNumBands == 1, s"expected grayscale, got ${raster.getNumBands} bands")
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var max = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = raster.getSample(x, y, 0).toLong
        sum += v
        if (v > max) max = v
        x += 1
      }
      y += 1
    }
    JpegMeta(w, h, sum, max)
  }

  private val jpegDecodeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("gray_sum", LongType),
    StructField("gray_max", LongType)))

  /** Partition-batched JPEG decode over a binary column (same contract
    * as [[decodePngDF]]). */
  def decodeJpegDF(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(df.col(idCol), df.col(payloadCol)).mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        val m = decodeJpegGray(payload)
        Row(r.getLong(0), payload.length.toLong, m.width.toLong,
          m.height.toLong, m.graySum, m.grayMax)
      }
    }(Encoders.row(jpegDecodeSchema))
}
