package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables

/** SURVEY.md §2c mm43/mm56/mm62/mm65/mm76 — multimodal column plumbing.
  *
  * Media (image/audio/video) ride through the pipeline as opaque
  * `binary` payloads plus typed metadata; per-item decode/feature
  * extraction runs as a partition-batched transform with a fixed
  * output schema. Four modalities decode FOR REAL in pure JVM — WAV
  * (hand-rolled RIFF parser), BMP (hand-rolled header/pixel parser),
  * PNG and GIF (the JDK's own `javax.imageio` readers against
  * hand-rolled spec encoders, GIF's with a real compress-convention
  * LZW compressor), and JPEG (hand-rolled baseline T.81 encoder
  * against the JDK's libjpeg-derived reader, exact on the DC
  * quantization lattice). Only modalities with no JVM codec at all
  * (MP3/video) keep a
  * clearly-marked deterministic STUB (byte-histogram "features");
  * everything around it — binary column, metadata struct,
  * mapPartitions batching, explicit result schema — is the real
  * Spark-side contract a codec-backed decoder drops into.
  *
  * The stub's 8 histogram ratios are emitted as scalar columns
  * (f0..f7), not an array: the verify dump is hash-compared row-wise
  * and each ratio is a single exact-int division, so the whole decode
  * output is DuckDB-oracle-checkable (the oracle re-derives the bytes
  * from hex pairs — see [[OracleSql.unsignedBytes]]).
  */
object MultimodalQueries {

  /** STUB decode: a real implementation would decode the payload with
    * a codec and emit model features; this emits a deterministic
    * 8-bin byte histogram (bin = unsigned byte >> 5, normalized by
    * payload length) so the plumbing is testable end-to-end. */
  def stubDecode(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](8)
    payload.foreach(b => hist((b & 0xff) >> 5) += 1.0)
    if (payload.nonEmpty) (0 until 8).foreach(i => hist(i) /= payload.length)
    hist
  }

  private val outSchema = StructType(
    Seq(
      StructField("doc_id", LongType),
      StructField("modality", StringType),
      StructField("byte_len", LongType),
      StructField("checksum", StringType)) ++
      (0 until 8).map(i => StructField(s"f$i", DoubleType)))

  private def oracle: String = {
    val bins = OracleSql.unsignedBytes("hx", "bl")
    val fs = (0 until 8).map { i =>
      s"CASE WHEN bl = 0 THEN 0.0 ELSE CAST(len(list_filter(bins, x -> x // 32 = $i)) AS DOUBLE) / bl END AS f$i"
    }.mkString(",\n  ")
    s"""WITH d AS (
       |  SELECT doc_id, md5(text) AS checksum,
       |    hex(encode(text)) AS hx, octet_length(encode(text)) AS bl
       |  FROM documents
       |), b AS (
       |  SELECT doc_id, checksum, bl, $bins AS bins FROM d
       |)
       |SELECT doc_id, 'text/plain' AS modality, bl AS byte_len, checksum,
       |  $fs
       |FROM b ORDER BY doc_id""".stripMargin
  }

  /** mm_decode's deterministic WAV fixture, per doc:
    * frames, channels, sample rate and the interleaved 8-bit samples
    * are closed-form in doc_id — so the DuckDB oracle can recompute
    * the DECODED stats independently, turning the query into a true
    * encode→parse→aggregate roundtrip check of the real
    * [[graft.operators.MediaOps]] WAV decoder. */
  private val wavGenSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("payload", BinaryType)))

  private def wavFixture(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = 50 + (id % 50).toInt
        val ch = 1 + (id % 2).toInt
        val sr = 8000 + (id % 3).toInt * 4000
        val samples = Array.tabulate(n * ch)(j => ((id * 37 + j * 11) % 256).toInt)
        Row(id, graft.operators.MediaOps.wavBytes(sr, ch, 8, samples))
      }
    }(org.apache.spark.sql.Encoders.row(wavGenSchema))

  private def decodeOracle: String = {
    def chanSum(cExpr: String) =
      s"list_sum(list_transform(range(0, CAST(n AS BIGINT)), k -> (doc_id*37 + (k*ch + $cExpr)*11) % 256))"
    def chanMax(cExpr: String) =
      s"list_max(list_transform(range(0, CAST(n AS BIGINT)), k -> (doc_id*37 + (k*ch + $cExpr)*11) % 256))"
    s"""WITH p AS (
       |  SELECT doc_id,
       |    50 + doc_id % 50 AS n,
       |    1 + doc_id % 2 AS ch,
       |    8000 + (doc_id % 3) * 4000 AS sr
       |  FROM documents
       |)
       |SELECT doc_id, 'audio/wav' AS modality,
       |  CAST(44 + n*ch AS BIGINT) AS byte_len,
       |  CAST(sr AS BIGINT) AS sample_rate,
       |  CAST(ch AS BIGINT) AS channels,
       |  CAST(8 AS BIGINT) AS bits,
       |  CAST(n AS BIGINT) AS n_frames,
       |  CAST(n * 1000000 // sr AS BIGINT) AS duration_us,
       |  CAST(${chanSum("0")} AS BIGINT) AS c0_sum,
       |  CAST(${chanMax("0")} AS BIGINT) AS c0_peak,
       |  CAST(CASE WHEN ch = 2 THEN ${chanSum("1")} END AS BIGINT) AS c1_sum,
       |  CAST(CASE WHEN ch = 2 THEN ${chanMax("1")} END AS BIGINT) AS c1_peak
       |FROM p ORDER BY doc_id""".stripMargin
  }

  /** Closed-form replay of the stride-4 frame sample over the
    * mm_decode WAV fixture: sampled frame k is source frame 4k, whose
    * channel-c value is (doc_id*37 + (4k*ch + c)*11) % 256; the md5
    * input lists sampled values frame-major across channels,
    * comma-joined — exactly [[graft.operators.MediaOps.sampleWavFrames]]'
    * fingerprint. */
  private def frameSampleOracle: String = {
    val every = 4
    def v(kExpr: String, cExpr: String) =
      s"(doc_id*37 + (($kExpr)*$every*ch + ($cExpr))*11) % 256"
    def chan(cExpr: String, agg: String) =
      s"list_$agg(list_transform(range(0, ns), k -> ${v("k", cExpr)}))"
    val md5Str = s"array_to_string(list_transform(range(0, ns*ch), " +
      s"j -> CAST(${v("j//ch", "j%ch")} AS VARCHAR)), ',')"
    s"""WITH p AS (
       |  SELECT doc_id,
       |    50 + doc_id % 50 AS n,
       |    1 + doc_id % 2 AS ch,
       |    8000 + (doc_id % 3) * 4000 AS sr
       |  FROM documents
       |), q AS (
       |  SELECT doc_id, n, ch, sr, (n + ${every - 1}) // $every AS ns FROM p
       |)
       |SELECT doc_id, 'audio/wav' AS modality,
       |  CAST(sr AS BIGINT) AS sample_rate,
       |  CAST(ch AS BIGINT) AS channels,
       |  CAST(n AS BIGINT) AS n_frames,
       |  CAST(ns AS BIGINT) AS n_sampled,
       |  CAST(${chan("0", "sum")} AS BIGINT) AS c0_sum,
       |  CAST(${chan("0", "max")} AS BIGINT) AS c0_peak,
       |  CAST(CASE WHEN ch = 2 THEN ${chan("1", "sum")} END AS BIGINT) AS c1_sum,
       |  CAST(CASE WHEN ch = 2 THEN ${chan("1", "max")} END AS BIGINT) AS c1_peak,
       |  md5($md5Str) AS sample_md5
       |FROM q ORDER BY doc_id""".stripMargin
  }

  private def bmpOracle: String = {
    def chanSum(c: Int) =
      s"list_sum(list_transform(range(0, CAST(w*h AS BIGINT)), p2 -> (doc_id*31 + (p2*3 + $c)*7) % 256))"
    def chanMax(c: Int) =
      s"list_max(list_transform(range(0, CAST(w*h AS BIGINT)), p2 -> (doc_id*31 + (p2*3 + $c)*7) % 256))"
    s"""WITH p AS (
       |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
       |)
       |SELECT doc_id, 'image/bmp' AS modality,
       |  CAST(54 + ((w*3 + 3) // 4 * 4) * h AS BIGINT) AS byte_len,
       |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       |  CAST(24 AS BIGINT) AS bpp,
       |  CAST(${chanSum(0)} AS BIGINT) AS b_sum, CAST(${chanMax(0)} AS BIGINT) AS b_max,
       |  CAST(${chanSum(1)} AS BIGINT) AS g_sum, CAST(${chanMax(1)} AS BIGINT) AS g_max,
       |  CAST(${chanSum(2)} AS BIGINT) AS r_sum, CAST(${chanMax(2)} AS BIGINT) AS r_max
       |FROM p ORDER BY doc_id""".stripMargin
  }

  /** Closed-form replay of nearest-neighbor resize to 3×2: target
    * pixel (tx, ty) samples logical source (tx*w//3, ty*h//2); the
    * source BGR value at logical (sx, sy, c) is the mm_image fixture's
    * (doc_id*31 + ((sy*w + sx)*3 + c)*7) % 256 — all integer ops. */
  private def resizeOracle: String = {
    val tw = 3; val th = 2
    // value of flattened resized position p (pixel index) and channel c
    def v(p: String, c: String) =
      s"(doc_id*31 + (((($p)//$tw*h//$th)*w + (($p)%$tw*w//$tw))*3 + ($c))*7) % 256"
    def chan(c: Int, agg: String) =
      s"list_$agg(list_transform(range(0, ${tw * th}), p2 -> ${v("p2", c.toString)}))"
    // md5 input: BGR values in row-major target order, comma-joined
    val pxStr = s"array_to_string(list_transform(range(0, ${tw * th * 3}), " +
      s"j -> CAST(${v("j//3", "j%3")} AS VARCHAR)), ',')"
    s"""WITH p AS (
       |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
       |)
       |SELECT doc_id, 'image/bmp' AS modality,
       |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       |  CAST($tw AS BIGINT) AS t_width, CAST($th AS BIGINT) AS t_height,
       |  CAST(${chan(0, "sum")} AS BIGINT) AS b_sum, CAST(${chan(0, "max")} AS BIGINT) AS b_max,
       |  CAST(${chan(1, "sum")} AS BIGINT) AS g_sum, CAST(${chan(1, "max")} AS BIGINT) AS g_max,
       |  CAST(${chan(2, "sum")} AS BIGINT) AS r_sum, CAST(${chan(2, "max")} AS BIGINT) AS r_max,
       |  md5($pxStr) AS px_md5
       |FROM p ORDER BY doc_id""".stripMargin
  }

  private def pngOracle: String = {
    def chanSum(c: Int) =
      s"list_sum(list_transform(range(0, CAST(w*h AS BIGINT)), p2 -> (doc_id*29 + (p2*3 + $c)*13) % 256))"
    def chanMax(c: Int) =
      s"list_max(list_transform(range(0, CAST(w*h AS BIGINT)), p2 -> (doc_id*29 + (p2*3 + $c)*13) % 256))"
    s"""WITH p AS (
       |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
       |)
       |SELECT doc_id, 'image/png' AS modality,
       |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       |  CAST(8 AS BIGINT) AS bit_depth,
       |  CAST(${chanSum(0)} AS BIGINT) AS r_sum, CAST(${chanMax(0)} AS BIGINT) AS r_max,
       |  CAST(${chanSum(1)} AS BIGINT) AS g_sum, CAST(${chanMax(1)} AS BIGINT) AS g_max,
       |  CAST(${chanSum(2)} AS BIGINT) AS b_sum, CAST(${chanMax(2)} AS BIGINT) AS b_max
       |FROM p ORDER BY doc_id""".stripMargin
  }

  private def gifOracle: String = {
    // pixel p's palette index is (doc_id*17 + p*5) % 16; palette entry
    // c's channel ch value is (doc_id*19 + c*7 + ch*53) % 256 — exact
    // integer replay of the fixture's palette lookup
    def chan(c: Int, agg: String) =
      s"list_$agg(list_transform(range(0, CAST(w*h AS BIGINT)), " +
        s"p2 -> (doc_id*19 + ((doc_id*17 + p2*5) % 16)*7 + $c*53) % 256))"
    s"""WITH p AS (
       |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
       |)
       |SELECT doc_id, 'image/gif' AS modality,
       |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       |  CAST(${chan(0, "sum")} AS BIGINT) AS r_sum, CAST(${chan(0, "max")} AS BIGINT) AS r_max,
       |  CAST(${chan(1, "sum")} AS BIGINT) AS g_sum, CAST(${chan(1, "max")} AS BIGINT) AS g_max,
       |  CAST(${chan(2, "sum")} AS BIGINT) AS b_sum, CAST(${chan(2, "max")} AS BIGINT) AS b_max
       |FROM p ORDER BY doc_id""".stripMargin
  }

  private def jpegOracle: String = {
    // tile t's gray value is 2*((doc_id*31 + t*97) % 128); a flat 8x8
    // tile decodes to exactly that value (DC-only block on the Q=16
    // quantization lattice), so sum = 64 * sum(tile values)
    s"""WITH g AS (
       |  SELECT doc_id, 1 + doc_id % 3 AS tw, 1 + doc_id % 2 AS th
       |  FROM documents
       |), v AS (
       |  SELECT doc_id, tw, th,
       |    list_transform(range(0, CAST(tw*th AS BIGINT)),
       |      t -> 2 * ((doc_id*31 + t*97) % 128)) AS vals
       |  FROM g
       |)
       |SELECT doc_id, 'image/jpeg' AS modality,
       |  CAST(tw * 8 AS BIGINT) AS width, CAST(th * 8 AS BIGINT) AS height,
       |  CAST(64 * list_sum(vals) AS BIGINT) AS gray_sum,
       |  CAST(list_max(vals) AS BIGINT) AS gray_max
       |FROM v ORDER BY doc_id""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    // mm101 (round 5): JPEG decode — the transform-codec modality,
    // same cross-implementation recipe as mm_png/mm_gif: a hand-rolled
    // baseline JFIF ENCODER (T.81 markers, Annex-K Huffman tables,
    // MSB-first entropy coding with byte stuffing, DC difference
    // chain) against the JDK's libjpeg-derived ImageIO READER. JPEG is
    // lossy in general, so the fixture pins every 8x8 block to a flat
    // tile whose value sits on the Q=16 DC quantization lattice
    // (even values): the block's only nonzero coefficient is
    // F(0,0)=8(v-128), quantized exactly, and the decoder returns
    // exactly v — verified exhaustively for all 128 lattice values in
    // MediaOpsSpec. The byte-histogram stub now stands ONLY for
    // modalities with no JVM codec at all (MP3/video).
    QueryDef.sql("mm_jpeg", jpegOracle) { (s, dir) =>
      val docs = graft.operators.Par.repart(
        Tables.load(s, dir, "documents"), targetBytes = 128L << 10)
      val fixture = docs.select(col("doc_id")).mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val tw = 1 + (id % 3).toInt
          val th = 1 + (id % 2).toInt
          val vals = Array.tabulate(tw * th)(t => 2 * ((id * 31 + t * 97) % 128).toInt)
          Row(id, graft.operators.MediaOps.jpegBytes(tw, th, vals))
        }
      }(org.apache.spark.sql.Encoders.row(wavGenSchema))
      graft.operators.MediaOps.decodeJpegDF(fixture, "doc_id", "payload")
        .select(
          col("doc_id"), lit("image/jpeg").as("modality"),
          col("width"), col("height"), col("gray_sum"), col("gray_max"))
        .orderBy("doc_id")
    },
    // mm76: GIF decode — hand-rolled GIF89a writer with a real
    // compress-convention LZW compressor (variable code width,
    // dictionary resets) against the JDK's own ImageIO GIF reader, the
    // same cross-implementation roundtrip recipe as mm_png. GIF is
    // lossless palette lookup, so DuckDB recomputes the decoded
    // per-channel stats closed-form from doc_id. With GIF landed, the
    // byte-histogram stub below stands ONLY for modalities whose
    // codecs genuinely aren't in a stock JVM (MP3/video; JPEG's
    // lossiness is handled by mm_jpeg's quantization-lattice fixture,
    // which makes the transform pipeline exactly lossless).
    QueryDef.sql("mm_gif", gifOracle) { (s, dir) =>
      val docs = graft.operators.Par.repart(
        Tables.load(s, dir, "documents"), targetBytes = 128L << 10)
      val fixture = docs.select(col("doc_id")).mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = 4 + (id % 5).toInt
          val h = 3 + (id % 4).toInt
          val palette = Array.tabulate(16 * 3)(j =>
            ((id * 19 + (j / 3) * 7 + (j % 3) * 53) % 256).toInt)
          val indices = Array.tabulate(w * h)(p => ((id * 17 + p * 5) % 16).toInt)
          Row(id, graft.operators.MediaOps.gifBytes(w, h, palette, indices))
        }
      }(org.apache.spark.sql.Encoders.row(wavGenSchema))
      graft.operators.MediaOps.decodeGifDF(fixture, "doc_id", "payload")
        .select(
          col("doc_id"), lit("image/gif").as("modality"),
          col("width"), col("height"),
          element_at(col("channel_sums"), 1).as("r_sum"),
          element_at(col("channel_peaks"), 1).as("r_max"),
          element_at(col("channel_sums"), 2).as("g_sum"),
          element_at(col("channel_peaks"), 2).as("g_max"),
          element_at(col("channel_sums"), 3).as("b_sum"),
          element_at(col("channel_peaks"), 3).as("b_max"))
        .orderBy("doc_id")
    },
    // mm81 (round 5): decode → TRANSFORM — nearest-neighbor downsample
    // to a fixed 3×2 thumbnail inside the same partition-batched pass
    // as the BMP parse (no full-resolution pixel array ever reaches a
    // column: the per-row output is bounded at tw·th pixels no matter
    // the source size — the shape an image training pipeline needs at
    // 100 TB). Resized per-channel stats AND the md5 of the exact
    // resized BGR byte string are replayed closed-form by the oracle,
    // so the sampling arithmetic (floor(t*src/dst), bottom-up row
    // un-flip) is verified pixel-exact, not just statistically.
    QueryDef.sql("mm_resize", resizeOracle) { (s, dir) =>
      val docs = graft.operators.Par.repart(
        Tables.load(s, dir, "documents"), targetBytes = 128L << 10)
      val fixture = docs.select(col("doc_id")).mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = 4 + (id % 5).toInt
          val h = 3 + (id % 4).toInt
          val pixels = Array.tabulate(w * h * 3)(j => ((id * 31 + j * 7) % 256).toInt)
          Row(id, graft.operators.MediaOps.bmpBytes(w, h, pixels))
        }
      }(org.apache.spark.sql.Encoders.row(wavGenSchema))
      graft.operators.MediaOps.resizeBmpDF(fixture, "doc_id", "payload", 3, 2)
        .select(
          col("doc_id"), lit("image/bmp").as("modality"),
          col("width"), col("height"),
          lit(3L).as("t_width"), lit(2L).as("t_height"),
          element_at(col("channel_sums"), 1).as("b_sum"),
          element_at(col("channel_peaks"), 1).as("b_max"),
          element_at(col("channel_sums"), 2).as("g_sum"),
          element_at(col("channel_peaks"), 2).as("g_max"),
          element_at(col("channel_sums"), 3).as("r_sum"),
          element_at(col("channel_peaks"), 3).as("r_max"),
          col("px_md5"))
        .orderBy("doc_id")
    },
    // mm65: PNG decode through the JDK's OWN ImageIO reader against a
    // hand-rolled spec encoder (zlib Deflater + CRC32 — both JDK) — a
    // true cross-implementation roundtrip: fixture pixels are
    // closed-form in doc_id, DuckDB recomputes the decoded stats
    // independently. byte_len is deliberately absent: deflate output
    // size isn't closed-form, and the oracle checks DECODE, not the
    // compressor. With WAV+BMP+PNG real, the histogram stub below
    // stands only for codec-requiring modalities (MP3/video).
    QueryDef.sql("mm_png", pngOracle) { (s, dir) =>
      val docs = graft.operators.Par.repart(
        Tables.load(s, dir, "documents"), targetBytes = 128L << 10)
      val fixture = docs.select(col("doc_id")).mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = 4 + (id % 5).toInt
          val h = 3 + (id % 4).toInt
          val pixels = Array.tabulate(w * h * 3)(j => ((id * 29 + j * 13) % 256).toInt)
          Row(id, graft.operators.MediaOps.pngBytes(w, h, pixels))
        }
      }(org.apache.spark.sql.Encoders.row(wavGenSchema))
      graft.operators.MediaOps.decodePngDF(fixture, "doc_id", "payload")
        .select(
          col("doc_id"), lit("image/png").as("modality"),
          col("width"), col("height"), col("bit_depth"),
          element_at(col("channel_sums"), 1).as("r_sum"),
          element_at(col("channel_peaks"), 1).as("r_max"),
          element_at(col("channel_sums"), 2).as("g_sum"),
          element_at(col("channel_peaks"), 2).as("g_max"),
          element_at(col("channel_sums"), 3).as("b_sum"),
          element_at(col("channel_peaks"), 3).as("b_max"))
        .orderBy("doc_id")
    },
    // mm62: REAL decode for the image modality — 24-bpp BI_RGB BMP
    // parsed from the payload bytes (pure JVM: magic, header offsets,
    // bottom-up padded rows), per-channel BGR stats hash-checked
    // against DuckDB's closed-form replay of the fixture. Together
    // with mm_decode (WAV), both codec-free modalities now decode for
    // real; the histogram stub stands only where a codec would be
    // required (MP3/video).
    QueryDef.sql("mm_image", bmpOracle) { (s, dir) =>
      val docs = graft.operators.Par.repart(
        Tables.load(s, dir, "documents"), targetBytes = 128L << 10)
      val fixture = docs.select(col("doc_id")).mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = 4 + (id % 5).toInt
          val h = 3 + (id % 4).toInt
          val pixels = Array.tabulate(w * h * 3)(j => ((id * 31 + j * 7) % 256).toInt)
          Row(id, graft.operators.MediaOps.bmpBytes(w, h, pixels))
        }
      }(org.apache.spark.sql.Encoders.row(wavGenSchema))
      graft.operators.MediaOps.decodeBmpDF(fixture, "doc_id", "payload")
        .select(
          col("doc_id"), lit("image/bmp").as("modality"),
          col("byte_len"), col("width"), col("height"), col("bpp"),
          element_at(col("channel_sums"), 1).as("b_sum"),
          element_at(col("channel_peaks"), 1).as("b_max"),
          element_at(col("channel_sums"), 2).as("g_sum"),
          element_at(col("channel_peaks"), 2).as("g_max"),
          element_at(col("channel_sums"), 3).as("r_sum"),
          element_at(col("channel_peaks"), 3).as("r_max"))
        .orderBy("doc_id")
    },

    // mm43b: REAL decode for the audio modality — RIFF/WAVE PCM parsed
    // from the payload bytes by MediaOps.decodeWav (pure JVM, no codec
    // lib), stats oracle-checked against DuckDB's closed-form replay of
    // the fixture. The byte-histogram stub survives only for modalities
    // whose codecs aren't in the container (mm_metadata below).
    QueryDef.sql("mm_decode", decodeOracle) { (s, dir) =>
      val docs = graft.operators.Par.repart(
        Tables.load(s, dir, "documents"), targetBytes = 128L << 10)
      val decoded = graft.operators.MediaOps.decodeWavDF(
        wavFixture(docs), "doc_id", "payload")
      decoded.select(
          col("doc_id"), lit("audio/wav").as("modality"),
          col("byte_len"), col("sample_rate"), col("channels"), col("bits"),
          col("n_frames"), col("duration_us"),
          element_at(col("channel_sums"), 1).as("c0_sum"),
          element_at(col("channel_peaks"), 1).as("c0_peak"),
          when(col("channels") === 2, element_at(col("channel_sums"), 2)).as("c1_sum"),
          when(col("channels") === 2, element_at(col("channel_peaks"), 2)).as("c1_peak"))
        .orderBy("doc_id")
    },

    // mm85 (round 5): decode → FRAME SAMPLE — stats over every 4th
    // frame only, fused into the same partition-batched parse (one
    // chunk walk, one stride-4 fold; the sampled subset never
    // materializes as an array or column). sample_md5 fingerprints the
    // sampled values themselves, so the decimation arithmetic (which
    // frames, which channels, in what order) is verified sample-exact
    // by the oracle's closed-form replay — the audio twin of
    // mm_resize's pixel-exact check, and the access pattern video
    // frame sampling needs at 100 TB.
    QueryDef.sql("mm_framesample", frameSampleOracle) { (s, dir) =>
      val docs = graft.operators.Par.repart(
        Tables.load(s, dir, "documents"), targetBytes = 128L << 10)
      graft.operators.MediaOps.sampleWavDF(
          wavFixture(docs), "doc_id", "payload", every = 4)
        .select(
          col("doc_id"), lit("audio/wav").as("modality"),
          col("sample_rate"), col("channels"),
          col("n_frames"), col("n_sampled"),
          element_at(col("channel_sums"), 1).as("c0_sum"),
          element_at(col("channel_peaks"), 1).as("c0_peak"),
          when(col("channels") === 2, element_at(col("channel_sums"), 2)).as("c1_sum"),
          when(col("channels") === 2, element_at(col("channel_peaks"), 2)).as("c1_peak"),
          col("sample_md5"))
        .orderBy("doc_id")
    },

    QueryDef.sql("mm_metadata", oracle) { (s, dir) =>
      // payload: the document text as bytes — the stand-in for a real
      // media column; metadata is carried as typed columns. Checksum is
      // md5 (hex string): identical across Spark and DuckDB.
      val withPayload = graft.operators.Par.repart(
        Tables.load(s, dir, "documents"), targetBytes = 128L << 10)
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          lit("text/plain").as("modality"),
          md5(encode(col("text"), "UTF-8")).as("checksum"))
      // partition-batched "decode": the executor processes one batch
      // (partition) at a time with bounded memory — where a Pandas-UDF
      // / mapInPandas decode sits in a PySpark pipeline.
      val decoded = withPayload.mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val feats = stubDecode(payload)
          Row.fromSeq(
            Seq(r.getAs[Long]("doc_id"), r.getAs[String]("modality"),
              payload.length.toLong, r.getAs[String]("checksum")) ++ feats)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      decoded.orderBy("doc_id")
    }
  )
}
