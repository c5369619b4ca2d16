package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables

/** SURVEY.md §2c mm43 — multimodal column plumbing.
  *
  * Media (image/audio/video) ride through the pipeline as opaque
  * `binary` payloads plus typed metadata; per-item decode/feature
  * extraction runs as a partition-batched transform with a fixed
  * output schema. No media codecs exist in this container, so the
  * decode step is a clearly-marked deterministic STUB (byte-histogram
  * "features"); everything around it — binary column, metadata struct,
  * mapPartitions batching, explicit result schema — is the real
  * Spark-side contract a codec-backed decoder would drop into.
  */
object MultimodalQueries {

  /** STUB decode: a real implementation would decode the payload with
    * a codec and emit model features; this emits a deterministic
    * 8-bin byte histogram so the plumbing is testable end-to-end. */
  def stubDecode(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](8)
    payload.foreach(b => hist((b & 0xff) >> 5) += 1.0)
    if (payload.nonEmpty) (0 until 8).foreach(i => hist(i) /= payload.length)
    hist
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("modality", StringType),
    StructField("byte_len", IntegerType),
    StructField("checksum", LongType),
    StructField("features", ArrayType(DoubleType))))

  val all: Seq[QueryDef] = Seq(
    QueryDef.rowsOnly("mm_metadata") { (s, dir) =>
      // payload: the document text as bytes — the stand-in for a real
      // media column; metadata is carried as typed columns.
      val withPayload = Tables.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          lit("text/plain").as("modality"),
          crc32(encode(col("text"), "UTF-8")).as("checksum"))
      // partition-batched "decode": the executor processes one batch
      // (partition) at a time with bounded memory — where a Pandas-UDF
      // / mapInPandas decode sits in a PySpark pipeline.
      val decoded = withPayload.mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("doc_id"), r.getAs[String]("modality"),
            payload.length, r.getAs[Long]("checksum"), stubDecode(payload).toSeq)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      decoded.orderBy("doc_id")
    }
  )
}
