package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Sidecar-metadata IO for persisted prefetch models.
  *
  * The reference's serving loop reloads a trained model from disk at
  * startup (run_with_prefetch_loop.py:17-22: `trained_model.pt` +
  * `trained_mappings.json`); graft's equivalent is a `meta.json`
  * sidecar next to the model's parquet tables. Written through the
  * session's Hadoop configuration so model dirs can live on any
  * filesystem the cluster sees, not just local disk.
  */
private[graft] object ModelIO {

  def writeMeta(spark: SparkSession, dir: String, json: String): Unit = {
    val p = new Path(s"$dir/meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readMeta(spark: SparkSession, dir: String): String = {
    val p = new Path(s"$dir/meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(s"$dir/meta.json")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Integer field from the flat meta JSON (the metas this module
    * writes are single-level objects with unquoted numeric fields). */
  def intField(meta: String, name: String): Int = {
    val m = ("\"" + name + "\"\\s*:\\s*(-?\\d+)").r.findFirstMatchIn(meta)
    m.map(_.group(1).toInt).getOrElse(
      throw new IllegalArgumentException(s"meta.json lacks numeric field '$name': $meta"))
  }

  def strField(meta: String, name: String): String = {
    val m = ("\"" + name + "\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(meta)
    m.map(_.group(1)).getOrElse(
      throw new IllegalArgumentException(s"meta.json lacks string field '$name': $meta"))
  }
}
