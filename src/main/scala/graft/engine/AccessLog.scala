package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.collection.mutable

/** One logged query access: which blocks a query touched, and which
  * columns its predicate filtered (empty for non-predicate paths like
  * range scans) — the signal workload-adaptive clustering reads.
  * `op` (round 14) classifies the access for the LAYOUT-KIND election:
  * "filter" (cols = filtered columns — favors range/z-order
  * clustering), "join" (cols = equi-join keys) and "window" (cols =
  * PARTITION BY keys) — both of which favor hash-bucket co-location
  * on the dominant key. */
final case class Access(queryIdx: Long, table: String, blocks: Seq[Int],
    cols: Seq[String] = Nil, op: String = "filter")

/** Append-only access log + bounded global history.
  *
  * Mirrors the reference's `AccessLogger` (JSON file of per-query block
  * lists) and `GlobalHistory` (rolling window of recently touched block
  * ids) — access_logger.py:1-61. The JSONL file is Spark-readable, so
  * the prefetch model trains *from the log* as a distributed job.
  */
final class AccessLog(logPath: Option[String] = None, historyWindow: Int = 256) {

  private val accesses = mutable.ArrayBuffer.empty[Access]
  private val history = mutable.ArrayDeque.empty[Int]
  private var nextIdx = 0L

  def log(table: String, blocks: Seq[Int],
      cols: Seq[String] = Nil, op: String = "filter"): Access = synchronized {
    val a = Access(nextIdx, table, blocks, cols, op)
    nextIdx += 1
    accesses += a
    blocks.foreach { b =>
      history.append(b)
      while (history.size > historyWindow) history.removeHead()
    }
    logPath.foreach { p =>
      val tableJson = a.table.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      val colsJson = a.cols.map(c => "\"" + c.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case ch if ch < ' ' => f"\\u${ch.toInt}%04x"
        case ch => ch.toString
      } + "\"").mkString(",")
      val line = s"""{"queryIdx":${a.queryIdx},"table":"$tableJson","blocks":[${a.blocks.mkString(",")}],"cols":[$colsJson],"op":"${a.op}"}\n"""
      Files.write(Paths.get(p), line.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
    a
  }

  def all: Seq[Access] = synchronized(accesses.toSeq)

  /** Most recent `n` block ids, oldest→newest (the model's input). */
  def recent(n: Int): Seq[Int] = synchronized(history.takeRight(n).toSeq)
}
