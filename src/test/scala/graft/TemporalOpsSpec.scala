package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.operators.TemporalOps

class TemporalOpsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(cores = 4, appName = "graft-temporal-test")

  test("intervalBinStats: key-less range join, bin edges hand-computed") {
    import spark.implicits._
    // window = 100: left row at t matches right rows in [t-100, t)
    val left = Seq((1L, 250L), (2L, 300L), (3L, 1000L))
      .toDF("id", "t")
    val right = Seq(
      (150L, 1.0),  // = 250-100: inclusive lower edge for id 1; < 200 bin boundary
      (200L, 2.0),  // in [150,250) and [200,300): ids 1 and 2
      (249L, 4.0),  // id 1 (and id 2's window [200,300))
      (250L, 8.0),  // = id 1's t: excluded (strict upper); id 2 keeps it
      (300L, 16.0), // = id 2's t: excluded; matches nobody
      (999L, 32.0)) // id 3 only
      .toDF("rt", "v")
    val got = TemporalOps.intervalBinStats(
        left, Seq("id"), col("t"), right, col("rt"), col("v"), windowUs = 100L)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSeq
    assert(got == Seq(
      (1L, 3L, Some(7.0)),   // 150+200+249
      (2L, 3L, Some(14.0)),  // 200+249+250
      (3L, 1L, Some(32.0))))
  }

  test("intervalBinStats: left rows with no matches survive with count 0") {
    import spark.implicits._
    val left = Seq((1L, 5000L)).toDF("id", "t")
    val right = Seq((10L, 1.0)).toDF("rt", "v")
    val got = TemporalOps.intervalBinStats(
        left, Seq("id"), col("t"), right, col("rt"), col("v"), windowUs = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSeq
    assert(got == Seq((1L, 0L, None)))
  }

  test("intervalBinStats: correct under a pathological hot bin (all rows one window)") {
    import spark.implicits._
    // every right row lands in the SAME time bin — the worst skew the
    // bin key can see; counts must still be exact
    val left = Seq((1L, 1000L), (2L, 1050L)).toDF("id", "t")
    val right = (0 until 10000).map(i => (900L + (i % 100), 1.0)).toDF("rt", "v")
    val got = TemporalOps.intervalBinStats(
        left, Seq("id"), col("t"), right, col("rt"), col("v"), windowUs = 100L)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // id 1 window [900,1000): all 10000 rows (900..999); id 2 window
    // [950,1050): rt in 950..999 -> 50 of each 100-cycle = 5000 rows
    assert(got == Seq((1L, 10000L), (2L, 5000L)))
  }

  test("asofJoin picks the latest right row at-or-before each left time, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, "a", 100L, "l1"), (2L, "a", 205L, "l2"), (3L, "b", 50L, "l3"),
      (4L, "b", 300L, "l4"), (5L, "c", 10L, "l5"))
      .toDF("id", "k", "t", "payload")
    val right = Seq(
      (10L, "a", 100L, 1.0), (11L, "a", 200L, 2.0), (12L, "a", 210L, 3.0),
      (13L, "b", 60L, 4.0), (14L, "b", 299L, 5.0))
      .toDF("rid", "k", "t", "v")
    val got = TemporalOps.asofJoin(left, right, "k", "t", tieBreak = Some("rid"))
      .select("id", "asof_rid", "asof_v").orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(got == Seq(
      (1L, Some(10L), Some(1.0)), // equal time matches (>= semantics)
      (2L, Some(11L), Some(2.0)), // 210 is later than 205 -> 200 wins
      (3L, None, None),           // no right row at or before 50
      (4L, Some(14L), Some(5.0)),
      (5L, None, None)))          // key with no right rows at all
  }

  test("asofJoin equal-time right duplicates break toward the largest tieBreak") {
    import spark.implicits._
    val left = Seq((1L, "a", 100L)).toDF("id", "k", "t")
    val right = Seq((7L, "a", 100L, 1.0), (9L, "a", 100L, 2.0), (8L, "a", 100L, 3.0))
      .toDF("rid", "k", "t", "v")
    val got = TemporalOps.asofJoin(left, right, "k", "t", tieBreak = Some("rid"))
      .select("asof_rid").collect().head.getLong(0)
    assert(got == 9L)
  }

  test("asofJoin plan: one hash partitioning on the key, no cartesian/BNL join") {
    import spark.implicits._
    val left = spark.range(1000).select(col("id"), (col("id") % 50).as("k"), (col("id") * 3).as("t"))
    val right = spark.range(800).select(col("id").as("rid"), (col("id") % 50).as("k"), (col("id") * 4).as("t"))
    val plan = TemporalOps.asofJoin(left, right, "k", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"as-of must not cross-product:\n$plan")
    assert(plan.contains("hashpartitioning(_k"), "expected a key shuffle for the window")
  }

  test("lookbackStats equals the brute-force inequality join") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // ~10% of right events carry a NULL value: they must still count
    // toward lookback_count (event count), just not lookback_sum
    val rows = (0 until 400).map { i =>
      (i.toLong, (i % 7).toLong, rnd.nextInt(10000).toLong,
        if (rnd.nextBoolean()) "L" else "R",
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(100).toDouble))
    }
    val df = rows.toDF("id", "k", "t", "side", "v")
    val got = TemporalOps.lookbackStats(
        df, "k", col("t"), col("side") === "L", col("side") === "R",
        col("v"), lookbackUs = 500L)
      .select("id", "lookback_count", "lookback_sum")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.toString))).toSeq.sortBy(_._1)
    val rights = rows.filter(_._4 == "R")
    val want = rows.filter(_._4 == "L").map { case (id, k, t, _, _) =>
      val in = rights.filter(r => r._2 == k && r._3 >= t - 500 && r._3 < t)
      val vals = in.flatMap(_._5)
      (id, in.size.toLong, if (vals.isEmpty) None else Some(vals.sum.toString))
    }.sortBy(_._1)
    assert(got.map(x => (x._1, x._2)) == want.map(x => (x._1, x._2)))
    // sums compared loosely typed (double formatting) — exact equality
    got.zip(want).foreach { case ((id, _, gs), (_, _, ws)) =>
      assert(gs.map(_.toDouble.round) == ws.map(_.toDouble.round), s"sum mismatch at $id")
    }
  }
}
