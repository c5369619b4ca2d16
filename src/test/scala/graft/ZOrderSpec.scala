package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, Tables}
import graft.plans.{And, Between, IndexPruning, PredValue}
import graft.sources.{MicroBlockIndex, MicroBlockWriter}

/** Z-order layout: interleave correctness, row preservation, pruning
  * conservativeness, and the measured multi-dimension pruning win over
  * single-key clustering (SURVEY.md §2b mb_zorder).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-zorder-test")
  private val dir = "/root/testdata/sf0.001"

  test("ZValue interleaves bits dimension-major (Morton order)") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def z(bits: Int, bs: Int*): Long =
      graft.functions.ZValue.interleave(ArrayData.toArrayData(bs.toArray), bits)
    // 2 dims, x=0b11 y=0b01: bit j of dim i -> position j*2+i
    // x bits 0,1 -> positions 0,2; y bit 0 -> position 1 => 0b0111 = 7
    assert(z(2, 3, 1) == 7L)
    assert(z(2, 0, 0) == 0L)
    assert(z(2, 3, 3) == 15L)
    // 3 dims, one bit each
    assert(z(1, 1, 0, 1) == 5L)
    // monotone in each dim for fixed others
    assert(z(4, 5, 9) != z(4, 9, 5), "interleave must be dimension-ordered")
  }

  test("zvalue column matches the static interleave and codegen runs") {
    import spark.implicits._
    val df = Seq((3, 1), (0, 0), (3, 3)).toDF("x", "y")
      .select(graft.functions.ZOrder.zvalue(Seq(col("x"), col("y")), 2).as("z"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(7L, 0L, 15L))
  }

  test("quantile bucket: count of boundaries <= v, nulls to bucket 0") {
    import spark.implicits._
    val df = Seq(Some(0.5), Some(1.0), Some(2.5), None).toDF("v")
      .select(graft.functions.ZOrder.bucket(col("v"), Seq(1.0, 2.0)).as("b"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 1, 2, 0))
  }

  private lazy val layouts: (String, String) = {
    val li = Tables.load(spark, dir, "lineitem")
    val lin = "target/scratch/test/zorder/linear"
    val zo = "target/scratch/test/zorder/zordered"
    MicroBlockWriter.write(li, lin, "l_quantity", 16)
    MicroBlockWriter.writeZOrdered(li, zo, Seq("l_quantity", "l_extendedprice"), 16)
    (lin, zo)
  }

  test("z-ordered layout preserves every row exactly") {
    val li = Tables.load(spark, dir, "lineitem")
    val z = spark.read.parquet(layouts._2)
    assert(z.count() == li.count())
    val key = (d: org.apache.spark.sql.DataFrame) => d
      .select(sum(col("l_orderkey") * lit(7) + col("l_linenumber")).as("k"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      .collect().head.toString
    assert(key(z) == key(li))
  }

  test("pruning stays conservative on the z layout: skipped files hold zero matching rows") {
    val (_, zo) = layouts
    val idx = MicroBlockIndex.build(spark, zo, "lineitem_z").toDF
    val pred = And(
      Between("l_quantity", PredValue(11L), PredValue(13L)),
      Between("l_extendedprice", PredValue(20000L), PredValue(26000L)))
    val skipped = IndexPruning.skippedFiles(idx, pred)
    if (skipped.nonEmpty) {
      val n = spark.read.parquet(skipped: _*)
        .filter(col("l_quantity").between(11, 13) &&
          col("l_extendedprice").between(20000, 26000))
        .count()
      assert(n == 0, s"skipped files must be provably irrelevant, found $n rows")
    }
    // and kept files cover the full answer
    val kept = IndexPruning.keptFiles(idx, pred)
    val full = Tables.load(spark, dir, "lineitem")
      .filter(col("l_quantity").between(11, 13) &&
        col("l_extendedprice").between(20000, 26000)).count()
    val served = spark.read.parquet(kept: _*)
      .filter(col("l_quantity").between(11, 13) &&
        col("l_extendedprice").between(20000, 26000)).count()
    assert(served == full && full > 0)
  }

  test("z-order prunes the SECOND dimension where single-key clustering cannot") {
    val (lin, zo) = layouts
    val linIdx = MicroBlockIndex.build(spark, lin, "lineitem_lin").toDF
    val zIdx = MicroBlockIndex.build(spark, zo, "lineitem_z").toDF
    val price = Between("l_extendedprice", PredValue(20000L), PredValue(26000L))
    val total = 16
    val linKept = total - IndexPruning.skippedFiles(linIdx, price).size
    val zKept = total - IndexPruning.skippedFiles(zIdx, price).size
    // the quantity-clustered layout scatters price across every block
    assert(linKept >= total - 1,
      s"single-key layout should not prune the off-key dim (kept $linKept)")
    // the z layout gives every block a tight price box
    assert(zKept <= total / 2,
      s"z-order should prune at least half the files on the second dim (kept $zKept)")
  }
}
