package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, Tables}
import graft.operators.DedupOps

/** Leakage-safe train/val/test split (`pipe_split`): the split unit is
  * the near-dup CLUSTER, so no near-duplicate pair can straddle a
  * split — the contamination a per-doc hash split silently allows.
  */
class LeakageSplitSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-split-test")
  private val dir = "/root/testdata/sf0.001"

  private def split() = SparkEntry.queries("pipe_split")(spark, dir)

  test("every verified near-dup pair lands in ONE split (zero leakage, structural)") {
    val s = split().select(col("doc_id"), col("split"))
    val pairs = DedupOps.minhashPairs(Tables.load(spark, dir, "documents"))
      .filter(col("jaccard") >= 0.8)
    assert(pairs.count() > 0, "fixture must actually contain near-dup pairs")
    val straddling = pairs
      .join(s.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(s.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .count()
    assert(straddling == 0, s"$straddling near-dup pairs straddle a split boundary")
  }

  test("all docs assigned exactly once; groups are split-atomic; proportions near 81/9/9") {
    val out = split().cache()
    val nDocs = Tables.load(spark, dir, "documents").count()
    assert(out.count() == nDocs, "every doc gets exactly one split row")
    // group atomicity: a group key maps to exactly one split
    val splitPerGroup = out.groupBy("group_key")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(splitPerGroup == 0, "a group must never straddle splits")
    // proportions: by GROUP (the unit the hash deals) — binomial
    // tolerance on a small corpus
    val groups = out.select("group_key").distinct().count().toDouble
    val trainGroups = out.filter(col("split") === "train")
      .select("group_key").distinct().count().toDouble
    val frac = trainGroups / groups
    assert(frac > 0.70 && frac < 0.92,
      s"train group share $frac should be near 52/64 = 0.8125")
    assert(out.select("split").distinct().count() == 3,
      "all three splits must be non-empty on the fixture")
    out.unpersist()
  }

  test("deterministic: two independent runs produce identical assignments") {
    val a = split().collect().map(_.toString).sorted
    val b = split().collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
