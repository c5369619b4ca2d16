package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, Salting}
import graft.operators.DedupOps

/** Hot-band skew in the dedup bucket joins: one band key holding ~30%
  * of the corpus must neither change results nor serialize pair
  * generation onto a single task.
  */
class DedupSkewSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-skew-test")

  /** 1000 docs; 300 share a single HOT band (~30% of the corpus), the
    * rest have unique bands (no pairs). */
  private lazy val skewed = spark.range(1000).select(
    col("id").as("doc_id"),
    when(col("id") < 300, array(lit("HOT")))
      .otherwise(array(concat(lit("u"), col("id")))).as("bands"))

  test("salted bucketPairs returns exactly the unsalted pair set on a skewed corpus") {
    val salted = DedupOps.bucketPairs(skewed, "bands", hotCap = 64, saltFactor = 8)
    val plain = DedupOps.bucketPairs(skewed, "bands", hotCap = Int.MaxValue)
    val expected = 300L * 299 / 2
    assert(salted.count() == expected)
    assert(plain.count() == expected)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("duplicateClusters: transitive chains collapse to one component") {
    import spark.implicits._
    // components: {1..5} as a chain, {10,11} a pair, {20,21,22} a star
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L),
      (20L, 21L), (20L, 22L))
      .toDF("doc_a", "doc_b")
    val got = graft.operators.DedupOps.duplicateClusters(pairs)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, 1L, 5L), (2L, 1L, 5L), (3L, 1L, 5L), (4L, 1L, 5L), (5L, 1L, 5L),
      (10L, 10L, 2L), (11L, 10L, 2L),
      (20L, 20L, 3L), (21L, 20L, 3L), (22L, 20L, 3L)))
  }

  test("duplicateClusters: diameter-64 chain converges with bounded per-round planning") {
    import spark.implicits._
    // a pure chain 0-1-2-...-64: min-label propagation needs ~diameter
    // rounds, the worst case for lineage growth — without checkpointing
    // the per-round planning cost climbs with the round number.
    val chain = (0L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val t0 = System.nanoTime()
    val got = graft.operators.DedupOps.duplicateClusters(chain, checkpointEvery = 5)
      .collect()
    val total = (System.nanoTime() - t0) / 1e9
    assert(got.length == 65)
    assert(got.forall(r => r.getLong(1) == 0L && r.getLong(2) == 65L))
    // bounded-behavior guard: 64+ checkpointed rounds on 65 rows must
    // not blow up (un-checkpointed lineage at this diameter overflows
    // analysis budgets long before any data cost)
    assert(total < 300.0, s"diameter-64 chain took ${total}s")
  }

  test("hot bucket's pairs spread across tasks instead of one reducer") {
    // at corpus scale neither side broadcasts — force the shuffle-join
    // path this test is about (a 300-row toy side would broadcast and
    // hide the reducer partitioning entirely)
    // ... and keep AQE from coalescing the kilobyte-sized toy shuffle
    // partitions back into one (at scale they'd be far above the
    // coalesce target)
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCo = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try testSpread()
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCo)
    }
  }

  private def testSpread(): Unit = {
    val hotOnly = skewed.filter(col("doc_id") < 300)
      .select(col("doc_id"), explode(col("bands")).as("bkey"))
    def partCounts(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.groupBy(spark_partition_id()).count()
        .collect().map(_.getLong(1)).toSeq
    // unsalted: ONE join key -> every pair lands in one partition
    val plainParts = partCounts(
      hotOnly.as("l").join(hotOnly.as("r"),
          col("l.bkey") === col("r.bkey") && col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id"), col("r.doc_id")))
    assert(plainParts.size == 1, s"expected 1 hot partition, got $plainParts")
    // salted: (key, salt) spreads the same pairs over multiple tasks
    // with no single task holding a majority
    val saltedParts = partCounts(
      Salting.saltedSelfPairs(hotOnly, "doc_id", "bkey", factor = 8))
    val total = saltedParts.sum
    assert(total == 300L * 299 / 2)
    assert(saltedParts.size >= 4,
      s"expected the hot bucket spread over >=4 partitions, got $saltedParts")
    assert(saltedParts.max.toDouble / total <= 0.5,
      s"one partition still holds a majority: $saltedParts")
  }
}
