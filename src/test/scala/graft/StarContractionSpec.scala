package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.operators.DedupOps

/** Round bound + equivalence for the star-contraction connected
  * components (Kiveris et al. '14) behind `duplicateClusters`.
  *
  * The old min-label propagation converges in O(component diameter)
  * rounds — a 10k-doc chain of pairwise near-dups (template drift)
  * would pay 10k full join+shuffle rounds at 100 TB. Star contraction
  * must (a) collapse that pathological chain in ≤ 2·log₂(n) rounds and
  * (b) produce the exact same (doc_id, cluster_id, cluster_size)
  * table as the independently-derived label-prop implementation.
  */
class StarContractionSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-starcontract-test")

  test("pathological 10k-doc chain collapses in <= 2*log2(n) rounds, not diameter") {
    import spark.implicits._
    val n = 10000L
    // each doc pairs ONLY with its neighbor: diameter = n-1
    val chain = spark.range(n - 1).select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    // force the DISTRIBUTED path: this test pins the round bound, which
    // the small-graph driver union-find (round 16) would bypass
    spark.conf.set("spark.graft.cluster.driverEdgeMax", "0")
    val (labels, rounds) = try DedupOps.starContract(chain)
      finally spark.conf.unset("spark.graft.cluster.driverEdgeMax")
    val bound = 2 * (math.log(n.toDouble) / math.log(2.0))
    assert(rounds <= bound.toInt,
      s"star contraction took $rounds rounds on a diameter-${n - 1} chain (bound ${bound.toInt})")
    // every node labeled with the component min (0), all n nodes present
    val rows = labels.agg(count(lit(1)), sum(when(col("label") === 0L, 1L).otherwise(0L))).head()
    assert(rows.getLong(0) == n && rows.getLong(1) == n)
  }

  test("chain clusters: same output as min-label propagation, dd_cluster shape") {
    import spark.implicits._
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val star = DedupOps.duplicateClusters(chain)
    val prop = DedupOps.duplicateClustersLabelProp(chain)
    assert(star.exceptAll(prop).isEmpty && prop.exceptAll(star).isEmpty)
    val head = star.orderBy("doc_id").head()
    assert(head.getLong(1) == 0L && head.getLong(2) == 201L)
  }

  test("random multi-component graph: star == label-prop, exact cluster table") {
    import spark.implicits._
    // deterministic pseudo-random graph: 400 nodes, edges from a fixed
    // LCG so the fixture never drifts; mixes dense blobs, pairs,
    // mid-length chains and isolated-from-pairs nodes.
    var seed = 0x5DEECE66DL
    def nextInt(bound: Int): Int = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    val edges = (0 until 600).map { _ =>
      val a = nextInt(400).toLong; val b = nextInt(400).toLong; (a, b)
    }.filter { case (a, b) => a != b }
    val pairs = edges.toDF("doc_a", "doc_b")
    val star = DedupOps.duplicateClusters(pairs)
    val prop = DedupOps.duplicateClustersLabelProp(pairs)
    assert(star.exceptAll(prop).isEmpty && prop.exceptAll(star).isEmpty)
    // sanity: cluster_id is always the component min ⇒ one row per node
    val n = star.count()
    assert(n == star.select("doc_id").distinct().count())
    assert(star.filter(col("cluster_id") > col("doc_id")).count() == 0)
  }

  test("driver union-find == distributed star contraction (round 16 gate)") {
    import spark.implicits._
    // same deterministic mixed graph shape as above, plus non-ASCII
    // string ids (UTF8String byte order differs from String order —
    // the driver path must follow Catalyst's ordering for min roots)
    var seed = 0xDEADBEEFL
    def nextInt(bound: Int): Int = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    val edges = (0 until 500).map { _ =>
      (nextInt(300).toLong, nextInt(300).toLong)
    }.filter { case (a, b) => a != b }
    val pairs = edges.toDF("doc_a", "doc_b")
    spark.conf.set("spark.graft.cluster.driverEdgeMax", "0")
    val dist = try DedupOps.duplicateClusters(pairs)
      finally spark.conf.unset("spark.graft.cluster.driverEdgeMax")
    val drv = DedupOps.duplicateClusters(pairs) // default gate: driver path
    assert(drv.exceptAll(dist).isEmpty && dist.exceptAll(drv).isEmpty)
    // string ids incl. a supplementary-plane char: U+10000 sorts ABOVE
    // "z" in UTF-8 byte order on both paths
    val sp = Seq(("z", new String(Character.toChars(0x10000))), ("z", "a"))
      .toDF("doc_a", "doc_b")
    spark.conf.set("spark.graft.cluster.driverEdgeMax", "0")
    val distS = try DedupOps.duplicateClusters(sp).collect().toSet
      finally spark.conf.unset("spark.graft.cluster.driverEdgeMax")
    val drvS = DedupOps.duplicateClusters(sp).collect().toSet
    assert(drvS == distS)
  }

  test("string doc_ids and empty input are handled") {
    import spark.implicits._
    val strPairs = Seq(("docB", "docA"), ("docC", "docB"), ("x", "y"))
      .toDF("doc_a", "doc_b")
    val got = DedupOps.duplicateClusters(strPairs).orderBy("doc_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("docA", "docA", 3L), ("docB", "docA", 3L), ("docC", "docA", 3L),
      ("x", "x", 2L), ("y", "x", 2L)))
    val empty = DedupOps.duplicateClusters(strPairs.filter(lit(false)))
    assert(empty.count() == 0)
  }
}
