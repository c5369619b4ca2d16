package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, Tables}

/** Plan audits: the properties that matter at 100 TB, asserted on the
  * actual executed plans (SURVEY.md §5). A query that passes the value
  * check but reads all columns, skips pushdown, or shuffles a
  * broadcastable dim would regress silently without these.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = GraftSession.local(cores = 8, appName = "graft-audit")
    // These audits pin the AT-SCALE plan shapes. The round-16 adaptive
    // repartition width (operators/Par) collapses toy-scale inputs to 1
    // partition, which trivially satisfies any clustering and removes
    // the very exchanges the audits count — force the pre-adaptive
    // width so the pinned shapes stay the at-scale ones.
    s.conf.set("spark.graft.par.fixedWidth", "8")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("filters are pushed to the parquet scan") {
    val p = plan("q2_filter_between")
    assert(p.contains("PushedFilters") &&
      (p.contains("GreaterThanOrEqual(l_quantity") || p.contains("ThanOrEqual(l_quantity,18")),
      s"quantity range must reach the scan:\n${p.take(2000)}")
  }

  test("projection prunes the read schema") {
    val p = plan("q5_projection")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("p_partkey") && !readSchema.contains("p_brand"),
      s"scan must read only projected columns: $readSchema")
  }

  test("dimension joins broadcast (no fact-table shuffle)") {
    assert(plan("q11_join_inner").contains("BroadcastHashJoin"))
    val q12 = plan("q12_join_multi")
    assert(q12.contains("BroadcastHashJoin"), "dims must broadcast in the join chain")
  }

  test("semi/anti joins plan as such (only keys shuffle)") {
    assert(plan("q14_join_semi").contains("LeftSemi"))
    assert(plan("q15_join_anti").contains("LeftAnti"))
  }

  test("aggregations are partial (map-side combine before shuffle)") {
    val p = plan("q1_agg")
    assert(p.contains("partial_"), s"expected partial aggregation:\n${p.take(1500)}")
  }

  test("top-k plans as TakeOrdered, not a full sort") {
    val p = plan("q9_orderby_limit")
    assert(p.contains("TakeOrderedAndProject"), s"limit+orderBy must not global-sort:\n${p.take(1000)}")
  }

  test("relational queries stay inside whole-stage codegen") {
    // AQE prints codegen spans only in the final (post-execution) plan
    val df = SparkEntry.queries("q1_agg")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in plan strings
    assert(p.contains("*(") || p.contains("WholeStageCodegen"),
      s"no codegen span:\n${p.take(1500)}")
  }

  test("hive-partitioned layout prunes partitions at the listing level") {
    import graft.sources.MicroBlockWriter
    val out = "target/scratch/test/partitioned-orders"
    val o = Tables.load(spark, dir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
    MicroBlockWriter.writePartitioned(o, out, "order_year", "o_custkey", 2)
    val df = spark.read.parquet(out).filter(col("order_year") === 1997)
    val expected = o.filter(col("order_year") === 1997).count()
    // collect() executes df's own plan (count() builds a separate one,
    // leaving df.queryExecution's scan metrics untouched)
    assert(df.collect().length == expected && expected > 0)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("order_year"), s"partition filter must reach the scan:\n${scan.take(1200)}")
    // only the matching partition's files are read (post-execution
    // scan metrics — location.inputFiles is the pre-pruning listing)
    val (numFiles, numParts) = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        (f.metrics("numFiles").value, f.metrics.get("numPartitions").map(_.value))
    }.getOrElse((-1L, None))
    val totalParts = 7 // order_year 1995..2001
    assert(numParts.forall(_ < totalParts) && numFiles > 0 && numFiles <= 2,
      s"scan must touch only the 1997 partition: files=$numFiles partitions=$numParts")
  }

  test("count(*) uses metadata-only parquet aggregate pushdown") {
    // q6 is COUNT(*) over the bare scan — parquet footer row counts
    val df = graft.engine.Tables.load(spark, dir, "lineitem").agg(count(lit(1)))
    assert(df.collect().head.getLong(0) == 6000L)
  }

  test("ann query sides broadcast — the corpus is never shuffled for the join") {
    // brute-force: corpus crossJoin BROADCAST(queries); LSH re-attach
    // joins also broadcast the tiny query side
    val bf = plan("ann_bruteforce")
    assert(bf.contains("BroadcastNestedLoopJoin") || bf.contains("BroadcastExchange"),
      s"query batch must broadcast:\n${bf.take(1500)}")
    assert(plan("ann_lsh").contains("BroadcastExchange"))
  }

  test("ann_pq broadcasts the query batch and encodes via the native L2 expression") {
    val p = plan("ann_pq")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"PQ scoring must broadcast the query batch, never shuffle the corpus:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), "ADC scoring must not be a shuffled cartesian")
    val opt = SparkEntry.queries("ann_pq")(spark, dir)
      .queryExecution.optimizedPlan.toString.toLowerCase
    assert(opt.contains("nearestcentroidl2") || opt.contains("nearest_centroid_l2"),
      "codebook assignment must be the native scan-local expression")
  }

  test("ann_lsh computes hyperplane keys once via the native expression") {
    // the composed form evaluated tables*bits aggregate trees; the
    // native expression must appear (and the old sequence+aggregate
    // per-bit shape must not)
    val p = SparkEntry.queries("ann_lsh")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("graft_hyperplane_keys") || p.contains("hyperplanekeys") ||
      p.toLowerCase.contains("hyperplane"),
      s"native HyperplaneKeys expression missing from plan:\n${p.take(1500)}")
  }

  test("pipe_e2e reads documents through ONE scan (stages fuse over the cached pass)") {
    val df = SparkEntry.queries("pipe_e2e")(spark, dir)
    df.collect() // materialize the persisted stage so reuse is visible
    val fileScans = df.queryExecution.executedPlan.collectLeaves().count {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.exists(_.contains("documents"))
      case _ => false
    }
    assert(fileScans <= 1,
      s"quality/langid/dedup/fingerprint must share one documents scan, saw $fileScans")
  }

  test("dd_ngram_jaccard joins on keys and never goes O(n^2)") {
    val p = plan("dd_ngram_jaccard")
    assert(p.contains("hashpartitioning"), "expected shuffle stages")
    assert(!p.contains("CartesianProduct"), "similarity join must never go O(n^2)")
  }

  test("index-pruning decisions pre-aggregate map-side (partial collect_list)") {
    import org.apache.spark.sql.functions._
    val index = spark.range(0, 200).select(
      col("id").cast("int").as("blockId"), concat(lit("f"), col("id")).as("file"),
      lit(10L).as("rows"), (col("id") * 10).as("rowStart"), (col("id") * 10 + 9).as("rowEnd"),
      explode(array(lit("x"), lit("y"))).as("column"),
      (col("id") * 1.0).as("minNum"), (col("id") * 1.0 + 9).as("maxNum"),
      lit(null).cast("string").as("minStr"), lit(null).cast("string").as("maxStr"),
      lit(0L).as("nullCount"))
    val p = graft.plans.IndexPruning
      .decide(index, graft.plans.Between("x",
        graft.plans.PredValue(10.0), graft.plans.PredValue(50.0)))
      .queryExecution.executedPlan.toString
    // the stats-map aggregation must combine map-side: at a million
    // files the shuffle carries one partially-collected row per
    // (block, partition), not every index entry
    assert(p.contains("partial_collect_list") || p.contains("partial_map_from"),
      s"expected a partial (map-side) collect stage:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("dd_decontaminate broadcasts the eval side — the train corpus never shuffles pre-agg") {
    val df = SparkEntry.queries("dd_decontaminate")(spark, dir)
    df.collect() // AQE: audit the final plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"eval shingles must broadcast:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("dd_bloom probes scan-locally: the bitmap is a literal, no join below the filter") {
    val df = SparkEntry.queries("dd_bloom")(spark, dir)
    df.collect() // AQE: audit the final plan
    val p = df.queryExecution.executedPlan.toString
    // the membership test is a codegen'd Filter expression over the
    // positions array — present in-plan, NOT implemented as a join
    assert(p.toLowerCase.contains("bloompositions"),
      s"bloom probe must be an in-scan expression:\n${p.take(2000)}")
    // the only join is the exact-verification broadcast; the 100 TB
    // train side never sort-merge-joins or cartesians
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"train side must not shuffle into a join:\n${p.take(2000)}")
  }

  test("q42_range_join decomposes to an equi hash join — never a nested-loop") {
    val df = SparkEntry.queries("q42_range_join")(spark, dir)
    df.collect() // AQE: audit the final plan
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the interval predicate must ride an equi bin join:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("SortMergeJoin"), s"expected a hash/merge join on the bin:\n${p.take(2000)}")
  }

  test("q43_merge_cdc broadcasts the CDC batch — the base table never shuffles") {
    val df = SparkEntry.queries("q43_merge_cdc")(spark, dir)
    df.collect() // AQE: audit the final plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"changes batch must broadcast:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"the base scan must not shuffle into the merge join:\n${p.take(2000)}")
  }

  test("pipe_mix computes global order without a single-partition stage") {
    val df = SparkEntry.queries("pipe_mix")(spark, dir)
    df.collect() // AQE: audit the final plan
    val p = df.queryExecution.executedPlan.toString
    // closed-form position: no global row_number → no Exchange
    // SinglePartition anywhere (the output orderBy is a range
    // partition, which scales; one reducer does not)
    assert(!p.contains("SinglePartition"),
      s"global position must not serialize through one task:\n${p.take(2000)}")
  }

  test("pipe_pack shuffles ONCE (the shard exchange) and never sorts globally") {
    val df = graft.operators.PackingOps.packSequences(
      Tables.load(spark, dir, "documents"), budget = 512, shards = 8)
    df.collect()
    // AQE toString prints Final AND Initial plans — audit only the final
    val full = df.queryExecution.executedPlan.toString
    val p = full.split("== Initial Plan ==").head
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Reused") && !l.contains("Broadcast"))
    assert(exchanges == 1, s"packing must pay exactly one shuffle, saw $exchanges:\n${p.take(2000)}")
    // in-partition order only: no global Sort node (Sort with global=true
    // prints as a Sort over an Exchange rangepartitioning)
    assert(!p.contains("rangepartitioning"),
      s"no global sort in the packing plan:\n${p.take(2000)}")
  }

  test("q36 correlated EXISTS decorrelates to semi + anti joins") {
    val p = plan("q36_exists")
    assert(p.contains("LeftSemi"), s"EXISTS must plan as semi join:\n${p.take(1500)}")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as anti join:\n${p.take(1500)}")
  }

  test("st_join (interval join) stays key-equi + range filter — no cartesian") {
    val p = plan("st_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"interval join must remain an equi-join on user_id:\n${p.take(2000)}")
  }

  test("st_static_join broadcasts the dim — the event stream never shuffles for the join") {
    val p = plan("st_static_join")
    assert(p.contains("BroadcastHashJoin"),
      s"static dim must broadcast:\n${p.take(2000)}")
    // the only exchange is the (segment, type) aggregation shuffle —
    // the join itself must add none on the fact side
    val joinIdx = p.indexOf("BroadcastHashJoin")
    val scanSide = p.substring(joinIdx)
    assert(!scanSide.contains("Exchange hashpartitioning"),
      s"no exchange may sit between the events scan and the join:\n${p.take(2500)}")
  }

  test("dd_span joins on gram keys and never goes O(n^2)") {
    val p = plan("dd_span")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"span pair generation must stay a key-equi join:\n${p.take(2000)}")
  }

  test("st_sliding fans out map-side with partial aggregation before the shuffle") {
    val p = plan("st_sliding")
    assert(p.contains("partial_"),
      s"sliding-window agg must combine map-side:\n${p.take(1500)}")
  }

  private def occurrences(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("q45 full-outer join inputs are BOTH pre-aggregated (join sees key-sized sides)") {
    val p = plan("q45_join_full")
    val lines = p.linesIterator.toSeq
    val joinLine = lines.indexWhere(_.contains("FullOuter"))
    assert(joinLine >= 0, s"expected a full-outer join:\n${p.take(2000)}")
    // children print BELOW the join node: partial+final aggregate per
    // side = >=4 HashAggregates under it. An un-collapsed plan (join
    // raw facts, aggregate after) would put aggregates ABOVE instead.
    val below = lines.drop(joinLine + 1)
    assert(below.count(_.contains("HashAggregate")) >= 4,
      s"both join inputs must be aggregates:\n${p.take(2500)}")
    assert(!lines.take(joinLine).exists(_.contains("HashAggregate")),
      s"no aggregation may run on the join OUTPUT (fact-sized):\n${p.take(2500)}")
  }

  test("q46 CUBE plans as ONE Expand + one aggregation over one scan") {
    val p = plan("q46_cube")
    assert(occurrences(p, "Expand") == 1,
      s"CUBE must expand once, not re-scan per grouping set:\n${p.take(2000)}")
    assert(p.linesIterator.count(l => l.contains("FileScan") || l.contains("BatchScan")) == 1,
      s"CUBE must read lineitem exactly once:\n${p.take(2000)}")
    assert(p.contains("partial_"),
      s"cube aggregation must combine map-side:\n${p.take(1500)}")
  }

  test("q47 QUALIFY is one partitioned window: single key shuffle, no join, local sort") {
    val p = plan("q47_qualify")
    assert(occurrences(p, "Window") >= 1 && !p.contains("Join"),
      s"latest-per-key must be a window, never groupBy-max + self-join:\n${p.take(2000)}")
    assert(occurrences(p, "Exchange hashpartitioning") == 1 &&
      p.contains("o_custkey"),
      s"exactly one exchange (the custkey window shuffle):\n${p.take(2000)}")
    // the window's sort is per-partition (global=false); the only
    // global sort allowed is the final presentation orderBy
    assert(occurrences(p, "Exchange rangepartitioning") <= 1,
      s"no global sort besides the output orderBy:\n${p.take(2000)}")
  }

  test("q48 gapfill scans the fact table ONCE (spine + fill both read the cached aggregate)") {
    val df = SparkEntry.queries("q48_gapfill")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // both the bounds branch and the join's fill side must read the
    // persisted daily aggregate — never re-scan raw orders (FileScan
    // appears only INSIDE the InMemoryRelation definition)
    assert(occurrences(p, "InMemoryTableScan") >= 2,
      s"spine and fill sides must reuse the cached daily agg:\n${p.take(2500)}")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftOuter"),
      s"the fill join is aggregate-vs-aggregate and broadcastable:\n${p.take(2000)}")
    spark.catalog.clearCache()
  }

  test("q49 histogram buckets scan-locally with partial aggregation") {
    val p = plan("q49_histogram")
    assert(p.contains("partial_"),
      s"bucket counts must combine map-side:\n${p.take(1500)}")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_extendedprice") && !readSchema.contains("l_orderkey"),
      s"scan must read only the bucketed column: $readSchema")
  }

  test("q50 unpivot is ONE Expand over the aggregated wide table, no extra exchange") {
    val p = plan("q50_unpivot")
    val lines = p.linesIterator.toSeq
    assert(occurrences(p, "Expand") == 1,
      s"unpivot must expand once (map-side row generation):\n${p.take(2000)}")
    // Expand runs on the |returnflag|-sized aggregate, not the raw
    // fact table: it prints ABOVE the aggregates, and the only hash
    // exchange is the groupBy's own
    val expandIdx = lines.indexWhere(_.contains("Expand"))
    val firstAggIdx = lines.indexWhere(_.contains("HashAggregate"))
    assert(expandIdx >= 0 && firstAggIdx > expandIdx,
      s"Expand must sit over the wide aggregate:\n${p.take(2000)}")
    assert(occurrences(p, "Exchange hashpartitioning") == 1,
      s"only the groupBy shuffle is allowed:\n${p.take(2000)}")
    assert(occurrences(p, "Exchange rangepartitioning") <= 1,
      s"only the presentation orderBy may range-partition:\n${p.take(2000)}")
  }

  test("ta_entropy is one codegen'd scan pass: no explode, no shuffle below the sort") {
    val p = plan("ta_entropy")
    assert(!p.contains("Generate"),
      s"the char histogram must come from the native expression, never explode:\n${p.take(2000)}")
    assert(p.contains("charentropystats"),
      s"expected the CharEntropyStats expression in the plan:\n${p.take(2000)}")
    assert(p.linesIterator.count(l => l.contains("FileScan") || l.contains("BatchScan")) == 1,
      s"documents must scan exactly once:\n${p.take(2000)}")
    assert(occurrences(p, "Exchange hashpartitioning") == 0,
      s"scan-local expression — no hash shuffle anywhere:\n${p.take(2000)}")
  }

  test("ta_cms_topk broadcasts the d×w sketch, never the exploded term stream") {
    val p = plan("ta_cms_topk")
    val lines = p.linesIterator.toSeq
    assert(p.contains("BroadcastHashJoin [hrow"),
      s"estimate join must be a broadcast join on the sketch cells:\n${p.take(2500)}")
    // the broadcast build side IS the sketch aggregation (keys hrow,
    // bucket — d×w counter cells, corpus-size-independent)
    val bIdx = lines.zipWithIndex.filter(_._1.contains("BroadcastExchange")).map(_._2)
    assert(bIdx.exists(i => i + 1 < lines.length &&
        lines(i + 1).contains("HashAggregate(keys=[hrow")),
      s"the sketch aggregate must be the broadcast side:\n${p.take(3000)}")
    // the term×d exploded stream must never sit under a broadcast
    // (it is corpus-vocabulary-sized; only cell-bounded or cached
    // term-count relations may broadcast)
    assert(!bIdx.exists(i => lines.slice(i + 1, i + 4).exists(_.contains("Generate explode"))),
      s"never broadcast the exploded (term × hash-row) stream:\n${p.take(3000)}")
    // token stream aggregates map-side and scans once (cached terms)
    assert(p.contains("partial_sum") && p.contains("InMemoryTableScan"),
      s"sketch build must combine map-side over the cached term counts:\n${p.take(2000)}")
  }

  test("ann_refine: exact cosine only ABOVE the broadcast shortlist join") {
    val p = plan("ann_refine")
    val lines = p.linesIterator.toSeq
    // exact cosine is computed exactly once, in the re-rank projection
    val cosIdx = lines.zipWithIndex.filter(_._1.contains("AS cosine#")).map(_._2)
    assert(cosIdx.length == 1,
      s"exact cosine must appear once (re-rank only), got ${cosIdx.length}:\n${p.take(2500)}")
    // the PQ shortlist cut (rank <= shortlist) sits BELOW the cosine
    // projection — compressed-domain math does the cut, exact math
    // touches only S·Q pairs
    val shortIdx = lines.indexWhere(_.contains("<= 30"))
    assert(shortIdx > cosIdx.head,
      s"shortlist filter must feed the re-rank, not follow it:\n${p.take(2500)}")
    // the shortlist side is the EXPLICIT broadcast build of the join
    // against corpus vectors, so the corpus never shuffles for it
    val joinIdx = lines.indexWhere(l => l.contains("BroadcastHashJoin [neighbor_id"))
    assert(joinIdx > cosIdx.head && joinIdx < shortIdx && lines(joinIdx).contains("BuildLeft"),
      s"corpus vectors must join a BROADCAST shortlist (BuildLeft):\n${p.take(2500)}")
  }

  test("dd_incremental: store scan prunes to signatures (never reads shingle sets), batch broadcasts") {
    val p = plan("dd_incremental")
    val lines = p.linesIterator.toSeq
    // the signature store's scan: only (doc_id, sig, bands) reach the
    // reader — the sh shingle-set column (the store's biggest) is
    // pruned because verification is by signature estimate
    val storeScan = lines.find(l =>
      (l.contains("FileScan") || l.contains("BatchScan")) && l.contains("sigstore"))
    assert(storeScan.isDefined, s"expected a persisted-store scan:\n${p.take(2500)}")
    val readSchema = storeScan.get.drop(storeScan.get.indexOf("ReadSchema"))
    assert(readSchema.contains("sig") && readSchema.contains("bands")
        && !readSchema.contains("sh:"),
      s"store scan must prune the shingle-set column: $readSchema")
    // the cross-candidate join broadcasts the BATCH side (BuildRight
    // with the store streaming on the left)
    val joinLine = lines.find(l => l.contains("BroadcastHashJoin [bkey"))
    assert(joinLine.isDefined && joinLine.get.contains("BuildRight"),
      s"store must stream into a broadcast probe of the batch bands:\n${p.take(2500)}")
  }

  test("pipe_split: split hash is scan-local — no rand, no cartesian, labels joined not broadcast-built from corpus") {
    val p = plan("pipe_split")
    assert(!p.toLowerCase.contains("rand("),
      "split must be deterministic (no rand(): task retries re-deal nothing)")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no cross-product anywhere in the split plan:\n${p.take(2500)}")
    assert(p.contains("fnv64"),
      s"the split key must be the native FNV expression (codegen, scan-local):\n${p.take(2500)}")
    // the doc->group assignment is a LEFT join of docs against the
    // (paired-docs-bounded) label table
    assert(p.contains("LeftOuter"),
      s"unpaired docs must survive via a left join:\n${p.take(2500)}")
  }

  test("ann_sq: queries broadcast; corpus shuffles only for the top-k cut") {
    val p = plan("ann_sq")
    // the Q-row query side rides a broadcast into the scoring join —
    // the corpus never shuffles to meet it
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query batch must broadcast against the corpus scan:\n${p.take(2500)}")
    assert(occurrences(p, "BroadcastExchange") == 1,
      s"exactly one broadcast (the query batch):\n${p.take(2500)}")
    // the only hash shuffle is the per-query top-k window; encoding
    // and dequantized scoring are scan-local projections
    assert(occurrences(p, "Exchange hashpartitioning") == 1 &&
      p.contains("query_id"),
      s"one exchange only — the query_id window cut:\n${p.take(2500)}")
    assert(!p.contains("Generate"),
      s"grid encode/score are array projections, never explode:\n${p.take(2000)}")
  }

  test("ann_ivfpq: probe list broadcasts into the coded corpus; corpus never shuffles pre-cut") {
    val p = plan("ann_ivfpq")
    val lines = p.linesIterator.toSeq
    // the scoring join is the coded corpus streaming against a
    // BROADCAST of the (nprobe × Q) probe/query rows — BuildRight,
    // never the corpus side
    val scoring = lines.find(l => l.contains("BroadcastHashJoin [cluster"))
    assert(scoring.isDefined && scoring.get.contains("BuildRight"),
      s"coded corpus must stream into a broadcast probe join:\n${p.take(3000)}")
    // exactly two hash shuffles, both query_id-keyed and both CUT:
    // the probe-list window (Q × ivfK rows — metadata-scale) and the
    // final top-k window, whose Partial WindowGroupLimit trims to ≤ k
    // rows per (task, query) BEFORE the wire
    assert(occurrences(p, "Exchange hashpartitioning") == 2,
      s"only the two query_id window cuts may shuffle:\n${p.take(3000)}")
    assert(lines.exists(l => l.contains("WindowGroupLimit") && l.contains("Partial")),
      s"the ADC top-k must cut map-side before its shuffle:\n${p.take(3000)}")
  }

  test("ta_gopher is one scan-local pass: no explode, no shuffle, pruned read") {
    val p = plan("ta_gopher")
    assert(!p.contains("Generate"),
      s"all Gopher stats are array folds, never explode:\n${p.take(2000)}")
    assert(p.linesIterator.count(l => l.contains("FileScan") || l.contains("BatchScan")) == 1,
      s"documents must scan exactly once:\n${p.take(2000)}")
    assert(occurrences(p, "Exchange hashpartitioning") == 0,
      s"scan-local stats — no hash shuffle anywhere:\n${p.take(2000)}")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("text") && !readSchema.contains("lang")
        && !readSchema.contains("source"),
      s"scan must read only doc_id+text: $readSchema")
  }

  test("q51 recursive CTE runs as a native UnionLoop with a pruned frontier") {
    val p = plan("q51_recursive")
    assert(p.contains("UnionLoop"),
      s"WITH RECURSIVE must execute as UnionLoop, not an unrolled union:\n${p.take(2500)}")
    // the termination predicate sits INSIDE the loop step — each
    // iteration's frontier shrinks before the next self-join round
    val loopIdx = p.linesIterator.indexWhere(_.contains("UnionLoopRef"))
    assert(loopIdx >= 0 && p.linesIterator.toSeq.take(loopIdx).exists(_.contains("> 1")),
      s"frontier filter must apply within the recursion step:\n${p.take(2500)}")
    assert(p.contains("partial_max"),
      s"the closure aggregate must combine map-side:\n${p.take(2000)}")
  }

  test("q52 LATERAL decorrelates: map-side group-limit, no per-row subquery, no cartesian") {
    val p = plan("q52_lateral")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the lateral must decorrelate to a set-based plan:\n${p.take(2500)}")
    // the top-2 cut applies BEFORE the shuffle (Partial WindowGroupLimit)
    // — at 100 TB only <=2 rows per (task, orderkey) cross the wire
    assert(p.contains("WindowGroupLimit") &&
      p.linesIterator.exists(l => l.contains("WindowGroupLimit") && l.contains("Partial")),
      s"LIMIT-per-group must cut map-side:\n${p.take(2500)}")
    assert(p.contains("BroadcastHashJoin"),
      s"the orders key side must broadcast:\n${p.take(2000)}")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema"))
      .find(_.contains("lineitem")).getOrElse("")
    assert(readSchema.contains("l_extendedprice") && !readSchema.contains("l_quantity"),
      s"lineitem scan must read only the three referenced columns: $readSchema")
  }

  test("st_cdc latest-state is ONE partial max_by aggregation — no per-key window sort") {
    val p = plan("st_cdc")
    assert(!p.contains("Window"),
      s"latest-per-key must be max_by, never row_number (full sort at scale):\n${p.take(2000)}")
    assert(p.contains("partial_max_by"),
      s"the candidate row must combine map-side before the key shuffle:\n${p.take(2000)}")
    assert(occurrences(p, "Exchange hashpartitioning") == 1,
      s"one shuffle only — the user_id aggregation:\n${p.take(2000)}")
  }

  test("window over the bucketed layout runs with NO exchange under WindowExec") {
    // the q20 100 TB answer, FIRST-CLASS (round 13): Bucketing
    // .ensureBucketed lays orders out by the window key once; the
    // bucketed scan's hash distribution satisfies PARTITION BY, so
    // the row-number window plans with zero shuffles below it — only
    // the per-bucket sort remains (sf100 measured 13.8 s -> 3.5 s,
    // 0.81x DuckDB marginal, BENCH_SCALE sf100_r10).
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.load(spark, dir, "orders")
    val build = graft.sources.Bucketing.ensureBucketed(
      spark, orders, "audit_ord_bkt", "o_custkey", 8,
      columns = Seq("o_orderkey", "o_totalprice"))
    assert(build >= 0.0)
    // second ensure must REUSE, not re-pay the clustering write
    assert(graft.sources.Bucketing.ensureBucketed(
      spark, orders, "audit_ord_bkt", "o_custkey", 8) == 0.0,
      "ensureBucketed must reuse the validated existing layout")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = spark.table("audit_ord_bkt")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
    df.collect() // finalize AQE so the audited plan is the executed one
    // flatten THROUGH the adaptive/stage wrappers (TreeNode.collect
    // does not descend into AdaptiveSparkPlanExec / QueryStageExec)
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    val windows = nodes.collect {
      case we: org.apache.spark.sql.execution.window.WindowExec => we
    }
    assert(windows.nonEmpty,
      s"plan must contain a WindowExec:\n${nodes.map(_.nodeName).mkString(", ")}")
    windows.foreach { we =>
      val exchanges = flatten(we).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed layout must satisfy the window distribution - no " +
        s"exchange under WindowExec:\n${we.toString.take(1500)}")
    }
    // and the values are the scan answer
    val truth = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
    assert(df.collect().map(_.toString).sorted.toSeq ==
      truth.collect().map(_.toString).sorted.toSeq)
  }
}
