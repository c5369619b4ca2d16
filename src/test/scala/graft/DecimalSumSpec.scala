package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.GraftSession

/** The INT128 unscaled decimal sum (functions/SumUnscaled128 +
  * plans/DecimalSumRule): every `SUM(decimal(p ≤ 18, s))` must be
  * value-identical to Spark's BigDecimal-buffered sum — including
  * carries across the long boundary, negatives, NULL handling and the
  * final overflow contract — while the plan shows the rewritten
  * function (the whole point: a long-typed buffer in the hash
  * aggregate instead of per-row BigDecimal churn). */
class DecimalSumSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-d128-test")

  private def ruleOff[T](body: => T): T = {
    spark.conf.set("spark.graft.decimalSum128.enabled", "false")
    try body
    finally spark.conf.set("spark.graft.decimalSum128.enabled", "true")
  }

  private def usesInt128(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(_.expressions.exists(_.exists {
      case _: graft.functions.SumUnscaled128 => true
      case _ => false
    }))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("random decimal sums match the rule-off plan: grouped, global, nulls, negatives") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val data = Seq.tabulate(5000) { i =>
      val v =
        if (rnd.nextInt(11) == 0) None
        else Some(BigDecimal(rnd.nextLong() % 1000000000000L, 4))
      (i % 37, v.map(_.underlying))
    }
    val df = data.toDF("g", "v")
      .select(col("g"), col("v").cast("decimal(18,4)").as("v"))
    df.createOrReplaceTempView("d128_t")
    for (q <- Seq(
        "SELECT g, SUM(v) AS s FROM d128_t GROUP BY g",
        "SELECT SUM(v) AS s FROM d128_t",
        "SELECT g, SUM(v) AS s, COUNT(v) AS c, MIN(v) AS mn FROM d128_t GROUP BY g")) {
      val on = spark.sql(q)
      assert(usesInt128(on), s"rewrite must fire for: $q")
      assert(rows(on) == ruleOff(rows(spark.sql(q))), s"values diverged for: $q")
      // schema identical too (the result type contract)
      assert(on.schema == ruleOff(spark.sql(q).schema))
    }
  }

  test("carries across the long boundary stay exact (the int128 reason to exist)") {
    import spark.implicits._
    // 40 values of near-max decimal(18,4) magnitude: the running
    // unscaled sum exceeds 2^63 after ~10 rows — a plain long
    // accumulator would wrap, int128 carries
    val big = BigDecimal("99999999999999.9999")
    val data = Seq.tabulate(40)(i =>
      (i % 2, (if (i % 5 == 0) -big else big).underlying))
    val df = data.toDF("g", "v")
      .select(col("g"), col("v").cast("decimal(18,4)").as("v"))
    df.createOrReplaceTempView("d128_big")
    val q = "SELECT g, SUM(v) AS s FROM d128_big GROUP BY g"
    val on = spark.sql(q)
    assert(usesInt128(on))
    assert(rows(on) == ruleOff(rows(spark.sql(q))))
    // and the global twin (one group, 40 carries)
    val qg = "SELECT SUM(v) AS s FROM d128_big"
    assert(rows(spark.sql(qg)) == ruleOff(rows(spark.sql(qg))))
  }

  test("NULL semantics: all-NULL group is NULL; empty input is NULL") {
    import spark.implicits._
    val df = Seq(
      (1, Some(BigDecimal("2.50").underlying)),
      (1, None),
      (2, None)).toDF("g", "v")
      .select(col("g"), col("v").cast("decimal(12,2)").as("v"))
    df.createOrReplaceTempView("d128_n")
    val q = "SELECT g, SUM(v) AS s FROM d128_n GROUP BY g ORDER BY g"
    val on = spark.sql(q)
    assert(usesInt128(on))
    val got = on.collect()
    assert(got(0).getDecimal(1).toPlainString == "2.50")
    assert(got(1).isNullAt(1), "an all-NULL group must sum to NULL")
    val empty = spark.sql("SELECT SUM(v) AS s FROM d128_n WHERE g = 99")
    assert(empty.collect().head.isNullAt(0), "SUM of no rows is NULL")
  }

  test("refusals: DISTINCT, TRY, precision > 18, FILTER clause") {
    import spark.implicits._
    Seq((1, BigDecimal("1.5").underlying)).toDF("g", "v")
      .select(col("g"), col("v").cast("decimal(20,2)").as("w"),
        col("v").cast("decimal(10,2)").as("v"))
      .createOrReplaceTempView("d128_r")
    assert(!usesInt128(spark.sql("SELECT SUM(DISTINCT v) FROM d128_r")))
    assert(!usesInt128(spark.sql("SELECT TRY_SUM(v) FROM d128_r")))
    assert(!usesInt128(spark.sql("SELECT SUM(w) FROM d128_r")),
      "precision 20 has no faithful unscaled long")
    assert(!usesInt128(
      spark.sql("SELECT SUM(v) FILTER (WHERE g = 1) FROM d128_r")))
    // and a refused query still answers
    assert(spark.sql("SELECT SUM(w) AS s FROM d128_r")
      .collect().head.getDecimal(0).toPlainString == "1.50")
  }

  test("final overflow contract: LEGACY null / ANSI throw (unit, constructed int128)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.DecimalType
    // hi = 10^18 ⇒ total ≈ 1.8e37 > dec(28,4)'s 10^24 bound
    val hi = Literal(1000000000000000000L)
    val lo = Literal(0L)
    val legacy = graft.functions.Int128ToDecimal(
      hi, lo, DecimalType(28, 4), ansi = false)
    assert(legacy.eval(null) == null, "LEGACY overflow must be NULL")
    val ansi = graft.functions.Int128ToDecimal(
      hi, lo, DecimalType(28, 4), ansi = true)
    intercept[ArithmeticException] { ansi.eval(null) }
    // and a value inside the bound converts exactly (incl. negative lo)
    val ok = graft.functions.Int128ToDecimal(
      Literal(1L), Literal(-1L), DecimalType(28, 4), ansi = true)
    // 1 * 2^64 + (2^64 - 1) = 2^65 - 1 = 36893488147419103231, scale 4
    assert(ok.eval(null).toString == "3689348814741910.3231")
  }

  test("AVG(decimal): rewrite fires and matches the rule-off plan — grouped, global, nulls, negatives") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val data = Seq.tabulate(5000) { i =>
      val v =
        if (rnd.nextInt(7) == 0) None
        else Some(BigDecimal(rnd.nextLong() % 1000000000000L, 4))
      (i % 41, v.map(_.underlying))
    }
    data.toDF("g", "v")
      .select(col("g"), col("v").cast("decimal(18,4)").as("v"))
      .createOrReplaceTempView("d128_avg")
    for (q <- Seq(
        "SELECT g, AVG(v) AS a FROM d128_avg GROUP BY g",
        "SELECT AVG(v) AS a FROM d128_avg",
        // AVG alongside SUM/COUNT of the same column — both rewrites
        // coexist in one Aggregate and share the projected unscaled view
        "SELECT g, AVG(v) AS a, SUM(v) AS s, COUNT(v) AS c FROM d128_avg GROUP BY g")) {
      val on = spark.sql(q)
      assert(usesInt128(on), s"AVG rewrite must fire for: $q")
      assert(rows(on) == ruleOff(rows(spark.sql(q))), s"values diverged for: $q")
      assert(on.schema == ruleOff(spark.sql(q).schema))
    }
  }

  test("AVG(decimal): empty group is NULL in LEGACY and ANSI (the CheckOverflowInSum(null) trap)") {
    import spark.implicits._
    Seq((1, BigDecimal("2.50").underlying)).toDF("g", "v")
      .select(col("g"), col("v").cast("decimal(12,2)").as("v"))
      .createOrReplaceTempView("d128_avg_e")
    val q = "SELECT AVG(v) AS a FROM d128_avg_e WHERE g = 99"
    for (ansi <- Seq(false, true)) {
      spark.conf.set("spark.sql.ansi.enabled", ansi)
      try {
        val df = spark.sql(q)
        assert(usesInt128(df), s"rewrite must fire under ansi=$ansi")
        // an empty-group AVG must be NULL, never an overflow error:
        // the count guard substitutes the buffer's initial 0 where a
        // bare NULL sum would make ANSI's CheckOverflowInSum throw
        assert(df.collect().head.isNullAt(0), s"ansi=$ansi")
      } finally spark.conf.unset("spark.sql.ansi.enabled")
    }
  }

  test("AVG(decimal) refusals: TRY_AVG, DISTINCT, precision > 18 — and refused queries still answer") {
    import spark.implicits._
    Seq((1, BigDecimal("1.5").underlying), (1, BigDecimal("2.5").underlying))
      .toDF("g", "v")
      .select(col("g"), col("v").cast("decimal(20,2)").as("w"),
        col("v").cast("decimal(10,2)").as("v"))
      .createOrReplaceTempView("d128_avg_r")
    assert(!usesInt128(spark.sql("SELECT TRY_AVG(v) FROM d128_avg_r")))
    assert(!usesInt128(spark.sql("SELECT AVG(DISTINCT v) FROM d128_avg_r")))
    assert(!usesInt128(spark.sql("SELECT AVG(w) FROM d128_avg_r")),
      "precision 20 has no faithful unscaled long")
    assert(spark.sql("SELECT AVG(w) AS a FROM d128_avg_r")
      .collect().head.getDecimal(0).toPlainString == "2.000000")
  }

  test("Partial/Final split: the int128 buffer crosses the exchange — sum and avg over many partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val data = Seq.tabulate(20000)(i =>
      (i % 13, BigDecimal(rnd.nextLong() % 100000000000L, 4).underlying))
    // 16 input partitions force real partial aggregates on every core
    // and a merge on the final side — the (hi, lo, seen) long buffers
    // must combine exactly across the shuffle
    val df = data.toDF("g", "v")
      .select(col("g"), col("v").cast("decimal(18,4)").as("v"))
      .repartition(16)
    df.createOrReplaceTempView("d128_pf")
    val q = "SELECT g, SUM(v) AS s, AVG(v) AS a FROM d128_pf GROUP BY g"
    val on = spark.sql(q)
    assert(usesInt128(on))
    val phys = on.queryExecution.executedPlan.toString
    // both aggregation stages run the int128 function (partial_ prefix
    // marks the pre-shuffle stage in explain output)
    assert(phys.contains("partial_sum_unscaled128"),
      s"partial stage must carry the int128 buffer:\n$phys")
    assert(phys.split("sum_unscaled128", -1).length > 2,
      "final stage must merge the int128 buffer")
    assert(rows(on) == ruleOff(rows(spark.sql(q))))
  }

  test("the q1-shape decimal aggregate over real data matches DuckDB-checked truth") {
    val dir = "/root/testdata/sf0.01"
    val li = graft.engine.Tables.load(spark, dir, "lineitem")
    li.createOrReplaceTempView("d128_li")
    val q = """SELECT l_returnflag,
      |  SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS rev
      |FROM d128_li GROUP BY l_returnflag""".stripMargin
    val on = spark.sql(q)
    assert(usesInt128(on))
    assert(rows(on) == ruleOff(rows(spark.sql(q))))
  }
}
