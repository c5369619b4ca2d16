package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans._

/** Property: zone-map pruning is CONSERVATIVE. For any block of values
  * and any predicate from the supported algebra, if some value in the
  * block satisfies the predicate then `mayMatch` on the block's
  * (min, max) must be true. (The converse — pruning effectiveness — is
  * best-effort; safety is the invariant everything else rests on.)
  *
  * Exercised with seeded random generation (deterministic; the
  * scalatest/scalacheck bridge isn't on the classpath).
  */
class PrunerPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def value(): Double = math.floor(rnd.between(-1000.0, 1000.0) * 4) / 4

  private def leaf(): Pred = rnd.nextInt(3) match {
    case 0 => Cmp(Seq("=", "!=", "<", "<=", ">", ">=")(rnd.nextInt(6)), "x", PredValue(value()))
    case 1 =>
      val (a, b) = (value(), value())
      Between("x", PredValue(math.min(a, b)), PredValue(math.max(a, b)))
    case _ => In("x", Seq.fill(1 + rnd.nextInt(4))(PredValue(value())))
  }

  private def pred(): Pred = rnd.nextInt(3) match {
    case 0 => leaf()
    case 1 => And(leaf(), leaf())
    case _ => Or(leaf(), leaf())
  }

  /** Row-level truth of a predicate for a single value of column x. */
  private def sat(p: Pred, x: Double): Boolean = p match {
    case And(l, r)          => sat(l, x) && sat(r, x)
    case Or(l, r)           => sat(l, x) || sat(r, x)
    case Between(_, lo, hi) => x >= lo.num.get && x <= hi.num.get
    case In(_, vs)          => vs.exists(_.num.get == x)
    case Cmp("=", _, v)     => x == v.num.get
    case Cmp("!=", _, v)    => x != v.num.get
    case Cmp("<", _, v)     => x < v.num.get
    case Cmp("<=", _, v)    => x <= v.num.get
    case Cmp(">", _, v)     => x > v.num.get
    case Cmp(">=", _, v)    => x >= v.num.get
    case _                  => true
  }

  test("a numeric block containing any satisfying row is never pruned (5000 cases)") {
    for (_ <- 1 to 5000) {
      val block = Seq.fill(1 + rnd.nextInt(20))(value())
      val p = pred()
      val stats = Map("x" -> ColStats(Some(block.min), Some(block.max), None, None))
      if (block.exists(sat(p, _))) {
        assert(ZoneMapPruner.mayMatch(p, stats),
          s"pruned a block with matching rows: pred=$p min=${block.min} max=${block.max}")
      }
    }
  }

  test("string blocks: UTF-8 ordering property holds incl. non-ASCII (2000 cases)") {
    val pool = Vector("a", "zebra", "中文", "日本語", "😀emoji", "private", "Zz", "pua", "")
    val ops = Seq("=", "<", "<=", ">", ">=")
    for (_ <- 1 to 2000) {
      val block = Seq.fill(1 + rnd.nextInt(5))(pool(rnd.nextInt(pool.size)))
      val v = pool(rnd.nextInt(pool.size))
      val op = ops(rnd.nextInt(ops.size))
      // min/max in unsigned UTF-8 byte order, as parquet computes them
      val sorted = block.sortWith((a, b) => ZoneMapPruner.u8cmp(a, b) < 0)
      val stats = Map("x" -> ColStats(None, None, Some(sorted.head), Some(sorted.last)))
      def satS(x: String): Boolean = op match {
        case "="  => x == v
        case "<"  => ZoneMapPruner.u8cmp(x, v) < 0
        case "<=" => ZoneMapPruner.u8cmp(x, v) <= 0
        case ">"  => ZoneMapPruner.u8cmp(x, v) > 0
        case ">=" => ZoneMapPruner.u8cmp(x, v) >= 0
      }
      if (block.exists(satS)) {
        assert(ZoneMapPruner.mayMatch(Cmp(op, "x", PredValue(v)), stats),
          s"pruned matching string block: op=$op v=$v range=[${sorted.head},${sorted.last}]")
      }
    }
  }

  test("null-check pruning is conservative against real row sets (3000 cases)") {
    for (_ <- 1 to 3000) {
      // a block of rows where each is null with random probability
      val n = 1 + rnd.nextInt(20)
      val rows = Seq.fill(n)(if (rnd.nextInt(3) == 0) None else Some(value()))
      val nullCount = rows.count(_.isEmpty).toLong
      val present = rows.flatten
      // footer stats: min/max over present values, exact null count;
      // sometimes the footer omits the count (-1 → None)
      val ncStat = if (rnd.nextInt(5) == 0) None else Some(nullCount)
      val stats = Map("x" -> ColStats(
        present.minOption, present.maxOption, None, None, ncStat, Some(n.toLong)))
      val isNull = NullCheck("x", negated = false)
      val isNotNull = NullCheck("x", negated = true)
      if (nullCount > 0)
        assert(ZoneMapPruner.mayMatch(isNull, stats),
          s"pruned a block holding nulls: nc=$nullCount stat=$ncStat")
      if (present.nonEmpty)
        assert(ZoneMapPruner.mayMatch(isNotNull, stats),
          s"pruned a block holding non-nulls: nc=$nullCount/$n stat=$ncStat")
      // effectiveness on exact stats: all-null refutes IS NOT NULL,
      // no-null refutes IS NULL
      if (ncStat.contains(0L))
        assert(!ZoneMapPruner.mayMatch(isNull, stats))
      if (ncStat.contains(n.toLong))
        assert(!ZoneMapPruner.mayMatch(isNotNull, stats))
    }
  }
}
