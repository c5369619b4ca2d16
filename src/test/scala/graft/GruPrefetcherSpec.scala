package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{GraftSession, GruMath, GruPrefetcher, MarkovPrefetcher, PrefetchEval}

/** The pure-JVM GRU prefetcher: BPTT gradient correctness (finite
  * differences), learning on cyclic workloads beyond fixed-order
  * context, determinism, and accuracy parity with the Markov table on
  * the same split.
  */
class GruPrefetcherSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 4, appName = "graft-gru-test")

  test("BPTT gradient matches finite differences on a tiny net") {
    val B = 4; val H = 3
    val win = Array(0, 2, 1, 3, 0, 2)
    // deterministic non-trivial weights
    val nW = GruMath.nW(B, H)
    val w = Array.tabulate(nW)(i => math.sin(i * 0.7 + 0.3) * 0.4)
    val gr = new Array[Double](nW)
    GruMath.windowGrad(w, B, H, win, gr)

    def loss(wv: Array[Double]): Double = {
      // forward CE summed over the window's transitions
      val T = win.length - 1
      var total = 0.0
      for (t <- 1 to T) {
        val xs = java.util.Arrays.copyOfRange(win, 0, t)
        val h = GruMath.forward(wv, B, H, xs, null)
        val lg = GruMath.logits(wv, B, H, h)
        val mx = lg.max
        val sum = lg.map(v => math.exp(v - mx)).sum
        total += -(lg(win(t)) - mx - math.log(sum))
      }
      total
    }
    val eps = 1e-5
    // probe a spread of indices across every weight family
    val probes = Seq(0, 1, B * H, 3 * B * H + 1, 3 * B * H + H * H,
      GruMath.oB(B, H, 0) + 1, GruMath.oB(B, H, 2),
      GruMath.oV(B, H) + 2, GruMath.oC(B, H) + 1, nW - 1)
    for (i <- probes) {
      val wp = w.clone(); wp(i) += eps
      val wm = w.clone(); wm(i) -= eps
      val num = (loss(wp) - loss(wm)) / (2 * eps)
      assert(math.abs(num - gr(i)) < 1e-4,
        s"grad mismatch at $i: analytic ${gr(i)} vs numeric $num")
    }
  }

  test("learns a cycle LONGER than any fixed context the Markov table holds") {
    // period-6 cycle with repeated symbols: 0,1,2,0,1,3 — after (0,1)
    // the next block is 2 or 3 depending on PHASE, which an order-1/2
    // exact-context table cannot disambiguate but carried state can
    val cycle = Seq(0, 1, 2, 0, 1, 3)
    val seq = Seq.fill(40)(cycle).flatten
    val gru = new GruPrefetcher(hidden = 16, window = 12, epochs = 150, lr = 0.6)
      .fit(spark, seq)
    // with 6+ steps of history the phase is observable
    val evals = PrefetchEval.replay(gru, seq.take(120), k = 1, historyLen = 12)
      .drop(12) // skip the cold-start prefix with truncated history
    val hitRate = evals.count(_.hit).toDouble / evals.size
    assert(hitRate >= 0.95, s"GRU should master the period-6 cycle, hit=$hitRate")
    // order-1 Markov CANNOT: after block 1 the answer is 2 half the
    // time and 3 the other half
    val markov = new MarkovPrefetcher(1).fitSeq(spark, seq)
    val mEvals = PrefetchEval.replay(markov, seq.take(120), k = 1, historyLen = 12).drop(12)
    val mHit = mEvals.count(_.hit).toDouble / mEvals.size
    assert(hitRate >= mHit + 0.15,
      s"state must beat order-1 context here: gru=$hitRate markov=$mHit")
  }

  test("fit is deterministic: same sequence -> identical suggestions") {
    val seq = Seq.fill(15)(Seq(4, 7, 1, 9, 4, 2)).flatten
    val a = new GruPrefetcher(hidden = 8, window = 6, epochs = 30).fit(spark, seq)
    val b = new GruPrefetcher(hidden = 8, window = 6, epochs = 30).fit(spark, seq)
    for (ctx <- Seq(Seq(4), Seq(4, 7), Seq(9, 4, 2), Seq(1, 9)); k <- Seq(1, 3))
      assert(a.suggest(ctx, k) == b.suggest(ctx, k))
  }

  test("save -> load predicts identically; hyperparameter mismatch refuses") {
    val dir = "target/scratch/models/gru"
    val seq = Seq.fill(12)(Seq(0, 1, 2, 3, 5)).flatten
    val fitted = new GruPrefetcher(hidden = 8, window = 6, epochs = 25).fit(spark, seq)
    fitted.save(spark, dir)
    val loaded = GruPrefetcher.load(spark, dir)
    assert(loaded.fitted && loaded.weightCount == fitted.weightCount)
    for (ctx <- Seq(Seq(0), Seq(1, 2), Seq(3, 5, 0), Seq(9)); k <- Seq(1, 3, 5))
      assert(loaded.suggest(ctx, k) == fitted.suggest(ctx, k),
        s"ctx=$ctx k=$k diverged after reload")
    val wrong = new GruPrefetcher(hidden = 4, window = 6)
    assertThrows[IllegalArgumentException](wrong.restore(spark, dir))
  }

  test("unknown blocks and empty context degrade gracefully") {
    val gru = new GruPrefetcher(hidden = 8, window = 4, epochs = 10)
      .fit(spark, Seq(1, 2, 1, 2, 1, 2))
    assert(gru.suggest(Seq.empty, 3).isEmpty)
    assert(gru.suggest(Seq(99), 3).isEmpty) // nothing known in context
    assert(gru.suggest(Seq(99, 1), 2).nonEmpty) // known suffix survives
  }
}
