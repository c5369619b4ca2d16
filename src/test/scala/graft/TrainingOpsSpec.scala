package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.operators.{DedupOps, PackingOps, TextOps}

/** The round-4 training-pipeline operators: repetition scoring, PII
  * scan/redaction, benchmark decontamination, sequence packing. */
class TrainingOpsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(cores = 8, appName = "graft-train-test")
  import spark.implicits._

  test("repetition: duplicate-bigram and top-word fractions, hand-computed") {
    val docs = Seq(
      (1L, "a b a b c"),       // bigrams: ab, ba, ab, bc -> 4 total, 3 distinct
      (2L, "x y z"),           // no repetition
      (3L, "w"),               // single word: no bigrams
      (4L, "t t t t")          // maximal repetition
    ).toDF("doc_id", "text")
    val got = TextOps.repetition(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    assert(got(0) == ((1L, 5L, 2.0 / 5, 4L, 1.0 / 4)))  // 'a'/'b' x2 of 5 words
    assert(got(1) == ((2L, 3L, 1.0 / 3, 2L, 0.0)))
    assert(got(2) == ((3L, 1L, 1.0, 0L, 0.0)))          // no bigrams -> 0.0
    assert(got(3) == ((4L, 4L, 1.0, 3L, 2.0 / 3)))      // tt,tt,tt -> 1 distinct
  }

  test("lmScore: integer-bit surprisal, hand-computed on a tiny corpus") {
    // vocab: a×2 b×2 c×1, N=5 → bits(5)=3, bits(2)=2, bits(1)=1
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextOps.lmScore(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc1: 3 tokens, surprisal (3-2)*3 = 3, min c = 2, all rare (c<=2)
    // doc2: 2 tokens, surprisal (3-2)+(3-1) = 3, min c = 1, both rare
    assert(got.toSeq == Seq((1L, 3L, 3L, 2L, 3L), (2L, 2L, 3L, 1L, 2L)))
  }

  test("bigramLmScore: conditional integer-bit surprisal, hand-computed") {
    // bigram instances: doc1 (x,a),(a,a),(a,b); doc2 (a,a); doc3 none
    // corpus: c(x,a)=1 c(a,a)=2 c(a,b)=1; contexts: c(x)=1 c(a)=3
    val docs = Seq((1L, "x a a b"), (2L, "a a"), (3L, "q")).toDF("doc_id", "text")
    val got = TextOps.bigramLmScore(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc1: bits(1)-bits(1)=0 for (x,a); bits(3)-bits(2)=0 for (a,a);
    //       bits(3)-bits(1)=1 for (a,b) -> surprisal 1; all cbi<=2 rare
    // doc2: (a,a): bits(3)-bits(2)=0; doc3: <2 tokens -> absent
    assert(got.toSeq == Seq((1L, 3L, 1L, 1L, 3L), (2L, 1L, 0L, 2L, 1L)))
  }

  test("tfidf: integer-bit idf argmax with term-ascending ties, hand-computed") {
    // N=4 docs → bits(4)=3. df: a→4 (idf 3-3=0), b→2 (3-2=1), c→1 (3-1=2), d→1 (2)
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "a d d"), (4L, "a")).toDF("doc_id", "text")
    val got = TextOps.tfidf(docs, topK = 2).orderBy("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 1, "c", 2L), (1L, 2, "b", 1L),   // c: 1*2 beats b: 1*1 beats a: 0
      (2L, 1, "b", 1L), (2L, 2, "a", 0L),
      (3L, 1, "d", 4L), (3L, 2, "a", 0L),   // d: tf 2 * idf 2
      (4L, 1, "a", 0L)))                    // only one term
  }

  test("piiScan: counts and redaction verified against manual replacement") {
    val docs = Seq(
      (1L, "mail me at jane.doe@corp.example.org or call 555-0199 now"),
      (2L, "no pii here"),
      (3L, "two mails a@b.co c@d.io one phone 123-4567")
    ).toDF("doc_id", "text")
    val got = TextOps.piiScan(docs, col("text")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.map(g => (g._1, g._2, g._3)).toSeq ==
      Seq((1L, 1L, 1L), (2L, 0L, 0L), (3L, 2L, 1L)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(got(0)._4 == md5hex("mail me at <EMAIL> or call <PHONE> now"))
    assert(got(2)._4 == md5hex("two mails <EMAIL> <EMAIL> one phone <PHONE>"))
  }

  test("decontaminate: flags exactly the train docs sharing a k-shingle with eval") {
    // eval doc 0 contains 'p q r s'; train doc 10 repeats it verbatim,
    // train doc 11 shares no 4-gram, train doc 12 shares one with doc 0
    val docs = Seq(
      (0L, "p q r s t u"),             // eval (isEval: doc_id < 10)
      (5L, "m n o p q"),               // eval, no partner
      (10L, "z z p q r s z"),          // contaminated via 'p q r s'
      (11L, "a b c d e f g"),          // clean
      (12L, "q r s t u v")             // contaminated via 'q r s t' + 'r s t u'
    ).toDF("doc_id", "text")
    val got = DedupOps.decontaminate(docs, isEval = col("doc_id") < 10, k = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((10L, 1L, 1L), (12L, 2L, 1L)))
  }

  test("bloomDecontaminate: candidates ⊇ exact hits; tiny bitmap forces FPs the exact stage rejects") {
    // 5 eval docs (25 distinct 4-shingles), 100 clean train docs with
    // doc-unique vocab, one truly contaminated doc sharing eval doc
    // 0's leading 4-gram. At mBits=128 the eval set saturates ~half
    // the bitmap, so clean-doc shingles false-positive with p≈(load)³;
    // at the default 2^17 the same corpus probes clean.
    val evalDocs = (0 until 5).map(e =>
      (e.toLong, (0 until 8).map(j => s"e${e}t$j").mkString(" ")))
    val train = (0 until 100).map(i =>
      (100L + i, (0 until 5).map(j => s"w${i}x$j").mkString(" ")))
    val docs = (evalDocs ++ train ++ Seq((300L, "e0t0 e0t1 e0t2 e0t3 zzz")))
      .toDF("doc_id", "text")
    val isEval = col("doc_id") < 10

    val exact = DedupOps.decontaminate(docs, isEval, k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val tiny = DedupOps.bloomDecontaminate(docs, isEval, k = 4, mBits = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    tiny.foreach { case (id, cand, tru) =>
      assert(cand >= tru)
      assert(tru == exact.getOrElse(id, 0L))
    }
    // no false negatives (the Bloom guarantee): every exact hit survives
    assert(exact == tiny.filter(_._3 > 0).map(t => t._1 -> t._3).toMap)
    // the overloaded bitmap DID produce false positives, all rejected
    assert(tiny.map(t => t._2 - t._3).sum > 0)

    val big = DedupOps.bloomDecontaminate(docs, isEval, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(big.map(t => t._1 -> t._3).toMap == exact)
    assert(big.forall(t => t._2 == t._3))
  }

  test("winnow: window counts, short-doc exclusion, identical text -> identical prints") {
    val docs = Seq(
      (1L, "a b c d e f g"),   // 7 toks -> 5 grams -> 2 full windows
      (2L, "a b c d e f g"),   // identical text: stats must match doc 1
      (3L, "x y z q w"),       // 5 toks -> 3 grams < w=4 -> absent
      (4L, "p q")              // < k -> absent
    ).toDF("doc_id", "text")
    val got = TextOps.winnow(docs, k = 3, w = 4).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(got(0)._2 == 5L && got(0)._3 == 2L)       // grams, full windows
    assert(got(0)._4 >= 1L && got(0)._4 <= 2L)       // 1..2 distinct minima
    assert((got(0)._2, got(0)._3, got(0)._4, got(0)._5, got(0)._6) ==
      (got(1)._2, got(1)._3, got(1)._4, got(1)._5, got(1)._6))
  }

  test("bpePairs: corpus-weighted adjacent pairs, every occurrence counts") {
    // words: aaa x1 (pairs aa,aa), bc x2, ab x1
    val docs = Seq((1L, "aaa bc"), (2L, "bc ab")).toDF("doc_id", "text")
    val got = TextOps.bpePairs(docs, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("aa", 2L), ("bc", 2L), ("ab", 1L)))
  }

  test("chunkDedup: cross-doc duplicated chunks removed, kept text fingerprinted") {
    // w=3 chunks; 'a b c' appears in docs 1, 2 and 4 -> duplicated.
    // doc 4 is NOTHING BUT the duplicated chunk -> kept_md5 NULL.
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c x"), (3L, "z z z"), (4L, "a b c")
    ).toDF("doc_id", "text")
    val got = DedupOps.chunkDedup(docs, w = 3).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3))))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, Some(md5hex("d e f"))),
      (2L, 2L, 1L, Some(md5hex("x"))),
      (3L, 1L, 0L, Some(md5hex("z z z"))),
      (4L, 1L, 1L, None)))
  }

  test("spanPairs: longest shared span via diagonal runs, boilerplate cap") {
    // k=3. doc1/doc2 share "a b c d" (grams 'a b c','b c d' on one
    // diagonal -> run 2 -> span 2+3-1=4). doc1/doc3 share 'c d e' at
    // TWO positions in doc3 (two diagonals, runs of 1 -> span 3,
    // 2 matches). docs 4-6 share 'k l m' across 3 docs — over the
    // cap of 2, dropped before pair generation.
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "x a b c d y"), (3L, "c d e q c d e"),
      (4L, "k l m 1"), (5L, "k l m 2"), (6L, "k l m 3")
    ).toDF("doc_id", "text")
    val capped = DedupOps.spanPairs(docs, k = 3, maxDocsPerSpan = 2)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(capped.toSeq == Seq((1L, 2L, 4L, 2L), (1L, 3L, 3L, 2L)))
    // with the cap lifted, the three boilerplate pairs appear too
    val uncapped = DedupOps.spanPairs(docs, k = 3, maxDocsPerSpan = 50)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(uncapped.toSeq == Seq(
      (1L, 2L, 4L, 2L), (1L, 3L, 3L, 2L),
      (4L, 5L, 3L, 1L), (4L, 6L, 3L, 1L), (5L, 6L, 3L, 1L)))
  }

  test("packSequences: next-fit semantics, per-shard bins, overflow docs isolated") {
    // one shard (shards=1), budget 10, token counts 4,5,3,12,2,9 in
    // doc order -> bins: [4,5],[3],[12],[2],[9]  (next-fit, 12 overflows alone,
    // 2 opens a new bin because 3+12 closed theirs, 9 can't join 2's bin? 2+9>10 -> new)
    val docs = Seq(
      (1L, "a a a a"), (2L, "b b b b b"), (3L, "c c c"),
      (4L, "d d d d d d d d d d d d"), (5L, "e e"), (6L, "f f f f f f f f f")
    ).toDF("doc_id", "text")
    val got = PackingOps.packSequences(docs, budget = 10, shards = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, 4L), (2L, 1L, 5L), (3L, 2L, 3L),
      (4L, 3L, 12L), (5L, 4L, 2L), (6L, 5L, 9L)))
  }

  test("packSequences: deterministic under repartitioning; no bin over budget except singletons") {
    val docs = (1L to 400L).map(i => (i, ("w " * (1 + (i % 37).toInt)).trim)).toDF("doc_id", "text")
    val a = PackingOps.packSequences(docs, budget = 64, shards = 8)
    val b = PackingOps.packSequences(docs.repartition(13), budget = 64, shards = 8)
    assert(a.orderBy("doc_id").collect().toSeq == b.orderBy("doc_id").collect().toSeq)
    val fills = a.groupBy("shard", "bin_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n_docs"))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(fills.forall { case (fill, nDocs) => fill <= 64 || nDocs == 1 },
      "a multi-doc bin exceeded the budget")
    // every doc of a shard is in exactly one bin and ids are contiguous from 1
    val binSeq = a.select("shard", "bin_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    binSeq.foreach { case (sh, bins) =>
      assert(bins == (1L to bins.size), s"shard $sh bins not contiguous: $bins")
    }
  }
}
