package graft

import org.apache.spark.sql.functions._

import graft.operators.GraftBpe

/** BPE trainer/segmenter semantics: the hand-computable Sennrich-style
  * fixture, a reference in-test implementation of `learn_bpe` for
  * differential checking on messier input, the greedy-replace law on
  * same-symbol runs, and the train/apply round trip.
  */
class BpeSpec extends GraftFunSuite {

  import SparkTestBase.spark.implicits._

  test("bpeTrain learns the classic fixture's merges in order, with " +
       "deterministic tie-breaks (count desc, then lexicographic)") {
    // low x3, lower x2, newest x1 — hand computation:
    //  r1: (l,o)=5 ties (o,w)=5 -> lex 'l' < 'o' -> (l,o)
    //  r2: (lo,w)=5             r3: (e,r)=2 ties (low,e)=2 -> 'e' < 'low'
    //  r4: (low,er)=2
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val got = GraftBpe.bpeTrain(docs, merges = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
                           r.getLong(3))).toSeq
    assert(got == Seq((1L, "l", "o", 5L), (2L, "lo", "w", 5L),
                      (3L, "e", "r", 2L), (4L, "low", "er", 2L)), got)
  }

  /** Reference learn_bpe (Sennrich et al. 2016) over a word-count map —
    * the sequential original, for differential testing. */
  private def referenceBpe(words: Map[String, Long],
                           merges: Int): Seq[(String, String, Long)] = {
    var vocab = words.map { case (w, c) => (w.map(_.toString).toList, c) }
    val out = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    for (_ <- 1 to merges) {
      val stats = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p =>
          stats(p) = stats.getOrElse(p, 0L) + c)
      }
      if (stats.nonEmpty) {
        val ((a, b), c) = stats.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b, c))
        vocab = vocab.map { case (syms, cnt) =>
          val merged = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += a + b; i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.toList, cnt)
        }
      }
    }
    out.toSeq
  }

  test("bpeTrain equals the sequential reference learn_bpe on real corpus " +
       "text (differential, 8 merges)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").limit(120)
    val words = docs.collect().map(_.getString(0))
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.length.toLong) }
    val expected = referenceBpe(words, merges = 8)
    val got = GraftBpe.bpeTrain(docs, merges = 8)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected, s"\ngot      $got\nexpected $expected")
  }

  test("greedy replace law: same-symbol runs merge left-to-right " +
       "non-overlapping ('aaaa' + (a,a) -> aa aa; 'aaa' -> aa a)") {
    val docs = Seq("aaaa aaaa", "aaa").toDF("text")
    val m = GraftBpe.bpeTrain(docs, merges = 2).collect()
    // r1: (a,a) count = 3+3+2(doc2? 'aaa' has 2) = 3*2? hand: 'aaaa'x2
    // words: aaaa x2 (pairs 3 each = 6), aaa x1 (pairs 2) -> (a,a)=8
    assert((m(0).getString(1), m(0).getString(2), m(0).getLong(3)) ==
      (("a", "a", 8L)))
    // after merge: aaaa -> [aa, aa]; aaa -> [aa, a]
    // r2 pairs: (aa,aa)=2, (aa,a)=1 -> (aa,aa)
    assert((m(1).getString(1), m(1).getString(2), m(1).getLong(3)) ==
      (("aa", "aa", 2L)))
    val seg = GraftBpe.bpeSegment(
        Seq("aaaa aaa").toDF("text"),
        GraftBpe.bpeTrain(docs, merges = 2))
      .select("bpe_tokens").head().getSeq[String](0)
    assert(seg == Seq("aaaa", "aa", "a"), seg)
  }

  test("bpeSegment applies the learned merges exactly: segmenting the " +
       "training corpus reproduces the reference's final vocab states, " +
       "and unseen words segment with the same merges") {
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val merges = GraftBpe.bpeTrain(docs, merges = 4)
    val seg = GraftBpe.bpeSegment(Seq("low lower newest lowest").toDF("text"),
                                  merges)
      .select("bpe_tokens").head().getSeq[String](0)
    // low -> [low]; lower -> [lower] (merge 4 = (low, er)); newest ->
    // chars (no learned merge applies); lowest -> [low, e, s, t] — the
    // UNSEEN word reuses the learned merges without retraining
    assert(seg == Seq("low", "lower",
                      "n", "e", "w", "e", "s", "t",
                      "low", "e", "s", "t"), seg)
    // argument validation
    intercept[IllegalArgumentException] {
      GraftBpe.bpeTrain(docs, merges = 0)
    }
    intercept[IllegalArgumentException] {
      GraftBpe.bpeSegment(docs, merges.limit(0))
    }
  }

  test("symbols with quotes/backslashes bind as values, not spliced SQL " +
       "(the injection-hardening contract of the merge-chain fold)") {
    val docs = Seq("do'n do'n d\\x d\\x d\\x").toDF("text")
    val m = GraftBpe.bpeTrain(docs, merges = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // pairs: d\x x3 words give (d,\)=3, (\,x)=3; do'n x2 give (d,o)=2,
    // (o,')=2, (',n)=2 -> r1 tie at 3: ('\','x') vs ('d','\') -> '\\'(0x5c)
    // vs 'd'(0x64) -> ('\','x') first
    assert(m == Seq(("\\", "x", 3L), ("d", "\\x", 3L)), m)
    val seg = GraftBpe.bpeSegment(
        Seq("d\\x do'n").toDF("text"),
        GraftBpe.bpeTrain(docs, merges = 2))
      .select("bpe_tokens").head().getSeq[String](0)
    assert(seg == Seq("d\\x", "d", "o", "'", "n"), seg)
  }
}
