package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import graft.functions.{GraftMinHash, GraftSimHash}
import graft.plans.XorShift64Star

/** ScalaCheck property coverage for the pure kernels (no Spark session):
  * PRNG uniformity/determinism, MinHash as a Jaccard estimator, SimHash
  * Hamming behavior. These are the randomized counterparts of the
  * reference's single golden test (tests/e2e.rs:20-35), per SURVEY §5.
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic mini-forAll over a ScalaCheck generator (the scalatest
    * bridge artifact is not in the offline cache).
    */
  private def forAll[A](gen: Gen[A], n: Int = 40)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(12345L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private def lit(ss: Seq[String]) =
    Literal.create(ss, ArrayType(StringType))

  private def minhash(ss: Seq[String], k: Int): Seq[Long] =
    GraftMinHash(lit(ss), k).eval(null).asInstanceOf[ArrayData].toLongArray().toSeq

  test("xorshift PRNG: deterministic per seed, distinct across seeds, uniform-ish") {
    forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { (seed: Long) =>
      val a = new XorShift64Star(seed)
      val b = new XorShift64Star(seed)
      val xs = Seq.fill(100)(a.nextDouble())
      assert(xs == Seq.fill(100)(b.nextDouble()))
      assert(xs.forall(x => x >= 0.0 && x < 1.0))
    }
    // mean of many draws near 0.5 for a handful of seeds
    for (seed <- Seq(0L, 1L, 42L, -7L)) {
      val r = new XorShift64Star(seed)
      val mean = Seq.fill(20000)(r.nextDouble()).sum / 20000
      assert(math.abs(mean - 0.5) < 0.02, s"seed=$seed mean=$mean")
    }
  }

  test("minhash estimates Jaccard within binomial bounds on random sets") {
    val genSets = for {
      n1 <- Gen.choose(20, 200)
      n2 <- Gen.choose(20, 200)
      overlap <- Gen.choose(0, math.min(n1, n2))
    } yield {
      val shared = (0 until overlap).map(i => s"s$i")
      val a = shared ++ (0 until n1 - overlap).map(i => s"a$i")
      val b = shared ++ (0 until n2 - overlap).map(i => s"b$i")
      (a, b)
    }
    forAll(genSets) { case (a, b) =>
      val exact = (a.toSet & b.toSet).size.toDouble / (a.toSet | b.toSet).size
      val k = 256
      val sa = minhash(a, k)
      val sb = minhash(b, k)
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / k
      // 5 sigma on Binomial(k, exact)
      val sigma = math.sqrt(exact * (1 - exact) / k)
      assert(math.abs(est - exact) <= 5 * sigma + 0.02,
        s"exact=$exact est=$est n=(${a.size},${b.size})")
    }
  }

  test("minhash is permutation- and duplication-invariant (a set function)") {
    forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) { (ss: List[String]) =>
      val base = minhash(ss.distinct, 64)
      assert(minhash(scala.util.Random.shuffle(ss ++ ss), 64) == base)
    }
  }

  test("simhash: disjoint vocabularies give larger Hamming distance than overlapping ones") {
    def sim(ss: Seq[String]): Long =
      GraftSimHash(lit(ss)).eval(null).asInstanceOf[Long]
    def ham(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    forAll(Gen.choose(50, 150)) { (n: Int) =>
      val base = (0 until n).map(i => s"t$i")
      val near = base.drop(n / 10) ++ (0 until n / 10).map(i => s"x$i")
      val far = (0 until n).map(i => s"z$i")
      assert(ham(sim(base), sim(near)) <= ham(sim(base), sim(far)) + 8,
        s"n=$n near=${ham(sim(base), sim(near))} far=${ham(sim(base), sim(far))}")
    }
  }
}
