package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.agg.Aggregates
import graft.filters.FuzzyMatch

/** Property tests: the distributed implementations against trivially
  * correct in-memory oracles on randomized (fixed-seed) inputs. */
class PropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(42L)
    (1 to n).map { _ =>
      val a = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      a
    }
  }

  test("distributed weightedMedian equals the naive cumulative-weight median") {
    import spark.implicits._
    val rows = Gen.nonEmptyListOf(for {
      v <- Gen.chooseNum(-1000.0, 1000.0)
      w <- Gen.chooseNum(0.1, 50.0)
    } yield (v, w))
    samples(rows, 10).foreach { data =>
      val sorted = data.sortBy(_._1)
      val totalW = sorted.map(_._2).sum
      val half = totalW / 2
      var cum = 0.0
      val naive = sorted.find { case (_, w) => cum += w; cum >= half }.get._1
      val got = Aggregates.weightedMedian(data.toDF("v", "w"), "v", "w", buckets = 16)
        .collect()(0).getDouble(0)
      // exact match expected; the escape hatch covers the case where the
      // crossing row sits within FP-summation-order noise of half the
      // total weight (distributed partial sums accumulate in a different
      // order than the sequential fold above)
      def cumThrough(v: Double): Double = sorted.takeWhile(_._1 <= v).map(_._2).sum
      assert(got == naive || math.abs(cumThrough(got) - half) <= 1e-9 * totalW,
        s"got $got want $naive for $data")
    }
  }

  test("FuzzyMatch equals the mask semantics it encodes (overlap-prefix)") {
    val gen = for {
      pat <- Gen.listOfN(6, Gen.oneOf('a', 'b', '?')).map(_.mkString)
      s <- Gen.listOfN(8, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      n <- Gen.chooseNum(0, 8)
    } yield (pat, s.take(n))
    samples(gen, 200).foreach { case (pat, s) =>
      val k = math.min(pat.length, s.length)
      val want = (0 until k).forall(i => pat(i) == '?' || pat(i) == s(i))
      assert(FuzzyMatch.matches(s, pat) == want, s"s=$s pat=$pat")
    }
  }
}
