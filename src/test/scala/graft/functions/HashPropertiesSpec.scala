package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._
import graft.operators.Splits

/** Property-based coverage (ScalaCheck) of the pure JVM kernels the
  * dedup/split operators are built on — the invariants that must hold for
  * EVERY input, not just the fixtures: hash ranges, permutation
  * invariance, shingle shape, ring-cut monotonicity. */
class HashPropertiesSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val token: Gen[String] =
    Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val tokens: Gen[List[String]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, token))

  test("tokenHashPairJvm stays in its prime fields and is deterministic") {
    check("ranges", Prop.forAll(token) { t =>
      val (h1, h2) = tokenHashPairJvm(t)
      h1 >= 0 && h1 < HashP1 && h2 >= 0 && h2 < HashP2 &&
        tokenHashPairJvm(t) == ((h1, h2))
    })
  }

  test("simhash is token-order invariant (votes commute) and multiplicity-sensitive") {
    check("permutation invariance", Prop.forAll(tokens, Gen.long) { (ts, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(ts)
      simhash64Jvm(ts.mkString(" ")) == simhash64Jvm(shuffled.mkString(" "))
    })
  }

  test("shingleSetJvm: every shingle has exactly w tokens, count bounded, distinct") {
    check("shape", Prop.forAll(tokens, Gen.chooseNum(1, 5)) { (ts, w) =>
      val text = ts.mkString(" ")
      shingleSetJvm(text, w) match {
        case None => ts.size < w
        case Some(ss) =>
          ss.length <= ts.size - w + 1 &&
            ss.forall(_.split(" ").length == w) &&
            ss.distinct.length == ss.length
      }
    })
  }

  test("minhash signature: self-estimate is exactly 1, length is k") {
    check("self similarity", Prop.forAll(tokens.suchThat(_.size >= 3)) { ts =>
      minhashSignatureJvm(ts.mkString(" "), k = 16, shingleWidth = 3) match {
        case None => ts.size < 3
        case Some(sig) => sig.length == 16 && {
          // identical text => identical signature => estimate 1
          val again = minhashSignatureJvm(ts.mkString(" "), 16, 3).get
          sig.sameElements(again)
        }
      }
    })
  }

  test("hash-ring cuts are monotone and end exactly at the ring size") {
    val weightsGen = Gen.chooseNum(2, 6).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 100)).map { raw =>
        val total = raw.sum.toDouble
        raw.zipWithIndex.map { case (w, i) => s"s$i" -> w / total }
      })
    check("cuts", Prop.forAll(weightsGen) { ws =>
      // normalize exactly to 1.0 by construction can still drift in the
      // last ulp; assign() tolerates 1e-9, mirror that here
      val cuts = Splits.cutsFor(ws)
      cuts.zip(cuts.tail).forall { case (a, b) => a <= b } &&
        math.abs(cuts.last - Splits.HashRing) <= 1
    })
  }
}
