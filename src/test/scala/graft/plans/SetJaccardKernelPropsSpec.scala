package graft.plans

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property coverage of the SetJaccard merge/probe kernels: both modes must
  * equal the reference set computation for EVERY input — duplicates, null
  * elements, unicode, empty sides — and agree with each other. */
class SetJaccardKernelPropsSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val elem: Gen[Option[String]] = Gen.frequency(
    8 -> Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaLowerChar, Gen.oneOf('π', 'δ', 'é', '中')))
        .map(_.mkString)).map(Some(_)),
    1 -> Gen.const(None))
  private val arr: Gen[List[Option[String]]] =
    Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, elem))

  private def toArrayData(a: List[Option[String]]): GenericArrayData =
    new GenericArrayData(a.map(_.map(UTF8String.fromString).orNull).toArray[Any])

  private def sortedData(a: List[Option[String]]): GenericArrayData = {
    // the expression contract's order: binary UTF8 ascending, nulls last
    val (vals, nulls) = a.partition(_.isDefined)
    val sorted = vals.map(v => UTF8String.fromString(v.get)).sortWith(_.compareTo(_) < 0)
    new GenericArrayData((sorted ++ nulls.map(_ => null)).toArray[Any])
  }

  private def reference(a: List[Option[String]], b: List[Option[String]]): Double = {
    val (sa, sb) = (a.toSet, b.toSet)
    val uni = (sa ++ sb).size
    if (uni == 0) -1.0 else (sa & sb).size.toDouble / uni
  }

  test("unsorted kernel equals the reference set Jaccard for any input") {
    check("unsorted", Prop.forAll(arr, arr) { (a, b) =>
      SetJaccardKernel.unsorted(toArrayData(a), toArrayData(b)) == reference(a, b)
    })
  }

  test("sorted merge equals the reference on contract-sorted input") {
    check("sorted", Prop.forAll(arr, arr) { (a, b) =>
      SetJaccardKernel.sortedMerge(sortedData(a), sortedData(b)) == reference(a, b)
    })
  }

  test("sortedUtf8 output satisfies the sorted-merge contract (nulls included)") {
    check("sortedUtf8", Prop.forAll(arr, arr) { (a0, b0) =>
      def prep(xs: List[Option[String]]): GenericArrayData =
        new GenericArrayData(SetJaccard.sortedUtf8(xs.map(_.orNull).toArray)
          .map(s => if (s == null) null else UTF8String.fromString(s))
          .toArray[Any])
      SetJaccardKernel.sortedMerge(prep(a0), prep(b0)) == reference(a0, b0)
    })
  }
}
