package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The fused kernels must be element-for-element equal to the built-in
  * higher-order chains they replaced (`split → sliding k-gram →
  * distinct` / nested pair transform) — including empty tokens from
  * consecutive spaces, which `split(text, " ")` keeps.
  */
object TextKernelProperties extends Properties("graft.textkernels") {

  private val wordGen = Gen.frequency(
    8 -> Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString),
    2 -> Gen.oneOf("a", "bb", ""), // "" => consecutive-space empty token
  )
  private val textGen = Gen.chooseNum(0, 12).flatMap(n =>
    Gen.listOfN(n, wordGen).map(_.mkString(" ")))

  private def refShingles(text: String, k: Int): Seq[String] = {
    val w = text.split(" ", -1).toSeq
    if (w.length < k) Nil else w.sliding(k).map(_.mkString(" ")).toSeq.distinct
  }

  private def kernelShingles(text: String, k: Int): Seq[String] = {
    val e = ShingleSet(org.apache.spark.sql.catalyst.expressions.Literal(text), k)
    e.nullSafeEval(UTF8String.fromString(text)).asInstanceOf[ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.asInstanceOf[UTF8String].toString).toSeq
  }

  property("ShingleSet == split/sliding/distinct reference, k in 1..4") =
    forAll(textGen, Gen.chooseNum(1, 4)) { (text, k) =>
      kernelShingles(text, k) == refShingles(text, k)
    }

  property("ShingleList == split/sliding reference (duplicates kept, in order), k in 1..4") =
    forAll(textGen, Gen.chooseNum(1, 4)) { (text, k) =>
      val w = text.split(" ", -1).toSeq
      val ref = if (w.length < k) Nil else w.sliding(k).map(_.mkString(" ")).toSeq
      val e = ShingleList(org.apache.spark.sql.catalyst.expressions.Literal(text), k)
      val got = e.nullSafeEval(UTF8String.fromString(text)).asInstanceOf[ArrayData]
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.asInstanceOf[UTF8String].toString).toSeq
      got == ref
    }

  property("OrderedPairs emits all C(n,2) ordered pairs in order") =
    forAll(Gen.chooseNum(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)))) { ids =>
      val sorted = ids.sorted
      val e = OrderedPairs(org.apache.spark.sql.catalyst.expressions.Literal(1L))
      val got = e.nullSafeEval(new GenericArrayData(sorted.toArray[Any]))
        .asInstanceOf[ArrayData]
      val rows = (0 until got.numElements()).map { i =>
        val r = got.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
      val expected = for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
      } yield (sorted(i), sorted(j))
      rows == expected
    }
}
