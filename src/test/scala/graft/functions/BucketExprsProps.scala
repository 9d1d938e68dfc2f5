package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck laws for the codegen'd bucketing expressions — evaluated
  * through the INTERPRETED eval path (pure, no Spark session); the
  * codegen/eval parity case in LayoutSpec ties this to the generated
  * code.
  */
object BucketExprsProps extends Properties("BucketExprs") {

  private val boundariesGen: Gen[Array[Double]] = for {
    n <- Gen.chooseNum(1, 40)
    vs <- Gen.listOfN(n, Gen.chooseNum(-1000000, 1000000).map(_ / 100.0))
  } yield vs.distinct.sorted.toArray

  private val valueGen: Gen[Double] =
    Gen.chooseNum(-1100000, 1100000).map(_ / 100.0)

  private def bucketOf(bounds: Array[Double], v: Double): Long =
    QuantileBucket(Literal(v), bounds).eval(null).asInstanceOf[Long]

  property("bucket == count of boundaries strictly below, +1 on exact hit") =
    Prop.forAll(boundariesGen, valueGen) { (b, v) =>
      val expected =
        if (b.contains(v)) b.count(_ < v) + 1L else b.count(_ < v).toLong
      bucketOf(b, v) == expected
    }

  property("bucket is monotone in the value") =
    Prop.forAll(boundariesGen, valueGen, valueGen) { (b, x, y) =>
      val (lo, hi) = if (x <= y) (x, y) else (y, x)
      bucketOf(b, lo) <= bucketOf(b, hi)
    }

  property("bucket range is [0, boundaries.length]") =
    Prop.forAll(boundariesGen, valueGen) { (b, v) =>
      val k = bucketOf(b, v)
      k >= 0L && k <= b.length.toLong
    }

  private def packOf(s: String): Long =
    StringPrefixLong(Literal(UTF8String.fromString(s), org.apache.spark.sql
      .types.StringType)).eval(null).asInstanceOf[Long]

  private val strGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf('é', 'ß', '中', ' ', '-')))
  } yield cs.mkString

  property("string pack preserves order on the 7-byte prefix") =
    Prop.forAll(strGen, strGen) { (a, b) =>
      // UTF-8 binary comparison — the collation the pack mirrors
      val cmp = UTF8String.fromString(a).binaryCompare(UTF8String.fromString(b))
      val (pa, pb) = (packOf(a), packOf(b))
      if (cmp < 0) pa <= pb else if (cmp > 0) pa >= pb else pa == pb
    }

  property("string pack is non-negative") =
    Prop.forAll(strGen) { s => packOf(s) >= 0L }

  property("equal packs imply equal 7-byte prefixes") =
    Prop.forAll(strGen, strGen) { (a, b) =>
      (packOf(a) != packOf(b)) ||
        (UTF8String.fromString(a).getBytes.take(7).toSeq ==
          UTF8String.fromString(b).getBytes.take(7).toSeq)
    }
}
