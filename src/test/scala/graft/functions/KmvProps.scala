package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** Property laws of the KMV sketch: for ANY input order, duplication, or
  * stream split, the buffer equals the sorted distinct k-minimum set —
  * exactly the guarantees a map-side partial combine relies on.
  */
object KmvProps extends Properties("Kmv") {

  private val K = 8

  private def sketchOf(xs: Seq[Long]): Array[Long] =
    xs.foldLeft(Array.emptyLongArray)((b, v) => Kmv.insert(b, v, K))

  private def truth(xs: Seq[Long]): Seq[Long] =
    xs.distinct.sorted.take(K)

  private val stream = Gen.listOf(Gen.chooseNum(0L, 200L))

  property("buffer == sorted distinct k-min set, any order") =
    Prop.forAll(stream) { xs => sketchOf(xs).toSeq == truth(xs) }

  property("any split-then-merge == whole-stream sketch, both ways") =
    Prop.forAll(stream, Gen.chooseNum(0, 10)) { (xs, cut0) =>
      val agg = new Kmv.KmvAgg(K)
      val cut = if (xs.isEmpty) 0 else cut0 % (xs.length + 1)
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(sketchOf(a), sketchOf(b))
      val swapped = agg.merge(sketchOf(b), sketchOf(a))
      merged.toSeq == truth(xs) && swapped.toSeq == truth(xs)
    }
}
