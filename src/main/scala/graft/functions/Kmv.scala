package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{filter, lit, udaf, when}

/** KMV (k minimum values) distinct-count sketch — the θ-sketch core
  * (Bar-Yossef et al. 2002; Beyer et al. 2007, "On synopses for distinct-
  * value estimation under multiset operations"): keep the k smallest
  * DISTINCT hash values seen; if fewer than k exist the buffer IS the
  * distinct hash set (exact count), otherwise the k-th minimum U_(k)
  * estimates the cardinality as (k−1)·M/U_(k) over hash domain M.
  *
  * Beside [[Sketches]]' HLL this is the sketch an ORACLE can check: fed an
  * engine-consistent hash (the 60-bit md5-prefix idiom), the kept set —
  * and therefore the estimate — is a pure deterministic function of the
  * input VALUE SET, reproducible bit-for-bit by any engine that can sort.
  * (HLL estimates are library-implementation-specific; KMV's is four
  * IEEE-exact ops.)
  *
  * Scale: O(k) state per group regardless of cardinality, and merge is
  * union-then-truncate — associative, commutative, idempotent — so
  * partial sketches combine map-side and shuffle volume is
  * O(groups × k) longs, never O(rows). This is the typed-`Aggregator`
  * (UDAF) corner of the §2.10 extension surface; the codegen'd
  * `Expression`s cover the scalar corner.
  */
object Kmv {

  /** Sorted-array insert keeping the ≤ maxK smallest distinct values. */
  private[functions] def insert(buf: Array[Long], v: Long, maxK: Int)
      : Array[Long] = {
    val idx = java.util.Arrays.binarySearch(buf, v)
    if (idx >= 0) buf // already present — sketch state is a SET
    else {
      val ins = -idx - 1
      if (buf.length < maxK) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < maxK) {
        val out = new Array[Long](maxK)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, maxK - ins - 1)
        out
      } else buf // v larger than the current k-th min — irrelevant
    }
  }

  /** Typed aggregator over already-hashed long inputs. The buffer (and
    * output) is the sorted array of kept hash values — consumers read
    * exactness from `size < k` and the k-th min from `element_at(_, k)`,
    * keeping the estimator arithmetic IN THE PLAN where the SQL twin can
    * mirror it.
    */
  class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, s"k must be >= 2, got $k")
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], a: Long): Array[Long] = insert(b, a, k)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      b.foldLeft(a)((acc, v) => insert(acc, v, k))
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The sketch as an aggregate Column over a LONG hash column.
    *
    * NULL inputs are dropped before the aggregator sees them — the
    * primitive-long encoder would otherwise decode NULL as 0L and
    * insert a spurious minimum into the k-min set while countDistinct
    * beside it ignores NULLs. The guard maps NULL to the aggregator's
    * no-op (Long.MaxValue never displaces a kept minimum and an
    * all-null group yields the empty sketch via the size cap below),
    * so nullable hash columns estimate exactly the non-null distinct
    * count, matching countDistinct semantics.
    *
    * CONTRACT: `Long.MaxValue` is RESERVED as the NULL sentinel — a
    * genuine input of Long.MaxValue is indistinguishable from NULL and
    * is dropped from the sketch, undercounting by one distinct value.
    * This is unreachable with the engine's own hashes (60-bit md5
    * prefixes, the `hashBucket` idiom: max 2^60-1 < Long.MaxValue),
    * but callers feeding arbitrary long columns must
    * either avoid that one value or pre-map it. The alternative — a
    * boxed java.lang.Long buffer so NULLs skip inside reduce — costs an
    * allocation per row on the sketch hot path; the engine keeps the
    * primitive encoder and documents the reserved value instead.
    */
  def kmvAgg(hashCol: Column, k: Int = 64): Column = {
    val sketch = udaf(new KmvAgg(k), Encoders.scalaLong)
      .apply(when(hashCol.isNotNull, hashCol)
        .otherwise(lit(Long.MaxValue)))
    // Long.MaxValue sentinels from all-null groups are only visible when
    // the group holds fewer than k real values; strip them so the sketch
    // is exactly the k smallest REAL hashes (filter preserves sort order).
    filter(sketch, (v: Column) => v =!= lit(Long.MaxValue))
  }
}
