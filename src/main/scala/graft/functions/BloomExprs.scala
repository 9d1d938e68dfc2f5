package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]].
  *
  * The filter is built once with `df.stat.bloomFilter` (a distributed
  * treeAggregate — the set being summarized never collects to one task)
  * and shipped to executors INSIDE the expression as its serialized bytes,
  * exactly like a literal: no broadcast plumbing, no UDF, and the probe
  * stays inside whole-stage codegen. One `test(long)` per row against a
  * bit array.
  *
  * This is the same lever Spark's own runtime-filter rule injects for
  * shuffle joins, exposed as a first-class building block: probe a small
  * side's key set BEFORE a shuffle/explode so rows that cannot match never
  * leave the scan stage. False positives are possible (the consumer must
  * re-verify exactly — e.g. with the equi-join the probe was protecting);
  * false negatives are not, so prefiltering never drops a true match.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint probe (hash first), got " +
        child.dataType.simpleString)

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  def test(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(v: Any): Any =
    test(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("bloom", this,
      classOf[BloomMightContainLong].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.test($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object BloomExprs {

  /** Serialize a built filter once; reuse across probe columns. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Probe a LONG column (pre-hashed key) against `bf`. Pair the build
    * side with the same hash: build over `xxhash64(k)`, probe with
    * `mightContainHashed(xxhash64(k), bf)` — both sides codegen'd, no
    * per-row allocation.
    */
  def mightContainHashed(hashed: Column, bf: BloomFilter): Column =
    ColumnBridge.column(BloomMightContainLong(
      ColumnBridge.expression(hashed), serialize(bf)))
}
