package org.apache.spark.sql.graftvec

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `mightContain` probe of a pre-built [[BloomFilter]] over a LONG key —
  * the map-side prefilter for decontamination against benchmark corpora too
  * large to broadcast as a raw join side (the sketch is ~9.6 bits/item at
  * 1% fpp vs 64 bits + hashmap overhead for the exact broadcast set).
  *
  * No false negatives, by the sketch's contract: a `false` here proves the
  * key is NOT in the benchmark set, so rows dropped by this filter can never
  * be true contamination matches. False positives pass through and must be
  * removed by an exact verify join downstream — callers that do so produce
  * results byte-identical to the exact path.
  *
  * The filter travels as its serialized bytes (an `IndexedSeq` for value
  * equality, so canonicalization / common-subexpression elimination can
  * dedupe semantically identical probes — same rationale as
  * [[SignBuckets.planes]]) and is deserialized once per task via a lazy
  * transient; codegen references the deserialized object directly.
  */
case class BloomMightContain(
    child: Expression,
    filterBytes: IndexedSeq[Byte]
) extends UnaryExpression with ExpectsInputTypes {

  require(filterBytes.nonEmpty, "filterBytes must be a serialized BloomFilter")

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes.toArray))

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bf = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      s"${ev.value} = $bf.mightContainLong($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
