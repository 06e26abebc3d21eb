package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.graftvec.BloomMightContain
import org.apache.spark.util.sketch.BloomFilter

/** Sketch-probe columns (codegen'd Catalyst expressions over pre-built
  * sketches). Counterpart of [[VectorFunctions]] for the membership-sketch
  * family: build the sketch once with the public `DataFrameStatFunctions`
  * API, then probe it map-side with a native expression that stays inside
  * whole-stage codegen.
  */
object SketchFunctions {

  /** `true` iff `key` (LONG) might be in `filter` — no false negatives;
    * false positives at the filter's configured fpp. Null key → null.
    */
  def bloomMightContainLong(filter: BloomFilter, key: Column): Column = {
    val bos = new ByteArrayOutputStream()
    filter.writeTo(bos)
    GraftColumnBridge.column(BloomMightContain(
      GraftColumnBridge.expression(key),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(bos.toByteArray)))
  }
}
