package org.apache.spark.sql.graftvec

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** All sign-LSH bucket signatures of a vector in ONE codegen'd expression:
  * element t of the result is table t's bucket id, bit b set iff
  * `vec · plane(t,b) > 0`.
  *
  * Why this exists: building the per-table buckets from `tables × bits`
  * separate [[DotProduct]] expressions inlines every dot into one generated
  * method — at 24 tables × 6 bits × dim 64 the method crosses Janino's
  * 64 KB limit, whole-stage codegen FAILS, and the whole projection falls
  * back to interpreted eval (observed in the bench logs as
  * `CodeGenerator: Failed to compile`). One expression with a runtime loop
  * keeps generated-code size O(1) in `tables × bits` — the LSH
  * strengthening knob no longer degrades the execution mode.
  *
  * Per-plane semantics are exactly the former `dot(vec, plane) > 0`
  * composition: a dimension mismatch or a null element makes that plane's
  * dot undefined → bit 0 (never a crash); summation is left-to-right per
  * plane, so signs — and thus buckets and measured recalls — are
  * bit-identical to the composed form. A NULL input vector yields a NULL
  * array (stricter than the composed form, which sank null vectors into
  * bucket 0 of every table where they collided with everything);
  * `posexplode` then simply emits no candidate rows for it.
  *
  * `planes` is laid out `[t][b][d]` flattened: `idx = (t*bits + b)*dim + d`.
  * It is an `IndexedSeq`, not an `Array`: case-class equality on an array is
  * reference-based, so semantically identical instances would never compare
  * equal and Catalyst canonicalization / common-subexpression elimination
  * could not dedupe them.
  */
case class SignBuckets(
    child: Expression,
    planes: IndexedSeq[Double],
    tables: Int,
    bits: Int,
    dim: Int
) extends UnaryExpression with ExpectsInputTypes {

  require(planes.length == tables * bits * dim,
    s"planes length ${planes.length} != tables*bits*dim ${tables * bits * dim}")
  require(bits > 0 && bits <= 63, s"bits must be in [1, 63], got $bits")

  // the hot loops (interpreted and the codegen reference object) index a
  // primitive array, not the boxed Seq
  @transient private lazy val planesArr: Array[Double] = planes.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_sign_buckets"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val out = new Array[Long](tables)
    val matched = x.numElements() == dim
    var t = 0
    while (t < tables) {
      var acc = 0L
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var s = 0.0
        var ok = matched
        var d = 0
        while (ok && d < dim) {
          if (x.isNullAt(d)) ok = false
          else s += x.getDouble(d) * planesArr(base + d)
          d += 1
        }
        if (ok && s > 0) acc |= 1L << b
        b += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.addReferenceObj("planes", planesArr, "double[]")
      val out = ctx.freshName("out")
      val matched = ctx.freshName("matched")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val ok = ctx.freshName("ok")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      s"""
         |long[] $out = new long[$tables];
         |boolean $matched = $v.numElements() == $dim;
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $acc = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    int $base = ($t * $bits + $b) * $dim;
         |    double $s = 0.0;
         |    boolean $ok = $matched;
         |    for (int $d = 0; $ok && $d < $dim; $d++) {
         |      if ($v.isNullAt($d)) { $ok = false; }
         |      else { $s += $v.getDouble($d) * $p[$base + $d]; }
         |    }
         |    if ($ok && $s > 0) { $acc |= 1L << $b; }
         |  }
         |  $out[$t] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBuckets =
    copy(child = newChild)
}
