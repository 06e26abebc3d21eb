package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.graftvec.DotProduct

/** Native Catalyst vector expressions with whole-stage codegen.
  *
  * The engine's vector math was originally `aggregate`/`zip_with`
  * higher-order functions — pure Catalyst, but HOFs evaluate *interpreted*
  * (a lambda call per element, boxed accumulator) and sit outside
  * whole-stage codegen. On the hot paths that evaluate millions of dot
  * products (brute-force ranking, O(n²) dedup verification, IVF
  * assignment) that interpreter overhead dominates. [[DotProduct]]
  * compiles to a primitive `double` loop inside the generated code —
  * identical left-to-right summation order to the HOF fold, so results are
  * digit-for-digit the same (oracle hashes unchanged).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ over `array<double>` columns, codegen'd. Null array, length
    * mismatch, or any null element → null (exactly the HOF fold's edge
    * semantics — malformed vectors keep failing threshold filters);
    * summation is left-to-right — the cross-engine-reproducible order.
    */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** ‖a‖₂ via dot(a, a), codegen'd. */
  def norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(dot(a, a))

  /** All sign-LSH bucket ids of `vec` (element t = table t's bucket) in one
    * codegen'd loop — generated-code size O(1) in tables × bits, where the
    * composed per-plane `dot(...) > 0` form blows Janino's 64 KB method
    * limit at real table counts and silently de-optimizes the whole stage
    * to interpreted eval. `planes` as produced by `Ann.hyperplanes`:
    * planes(t)(b) is a dim-length hyperplane.
    */
  def signBuckets(vec: Column, planes: Seq[Seq[Seq[Double]]]): Column = {
    val tables = planes.length
    require(tables > 0, "at least one hash table required")
    val bits = planes.head.length
    val dim = planes.head.head.length
    val flat = new Array[Double](tables * bits * dim)
    for (t <- 0 until tables; b <- 0 until bits; d <- 0 until dim)
      flat((t * bits + b) * dim + d) = planes(t)(b)(d)
    GraftColumnBridge.column(org.apache.spark.sql.graftvec.SignBuckets(
      GraftColumnBridge.expression(vec),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(flat), tables, bits, dim))
  }
}
