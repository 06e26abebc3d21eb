package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import graft.functions.SketchFunctions

/** The codegen'd bloom probe must agree exactly with the driver-side sketch
  * API (`mightContainLong`) row-for-row — the sketch's no-false-negative
  * contract is what makes the bloom decontamination path exact.
  */
class SketchFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("probe agrees with BloomFilter.mightContainLong on members and non-members") {
    val bf = BloomFilter.create(100, 0.03)
    val members = (0L until 100L).map(_ * 7L)
    members.foreach(bf.putLong)
    val keys = (-50L until 800L).toDF("k")
    val got = keys.select(col("k"),
        SketchFunctions.bloomMightContainLong(bf, col("k")).as("hit"))
      .as[(Long, Boolean)].collect()
    // exact agreement with the driver-side probe (codegen path == sketch API)
    assert(got.forall { case (k, hit) => hit == bf.mightContainLong(k) })
    // and the contract the decontamination path rests on: NO false negatives
    val hits = got.toMap
    assert(members.forall(hits(_)), "a member was dropped — false negative")
  }

  test("null key probes to null, and the probe survives serialization round trips") {
    val bf = BloomFilter.create(10, 0.01)
    bf.putLong(42L)
    val df = Seq(Option(42L), Option(43L), None).toDF("k")
      .select(SketchFunctions.bloomMightContainLong(bf, col("k")).as("hit"))
    val out = df.collect().map(r => Option(r.get(0)))
    assert(out(0) == Some(true))
    assert(out(2).isEmpty, "null key must probe to null, not false")
    // two probes built from the same filter are value-equal (canonicalization
    // can dedupe them — the SignBuckets lesson). The key Column is built ONCE:
    // Spark 4 stamps each col() call with its source-line Origin, which is
    // child metadata, not probe semantics — the assertion targets the
    // serialized-filter-bytes equality on the probe itself.
    import org.apache.spark.sql.GraftColumnBridge
    val k = col("k")
    val e1 = GraftColumnBridge.expression(SketchFunctions.bloomMightContainLong(bf, k))
    val e2 = GraftColumnBridge.expression(SketchFunctions.bloomMightContainLong(bf, k))
    assert(e1 == e2, "semantically identical bloom probes must compare equal")
  }
}
