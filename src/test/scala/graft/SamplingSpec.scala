package graft

import org.apache.spark.sql.functions._
import graft.sample.Sampling

/** Deterministic sampling semantics: stability, partition coverage,
  * per-stratum exactness, and the no-reshuffle-on-append property that
  * makes the md5 scheme safe for incremental 100 TB corpora.
  */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private val ids = (0L until 2000L).toDF("doc_id")

  test("hashSplit: partition, deterministic, fraction-accurate") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.hashSplit(ids, "doc_id", splits)
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000L, "every row lands in exactly one split")
    assert(math.abs(counts("train") - 1600L) < 100, s"train ~80%, got ${counts("train")}")
    assert(math.abs(counts("val") - 200L) < 60 && math.abs(counts("test") - 200L) < 60)
    // rerun must assign identically
    val again = Sampling.hashSplit(ids, "doc_id", splits)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("hashSplit: assignments are stable when new rows are appended") {
    val splits = Seq("train" -> 0.9, "val" -> 0.1)
    val small = Sampling.hashSplit(ids.filter(col("doc_id") < 500), "doc_id", splits)
    val large = Sampling.hashSplit(ids, "doc_id", splits)
    assert(small.except(large).isEmpty,
      "existing rows must keep their split when the corpus grows")
  }

  test("hashSample keeps a deterministic ~fraction subset") {
    val s1 = Sampling.hashSample(ids, "doc_id", 0.25).as[Long].collect().toSet
    val s2 = Sampling.hashSample(ids, "doc_id", 0.25).as[Long].collect().toSet
    assert(s1 == s2)
    assert(math.abs(s1.size - 500) < 100, s"~25%, got ${s1.size}")
    // nested fractions: smaller sample is a subset of the larger
    val s3 = Sampling.hashSample(ids, "doc_id", 0.1).as[Long].collect().toSet
    assert(s3.subsetOf(s1), "hash samples must nest by fraction")
  }

  test("stratifiedSample: exact ceil(frac*n) per stratum, deterministic") {
    val df = (0L until 300L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "fr" else "zh"))
      .toDF("doc_id", "lang")
    val out = Sampling.stratifiedSample(df, "doc_id", Seq("lang"), 0.17)
    val per = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(per.values.toSet == Set(math.ceil(100 * 0.17).toLong),
      s"every stratum contributes exactly ceil(0.17*100)=17, got $per")
    val again = Sampling.stratifiedSample(df, "doc_id", Seq("lang"), 0.17)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }
}
