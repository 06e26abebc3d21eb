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

  test("hashSplit: a trailing zero-fraction split gets nothing, not ~94%") {
    // cumulative fraction 1.0 at an intermediate cutoff: the old
    // lexicographic hex comparison rendered it "10000" (5 chars), which
    // sorts BELOW most 4-char buckets and misrouted ~94% of rows into the
    // zero-fraction split
    val out = Sampling.hashSplit(ids, "doc_id", Seq("train" -> 1.0, "unused" -> 0.0))
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.getOrElse("train", 0L) == 2000L, s"all rows train, got $counts")
    // negative fractions are rejected even when they sum to 1
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids, "doc_id", Seq("a" -> 1.2, "b" -> -0.2))
    }
  }

  test("packSequences rejects zero, negative, and NULL token counts loudly") {
    import graft.sample.Packing
    val bad = Seq(("a", 5L), ("b", 0L), ("c", 7L)).toDF("doc_id", "n_tok")
    val e = intercept[Exception] {
      Packing.packSequences(bad, "doc_id", "n_tok", capacity = 8, numBuckets = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("requires positive")), msgs(e).mkString(" | "))
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

  test("stratifiedSample: salted two-level rank equals the single-window selection") {
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 1000L).map(i => (i, if (i % 10 == 0) "rare" else "hot"))
      .toDF("doc_id", "lang")
    // naive formulation: one window per stratum (the hot-stratum-unsafe shape)
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val naive = df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("lang"))))
      .filter(col("__rn") <= ceil(col("__n") * 0.23))
      .select("doc_id", "lang")
    for (digits <- Seq(1, 2)) {
      val salted = Sampling.stratifiedSample(df, "doc_id", Seq("lang"), 0.23, saltDigits = digits)
      assert(salted.except(naive).isEmpty && naive.except(salted).isEmpty,
        s"saltDigits=$digits must select byte-identical rows")
    }
  }

  test("stratifiedSample: NULL stratum is a real stratum and samples like any other") {
    val df = (0L until 400L)
      .map(i => (i, if (i % 4 == 0) null else "en"))
      .toDF("doc_id", "lang")
    val out = Sampling.stratifiedSample(df, "doc_id", Seq("lang"), 0.5)
    val per = out.groupBy("lang").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(per(None) == 50L, s"NULL stratum: ceil(0.5*100)=50, got $per")
    assert(per(Some("en")) == 150L)
  }

  test("packSequences: layout invariants and cross-check vs single-stream cumsum") {
    val docs = (0L until 400L).map(i => (i, 1L + i % 97)).toDF("doc_id", "n_tok")
    val packed = sample.Packing.packSequences(docs, "doc_id", "n_tok",
      capacity = 128L, numBuckets = 8)
    val rows = packed.as[(Long, Long, Int, Long, Long, Long)].collect()
    assert(rows.length == 400)
    assert(rows.forall { case (_, n, _, f, l, off) =>
      off >= 0 && off < 128 && f <= l && l == (off + n - 1 + f * 128) / 128
    }, "offset within capacity; chunk span consistent with token count")
    // per bucket, documents tile the token stream with no gaps or overlaps
    val byBucket = rows.groupBy(_._3)
    byBucket.foreach { case (b, ds) =>
      val total = ds.map(_._2).sum
      val lastEnd = ds.map { case (_, n, _, f, _, off) => f * 128 + off + n }.max
      assert(lastEnd == total, s"bucket $b stream must be gap-free")
    }
    // equals a directly computed cumsum over the same (md5, id) order
    import org.apache.spark.sql.expressions.Window
    val key = md5(col("doc_id").cast("string"))
    val bucket = pmod(conv(substring(key, 1, 8), 16, 10).cast("long"), lit(8)).cast("int")
    val direct = docs.select(col("doc_id"), col("n_tok"), key.as("k"), bucket.as("b"))
      .withColumn("cum", sum(col("n_tok")).over(
        Window.partitionBy(col("b")).orderBy(col("k"), col("doc_id"))))
      .select(col("doc_id"), ((col("cum") - col("n_tok")) % 128).as("off"))
    val got = packed.select(col("doc_id"), col("pack_offset").as("off"))
    assert(got.except(direct).isEmpty && direct.except(got).isEmpty)
  }

  test("reweight: exact integral epochs, proportional fractional part, drop at 0") {
    val docs = (0L until 2000L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val out = Sampling.reweight(docs, "doc_id", "source",
      Map("src0" -> 3.0, "src1" -> 2.25, "src2" -> 0.0), default = 1.0)
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts("src0") == 1500L, s"integral 3.0 → exactly 3 copies each, got $counts")
    assert(counts.getOrElse("src2", 0L) == 0L, "weight 0 drops the stratum")
    assert(counts("src3") == 500L, "unlisted stratum takes the default 1.0")
    // 2.25 → between 2× and 3× per id, ~2.25× overall
    assert(counts("src1") >= 1000L && counts("src1") <= 1500L)
    assert(math.abs(counts("src1") - 1125L) < 80, s"~2.25×500, got ${counts("src1")}")
    // per id: copy_idx is contiguous from 0 (a trainer can epoch-split on it)
    val perId = out.filter(col("source") === "src1")
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max("copy_idx").as("mx"))
      .as[(Long, Long, Int)].collect()
    assert(perId.forall { case (_, n, mx) => mx == n - 1 && (n == 2 || n == 3) })
    // deterministic under rerun
    val again = Sampling.reweight(docs, "doc_id", "source",
      Map("src0" -> 3.0, "src1" -> 2.25, "src2" -> 0.0), default = 1.0)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
    // zero-shuffle narrow plan — the 100 TB contract
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "reweight must not shuffle")
  }

  test("reweight: NULL ids resolve like SQL (fractional copy dropped), sub-granularity weights loud") {
    val docs = Seq((Some(1L), "a"), (Some(2L), "a"), (None, "a"), (None, "a"))
      .toDF("doc_id", "source")
    val out = Sampling.reweight(docs, "doc_id", "source", Map("a" -> 2.5))
    // NULL id: md5 key is NULL, bucket < cutoff is NULL → exactly the
    // integral 2 copies, same as an engine evaluating NULL || ':' || c
    val nullCounts = out.filter(col("doc_id").isNull).count()
    assert(nullCounts == 4L, s"2 NULL-id rows × floor(2.5) copies, got $nullCounts")
    // a fractional part below the 2⁻³² bucket granularity is rejected,
    // not silently truncated; 1e-6-grade fractions (old 4-hex limit was
    // ~1.5e-5) are now in range
    intercept[IllegalArgumentException] {
      Sampling.reweight(docs, "doc_id", "source", Map("a" -> (1.0 + 1e-10)))
    }
    Sampling.reweight(docs, "doc_id", "source", Map("a" -> 1.000001))
  }

  test("hashSample supports 1e-6-grade fractions (2^32 bucket space)") {
    // below the old 1/65536 granularity — used to be a hard require
    val big = (0L until 200000L).toDF("doc_id")
    val out = Sampling.hashSample(big, "doc_id", 2e-5).count()
    // λ = 4 expected; deterministic, just pin a sane band
    assert(out >= 1 && out <= 20, s"2e-5 of 200k rows gave $out")
    // still loud below the new granularity
    intercept[IllegalArgumentException] {
      Sampling.hashSample(big, "doc_id", 1e-10)
    }
  }

  test("packSequences: duplicate-id rows still tile the bucket stream gap-free") {
    val docs = Seq((7L, 100L), (7L, 100L), (9L, 50L)).toDF("doc_id", "n_tok")
    val packed = sample.Packing.packSequences(docs, "doc_id", "n_tok",
      capacity = 128L, numBuckets = 1)
    val rows = packed.as[(Long, Long, Int, Long, Long, Long)].collect()
    assert(rows.length == 3)
    // under the default RANGE frame the two id-7 peers would each absorb
    // the other's tokens (__cum = 200 for both) and overlap; under ROWS
    // the stream is a gap-free tiling of 250 tokens
    val total = rows.map(_._2).sum
    val starts = rows.map { case (_, n, _, f, _, off) => f * 128 + off }.sorted
    val ends = rows.map { case (_, n, _, f, _, off) => f * 128 + off + n }.sorted
    assert(starts.head == 0 && ends.last == total &&
      starts.tail.sameElements(ends.init),
      s"stream must tile [0, $total) without gaps or overlaps: ${rows.mkString(";")}")
  }

  test("shuffled: total deterministic order via range-partitioned sort") {
    val docs = (0L until 5000L).toDF("doc_id").repartition(8)
    val out = Sampling.shuffled(docs, "doc_id", seed = 42L)
    val keys = out.select("shuffle_key").as[String].collect()
    assert(keys.length == 5000 && keys.sameElements(keys.sorted),
      "collected order must follow the shuffle key")
    // a different seed is a different permutation; the same seed is identical
    val same = Sampling.shuffled(docs, "doc_id", seed = 42L)
      .select("doc_id").as[Long].collect()
    val other = Sampling.shuffled(docs, "doc_id", seed = 7L)
      .select("doc_id").as[Long].collect()
    assert(same.sameElements(out.select("doc_id").as[Long].collect()))
    assert(!other.sameElements(same) && other.sorted.sameElements(same.sorted))
    // the plan is a range-partitioned sort (scale path), not a
    // single-partition window or coalesce
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"expected range sort, got:\n$plan")
  }
}
