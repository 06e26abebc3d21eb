package graft

import org.apache.spark.sql.functions._
import graft.sim.{Ann, Quantize}

/** Scalar quantization semantics: code range, reconstruction error bound,
  * constant-dimension handling, and search recall on dequantized vectors.
  */
class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 16
  private def vecs(n: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      // clustered so near neighbors exist: base pattern + small jitter
      val base = i % 7
      (i.toLong, Array.tabulate(dim)(d =>
        (math.sin(base * 31 + d) + rnd.nextGaussian() * 0.05).toFloat))
    }
  }

  test("codes are in [0,255], deterministic, and reconstruction error is bounded") {
    val df = vecs(300, 1L).toDF("vec_id", "embedding")
    val codes = Quantize.quantize(df, "vec_id", "embedding", dim)
    val rows = codes.select(col("vec_id"), col("codes")).as[(Long, Seq[Int])].collect()
    assert(rows.length == 300 && rows.forall(_._2.forall(c => c >= 0 && c <= 255)))
    val again = Quantize.quantize(df, "vec_id", "embedding", dim)
    assert(codes.except(again).isEmpty && again.except(codes).isEmpty)

    // reconstruction: |x - xhat| <= half a quantization step per dimension
    val cb = Quantize.codebook(df, "embedding", dim)
    val (mn, mx) = cb.as[(Seq[Double], Seq[Double])].head()
    val orig = df.as[(Long, Seq[Float])].collect().toMap
    val deq = Quantize.dequantize(codes, "vec_id", cb, dim)
      .as[(Long, Seq[Double])].collect()
    deq.foreach { case (id, xhat) =>
      xhat.zipWithIndex.foreach { case (v, d) =>
        val step = (mx(d) - mn(d)) / 255.0
        assert(math.abs(v - orig(id)(d)) <= step / 2 + 1e-9,
          s"id=$id dim=$d err ${math.abs(v - orig(id)(d))} > step/2 ${step / 2}")
      }
    }
  }

  test("constant dimension quantizes to code 0 and reconstructs exactly") {
    val df = Seq((1L, Array(2.5f, 1.0f)), (2L, Array(2.5f, 3.0f))).toDF("vec_id", "embedding")
    val cb = Quantize.codebook(df, "embedding", 2)
    val codes = Quantize.quantize(df, "vec_id", "embedding", 2, Some(cb))
    assert(codes.select(element_at(col("codes"), 1)).as[Int].collect().toSet == Set(0))
    val deq = Quantize.dequantize(codes, "vec_id", cb, 2).as[(Long, Seq[Double])].collect()
    assert(deq.forall { case (_, v) => math.abs(v.head - 2.5) < 1e-6 })
  }

  test("quantizedTopK recall@5 >= 0.9 vs full-precision brute force") {
    val all = vecs(250, 7L).toDF("vec_id", "embedding")
    val q = all.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val c = all.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val exact = Ann.bruteForceTopK(q, c, k = 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val approx = Quantize.quantizedTopK(q, c, k = 5, dim)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }
}
