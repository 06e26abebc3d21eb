package graft

import graft.sim.EmbeddingDedup

/** Embedding-cosine near-dup: exact pairs vs a Scala oracle; LSH recall at
  * near-duplicate similarity on a corpus with planted perturbed copies.
  */
class EmbeddingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64

  /** 60 base vectors; every third gets a lightly-perturbed copy (cosine
    * ≈ 0.99 — a planted near-dup); ids 1000+ are the copies.
    */
  private val vectors: Seq[(Long, Array[Float])] = {
    val bases = (0 until 60).map { i =>
      val r = new scala.util.Random(500L + i)
      (i.toLong, Array.fill(dim)(r.nextGaussian().toFloat))
    }
    val dups = bases.filter(_._1 % 3 == 0).map { case (id, v) =>
      val r = new scala.util.Random(9000L + id)
      (1000L + id, v.map(x => x + 0.05f * r.nextGaussian().toFloat))
    }
    bases ++ dups
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private val df = vectors.toDF("id", "vec")

  private def oraclePairs(threshold: Double): Set[(Long, Long)] =
    (for {
      (a, va) <- vectors
      (b, vb) <- vectors
      if a < b && math.rint(cos(va, vb) * 1e6) / 1e6 >= threshold
    } yield (a, b)).toSet

  test("exact cosine pairs match the Scala oracle and find every planted dup") {
    val expect = oraclePairs(0.9)
    val got = EmbeddingDedup.cosinePairs(df, "id", "vec", 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == expect)
    val planted = vectors.map(_._1).filter(id => id % 3 == 0 && id < 1000)
      .map(id => (id, 1000L + id)).toSet
    assert(planted.subsetOf(got), "a planted near-dup was missed")
  }

  test("sim values carry the exact cosine, rounded to 6 places") {
    val byId = vectors.toMap
    EmbeddingDedup.cosinePairs(df, "id", "vec", 0.9)
      .as[(Long, Long, Double)].collect().foreach { case (a, b, s) =>
        assert(math.abs(s - math.rint(cos(byId(a), byId(b)) * 1e6) / 1e6) < 1e-9)
      }
  }

  test("LSH variant: full recall on planted near-dups, few candidate pairs") {
    val expect = oraclePairs(0.9)
    val got = EmbeddingDedup.cosinePairsLsh(df, "id", "vec", 0.9, dim = dim)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // verification makes precision exact; recall at cos≈0.99 should be total
    assert(got.subsetOf(expect))
    assert(got.size.toDouble / expect.size >= 0.99, s"recall ${got.size}/${expect.size}")
  }

  test("lshRecallPairs audit: sampled exact count + recall bound") {
    import org.apache.spark.sql.functions._
    val sample = pmod(col("id"), lit(2)) === 0
    val expectSampled = oraclePairs(0.9)
      .count { case (a, b) => a % 2 == 0 && b % 2 == 0 }
    val row = EmbeddingDedup.lshRecallPairs(df, "id", "vec", 0.9,
      sampleFilter = sample, recallFloor = 0.9, dim = dim).head()
    assert(row.getAs[Long]("n_exact_sampled") == expectSampled.toLong)
    assert(row.getAs[Int]("recall_ok") == 1) // near-dup band: recall ≈ 1
    val impossible = EmbeddingDedup.lshRecallPairs(df, "id", "vec", 0.9,
      sampleFilter = sample, recallFloor = 1.01, dim = dim).head()
    assert(impossible.getAs[Int]("recall_ok") == 0)
    // empty sample ⇒ vacuously met, count 0 — never a crash or a NULL row
    val empty = EmbeddingDedup.lshRecallPairs(df, "id", "vec", 0.9,
      sampleFilter = lit(false), recallFloor = 0.9, dim = dim).head()
    assert(empty.getAs[Long]("n_exact_sampled") == 0L &&
      empty.getAs[Int]("recall_ok") == 1)
  }
}
