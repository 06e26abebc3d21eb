package graft

import org.apache.spark.sql.functions._
import graft.sim.Ann

/** ANN semantics: brute-force top-k vs a Scala oracle; LSH recall and
  * candidate reduction on clustered embeddings.
  */
class AnnSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64
  private val nClusters = 10
  private val perCluster = 30

  /** Deterministic clustered embeddings: center per cluster + small noise. */
  private val vectors: Seq[(Long, Array[Float])] = {
    (0 until nClusters).flatMap { c =>
      val rc = new scala.util.Random(1000L + c)
      val center = Array.fill(dim)(rc.nextGaussian())
      (0 until perCluster).map { j =>
        val rv = new scala.util.Random(c * 1000L + j)
        val v = center.map(x => (x + 0.15 * rv.nextGaussian()).toFloat)
        (c.toLong * perCluster + j, v)
      }
    }
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private val corpus = vectors.toDF("c_id", "c_vec")
  private val queryIds = vectors.map(_._1).filter(_ % 15 == 0)
  private val queries = vectors.filter(v => queryIds.contains(v._1)).toDF("q_id", "q_vec")

  /** Scala brute-force oracle: top-k neighbor ids per query. */
  private val oracleTopK: Map[Long, Seq[Long]] = {
    val byId = vectors.toMap
    queryIds.map { q =>
      q -> vectors.filter(_._1 != q)
        .map { case (id, v) => (id, cos(byId(q), v)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(5).map(_._1)
    }.toMap
  }

  test("brute-force top-k matches the Scala oracle exactly, in rank order") {
    val out = Ann.bruteForceTopK(queries, corpus, k = 5)
      .select("q_id", "c_id", "rank")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(out == oracleTopK)
    // clustered data ⇒ neighbors come from the query's own cluster
    oracleTopK.foreach { case (q, ns) =>
      assert(ns.forall(n => n / perCluster == q / perCluster), s"query $q")
    }
  }

  test("LSH top-k: high recall at a fraction of the comparisons") {
    val lsh = Ann.lshTopK(queries, corpus, k = 5, tables = 8, bits = 8, dim = dim)
      .select("q_id", "c_id")
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = oracleTopK.toSeq.map { case (q, ns) =>
      ns.count(lsh.getOrElse(q, Set.empty)).toDouble / ns.size
    }
    val recall = hits.sum / hits.size
    assert(recall >= 0.8, f"recall@5 = $recall%.2f too low")
  }

  test("lshRecall audit: counts data-derived, bound flips with the floor") {
    val row = Ann.lshRecall(queries, corpus, k = 5, sampledQueries = queries,
      recallFloor = 0.8, tables = 8, bits = 8, dim = dim).head()
    assert(row.getAs[Long]("n_queries") == queryIds.size.toLong)
    assert(row.getAs[Long]("n_sampled") == queryIds.size.toLong)
    assert(row.getAs[Int]("recall_ok") == 1) // clustered data: recall ≥ 0.8
    val impossible = Ann.lshRecall(queries, corpus, k = 5,
      sampledQueries = queries, recallFloor = 1.01, tables = 8, bits = 8,
      dim = dim).head()
    assert(impossible.getAs[Int]("recall_ok") == 0)
  }

  test("IVF with nprobe = nlist is exactly brute force") {
    val out = Ann.ivfTopK(queries, corpus, k = 5, nlist = 8, nprobe = 8)
      .select("q_id", "c_id", "rank")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(out == oracleTopK)
  }

  test("IVF top-k: high recall probing a fraction of the cells") {
    val ivf = Ann.ivfTopK(queries, corpus, k = 5, nlist = 10, nprobe = 3)
      .select("q_id", "c_id")
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = oracleTopK.toSeq.map { case (q, ns) =>
      ns.count(ivf.getOrElse(q, Set.empty)).toDouble / ns.size
    }
    val recall = hits.sum / hits.size
    assert(recall >= 0.9, f"recall@5 = $recall%.2f too low")
  }

  test("IVF at large nlist (broadcast-centroid argmin): exact at nprobe = nlist") {
    // 64 cells over 300 vectors: the broadcast-DataFrame assignment path
    // must stay byte-equal to brute force when every cell is probed —
    // this is the plan-size regression guard for real nlist (≥ 4096),
    // where a literal-array argmin would blow up codegen.
    val out = Ann.ivfTopK(queries, corpus, k = 5, nlist = 64, nprobe = 64, lloydIters = 1)
      .select("q_id", "c_id", "rank")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(out == oracleTopK)
  }

  test("IVF at large nlist: useful recall probing a quarter of the cells") {
    val ivf = Ann.ivfTopK(queries, corpus, k = 5, nlist = 64, nprobe = 16, lloydIters = 1)
      .select("q_id", "c_id")
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = oracleTopK.toSeq.map { case (q, ns) =>
      ns.count(ivf.getOrElse(q, Set.empty)).toDouble / ns.size
    }
    val recall = hits.sum / hits.size
    assert(recall >= 0.6, f"recall@5 = $recall%.2f too low")
  }

  test("zero-norm vectors never rank, never pair, and never NaN-poison results") {
    val c = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (99L, Array(0.0f, 0.0f)) // zero embedding (e.g. empty document)
    ).toDF("c_id", "c_vec")
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("q_id", "q_vec")
    val top = Ann.bruteForceTopK(q, c, k = 5)
      .select("c_id").as[Long].collect().toSet
    assert(top == Set(2L), s"zero vector must not appear as a neighbor: $top")
    val pairs = graft.sim.EmbeddingDedup.cosinePairs(
      c.toDF("vec_id", "embedding"), "vec_id", "embedding", threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"zero vector must not pair: $pairs")
  }

  test("IVF degrades gracefully on NULL vectors and NULL elements") {
    // a NULL c_vec (or a vector with a NULL element) previously NPE'd the
    // driver-side centroid math; it must be excluded like a zero-norm
    // vector, with the real neighbors unaffected
    val c = Seq(
      (1L, Seq[java.lang.Double](1.0, 0.0)), (2L, Seq[java.lang.Double](0.9, 0.1)),
      (3L, Seq[java.lang.Double](0.8, 0.2)),
      (97L, null.asInstanceOf[Seq[java.lang.Double]]),
      (98L, Seq[java.lang.Double](1.0, null))
    ).toDF("c_id", "c_vec")
    val q = Seq((1L, Seq(1.0, 0.0))).toDF("q_id", "q_vec")
    val top = Ann.ivfTopK(q, c, k = 5, nlist = 2, nprobe = 2)
      .select("c_id").as[Long].collect().toSet
    assert(top == Set(2L, 3L), s"null vectors must be excluded, got $top")
  }

  test("declared dim mismatch fails loudly instead of degenerating LSH") {
    val c = Seq((1L, Array.fill(8)(0.5f))).toDF("c_id", "c_vec")
    val q = Seq((2L, Array.fill(8)(0.5f))).toDF("q_id", "q_vec")
    val e = intercept[IllegalArgumentException] {
      Ann.lshTopK(q, c, k = 1, dim = 64)
    }
    assert(e.getMessage.contains("dim"))
    // the QUERY side degenerates just as silently (all-zero buckets,
    // empty result set) — it must be validated too
    val c8 = Seq((1L, Array.fill(8)(0.5f))).toDF("c_id", "c_vec")
    val q16 = Seq((2L, Array.fill(16)(0.5f))).toDF("q_id", "q_vec")
    val eq = intercept[IllegalArgumentException] {
      Ann.lshTopK(q16, c8, k = 1, dim = 8)
    }
    assert(eq.getMessage.contains("dim"))
  }

  test("query/corpus dimension disagreement fails loudly on the dim-less paths") {
    val c = Seq((1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(0.25f))).toDF("c_id", "c_vec")
    val q = Seq((9L, Array.fill(16)(0.5f))).toDF("q_id", "q_vec")
    val eb = intercept[IllegalArgumentException] { Ann.bruteForceTopK(q, c, k = 1) }
    assert(eb.getMessage.contains("length"))
    val ei = intercept[IllegalArgumentException] { Ann.ivfTopK(q, c, k = 1, nlist = 2) }
    assert(ei.getMessage.contains("length"))
  }

  test("cosine expression matches the Scala computation") {
    val pairs = queries.limit(2).crossJoin(corpus.limit(3))
    val got = pairs.select(col("q_id"), col("c_id"),
      Ann.cosine(col("q_vec").cast("array<double>"), col("c_vec").cast("array<double>")).as("sim"))
      .as[(Long, Long, Double)].collect()
    val byId = vectors.toMap
    got.foreach { case (q, c, s) =>
      assert(math.abs(s - cos(byId(q), byId(c))) < 1e-12, s"($q,$c)")
    }
  }
}
