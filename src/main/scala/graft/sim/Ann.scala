package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`): exact
  * brute-force cosine top-k as the baseline, and a random-hyperplane-LSH
  * bucketed variant as the scale path (compares only bucket-colliding
  * pairs).
  *
  * All vector math is Catalyst higher-order functions (`zip_with` +
  * `aggregate`) over `array<double>` — codegen'd, no UDFs, left-to-right
  * summation so results are reproducible across engines.
  */
object Ann {

  /** Σ aᵢ·bᵢ as a sequential left fold (deterministic order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    *
    * `queries` and `corpus` are (id, vec) frames; self-pairs (same id) are
    * excluded. The query side is broadcast (queries ≪ corpus is the ANN
    * shape); the corpus is scanned exactly once, and the per-query top-k
    * runs as window row_number over (sim desc, id asc) — deterministic
    * ties.
    *
    * Scale: O(|Q|·|C|) compute but only one corpus scan and one shuffle of
    * |Q|·|C| slim rows (ids + sim, never the vectors). For corpus sizes
    * where that is too much, use [[lshTopK]].
    */
  def bruteForceTopK(
      queries: DataFrame, // (q_id, q_vec)
      corpus: DataFrame, // (c_id, c_vec)
      k: Int
  ): DataFrame = {
    val q = broadcast(queries.select(
      col("q_id"), col("q_vec").cast("array<double>").as("q_vec"),
      norm(col("q_vec").cast("array<double>")).as("__qn")))
    val c = corpus.select(
      col("c_id"), col("c_vec").cast("array<double>").as("c_vec"),
      norm(col("c_vec").cast("array<double>")).as("__cn"))
    val scored = c.join(q, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_vec"), col("c_vec")) / (col("__qn") * col("__cn"))).as("sim"))
    topK(scored, k)
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("rank"), round(col("sim"), 6).as("sim"))
  }

  /** Deterministic random hyperplanes: `tables` tables × `bits` planes,
    * each a `dim`-vector of ±1 components seeded from (table, bit, dim).
    * ±1 planes keep the dot inside integer-ish arithmetic and work as well
    * as Gaussian planes for sign-LSH.
    */
  private[sim] def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long): Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(tables, bits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Bucket signature of `vec` in table `t`: bit b = sign(vec · plane_b). */
  private def bucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, b) =>
      when(dot(vec, typedLit(p)) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))

  /** Approximate top-k cosine neighbors via sign-LSH: vectors that share a
    * bucket in ANY of the `tables` hash tables become candidates; exact
    * cosine ranks the candidates. Misses are possible (recall measured in
    * AnnSpec); compute drops from O(|Q|·|C|) to O(colliding pairs).
    */
  def lshTopK(
      queries: DataFrame, // (q_id, q_vec)
      corpus: DataFrame, // (c_id, c_vec)
      k: Int,
      tables: Int = 8,
      bits: Int = 8,
      dim: Int = 64,
      seed: Long = 20260816L
  ): DataFrame = {
    val hp = hyperplanes(tables, bits, dim, seed)
    def withBuckets(df: DataFrame, idC: String, vecC: String): DataFrame = {
      val v = col(vecC).cast("array<double>")
      val bucketStructs = hp.zipWithIndex.map { case (planes, t) =>
        struct(lit(t).as("t"), bucket(v, planes).as("b"))
      }
      df.select(col(idC), v.as(vecC), explode(array(bucketStructs: _*)).as("tb"))
        .select(col(idC), col(vecC), col("tb.t").as("t"), col("tb.b").as("b"))
    }
    val qb = withBuckets(queries, "q_id", "q_vec")
    val cb = withBuckets(corpus, "c_id", "c_vec")
    val cand = qb.join(cb, Seq("t", "b"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("q_vec"), col("c_id"), col("c_vec"))
      .dropDuplicates("q_id", "c_id")
    val scored = cand.select(col("q_id"), col("c_id"),
      cosine(col("q_vec"), col("c_vec")).as("sim"))
    topK(scored, k)
  }
}
