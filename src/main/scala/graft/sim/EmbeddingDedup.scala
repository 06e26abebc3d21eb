package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate detection: all pairs (a < b) with
  * cosine(vec_a, vec_b) ≥ threshold, completing the dedup pack
  * (graft.text.Dedup: exact / n-gram Jaccard / MinHash+LSH / SimHash)
  * with the semantic-similarity method a training-data pipeline uses when
  * byte-level methods miss paraphrases.
  *
  * The reference has no embedding operators; like the rest of the dedup
  * pack these are the corpus-level ops the engine needs at 100 TB. All
  * pure Catalyst (`zip_with`/`aggregate` folds from [[Ann]]) — no UDFs.
  */
object EmbeddingDedup {

  /** Exact cosine-threshold pairs via self-join. O(n²) compute but the
    * oracle-comparable baseline; the dot is identical to
    * [[Ann.bruteForceTopK]]'s (same left-to-right fold, same norm
    * placement) so results agree digit-for-digit with the exact ranker.
    * For corpora where n² is too much, use [[cosinePairsLsh]].
    */
  def cosinePairs(
      df: DataFrame, // (id, vec)
      idCol: String,
      vecCol: String,
      threshold: Double
  ): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val side = df.select(col(idCol), v.as("__v"), Ann.norm(v).as("__n"))
    val a = side.toDF("a", "__va", "__na")
    val b = side.toDF("b", "__vb", "__nb")
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        round(Ann.simExpr(Ann.dot(col("__va"), col("__vb")),
          col("__na"), col("__nb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Near-duplicate pairs via sign-LSH candidate generation + exact
    * verification: vectors sharing a bucket in ANY of `tables` hash tables
    * become candidates (the only pairwise step — and it only touches
    * colliding vectors); exact cosine then filters to ≥ threshold.
    *
    * Bucket-collision probability per table is (1 − θ/π)^bits with
    * θ = arccos(sim), so recall ≈ 1 − (1 − (1 − θ/π)^bits)^tables — for
    * sim ≥ 0.95 at the defaults that is > 0.999; for mid thresholds raise
    * `tables` or lower `bits` (recall measured in EmbeddingDedupSpec).
    * Scale: one scan to bucket, one shuffle on (table, bucket), exact
    * verify on candidates only.
    */
  def cosinePairsLsh(
      df: DataFrame, // (id, vec)
      idCol: String,
      vecCol: String,
      threshold: Double,
      tables: Int = 12,
      bits: Int = 8,
      dim: Int = 64,
      seed: Long = 20260816L
  ): DataFrame = {
    Ann.requireDim(df, vecCol, dim)
    val hp = Ann.hyperplanes(tables, bits, dim, seed)
    // bucketing + norm precompute shared with Ann.lshTopK (one codegen'd
    // SignBuckets expression; see Ann.signBucketed's scaladoc)
    val bucketed = Ann.signBucketed(df, idCol, vecCol, hp)
    val a = bucketed.toDF("a", "__va", "__na", "t", "b")
    val b = bucketed.toDF("b_", "__vb", "__nb", "t", "b")
    // verify BEFORE the candidate dedup: a pair colliding in k tables is
    // scored k times (cheap codegen'd dots), but the dedup shuffle then
    // carries (a, b, sim) instead of two dim-length vectors per candidate
    // — exchange bytes dominate at scale. The threshold filter also runs
    // pre-shuffle, so non-dup candidates (the vast majority) never enter
    // the exchange at all. Duplicates carry identical sims ⇒ byte-identical
    // result.
    a.join(b, Seq("t", "b"))
      .filter(col("a") < col("b_"))
      .select(col("a"), col("b_").as("b"),
        round(Ann.simExpr(Ann.dot(col("__va"), col("__vb")),
          col("__na"), col("__nb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
      .dropDuplicates("a", "b")
  }

  /** Recall audit of [[cosinePairsLsh]] as one DataFrame program: LSH pairs
    * over the full corpus, exact pairs over the `sampleFilter` subset (keep
    * the sample small — the exact side is O(|sample|²)), and one summary
    * row `(n_exact_sampled, recall_ok = sampled recall ≥ floor)` so a
    * correctness harness asserts a recall floor instead of a bare row
    * count. `n_exact_sampled` is oracle-recomputable from the inputs; with
    * zero sampled exact pairs the bound is vacuously met.
    */
  def lshRecallPairs(
      df: DataFrame, // (id, vec)
      idCol: String,
      vecCol: String,
      threshold: Double,
      sampleFilter: org.apache.spark.sql.Column,
      recallFloor: Double,
      tables: Int = 12,
      bits: Int = 8,
      dim: Int = 64,
      seed: Long = 20260816L
  ): DataFrame = {
    val lsh = cosinePairsLsh(df, idCol, vecCol, threshold, tables, bits, dim, seed)
      .select(col("a"), col("b"), lit(1).as("__hit"))
    val exact = cosinePairs(df.filter(sampleFilter), idCol, vecCol, threshold)
      .select(col("a"), col("b"))
    exact.join(lsh, Seq("a", "b"), "left")
      .agg(count(lit(1)).as("n_exact_sampled"),
        coalesce(avg(coalesce(col("__hit"), lit(0))), lit(1.0)).as("__recall"))
      .select(col("n_exact_sampled"),
        (col("__recall") >= recallFloor).cast("int").as("recall_ok"))
  }
}
