package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a pretraining pipeline runs
  * over raw documents before tokenization — language filter, minimum-length
  * filter, then near-duplicate removal keeping one canonical document per
  * cluster.
  *
  * Stage costs: the language + length filters are inline Catalyst
  * predicates on the scan ([[TextAnalysis.languagePrediction]] — no join,
  * no second scan, pushed ahead of everything so the expensive pair
  * generation only sees surviving docs); dedup defaults to
  * [[Dedup.minHashLshPairs]] → [[Dedup.duplicateClusters]] →
  * [[Dedup.dropNearDuplicates]] — the O(candidates) scale path (at 64
  * hashes / 16 bands the 0.8-threshold miss probability is ~3e-5, so it
  * matches the exact generator with near-certainty). Set `useLsh = false`
  * only for oracle-anchoring runs that need the exact O(pairs) generator.
  */
object Curation {

  def curate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lang: String,
      minChars: Int,
      n: Int = 3,
      threshold: Double = 0.8,
      useLsh: Boolean = true
  ): DataFrame = {
    val (langPred, _) = TextAnalysis.languagePrediction(col(textCol))
    val filtered = df.filter(langPred === lang && length(col(textCol)) >= minChars)
    val pairs =
      if (useLsh) Dedup.minHashLshPairs(filtered, idCol, textCol, n, threshold)
      else Dedup.ngramJaccardPairs(filtered, idCol, textCol, n, threshold)
    Dedup.dropNearDuplicates(filtered, idCol, Dedup.duplicateClusters(pairs))
  }

  /** Full training-data preparation, end to end: [[curate]] (language +
    * length filter, near-dedup keep) → source re-weighting
    * ([[graft.sample.Sampling.reweight]] — fractional-epoch mixing) →
    * tokenize → sequence packing ([[graft.sample.Packing.packSequences]]).
    * Output is the pack manifest a trainer consumes: one row per (doc,
    * epoch copy) with its context-window coordinates.
    *
    * Two scale choices baked in: token counting runs once per surviving
    * DOCUMENT, before the copy explode (counting per copy would re-run the
    * tokenizer regex per epoch for nothing), and there is no separate
    * shuffle stage — packing's per-bucket md5(pack_id) order IS the
    * deterministic corpus shuffle, with copies of the same document
    * hashing to independent positions.
    */
  def trainPrep(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      lang: String,
      minChars: Int,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0,
      capacity: Long = 512L,
      numBuckets: Int = 16,
      n: Int = 3,
      threshold: Double = 0.8,
      useLsh: Boolean = true
  ): DataFrame = {
    val kept = curate(df, idCol, textCol, lang, minChars, n, threshold, useLsh)
    val counted = kept.select(
      col(idCol), col(sourceCol),
      TextAnalysis.bpeTokenCount(col(textCol)).cast("long").as("n_tokens"))
      // a doc that tokenizes to nothing (possible only for degenerate
      // whitespace text) has no place in a pack stream — drop it here
      // rather than trip packSequences' positive-count contract
      .filter(col("n_tokens") > 0)
    val weighted = graft.sample.Sampling
      .reweight(counted, idCol, sourceCol, weights, defaultWeight)
      .withColumn("pack_id", concat_ws(":",
        col(idCol).cast("string"), col("copy_idx").cast("string")))
    graft.sample.Packing.packSequences(
      weighted.select(col("pack_id"), col("n_tokens")),
      "pack_id", "n_tokens", capacity, numBuckets)
  }
}
