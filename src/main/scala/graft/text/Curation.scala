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
}
