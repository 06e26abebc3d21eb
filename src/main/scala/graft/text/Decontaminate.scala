package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: remove training documents that share word
  * n-grams with a benchmark/eval corpus — the standard pretraining hygiene
  * step (e.g. 13-gram overlap screens). The reference has no corpus
  * operators; this generalizes its contamination-screen analog (top-ngram
  * document frequency, [[TextAnalysis.topNgrams]]) into an actionable
  * filter.
  *
  * Scale shape: the benchmark side is tiny relative to a 100 TB train
  * corpus, so its distinct shingle set is broadcast (hint applied when
  * `broadcastBench`); the train side is a map-side hash semi-join — no
  * shuffle of the train corpus at all on the broadcast path. The fallback
  * (huge benchmark) is a shuffle keyed on the shingle, which is
  * well-distributed by construction.
  */
object Decontaminate {

  /** (id, n_overlap) for every training doc sharing ≥ `minOverlap` distinct
    * word-`n`-grams with the benchmark corpus.
    */
  def contaminationOverlap(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minOverlap: Int = 1,
      broadcastBench: Boolean = true
  ): DataFrame = {
    require(minOverlap >= 1, "minOverlap must be >= 1")
    // Shingles join by 8-byte xxhash64, not by the raw n-gram string: a
    // 13-gram is ~80 bytes, so hashing shrinks the broadcast set and the
    // train-side join keys ~10×. A hash collision can only ADD a spurious
    // overlap (false-positive contamination) with probability ~|bench|·
    // |train-shingles|/2^64 — negligible, and it errs toward dropping.
    val benchSh0 = Dedup.shingles(bench, idCol, textCol, n)
      .select(xxhash64(col("shingle")).as("__sh")).distinct()
    val benchSh = if (broadcastBench) broadcast(benchSh0) else benchSh0
    // join BEFORE dedup: the broadcast semi-join filters the raw shingle
    // stream map-side, so the train corpus's shingles never shuffle — only
    // the (tiny) matched set is deduped for the per-doc distinct count
    Dedup.shingles(train, idCol, textCol, n, distinct = false)
      .select(col(idCol), xxhash64(col("shingle")).as("__sh"))
      .join(benchSh, Seq("__sh"))
      .distinct()
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Training corpus with contaminated documents removed (anti join against
    * [[contaminationOverlap]]).
    */
  def decontaminate(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 13,
      minOverlap: Int = 1,
      broadcastBench: Boolean = true
  ): DataFrame =
    train.join(
      contaminationOverlap(train, bench, idCol, textCol, n, minOverlap, broadcastBench)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
