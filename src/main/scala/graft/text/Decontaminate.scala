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
    * word-`n`-grams with the benchmark corpus. Benchmark docs SHORTER than
    * `n` words are screened by whole-text containment (see
    * [[shortBenchMatches]]) — without that, a 6-word benchmark question
    * verbatim inside a 1000-word training doc would pass a 13-gram screen,
    * because the short doc's only shingle (its whole text) never equals any
    * 13-gram.
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
    val mainMatches = Dedup.shingles(train, idCol, textCol, n, distinct = false)
      .select(col(idCol), xxhash64(col("shingle")).as("__sh"))
      .join(benchSh, Seq("__sh"))
      .select(col(idCol), col("__sh"))
    overlapCounts(
      shortBenchMatches(train, bench, idCol, textCol, n)
        .map(mainMatches.unionByName(_)).getOrElse(mainMatches),
      idCol, minOverlap)
  }

  private def overlapCounts(matches: DataFrame, idCol: String,
                            minOverlap: Int): DataFrame =
    matches
      .distinct()
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)

  /** Matched (train id, shingle-hash) pairs for benchmark docs shorter
    * than `n` words: their whole (token-rejoined) text against train
    * word-k-grams, generated in ONE extra train pass for exactly the
    * short lengths k present in the benchmark (a tiny driver-side distinct
    * on the benchmark side — small by contract). None when the benchmark
    * has no short docs, which keeps the common case single-pass.
    */
  private def shortBenchMatches(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int
  ): Option[DataFrame] = {
    val btoks = split(col(textCol), " ")
    val isShort = col(textCol).isNotNull && size(btoks) < n && size(btoks) >= 1
    val ks = bench.filter(isShort)
      .select(size(btoks).as("k")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (ks.isEmpty) None
    else {
      // token-rejoined text, same normalization as the k-grams it must equal
      val benchShort = broadcast(bench.filter(isShort)
        .select(xxhash64(array_join(btoks, " ")).as("__sh")).distinct())
      val ttoks = split(col(textCol), " ")
      val gramsPerK = ks.map { k =>
        when(size(ttoks) >= k,
          transform(sequence(lit(0), size(ttoks) - k),
            i => array_join(slice(ttoks, i + 1, lit(k)), " ")))
          .otherwise(typedLit(Seq.empty[String]))
      }
      Some(train.filter(col(textCol).isNotNull)
        .select(col(idCol), explode(flatten(array(gramsPerK: _*))).as("__g"))
        .select(col(idCol), xxhash64(col("__g")).as("__sh"))
        .join(benchShort, Seq("__sh"))
        .select(col(idCol), col("__sh")))
    }
  }

  /** [[contaminationOverlap]] with a broadcast *bloom sketch* prefilter
    * instead of a broadcast of the raw benchmark shingle set — the shape for
    * benchmark corpora too large to broadcast exactly (the sketch is ~9.6
    * bits per distinct shingle at 1% fpp vs 64 bits + hashmap overhead for
    * the exact broadcast side; a 100 M-shingle benchmark suite is ~120 MB
    * of sketch vs multi-GB of broadcast hash relation).
    *
    * Result is byte-identical to [[contaminationOverlap]]: the bloom probe
    * has no false negatives, so every true match survives the prefilter,
    * and the exact verify join removes the false positives. The verify join
    * is a *shuffle* join by design — its train side is only the bloom
    * survivors (true matches + ~fpp of the train shingle stream), so the
    * train corpus itself still never shuffles; only the fpp-bounded
    * candidate set does.
    *
    * `expectedItems < 0` (default) sizes the sketch from an exact count of
    * the distinct benchmark shingles (one extra pass over the *benchmark*
    * side only — small by contract); pass an estimate to skip that pass.
    */
  def contaminationOverlapBloom(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minOverlap: Int = 1,
      fpp: Double = 0.01,
      expectedItems: Long = -1L
  ): DataFrame = {
    require(minOverlap >= 1, "minOverlap must be >= 1")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    // materialize the distinct benchmark shingle set ONCE: it feeds up to
    // three consumers (the sizing count, the bloom build, and the verify
    // join) — without this each re-runs the tokenize + distinct shuffle
    // over the benchmark corpus
    val benchShPlan = Dedup.shingles(bench, idCol, textCol, n)
      .select(xxhash64(col("shingle")).as("__sh")).distinct()
    val policy = graft.CachePolicy.resolve(benchShPlan)
    val benchSh = policy.materialize(benchShPlan)
    val expected =
      if (expectedItems >= 0) math.max(expectedItems, 1L)
      else math.max(benchSh.count(), 1L)
    // one distributed pass over the benchmark shingles; the merged sketch
    // lands on the driver at sketch size (KB–MB), not set size
    val bf = benchSh.stat.bloomFilter("__sh", expected, fpp)
    // both EAGER consumers (sizing count, bloom build) are done — release
    // now rather than leaking session-lifetime blocks under persist-based
    // policies. The lazy verify join below recomputes the (small by
    // contract) benchmark distinct from lineage at action time under
    // `memory_and_disk`; under `local`/`reliable` release is a no-op and
    // the join reads the checkpointed blocks as before.
    policy.release(benchSh)
    val mainMatches = Dedup.shingles(train, idCol, textCol, n, distinct = false)
      .select(col(idCol), xxhash64(col("shingle")).as("__sh"))
      // map-side, codegen'd, zero-shuffle prefilter of the train stream
      .filter(graft.functions.SketchFunctions.bloomMightContainLong(bf, col("__sh")))
      // exact verify: false positives die here, restoring exact-path output
      .join(benchSh, Seq("__sh"))
      .select(col(idCol), col("__sh"))
    // short benchmark docs screen exactly (the short set is a tiny subset
    // of the benchmark — broadcast, no sketch needed), keeping this path
    // byte-identical to contaminationOverlap
    overlapCounts(
      shortBenchMatches(train, bench, idCol, textCol, n)
        .map(mainMatches.unionByName(_)).getOrElse(mainMatches),
      idCol, minOverlap)
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

  /** [[decontaminate]] over the bloom-prefiltered overlap path — identical
    * output (see [[contaminationOverlapBloom]]), benchmark side carried as a
    * sketch instead of a broadcast relation.
    */
  def decontaminateBloom(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 13,
      minOverlap: Int = 1,
      fpp: Double = 0.01,
      expectedItems: Long = -1L
  ): DataFrame =
    train.join(
      contaminationOverlapBloom(train, bench, idCol, textCol, n, minOverlap, fpp, expectedItems)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
