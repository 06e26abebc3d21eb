package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis pack for training-data pipelines: language-ID (marker-word
  * heuristic), quality scoring (length/punct/stopword ratios), token
  * counting (whitespace + BPE-ish regex), and document fingerprinting
  * (normalized content hash). All pure Catalyst expressions (codegen'd,
  * no UDFs), each a single map-side pass — no shuffle at all.
  */
object TextAnalysis {

  /** Occurrences of `needle` in `text` via the length/replace identity —
    * portable to any SQL engine (the oracle uses the same formula).
    */
  private def occurrences(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit("")))) / needle.length).cast("int")

  /** Marker words per language (public stopword lists, top distinctive
    * function words). Padded with spaces so only whole words count.
    */
  val LanguageMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "fr" -> Seq(" le ", " la ", " et "),
    "de" -> Seq(" der ", " die ", " und "),
    "es" -> Seq(" el ", " los ", " y "),
    "zh" -> Seq("的", "是", "了"))

  /** N-gram/marker language-ID heuristic: score = marker hits per language;
    * prediction = argmax with deterministic alphabetical tie-break
    * ("en" < "es" < ... wins ties via strict `>` scan). Output
    * (id, lang_pred, lang_score).
    */
  /** (lang_pred, lang_score) expression pair over a text column — exposed
    * so pipelines can filter by language inline (zero extra scan/join).
    */
  def languagePrediction(textCol: Column): (Column, Column) = {
    val padded = concat(lit(" "), lower(textCol), lit(" "))
    val scores: Seq[(String, Column)] = LanguageMarkers.map { case (lang, ms) =>
      lang -> ms.map(m => occurrences(padded, m)).reduce(_ + _)
    }
    scores.sortBy(_._1).foldLeft[(Column, Column)]((lit("und"), lit(0))) {
      case ((bl, bs), (lang, s)) => (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    }
  }

  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val best = languagePrediction(col(textCol))
    df.select(col(idCol), best._1.as("lang_pred"), best._2.as("lang_score"))
  }

  /** Token counts: whitespace tokens and BPE-ish subword units (runs of
    * letters, runs of digits, single other non-space chars — the shape a
    * byte-pair pre-tokenizer produces). Output (id, n_ws_tokens,
    * n_bpe_tokens, n_chars).
    */
  /** The BPE-ish pre-tokenizer definition — single source of truth shared
    * by [[tokenCounts]] and [[Curation.trainPrep]] (and mirrored verbatim
    * in the DuckDB oracles).
    */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Token count under [[BpeTokenPattern]]. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenPattern))

  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(split(col(textCol), " +")).as("n_ws_tokens"),
      bpeTokenCount(col(textCol)).as("n_bpe_tokens"),
      length(col(textCol)).as("n_chars"))

  /** Quality score per document: length, punctuation ratio, stopword ratio,
    * mean token length, and a composite quality in [0, 1] (long-enough,
    * low-punct, some stopwords — the classic pretraining-filter features).
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val padded = concat(lit(" "), lower(t), lit(" "))
    val nTok = size(split(t, " +"))
    val nPunct = regexp_count(t, lit("[.,;:!?]"))
    val nStop = Seq(" the ", " a ", " and ", " of ", " to ")
      .map(m => occurrences(padded, m)).reduce(_ + _)
    val punctRatio = round(nPunct / greatest(length(t), lit(1)).cast("double"), 6)
    val stopRatio = round(nStop / greatest(nTok, lit(1)).cast("double"), 6)
    val meanTokLen = round(
      (length(t) - (nTok - 1)) / greatest(nTok, lit(1)).cast("double"), 6)
    val lengthOk = when(length(t).between(50, 10000), 1.0).otherwise(0.0)
    val punctOk = when(punctRatio <= 0.1, 1.0).otherwise(0.0)
    val stopOk = when(stopRatio >= 0.01, 1.0).otherwise(0.0)
    df.select(
      col(idCol),
      length(t).as("n_chars"),
      nTok.as("n_tokens"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"),
      meanTokLen.as("mean_token_len"),
      round((lengthOk + punctOk + stopOk) / 3.0, 6).as("quality"))
  }

  /** Deterministic document fingerprint: md5 of the normalized content
    * (lower-cased, punctuation stripped, whitespace collapsed) — the
    * canonical key for fuzzy-exact dedup across formatting variants.
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      md5(trim(regexp_replace(
        regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""),
        " +", " "))).as("fingerprint"))

  /** Repetition-based quality signals (the Gopher-rule family): per
    * document,
    *   - `dup_word_frac`     — fraction of word occurrences beyond each
    *     word's first (1 − distinct/total),
    *   - `dup_bigram_frac`   — same over word 2-grams,
    *   - `top_bigram_char_frac` — characters covered by the most repeated
    *     2-gram (count × gram length) over total characters.
    *
    * Zero-shuffle: all counting runs in ONE codegen'd pass per document
    * ([[org.apache.spark.sql.graftvec.RepetitionCounts]] — single
    * tokenization, hash-map distinctness, no array sorts or per-element
    * interpreted lambdas), a narrow map that scales embarrassingly. The
    * explode-and-groupBy formulation would shuffle every gram of a 100 TB
    * corpus twice for the same answer; the previous higher-order-function
    * array program kept the zero-shuffle shape but allocated five array
    * copies + an O(n log n) string sort per document. The fractions stay
    * declarative Catalyst arithmetic so division/rounding semantics are
    * digit-identical to the array formulation (oracle hashes unchanged).
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val c = GraftColumnBridge.column(
      org.apache.spark.sql.graftvec.RepetitionCounts(
        GraftColumnBridge.expression(col(textCol))))
    val nW = c.getField("n_words")
    val nB = c.getField("n_bigrams")
    df.select(
      col(idCol),
      nW.as("n_words"),
      round((nW - c.getField("n_words_distinct")) / nW.cast("double"), 6)
        .as("dup_word_frac"),
      round((nB - c.getField("n_bigrams_distinct"))
          / greatest(nB, lit(1L)).cast("double"), 6)
        .as("dup_bigram_frac"),
      round(c.getField("best_mass")
          / greatest(length(col(textCol)), lit(1)).cast("double"), 6)
        .as("top_bigram_char_frac"))
  }

  // ------------------------------------------------------------- redaction
  // PII/URL scrubbing — the standard pretraining corpus-cleaning stage
  // (emails, URLs, bare IPv4s → placeholder tokens). Patterns avoid
  // lookarounds/backreferences so Java regex (Spark) and RE2 (common SQL
  // engines) agree character-for-character; replacement order is URL →
  // email → IP, each counted on the PREVIOUS stage's output so an address
  // inside a URL is never double-counted.

  val UrlPattern = "https?://[^ ]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact URLs, emails, and IPv4 literals from `textCol`. Output
    * (id, clean_text, n_urls, n_emails, n_ips) — counts are per-stage
    * match counts, clean_text has every match replaced by its placeholder.
    * Zero-shuffle narrow map, like the rest of this pack.
    */
  def redact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, UrlPattern, "<URL>")
    val t2 = regexp_replace(t1, EmailPattern, "<EMAIL>")
    val t3 = regexp_replace(t2, Ipv4Pattern, "<IP>")
    df.select(
      col(idCol),
      t3.as("clean_text"),
      regexp_count(t0, lit(UrlPattern)).as("n_urls"),
      regexp_count(t1, lit(EmailPattern)).as("n_emails"),
      regexp_count(t2, lit(Ipv4Pattern)).as("n_ips"))
  }

  /** Corpus n-gram statistics: the `k` word-`n`-grams with the highest
    * document frequency (distinct-docs count), ties broken alphabetically.
    * The frequency profile a pipeline uses for contamination screens and
    * boilerplate detection. One shuffle on the shingle (map-side combine
    * collapses per-partition duplicates); the top-k is a TakeOrdered — no
    * global sort materialized.
    */
  def topNgrams(df: DataFrame, idCol: String, textCol: String,
                n: Int, k: Int): DataFrame =
    // padShort = false: the frequency profile must contain only true
    // n-grams — the dedup paths' whole-text pseudo-shingle for short docs
    // would let bare words dominate a "top 3-grams" list
    Dedup.shingles(df, idCol, textCol, n, padShort = false)
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("shingle").asc)
      .limit(k)
}
