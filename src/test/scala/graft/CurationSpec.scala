package graft

import graft.text.{Curation, TextAnalysis}

/** End-to-end curation semantics: language + length filters compose with
  * near-dedup canonical-keep; top-ngram stats are deterministic.
  */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private val en = "the quick brown fox and the lazy dog of the farm ran over the old wooden bridge"
  private val enDup = "the quick brown fox and the lazy dog of the farm ran over the old stone bridge"
  private val docs = Seq(
    (1L, en),
    (2L, enDup), // near-dup of 1 at 3-gram jaccard ≥ 0.5
    (3L, "le chat et la maison et le chien dans le jardin pres de la riviere longue"),
    (4L, "the cat and the dog"), // en but too short
    (5L, "a completely different english text about the spark engine and the catalyst optimizer stack")
  ).toDF("doc_id", "text")

  test("curate: language filter, length filter, near-dedup keep compose") {
    val kept = Curation.curate(docs, "doc_id", "text",
      lang = "en", minChars = 30, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // 3 is fr, 4 is short, 2 loses to canonical 1
    assert(kept == Set(1L, 5L), s"got $kept")
  }

  test("curate with LSH pair generation gives the same survivors") {
    val exact = Curation.curate(docs, "doc_id", "text", "en", 30, threshold = 0.5)
    val lsh = Curation.curate(docs, "doc_id", "text", "en", 30, threshold = 0.5, useLsh = true)
    assert(exact.select("doc_id").except(lsh.select("doc_id")).isEmpty &&
      lsh.select("doc_id").except(exact.select("doc_id")).isEmpty)
  }

  test("topNgrams: highest doc-frequency shingles, deterministic ties") {
    val out = TextAnalysis.topNgrams(docs, "doc_id", "text", n = 3, k = 3)
      .as[(String, Long)].collect()
    // "the quick brown"/"quick brown fox" etc. appear in docs 1 and 2
    assert(out.length == 3)
    assert(out.head._2 >= out.last._2, "sorted by doc_freq desc")
    assert(out.forall(_._2 >= 1))
    val again = TextAnalysis.topNgrams(docs, "doc_id", "text", n = 3, k = 3)
      .as[(String, Long)].collect()
    assert(out.toSeq == again.toSeq, "deterministic under rerun")
  }
}
