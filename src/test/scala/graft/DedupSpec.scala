package graft

import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextAnalysis}

/** Dedup + text-analysis semantics on handmade fixtures with known
  * duplicate structure, cross-checked against a brute-force Scala oracle.
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm mat near the door"
  private val nearDup = // one word changed → high but < 1.0 jaccard
    "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm rug near the door"
  private val docs = Seq(
    (0L, base),
    (1L, base), // exact dup of 0
    (2L, nearDup), // near dup of 0/1
    (3L, "completely different content about spark shuffles and partition pruning at scale"),
    (4L, "yet another unrelated document mentioning catalyst expressions and codegen stages"),
    (5L, base) // second exact dup of 0
  ).toDF("doc_id", "text")

  /** Brute-force word-n-gram jaccard. */
  private def jaccard(a: String, b: String, n: Int): Double = {
    def sh(s: String) = s.split(" ").sliding(n).map(_.mkString(" ")).toSet
    val (x, y) = (sh(a), sh(b))
    x.intersect(y).size.toDouble / x.union(y).size
  }

  test("exact dedup finds the identical group with min-id canonical") {
    val out = Dedup.exactDuplicates(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 5L))
    assert(out.forall(_.getLong(1) == 0L), "canonical must be min doc_id")
  }

  test("ngram jaccard pairs match the brute-force oracle") {
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // expected: all pairs among {0,1,5} (j=1.0) and each with 2 (j≈…)
    val expected = (for {
      a <- 0L to 5L; b <- (a + 1) to 5L
      j = jaccard(docs.collect()(a.toInt).getString(1), docs.collect()(b.toInt).getString(1), 3)
      if j >= 0.5
    } yield (a, b) -> (math.round(j * 1e6) / 1e6)).toMap
    assert(out.keySet == expected.keySet, s"got ${out.keySet} want ${expected.keySet}")
    out.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-6, s"$k") }
    assert(out.contains((0L, 2L)) && out((0L, 2L)) < 1.0, "near-dup must be found, < 1.0")
  }

  test("minhash LSH pairs equal the exact pairs at threshold") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 0.5)
    assert(lsh.except(exact).isEmpty && exact.except(lsh).isEmpty,
      "LSH+verify must reproduce the exact pair set on near-dup data")
  }

  test("simhash: exact dups at distance 0; near dup closer than unrelated") {
    val sig = Dedup.simHash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sig(a) ^ sig(b))
    assert(ham(0L, 1L) == 0 && ham(0L, 5L) == 0, "exact dups: hamming 0")
    assert(ham(0L, 2L) < ham(0L, 3L) && ham(0L, 2L) < ham(0L, 4L),
      s"near dup (${ham(0L, 2L)}) must be closer than unrelated (${ham(0L, 3L)}, ${ham(0L, 4L)})")
    // banded pair join at the near-dup's distance finds it and the exact dups
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = ham(0L, 2L))
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(Set((0L, 1L), (0L, 5L), (1L, 5L), (0L, 2L)).subsetOf(pairs))
    assert(!pairs.contains((3L, 4L)), "unrelated docs must not match")
  }

  test("duplicate clusters: transitive closure with min-id labels") {
    // chain graph {1-2, 2-3} plus isolated pair {7-9}: two clusters
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a", "b")
    val out = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L),
      s"chain must collapse transitively, got $out")
  }

  test("duplicate clusters converge on a long chain (diameter >> 1)") {
    // diameter 64 with a 20-round budget: plain min-label propagation needs
    // ~64 rounds and would throw, so passing PROVES the pointer-doubling
    // step compresses paths (O(log diameter) rounds)
    val chain = (0L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    val out = Dedup.duplicateClusters(chain, maxIterations = 20)
      .as[(Long, Long)].collect()
    assert(out.length == 65 && out.forall(_._2 == 0L))
  }

  test("maxShingleDf: jaccard is computed on the capped shingle universe") {
    val boiler = "subscribe to our newsletter for updates every single day"
    val d = Seq(
      (0L, s"alpha beta gamma delta epsilon zeta $boiler"),
      (1L, s"alpha beta gamma delta epsilon zeta $boiler"), // identical to 0
      (2L, s"one two three four five six seven $boiler"),
      (3L, s"eight nine ten eleven twelve thirteen $boiler"),
      (4L, s"fourteen fifteen sixteen seventeen eighteen nineteen $boiler")
    ).toDF("doc_id", "text")
    val n = 3
    val cap = 3
    // brute-force capped oracle: drop shingles with doc frequency > cap from
    // EVERY doc's set, then plain jaccard on what survives
    val texts = Seq(0, 1, 2, 3, 4).map { i =>
      i.toLong -> d.filter(col("doc_id") === i).head().getString(1)
        .split(" ").sliding(n).map(_.mkString(" ")).toSet
    }.toMap
    val docFreq = texts.values.flatten.toSeq.groupBy(identity).view.mapValues(_.size)
    val capped = texts.view.mapValues(_.filter(s => docFreq(s) <= cap)).toMap
    val expected = (for {
      a <- texts.keys; b <- texts.keys if a < b
      inter = capped(a).intersect(capped(b)).size
      if inter > 0
      j = inter.toDouble / (capped(a).size + capped(b).size - inter)
      if j >= 0.3
    } yield (a, b, math.rint(j * 1e6) / 1e6)).toSet

    val out = Dedup.ngramJaccardPairs(d, "doc_id", "text", n,
        threshold = 0.3, maxShingleDf = Some(cap))
      .as[(Long, Long, Double)].collect().toSet
    assert(out == expected, s"got $out, expected $expected")
    // the boilerplate shingles (df=5 > cap) are gone from numerator AND
    // denominator: the identical pair still scores 1.0, while docs sharing
    // ONLY boilerplate produce no pair at all
    assert(out.contains((0L, 1L, 1.0)))
    assert(!out.exists { case (a, b, _) => Set(a, b) == Set(2L, 3L) })
    // sanity: without the cap the boilerplate-only pairs DO cross 0.3
    val uncapped = Dedup.ngramJaccardPairs(d, "doc_id", "text", n, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(uncapped.exists { case (a, b, _) => Set(a, b) == Set(2L, 3L) })
  }

  test("dropNearDuplicates keeps one canonical doc per cluster + singletons") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val clusters = Dedup.duplicateClusters(pairs)
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", clusters)
      .select("doc_id").as[Long].collect().toSet
    // {0,1,2,5} cluster → keep 0; 3 and 4 are singletons
    assert(kept == Set(0L, 3L, 4L))
  }

  test("NULL text is missing content, never an exact-duplicate group") {
    val docs = Seq((1L, "same words"), (2L, "same words"),
      (3L, null), (4L, null)).toDF("doc_id", "text")
    val out = Dedup.exactDuplicates(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L), "NULL-text docs must not group together")
  }

  test("duplicate clusters work with string doc ids (lexicographic-min canonical)") {
    val pairs = Seq(("doc-b", "doc-a"), ("doc-b", "doc-c")).toDF("a", "b")
    val out = Dedup.duplicateClusters(pairs)
      .as[(String, String)].collect().toMap
    assert(out == Map("doc-a" -> "doc-a", "doc-b" -> "doc-a", "doc-c" -> "doc-a"),
      s"string ids must propagate, got $out")
  }

  test("language id picks the marker language; und when no markers") {
    val multi = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "le chat et la maison et le chien"),
      (3L, "der hund und die katze und der baum"),
      (4L, "el perro y los gatos y el sol"),
      (5L, "这是一个测试了"),
      (6L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val out = TextAnalysis.languageId(multi, "doc_id", "text")
      .as[(Long, String, Int)].collect().map(r => r._1 -> r._2).toMap
    assert(out == Map(1L -> "en", 2L -> "fr", 3L -> "de", 4L -> "es", 5L -> "zh", 6L -> "und"))
  }

  test("token counts and fingerprint invariants") {
    val t = Seq((1L, "Hello, world! 42 times"), (2L, "hello world 42 times"),
      (3L, "HELLO,   world!! 42 times")).toDF("doc_id", "text")
    val tc = TextAnalysis.tokenCounts(t, "doc_id", "text")
      .as[(Long, Int, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(tc(1L) == ((4, 6, 22))) // ws: 4; bpe: Hello , world ! 42 times
    val fp = TextAnalysis.fingerprint(t, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(fp(1L) == fp(2L) && fp(2L) == fp(3L),
      "fingerprint must be invariant to case/punct/extra spaces")
  }

  test("exact dedup hashes with sha-256; short docs stay out of topNgrams") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "ok"),
      (4L, "the quick brown fox"), (5L, "the quick brown fox")
    ).toDF("doc_id", "text")
    val dup = Dedup.exactDuplicates(docs, "doc_id", "text")
    // 64 hex chars = sha-256, not the collision-constructible 32-char md5
    assert(dup.select("content_hash").as[String].collect()
      .forall(h => h.length == 64 && h.matches("[0-9a-f]+")))
    // padShort=false: the 1-word doc "ok" is not a 3-gram and must not
    // enter the frequency profile; true 3-grams still count
    val top = graft.text.TextAnalysis.topNgrams(docs, "doc_id", "text", n = 3, k = 10)
      .as[(String, Long)].collect().toMap
    assert(!top.contains("ok") && !top.contains("same text"), top.toString)
    assert(top("the quick brown") == 2L && top("quick brown fox") == 2L)
  }
}
