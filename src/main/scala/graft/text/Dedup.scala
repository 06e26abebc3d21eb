package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication pack for training-data pipelines: exact
  * (hash-groupBy), word-n-gram Jaccard (inverted-index join), MinHash+LSH
  * (shingle → minhash → band → bucket-join → exact verify), and SimHash
  * (bit-sign signatures + banded Hamming join).
  *
  * The reference has no dedup operators (its dedup is row-version dedup,
  * SURVEY §2.3 J4/J5); these are the corpus-level operators a
  * transcript/document training pipeline needs at 100 TB. All are pure
  * Catalyst column programs — no UDFs, no driver-side loops; every stage is
  * a shuffle on a well-distributed key (shingle hash, band signature,
  * doc-id pair).
  */
object Dedup {

  /** Distinct word-level n-gram shingles per document: (id, shingle).
    * Word-level (not char-level) keeps the inverted index selective —
    * char-3-grams of natural text collide on nearly every pair.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int,
               distinct: Boolean = true): DataFrame = {
    val toks = split(col(textCol), " ")
    val sh = df.select(
      col(idCol),
      explode(
        when(size(toks) >= n,
          transform(sequence(lit(0), size(toks) - n),
            i => array_join(slice(toks, i + 1, lit(n)), " ")))
          .otherwise(array(array_join(toks, " ")))).as("shingle"))
    // distinct = a full shuffle of every shingle; callers that filter the
    // stream first (e.g. Decontaminate's broadcast semi-join) dedup later,
    // on the much smaller surviving set
    if (distinct) sh.distinct() else sh
  }

  /** Exact duplicates via content hash: (doc_id, canonical_id, content_hash)
    * for every member of a duplicate group (group size > 1); canonical = min
    * id. One shuffle on the hash.
    */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // NULL text is missing content, not shared content — grouping NULL
    // hashes would report unrelated empty docs as duplicates of each other
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), md5(col(textCol)).as("content_hash"))
      .withColumn("canonical_id",
        min(col(idCol)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))))
      .withColumn("group_size",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))))
      .filter(col("group_size") > 1)
      .select(col(idCol), col("canonical_id"), col("content_hash"))

  /** All pairs (a < b) with word-n-gram Jaccard ≥ threshold, via an
    * inverted-index self-join on shingles (one shuffle on the shingle, one
    * on the pair). Exact — the oracle-comparable baseline the approximate
    * methods are verified against.
    *
    * Scale note: ultra-frequent shingles make the pair explosion
    * quadratic; production runs should cap document frequency
    * (`maxShingleDf`) — kept off by default so the result stays exact.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxShingleDf: Option[Int] = None
  ): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    val shF = maxShingleDf match {
      case Some(cap) =>
        val freq = sh.groupBy("shingle").count().filter(col("count") <= cap)
        sh.join(freq.select("shingle"), "shingle")
      case None => sh
    }
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    pairsFromShared(shF, sizes, idCol, threshold)
  }

  /** Intersection counts of shared shingles → Jaccard filter. */
  private def pairsFromShared(
      sh: DataFrame, sizes: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val a = sh.toDF("a", "shingle")
    val b = sh.toDF("b", "shingle")
    a.join(b, Seq("shingle"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("__inter"))
      .join(sizes.toDF("a", "__na"), "a")
      .join(sizes.toDF("b", "__nb"), "b")
      .withColumn("jaccard",
        round(col("__inter") / (col("__na") + col("__nb") - col("__inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  // MinHash universe: h_i(x) = (a_i * x + b_i) mod P over x = xxhash64(shingle) mod P.
  private val P = 2147483647L // 2^31 − 1 (Mersenne prime)
  private def permParams(numHashes: Int): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(20260816L)
    val as = Seq.fill(numHashes)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val bs = Seq.fill(numHashes)(rnd.nextInt(Int.MaxValue).toLong)
    (as, bs)
  }

  /** Near-duplicate pairs via MinHash + LSH banding, verified exactly.
    *
    * Pipeline (all Catalyst):
    *   1. shingle → `xxhash64` → per-(doc, hashFn) min over `numHashes`
    *      universal-hash permutations (the MinHash signature);
    *   2. signature split into `bands` bands; docs sharing any band bucket
    *      become candidate pairs (bucket-join — the only pairwise step, and
    *      it only touches colliding docs);
    *   3. candidates verified with the exact n-gram Jaccard and filtered to
    *      ≥ threshold.
    *
    * With numHashes=64, bands=16 (rows/band=4) the miss probability of a
    * 0.8-Jaccard pair is (1 − 0.8⁴)¹⁶ ≈ 3·10⁻⁵, so on thresholded output
    * this matches the exact [[ngramJaccardPairs]] with near-certainty —
    * while scaling as O(candidates), not O(n²).
    */
  def minHashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      numHashes: Int = 64,
      bands: Int = 16
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val (as, bs) = permParams(numHashes)

    val sh = shingles(df, idCol, textCol, n)
    // (id, i, v) — i-th permutation value of each shingle; min per (id, i)
    val hv = pmod(xxhash64(col("shingle")), lit(P))
    val perms = sh.select(
      col(idCol),
      explode(transform(sequence(lit(0), lit(numHashes - 1)), i =>
        struct(i.as("i"),
          pmod(element_at(typedLit(as), i + 1) * hv + element_at(typedLit(bs), i + 1),
            lit(P)).as("v")))).as("p"))
      .select(col(idCol), col("p.i").as("i"), col("p.v").as("v"))
    val sig = perms
      .groupBy(col(idCol), col("i"))
      .agg(min(col("v")).as("mh"))
      .withColumn("band", (col("i") / rows).cast("int"))
      .groupBy(col(idCol), col("band"))
      .agg(sort_array(collect_list(struct(col("i"), col("mh")))).as("sig"))
      .select(col(idCol), col("band"), col("sig.mh").as("bandSig"))

    // bucket-join: docs sharing (band, bandSig) are candidates
    val l = sig.toDF("a", "band", "bandSig")
    val r = sig.toDF("b", "band", "bandSig")
    val candidates = l.join(r, Seq("band", "bandSig"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()

    // exact verification of candidates only
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    val aSh = sh.toDF("a", "shingle")
    val bSh = sh.toDF("b", "shingle")
    candidates
      .join(aSh, "a").join(bSh, Seq("b", "shingle"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("__inter"))
      .join(sizes.toDF("a", "__na"), "a")
      .join(sizes.toDF("b", "__nb"), "b")
      .withColumn("jaccard",
        round(col("__inter") / (col("__na") + col("__nb") - col("__inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 64-bit SimHash signature per document: bit k of the signature is the
    * sign of Σ_tokens (±1 by bit k of tokenHash(token)). Output (id, simhash).
    * `tokenHash` defaults to xxhash64 (fastest); pass an md5-derived hash
    * for engine-portable signatures (the oracle-checked driver query does).
    */
  def simHash(df: DataFrame, idCol: String, textCol: String,
              tokenHash: Column => Column = c => xxhash64(c)): DataFrame = {
    val tok = df.select(col(idCol),
      explode(split(col(textCol), " ")).as("t"))
      .withColumn("h", tokenHash(col("t")))
    val bitSums: Seq[Column] = (0 until 64).map { k =>
      sum(when(col("h").bitwiseAND(lit(1L << k)) =!= 0, 1).otherwise(-1)).as(s"b$k")
    }
    val agged = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { k =>
      when(col(s"b$k") > 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    agged.select(col(idCol), sig.as("simhash"))
  }

  /** Connected components over a near-duplicate pair graph: every doc that
    * appears in `pairs` is assigned `cluster_id` = the minimum doc id
    * reachable through the pair relation (so {a–b, b–c} collapses into one
    * cluster labelled min(a,b,c)). Input: (a, b) pair columns from any of
    * the pair generators above; output: (doc_id, cluster_id).
    *
    * Distributed min-label propagation: each round joins the current labels
    * across the edge list and keeps the per-node minimum — two shuffles per
    * round, both on doc-id keys, converging in O(component diameter) rounds.
    * Near-dup clusters are shallow (dups of a common ancestor), so 2–3
    * rounds is typical; `localCheckpoint` truncates the lineage each round
    * so the plan does not grow with iterations, and convergence is detected
    * with a cheap changed-row count. For adversarially chained graphs
    * (diameter ~ n) switch to star-contraction (large-star/small-star,
    * O(log² n) rounds) — not needed for dedup workloads.
    */
  def duplicateClusters(
      pairs: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIterations: Int = 50
  ): DataFrame = {
    // numeric ids propagate as long; anything else (UUID/string doc ids)
    // as string with lexicographic-min canonicals — a blind cast("long")
    // would NULL every string id and the dedup would silently drop nothing
    val castType = pairs.schema(aCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType => "long"
      case _ => "string"
    }
    val edges = pairs.select(col(aCol).cast(castType).as("src"), col(bCol).cast(castType).as("dst"))
      .union(pairs.select(col(bCol).cast(castType).as("src"), col(aCol).cast(castType).as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = edges.groupBy("src")
      .agg(min(col("dst")).as("mn"))
      .select(col("src"), least(col("src"), col("mn")).as("label"))
      .localCheckpoint()

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIterations) {
      // label(v) <- min(label(v), min over neighbors u of label(u))
      val neighborMin = edges
        .join(labels.select(col("src").as("dst"), col("label").as("nl")), "dst")
        .groupBy("src").agg(min(col("nl")).as("nmn"))
      // change indicator computed in the same pass — the convergence count
      // then reads the checkpointed result, no old-vs-new re-join
      val next = labels.join(neighborMin, Seq("src"), "left")
        .select(col("src"),
          least(col("label"), coalesce(col("nmn"), col("label"))).as("label"),
          (coalesce(col("nmn"), col("label")) < col("label")).as("__changed"))
        .localCheckpoint()
      changed = next.filter(col("__changed")).count()
      labels = next.drop("__changed")
      iter += 1
    }
    // non-convergence must be loud: partially propagated labels would keep
    // several "canonical" docs per cluster downstream with no signal
    if (changed > 0)
      throw new IllegalStateException(
        s"duplicateClusters did not converge after $maxIterations rounds " +
          s"($changed labels still changing) — component diameter exceeds the " +
          "budget; raise maxIterations or use star-contraction for chained graphs")
    labels.select(col("src").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Remove near-duplicates, keeping one canonical document per cluster
    * (the cluster's min id). `clusters` is [[duplicateClusters]] output;
    * docs absent from the pair graph are singletons and always survive.
    * One broadcast-or-shuffle anti join.
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, clusters: DataFrame): DataFrame =
    df.join(
      clusters.filter(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Near-duplicate pairs by SimHash Hamming distance ≤ maxHamming, found
    * with a banded join (pigeonhole: ≤ maxHamming differing bits spread over
    * maxHamming+1 chunks leave at least one chunk equal), then verified with
    * `bit_count(a XOR b)`. Recall is exact for any maxHamming < 64.
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   tokenHash: Column => Column = c => xxhash64(c)): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    val sig = simHash(df, idCol, textCol, tokenHash)
    val chunks = maxHamming + 1
    val bounds = (0 to chunks).map(i => i * 64 / chunks)
    val chunkStructs = (0 until chunks).map { c =>
      val start = bounds(c)
      val width = bounds(c + 1) - start
      val mask = if (width >= 64) -1L else (1L << width) - 1
      struct(lit(c).as("c"),
        shiftrightunsigned(col("simhash"), start).bitwiseAND(lit(mask)).as("v"))
    }
    val chunked = sig.select(col(idCol), col("simhash"),
      explode(array(chunkStructs: _*)).as("ch"))
      .select(col(idCol), col("simhash"), col("ch.c").as("c"), col("ch.v").as("v"))
    val l = chunked.toDF("a", "sa", "c", "v")
    val r = chunked.toDF("b", "sb", "c", "v")
    l.join(r, Seq("c", "v"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
