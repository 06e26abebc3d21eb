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

  /** Σ aᵢ·bᵢ — a codegen'd native expression (graft.functions.DotProduct)
    * with the same deterministic left-to-right summation as the former
    * `aggregate`/`zip_with` fold (results digit-for-digit identical; HOFs
    * evaluate interpreted, which dominated the million-dot hot paths).
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dot(a, b)

  def norm(a: Column): Column = graft.functions.VectorFunctions.norm(a)

  /** sim with NULL (not NaN) for zero-norm vectors: Spark orders NaN above
    * every double, so a NaN sim would rank a zero embedding as the top
    * neighbor of every query AND pass `sim >= threshold` filters; NULL
    * sorts last under desc and fails every threshold.
    */
  private[sim] def simExpr(dotC: Column, n1: Column, n2: Column): Column =
    when(n1 === 0.0 || n2 === 0.0, lit(null).cast("double"))
      .otherwise(dotC / (n1 * n2))

  def cosine(a: Column, b: Column): Column = simExpr(dot(a, b), norm(a), norm(b))

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
    requireSameDim(queries, "q_vec", corpus, "c_vec")
    val q = broadcast(queries.select(
      col("q_id"), col("q_vec").cast("array<double>").as("q_vec"),
      norm(col("q_vec").cast("array<double>")).as("__qn")))
    val c = corpus.select(
      col("c_id"), col("c_vec").cast("array<double>").as("c_vec"),
      norm(col("c_vec").cast("array<double>")).as("__cn"))
    val scored = c.join(q, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        simExpr(dot(col("q_vec"), col("c_vec")), col("__qn"), col("__cn")).as("sim"))
    topK(scored, k)
  }

  private[sim] def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id").asc)
    scored
      .filter(col("sim").isNotNull) // zero-norm pairs have no defined cosine
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("rank"), round(col("sim"), 6).as("sim"))
  }

  /** Deterministic random hyperplanes: `tables` tables × `bits` planes,
    * each a `dim`-vector of ±1 components seeded from (table, bit, dim).
    * ±1 planes keep the dot inside integer-ish arithmetic and work as well
    * as Gaussian planes for sign-LSH.
    */
  private[graft] def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long): Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(tables, bits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** A wrong `dim` makes every dot-vs-plane NULL → every bit 0 → every
    * vector in bucket 0: LSH silently degenerates to the all-pairs cross
    * join it exists to avoid. One-row probe, loud failure instead.
    */
  /** Shared sign-LSH bucketing: `(id, __vec, __n, t, b)` — one row per
    * (table, input row), norm computed ONCE per input row (not per
    * candidate collision: cosine() per joined row pays 3 dim-length dots
    * per pair per colliding table), buckets via the single codegen'd
    * [[graft.functions.VectorFunctions.signBuckets]] expression
    * (generated-code size O(1) in tables × bits — composed per-plane dots
    * exceed Janino's 64 KB method limit and de-optimize the stage to
    * interpreted). Used by [[lshTopK]] and
    * [[EmbeddingDedup.cosinePairsLsh]] so the bucket scheme and shuffle
    * payload stay in one place.
    */
  private[sim] def signBucketed(df: DataFrame, idCol: String, vecCol: String,
                                hp: Seq[Seq[Seq[Double]]]): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol), v.as("__vec"), norm(v).as("__n"),
      posexplode(graft.functions.VectorFunctions.signBuckets(v, hp))
        .as(Seq("t", "b")))
  }

  private[sim] def requireDim(df: DataFrame, vecCol: String, dim: Int): Unit =
    // probe a non-NULL row: size(NULL) is NULL and getInt on it would throw
    // an opaque NPE instead of the diagnostic this guard exists to give
    df.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).limit(1).collect().headOption.foreach { r =>
        require(!r.isNullAt(0) && r.getInt(0) == dim,
          s"declared dim=$dim but $vecCol vectors have length " +
            (if (r.isNullAt(0)) "NULL" else r.getInt(0).toString))
      }

  private def vecLen(df: DataFrame, vecCol: String): Option[Int] =
    df.filter(col(vecCol).isNotNull).select(size(col(vecCol))).limit(1)
      .collect().headOption.filterNot(_.isNullAt(0)).map(_.getInt(0))

  /** Dimension agreement between the two sides of an ANN search: a
    * mismatch makes every dot NULL and every result set silently empty —
    * same degeneration [[requireDim]] guards against, but for the paths
    * with no declared `dim` parameter. Two one-row probes.
    */
  private[sim] def requireSameDim(
      queries: DataFrame, qVecCol: String,
      corpus: DataFrame, cVecCol: String): Unit =
    (vecLen(queries, qVecCol), vecLen(corpus, cVecCol)) match {
      case (Some(a), Some(b)) =>
        require(a == b,
          s"$qVecCol vectors have length $a but $cVecCol vectors have length $b")
      case _ => () // an all-NULL or empty side has nothing to disagree with
    }

  /** Bucket signature of `vec` in one table: bit b = sign(vec · plane_b).
    * Composed-expression reference form — production paths use the single
    * codegen'd `VectorFunctions.signBuckets` (O(1) generated-code size in
    * tables × bits); VectorExpressionsSpec pins their equivalence.
    */
  private[graft] def bucket(vec: Column, planes: Seq[Seq[Double]]): Column =
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
    requireDim(corpus, "c_vec", dim)
    // the query side degenerates just as silently: wrong-dim queries get
    // all-zero buckets and NULL sims → an empty result set instead of a
    // diagnostic (and lshRecall would report misleading recall)
    requireDim(queries, "q_vec", dim)
    val hp = hyperplanes(tables, bits, dim, seed)
    // one SignBuckets expression per row (codegen size O(1) in
    // tables × bits) instead of tables × bits composed dots, which blow the
    // 64 KB generated-method limit at strengthened table counts and knock
    // the stage back to interpreted eval
    val qb = signBucketed(queries, "q_id", "q_vec", hp)
      .withColumnRenamed("__vec", "q_vec").withColumnRenamed("__n", "__qn")
    val cb = signBucketed(corpus, "c_id", "c_vec", hp)
      .withColumnRenamed("__vec", "c_vec").withColumnRenamed("__n", "__cn")
    // score BEFORE the candidate dedup: a pair colliding in k tables is
    // scored k times (cheap — one codegen'd dot each), but the dedup
    // shuffle then carries (q_id, c_id, sim) instead of two dim-length
    // vectors per row — at scale the exchange bytes dominate, not the
    // duplicate dots. Duplicates carry identical sims, so dropDuplicates
    // on the ids is deterministic and the result is byte-identical.
    val scored = qb.join(cb, Seq("t", "b"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        simExpr(dot(col("q_vec"), col("c_vec")), col("__qn"), col("__cn")).as("sim"))
      .dropDuplicates("q_id", "c_id")
    topK(scored, k)
  }

  /** Recall audit of [[lshTopK]] as one DataFrame program: LSH top-k for
    * every query, exact top-k for the (small) `sampledQueries` subset, and
    * a single summary row
    * `(n_queries, n_sampled, recall_ok = avg sampled recall@k ≥ floor)` —
    * so a correctness harness can assert a recall floor instead of a bare
    * row count. Scale: the exact side is O(|sample|·|C|) — keep the sample
    * a few hundred queries; the LSH side is the normal bucketed path.
    * Counts are data-derived (an oracle recomputes them from the inputs);
    * recall itself is deterministic given the seed but only the bound is
    * emitted, since no independent engine can recompute LSH internals.
    * `n_sampled` counts sampled queries WITH an exact top-k: a degenerate
    * sampled query (NULL/zero-norm vector — no exact neighbors exist) has
    * no recall to measure and is excluded from both the count and the
    * average, by construction of the exact-side join.
    */
  def lshRecall(
      queries: DataFrame, // (q_id, q_vec)
      corpus: DataFrame, // (c_id, c_vec)
      k: Int,
      sampledQueries: DataFrame, // (q_id, q_vec) ⊆ queries
      recallFloor: Double,
      tables: Int = 8,
      bits: Int = 8,
      dim: Int = 64,
      seed: Long = 20260816L
  ): DataFrame = {
    val lsh = lshTopK(queries, corpus, k, tables, bits, dim, seed)
      .select(col("q_id"), col("c_id"), lit(1).as("__hit"))
    val exact = bruteForceTopK(sampledQueries, corpus, k)
      .select(col("q_id"), col("c_id"))
    val perQuery = exact.join(lsh, Seq("q_id", "c_id"), "left")
      .groupBy(col("q_id"))
      .agg((sum(coalesce(col("__hit"), lit(0))) / count(lit(1))).as("__recall"))
    val summary = perQuery.agg(
      coalesce(avg(col("__recall")), lit(1.0)).as("__avg"),
      count(lit(1)).as("n_sampled"))
    queries.agg(count(lit(1)).as("n_queries")).crossJoin(summary)
      .select(col("n_queries"), col("n_sampled"),
        (col("__avg") >= recallFloor).cast("int").as("recall_ok"))
  }

  /** Deterministic spherical k-means coarse quantizer: `nlist` centroids
    * trained with `lloydIters` Lloyd rounds. Returns unit-norm centroids.
    *
    * Centroid state is nlist × dim doubles — KiBs to low MiBs — so it lives
    * on the driver between rounds and re-enters each assignment job as a
    * broadcast DataFrame ([[assignCells]], plan size O(1) in nlist); each
    * Lloyd round is one corpus scan + one
    * (cluster, dim)-keyed aggregation. Init = per-hash-bucket min-id corpus
    * vectors (seedless, reproducible, and fully parallel — a global
    * row_number rank-stride would single-partition-sort the whole corpus).
    */
  private[sim] def trainCentroids(
      corpus: DataFrame, // (c_id, c_vec) — c_vec array<double>
      nlist: Int,
      lloydIters: Int,
      trainSampleRows: Long = 65536L,
      corpusRowsHint: Option[Long] = None
  ): Seq[Seq[Double]] = {
    def normalize(v: Seq[Double]): Seq[Double] = {
      val nm = math.sqrt(v.map(x => x * x).sum)
      if (nm == 0) v else v.map(_ / nm)
    }
    // The quantizer trains on a bounded deterministic hash-sample of the
    // corpus (the FAISS shape — ~256 vectors per cell suffice): Lloyd
    // rounds must not scan a 100 TB corpus per iteration, and the sample is
    // small enough to persist for the duration of training, so iterations
    // read memory rather than re-reading the source. Sizing the sample rate
    // needs the corpus row count — pass `corpusRowsHint` when known (e.g.
    // from table stats) to skip even the count job (on a plain scan the
    // count is metadata-only anyway).
    val n = corpusRowsHint.getOrElse(corpus.count())
    val every = math.max(1L, n / math.max(trainSampleRows, 1L))
    val sample = (if (every > 1)
      corpus.filter(
        pmod(xxhash64(col("c_id").cast("string"), lit(7919L)), lit(every)) === 0)
    else corpus).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids: Seq[Seq[Double]] = sample
        .groupBy(pmod(xxhash64(col("c_id").cast("string")), lit(nlist)).as("__b"))
        .agg(min_by(col("c_vec"), col("c_id")).as("c_vec"))
        .orderBy(col("__b"))
        .select(col("c_vec")).collect()
        .map(r => normalize(r.getSeq[Double](0))).toSeq
      for (_ <- 1 to lloydIters) {
        val assigned = assignCells(sample, "c_id", "c_vec", centroids, "__cl")
        val sums = assigned
          .select(col("__cl"), posexplode(col("c_vec")).as(Seq("__d", "__x")))
          .groupBy(col("__cl"), col("__d"))
          .agg(sum(col("__x")).as("__s"))
          .collect()
        val byCluster = sums.groupBy(_.getInt(0))
        centroids = centroids.indices.map { c =>
          byCluster.get(c) match {
            case Some(rows) =>
              normalize(rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
            case None => centroids(c) // empty cluster keeps its centroid
          }
        }
      }
      centroids
    } finally { sample.unpersist(blocking = false); () }
  }

  /** Centroids as a broadcast DataFrame (__cidx, __cvec). The literal-array
    * alternative (an nlist-element struct array built per row inside
    * codegen) blows up plan size and codegen at real nlist (≥ 4096); a
    * broadcast table keeps the plan O(1) in nlist — the centroid bytes ship
    * once per executor, not once per expression tree.
    */
  private def centroidsDf(df: DataFrame, centroids: Seq[Seq[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    broadcast(centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("__cidx", "__cvec"))
  }

  /** Max-dot centroid assignment (ties → lowest index) via broadcast
    * nested-loop join + partial-aggregated `min(struct(negDot, idx, vec))`:
    * map-side combine collapses the |rows|·nlist scored pairs back to one
    * row per input before any shuffle, so the exchange stays O(|rows|).
    * Ordering is identical to the former literal `array_min` formulation
    * (negDot asc = dot desc, then idx asc), so results are byte-equal.
    */
  private[sim] def assignCells(
      df: DataFrame, // (idCol, vecCol) with vecCol array<double>
      idCol: String,
      vecCol: String,
      centroids: Seq[Seq[Double]],
      cellCol: String
  ): DataFrame =
    df.crossJoin(centroidsDf(df, centroids))
      .select(col(idCol),
        struct((-dot(col(vecCol), col("__cvec"))).as("negDot"),
          col("__cidx").as("idx"), col(vecCol).as("vec")).as("__cand"))
      .groupBy(col(idCol))
      .agg(min(col("__cand")).as("__best"))
      .select(col(idCol), col("__best.vec").as(vecCol),
        col("__best.idx").as(cellCol))

  /** Top-`nprobe` centroids per query vector (dot desc, idx asc), one row
    * per (query, probed cell). Same broadcast-join shape as [[assignCells]];
    * the per-query top-nprobe is a window row_number over |Q|·nlist slim
    * rows — fine at ANN query volumes (|Q| ≪ |C|).
    */
  private def probeCells(
      q: DataFrame, // (q_id, q_vec, __qn)
      centroids: Seq[Seq[Double]],
      nprobe: Int
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy((-dot(col("q_vec"), col("__cvec"))).asc, col("__cidx").asc)
    q.crossJoin(centroidsDf(q, centroids))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("__qn"), col("__cidx").as("__cell"))
  }

  /** Approximate top-k cosine neighbors via an IVF (inverted-file) coarse
    * quantizer: the corpus is partitioned into `nlist` spherical-k-means
    * cells, each query scans only its `nprobe` nearest cells, exact cosine
    * ranks the candidates.
    *
    * Scale shape: training is `lloydIters` corpus scans; search is one
    * equi-join on the cell id — compute drops from O(|Q|·|C|) to
    * O(|Q|·|C|·nprobe/nlist) and the cell id is a well-distributed shuffle
    * key (cells are balanced by construction on non-degenerate data).
    * Recall is measured in AnnSpec; `nprobe = nlist` degenerates to exact
    * brute force.
    */
  def ivfTopK(
      queries: DataFrame, // (q_id, q_vec)
      corpus: DataFrame, // (c_id, c_vec)
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      lloydIters: Int = 2,
      corpusRowsHint: Option[Long] = None
  ): DataFrame = {
    requireSameDim(queries, "q_vec", corpus, "c_vec")
    // exclude NULL vectors (and vectors with NULL elements) from the index
    // and training: they can never yield a defined cosine — the brute-force
    // and LSH paths end at the same place via topK's null-sim filter, but
    // here an unguarded null would NPE inside driver-side centroid math,
    // killing the job instead of degrading
    def usable(v: Column): Column =
      v.isNotNull && !exists(v, x => x.isNull)
    val c = corpus.select(col("c_id"), col("c_vec").cast("array<double>").as("c_vec"))
      .filter(usable(col("c_vec")))
    val q = queries.select(col("q_id"), col("q_vec").cast("array<double>").as("q_vec"))
    val centroids = trainCentroids(c, nlist, lloydIters,
      corpusRowsHint = corpusRowsHint)
    val cAssigned = assignCells(c, "c_id", "c_vec", centroids, "__cell")
      .withColumn("__cn", norm(col("c_vec")))
    val qProbes = probeCells(
      q.select(col("q_id"), col("q_vec"), norm(col("q_vec")).as("__qn")),
      centroids, math.min(nprobe, nlist))
    val scored = qProbes.join(cAssigned, "__cell")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        simExpr(dot(col("q_vec"), col("c_vec")), col("__qn"), col("__cn")).as("sim"))
      .dropDuplicates("q_id", "c_id")
    topK(scored, k)
  }
}
