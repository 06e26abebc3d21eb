package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8-style) quantization of embedding columns — the memory
  * lever for similarity search at corpus scale: a 100 TB float32 embedding
  * store drops to 25 TB of codes plus a d-element codebook, which is what
  * lets a candidate set fit in executor memory during re-ranking.
  *
  * Per-dimension affine quantization: code = floor((x − mnᵢ)/(mxᵢ − mnᵢ)
  * · 255 + 0.5) clamped to [0, 255]; dequantized x̂ = mnᵢ + code·(mxᵢ −
  * mnᵢ)/255. All arithmetic is `floor`-based (no engine-specific rounding
  * mode) over doubles, so any SQL engine reproduces the codes exactly.
  *
  * Scale shape: the codebook is ONE row of two d-element arrays, computed
  * in a single map-side-combined aggregate pass (d `min`/`max` expressions
  * — no explode, no shuffle of n·d rows) and broadcast back; encoding is a
  * narrow map. Everything stays lazy — no driver-side collect.
  */
object Quantize {

  /** One-row codebook frame (__mn, __mx): per-dimension min/max. `dim` is
    * the (fixed) embedding dimensionality.
    */
  def codebook(df: DataFrame, embCol: String, dim: Int): DataFrame = {
    val v = col(embCol).cast("array<double>")
    df.select(v.as("__v")).agg(
      array((1 to dim).map(i => min(element_at(col("__v"), i))): _*).as("__mn"),
      array((1 to dim).map(i => max(element_at(col("__v"), i))): _*).as("__mx"))
  }

  private def codeExpr(x: Column, mn: Column, mx: Column): Column = {
    val scaled = floor((x - mn) / (mx - mn) * 255.0 + 0.5)
    // constant dimension (mx == mn) quantizes to code 0
    when(mx === mn, lit(0.0))
      .otherwise(least(greatest(scaled, lit(0.0)), lit(255.0)))
      .cast("int")
  }

  /** (id, codes) with codes `array<int>` in [0, 255]. The codebook joins in
    * as a broadcast single row — one narrow pass over the corpus.
    */
  def quantize(df: DataFrame, idCol: String, embCol: String, dim: Int,
               precomputedCodebook: Option[DataFrame] = None): DataFrame = {
    // same loud guard as Ann.requireDim: a dim mismatch makes zip_with
    // NULL-pad or truncate the codes silently, and every downstream sim
    // ends NULL — quantizedTopK would just return short/empty results
    Ann.requireDim(df, embCol, dim)
    val cb = precomputedCodebook.getOrElse(codebook(df, embCol, dim))
    df.select(col(idCol), col(embCol).cast("array<double>").as("__v"))
      .crossJoin(broadcast(cb))
      .select(col(idCol),
        zip_with(col("__v"), sequence(lit(1), lit(dim)), (x, i) =>
          codeExpr(x, element_at(col("__mn"), i), element_at(col("__mx"), i)))
          .as("codes"))
  }

  /** Dequantized reconstruction x̂ from codes + codebook. */
  def dequantize(codes: DataFrame, idCol: String, cb: DataFrame, dim: Int): DataFrame =
    codes.crossJoin(broadcast(cb))
      .select(col(idCol),
        zip_with(col("codes"), sequence(lit(1), lit(dim)), (c, i) => {
          val mn = element_at(col("__mn"), i)
          val mx = element_at(col("__mx"), i)
          mn + c.cast("double") * (mx - mn) / 255.0
        }).as("vec"))

  /** Top-k cosine search over the QUANTIZED corpus: candidates are scored
    * on dequantized vectors (4× less corpus I/O; recall measured in
    * QuantizeSpec), queries stay full-precision.
    */
  def quantizedTopK(
      queries: DataFrame, // (q_id, q_vec)
      corpus: DataFrame, // (c_id, c_vec)
      k: Int,
      dim: Int
  ): DataFrame = {
    // materialize the one-row codebook: it feeds TWO broadcast subplans
    // (quantize + dequantize), each embedding the full-corpus min/max
    // aggregate — exchange reuse across them is planner-dependent, and a
    // second corpus scan is the most expensive thing this function could
    // possibly waste
    val cb = graft.CachePolicy.materialize(codebook(corpus, "c_vec", dim))
    val deq = dequantize(quantize(corpus, "c_id", "c_vec", dim, Some(cb)), "c_id", cb, dim)
      .withColumnRenamed("vec", "c_vec")
    Ann.bruteForceTopK(queries, deq, k)
  }
}
