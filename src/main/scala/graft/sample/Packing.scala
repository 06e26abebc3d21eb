package graft.sample

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic concat-and-chunk sequence packing — the standard
  * pretraining layout step: documents are laid out in a reproducible
  * pseudo-random order, token counts accumulate, and context windows of
  * `capacity` tokens are cut at fixed boundaries (documents may straddle a
  * boundary; training consumers mask across the seam). The reference has
  * no packing operator; a 100 TB corpus engine needs one to emit
  * shard/offset manifests for the trainer.
  *
  * Scale shape: one shuffle keyed on (bucket) where bucket =
  * md5-prefix(id) mod `numBuckets` — the stream is decomposed into
  * `numBuckets` independent deterministic substreams so the cumulative
  * sum never serializes through a single task; raise `numBuckets` with
  * corpus size (each bucket is one window task). Order within a bucket is
  * (md5(id), id): fully deterministic, engine-portable, and append-stable
  * hashes — the same doc always lands at the same position given the same
  * corpus.
  */
object Packing {

  /** Pack layout manifest: for every document,
    * (id, n_tokens, bucket, pack_first, pack_last, pack_offset) where
    * pack_first/pack_last are the chunk indices (within the bucket) of the
    * doc's first/last token and pack_offset is the token offset of the doc
    * inside its first chunk. `tokensCol` is any positive token count
    * (e.g. [[graft.text.TextAnalysis.tokenCounts]] output).
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      capacity: Long,
      numBuckets: Int = 256
  ): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    // 8 md5 hex digits = 2^32 distinct bucket seeds; a shorter prefix
    // silently caps effective parallelism (4 digits = 65536 buckets max)
    require(numBuckets > 0 && numBuckets <= (1 << 30),
      "numBuckets must be in [1, 2^30]")
    val key = md5(col(idCol).cast("string"))
    val bucket = pmod(conv(substring(key, 1, 8), 16, 10).cast("long"), lit(numBuckets))
      .cast("int")
    // enforce the stated positive-token-count precondition at data level:
    // a zero count on a chunk boundary inverts the doc's (pack_first,
    // pack_last) range, and a negative or NULL count shifts __cum and
    // corrupts the offsets of every later doc in the bucket — silently
    val nTokens = {
      val t = col(tokensCol).cast("long")
      when(t > 0, t).otherwise(raise_error(concat(
        lit(s"packSequences requires positive $tokensCol, got "),
        coalesce(t.cast("string"), lit("NULL")),
        lit(s" for $idCol="), col(idCol).cast("string"))).cast("long"))
    }
    // explicit ROWS frame: the default for an ordered window is RANGE,
    // which sums ALL order-key peers into each row's cumulative — two rows
    // sharing an id would each absorb the other's tokens and overlap every
    // later window in the bucket, silently. Under ROWS, duplicate-id rows
    // still tile the stream gap-free (their mutual order is arbitrary but
    // the output multiset is identical either way).
    val w = Window.partitionBy(col("bucket")).orderBy(col("__key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), nTokens.as("n_tokens"),
        key.as("__key"), bucket.as("bucket"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("__start", col("__cum") - col("n_tokens"))
      .select(
        col(idCol),
        col("n_tokens"),
        col("bucket"),
        // integer `div`, not fp `/`: a 100 TB corpus overflows double
        // mantissa precision long before it overflows a long
        expr(s"__start div ${capacity}L").as("pack_first"),
        expr(s"(__cum - 1) div ${capacity}L").as("pack_last"),
        pmod(col("__start"), lit(capacity)).as("pack_offset"))
  }
}
