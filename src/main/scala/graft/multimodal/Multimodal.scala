package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run as distributed column programs or batched
  * `mapPartitions` decoders.
  *
  * **The decode step is STUBBED**: this sandbox has no codec libraries, so
  * [[stubFeaturize]] derives a deterministic pseudo-embedding from the raw
  * bytes (pure Catalyst, codegen'd) and [[featurizeWithDecoder]] shows the
  * batched integration point where a real JNI/Java codec would plug in. The
  * Spark-side contract — schema, batch shape, partitioning, null handling —
  * is real and tested (MultimodalSpec).
  */
object Multimodal {

  val EmbedDim = 64

  /** Typed metadata extracted from the binary payload: byte size and a
    * format guess from the magic bytes (the real-world header sniff; here
    * the recognizable prefixes are the standard magics).
    */
  def extractMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val b = col(binCol)
    val magic = hex(substring(b, 1, 4))
    df.select(
      col(idCol),
      octet_length(b).as("n_bytes"),
      when(magic.startsWith("FFD8"), "jpeg")
        .when(magic.startsWith("89504E47"), "png")
        .when(magic.startsWith("52494646"), "riff-wav")
        .otherwise("unknown").as("format"))
  }

  /** STUB decoder output: a deterministic pseudo-embedding in [-1, 1)^dim
    * derived from md5 of (hex(bytes), lane-group). Stands in for "decode
    * image → CNN features"; replace with a real decoder via
    * [[featurizeWithDecoder]]. Pure Catalyst — whole-stage codegen, no
    * serialization boundary.
    *
    * Formula (engine-portable on purpose, so the DuckDB oracle can recompute
    * it exactly): lane `l` reads hex quad `l % 8` of
    * `md5(hex(bytes) || '_' || (l / 8))`; the 16-bit quad maps to
    * `q / 32768.0 − 1.0`, which is exactly representable in float32 — the
    * cross-engine compare is therefore bit-exact, not tolerance-based.
    */
  def stubFeaturize(bin: Column, dim: Int = EmbedDim): Column =
    transform(sequence(lit(0), lit(dim - 1)), l => {
      val g = floor(l / lit(8)).cast("int")
      val s = pmod(l, lit(8))
      val h = md5(concat(hex(bin), lit("_"), g.cast("string")))
      val quad = h.substr(s * lit(4) + lit(1), lit(4))
      ((conv(quad, 16, 10).cast("int") / lit(32768.0)) - lit(1.0)).cast("float")
    })

  /** (id, embedding array<float>) for every non-null payload. */
  def featurizeTable(df: DataFrame, idCol: String, binCol: String,
                     dim: Int = EmbedDim): DataFrame =
    df.filter(col(binCol).isNotNull)
      .select(col(idCol), stubFeaturize(col(binCol), dim).as("embedding"))

  /** Frame sampling for video-like payloads: `n` evenly spaced byte windows
    * of `frameBytes` each (STUB for keyframe extraction). Output one row per
    * (id, frame_idx, frame) — the downstream shape a frame-level featurizer
    * consumes.
    */
  def frameSample(df: DataFrame, idCol: String, binCol: String,
                  n: Int, frameBytes: Int): DataFrame = {
    val len = octet_length(col(binCol))
    df.filter(col(binCol).isNotNull)
      .select(col(idCol),
        explode(transform(sequence(lit(0), lit(n - 1)), i =>
          struct(i.cast("int").as("frame_idx"),
            substring_index_bytes(col(binCol), len, i, n, frameBytes).as("frame")))).as("f"))
      .select(col(idCol), col("f.frame_idx"), col("f.frame"))
  }

  /** Byte window i of n: substring on binary, offset spread over the blob. */
  private def substring_index_bytes(b: Column, len: Column, i: Column,
                                    n: Int, frameBytes: Int): Column = {
    // multiply in LONG: i * len overflows int for blobs past ~2^31/(n-1)
    // bytes (a 300 MB video at n=10 already does) — ANSI would throw,
    // non-ANSI would wrap negative and substring would read end-relative
    val off = (i.cast("long") * greatest(len - frameBytes, lit(0)).cast("long") /
      math.max(n - 1, 1)).cast("int") + 1
    substring(b, off, lit(frameBytes))
  }

  /** The batched-decoder integration point: a real codec (`Array[Byte] =>
    * Array[Float]`) runs per partition — one decoder instance per task, rows
    * streamed through it, no driver involvement. This is the Scala analog of
    * the reference's executor-side `mapInArrow` write path
    * (infra/compute_engines/spark/utils.py:128-175).
    */
  def featurizeWithDecoder(
      df: DataFrame, idCol: String, binCol: String,
      decoder: Array[Byte] => Array[Float]
  ): DataFrame = {
    // the typed lane is keyed on a long id — a blind cast would NULL every
    // string/UUID id and crash the non-nullable encoder downstream; fail
    // fast with the actual type instead
    locally {
      import org.apache.spark.sql.types._
      val t = df.schema(idCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
        s"featurizeWithDecoder requires an integral $idCol (got $t); " +
          "map string ids to a surrogate long first")
    }
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.product[Embedding])
    // same non-null contract as featurizeTable: a real codec NPEs on null
    val input = df.filter(col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    input.mapPartitions { rows =>
      // per-partition decoder init would go here (load model / codec once)
      rows.map { case (id, bytes) => (id, Embedding(decoder(bytes))) }
    }(enc).toDF(idCol, "emb").select(col(idCol), col("emb.values").as("embedding"))
  }

  case class Embedding(values: Array[Float])
}
