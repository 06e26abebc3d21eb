package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run as distributed column programs or batched
  * `mapPartitions` decoders.
  *
  * **Still images decode for REAL**: the JDK ships `javax.imageio`
  * (PNG/JPEG/BMP/GIF need no external dependency), so
  * [[decodeImageStats]] / [[decodeLumaGrid]] run an actual pixel decode
  * per row in the batched executor-side seam. **Audio decodes for REAL
  * too**: `javax.sound.sampled` handles RIFF/WAVE PCM with no external
  * dependency — [[decodeAudioStats]] runs the actual container+PCM parse
  * per row. The one genuinely stubbed modality is video (the JDK ships no
  * video codec): [[stubFeaturize]] derives a deterministic
  * pseudo-embedding from the raw bytes (pure Catalyst, codegen'd) and
  * [[featurizeWithDecoder]] is the batched integration point where a
  * JNI/native codec would plug in. The Spark-side contract — schema,
  * batch shape, partitioning, null handling — is identical either way.
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
    // RIFF is a container family (WAV, AVI, WebP…): the payload type lives
    // at bytes 9-12, so a bare "RIFF" prefix must not be labeled audio
    val riffType = hex(substring(b, 9, 4))
    df.select(
      col(idCol),
      octet_length(b).as("n_bytes"),
      when(magic.startsWith("FFD8"), "jpeg")
        .when(magic.startsWith("89504E47"), "png")
        .when(magic.startsWith("47494638"), "gif")
        .when(magic.startsWith("52494646") && riffType === lit("57415645"), "riff-wav")
        .when(magic.startsWith("52494646"), "riff")
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
    requireIntegralId(df, idCol, "featurizeWithDecoder")
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

  /** Every typed decode lane is keyed on a long id — a blind cast would
    * NULL every string/UUID id and crash the non-nullable encoder deep
    * inside the job; fail fast with the actual type instead.
    */
  private def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit = {
    import org.apache.spark.sql.types._
    val t = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
      s"$op requires an integral $idCol (got $t); " +
        "map string ids to a surrogate long first")
  }

  // ------------------------------------------------------------------ image
  // Real JDK-only image codec path (javax.imageio). No driver involvement:
  // every encode/decode runs inside mapPartitions on the executors, one
  // codec call per row, rows streamed through — the same seam shape as
  // featurizeWithDecoder.

  /** Input spec for [[synthesizeTwoTonePng]]: a w×h image, left half
    * (x < w/2) colored (r1,g1,b1), right half (r2,g2,b2). Deterministic
    * test/benchmark image source — the sandbox has no real image corpus,
    * and a two-tone layout makes decoded channel sums exactly computable
    * by an oracle from the generating parameters alone.
    */
  case class ImgSpec(id: Long, w: Int, h: Int,
      r1: Int, g1: Int, b1: Int, r2: Int, g2: Int, b2: Int)
  case class ImgBytes(id: Long, png: Array[Byte])
  case class ImgStats(id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)
  case class LumaCell(id: Long, cell_x: Int, cell_y: Int, n_px: Long,
      sum_luma_milli: Long, mean_luma: Double)

  /** Encode one real PNG per row from an [[ImgSpec]]-shaped frame
    * (columns id, w, h, r1..b2). Output (id, png binary).
    */
  def synthesizeTwoTonePng(df: DataFrame): DataFrame =
    df.select(col("id").cast("long"), col("w").cast("int"), col("h").cast("int"),
        col("r1").cast("int"), col("g1").cast("int"), col("b1").cast("int"),
        col("r2").cast("int"), col("g2").cast("int"), col("b2").cast("int"))
      .as(Encoders.product[ImgSpec])
      .mapPartitions { rows =>
        rows.map { s =>
          require(s.w > 0 && s.h > 0, s"degenerate image dims ${s.w}x${s.h} for id ${s.id}")
          val img = new java.awt.image.BufferedImage(
            s.w, s.h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val c1 = (s.r1 << 16) | (s.g1 << 8) | s.b1
          val c2 = (s.r2 << 16) | (s.g2 << 8) | s.b2
          var y = 0
          while (y < s.h) {
            var x = 0
            while (x < s.w) {
              img.setRGB(x, y, if (x < s.w / 2) c1 else c2); x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          ImgBytes(s.id, baos.toByteArray)
        }
      }(Encoders.product[ImgBytes]).toDF()

  /** REAL image decode (javax.imageio) → per-image pixel statistics:
    * dimensions + exact per-channel byte sums (integers — no float
    * tolerance in the oracle compare). PNG is lossless, so for a
    * synthesized image these are exactly recomputable from the generating
    * parameters.
    */
  def decodeImageStats(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    requireIntegralId(df, idCol, "decodeImageStats")
    df.filter(col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          // truncated-but-recognized payloads throw IOException rather
          // than returning null — map both to the same loud id-bearing
          // failure contract
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch {
              case e: java.io.IOException => throw new IllegalArgumentException(
                s"undecodable image payload for id $id", e)
            }
          require(img != null, s"undecodable image payload for id $id")
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
              x += 1
            }
            y += 1
          }
          ImgStats(id, img.getWidth, img.getHeight, sr, sg, sb)
        }
      }(Encoders.product[ImgStats]).toDF()
      .withColumnRenamed("id", idCol)
  }

  /** REAL decode → downsampled luma grid: the image is partitioned into a
    * gx×gy cell grid (cell (cx,cy) covers pixels with
    * floor(x·gx/width)=cx, floor(y·gy/height)=cy — every pixel in exactly
    * one cell regardless of divisibility) and each cell emits its pixel
    * count, its EXACT integer milli-luma sum (Σ 299·r + 587·g + 114·b —
    * the ITU-R 601 weights ×1000, so an oracle recomputes it with integer
    * arithmetic and no float tolerance), and the derived mean luma
    * (sum/1000/n). Output one row per (id, cell) — the flattened
    * "thumbnail embedding" a near-dup or perceptual-hash stage consumes.
    */
  def decodeLumaGrid(df: DataFrame, idCol: String, binCol: String,
                     gx: Int, gy: Int): DataFrame = {
    require(gx > 0 && gy > 0, "grid dims must be positive")
    requireIntegralId(df, idCol, "decodeLumaGrid")
    df.filter(col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch {
              case e: java.io.IOException => throw new IllegalArgumentException(
                s"undecodable image payload for id $id", e)
            }
          require(img != null, s"undecodable image payload for id $id")
          val w = img.getWidth; val h = img.getHeight
          val sums = Array.ofDim[Long](gx * gy)
          val counts = Array.ofDim[Long](gx * gy)
          var y = 0
          while (y < h) {
            // long intermediate: y·gy (and x·gx) can overflow Int on
            // gigapixel scans long before the row count does
            val cy = (y.toLong * gy / h).toInt
            var x = 0
            while (x < w) {
              val cx = (x.toLong * gx / w).toInt
              val p = img.getRGB(x, y)
              val lumaMilli = 299L * ((p >> 16) & 0xFF) +
                587L * ((p >> 8) & 0xFF) + 114L * (p & 0xFF)
              sums(cy * gx + cx) += lumaMilli; counts(cy * gx + cx) += 1
              x += 1
            }
            y += 1
          }
          (0 until gy).iterator.flatMap(cy => (0 until gx).iterator.map { cx =>
            val i = cy * gx + cx
            LumaCell(id, cx, cy, counts(i), sums(i),
              if (counts(i) > 0) sums(i) / 1000.0 / counts(i) else 0.0)
          })
        }
      }(Encoders.product[LumaCell]).toDF()
      .withColumnRenamed("id", idCol)
  }

  // ------------------------------------------------------------------ audio
  // Real JDK-only audio codec path (javax.sound.sampled). RIFF/WAVE PCM
  // needs no external dependency, so — like the PNG path above — the audio
  // decode is REAL: payload bytes go through AudioSystem's container and
  // format parse, not a stub. Same executor-side seam shape: encode and
  // decode both run inside mapPartitions, one codec call per row.

  /** Input spec for [[synthesizeSawtoothWav]]: an `n_samples`-frame mono
    * PCM16 clip at `sample_rate` Hz whose waveform is the integer sawtooth
    * sample(i) = (phase + i·step) mod 2^16 − 2^15. Deterministic
    * test/benchmark audio source — the sandbox has no real audio corpus,
    * and the integer recurrence makes every decoded sample exactly
    * recomputable by an oracle from the generating parameters alone.
    */
  case class WavSpec(id: Long, sample_rate: Int, n_samples: Int,
      step: Long, phase: Long)
  case class WavBytes(id: Long, wav: Array[Byte])
  case class AudioStats(id: Long, sample_rate: Int, channels: Int,
      n_frames: Long, sum_abs: Long, max_abs: Int, n_nonneg: Long)

  /** Encode one real RIFF/WAVE file (PCM signed 16-bit mono little-endian)
    * per row from a [[WavSpec]]-shaped frame (columns id, sample_rate,
    * n_samples, step, phase). Output (id, wav binary).
    */
  def synthesizeSawtoothWav(df: DataFrame): DataFrame =
    df.select(col("id").cast("long"), col("sample_rate").cast("int"),
        col("n_samples").cast("int"), col("step").cast("long"),
        col("phase").cast("long"))
      .as(Encoders.product[WavSpec])
      .mapPartitions { rows =>
        rows.map { s =>
          require(s.sample_rate > 0 && s.n_samples > 0,
            s"degenerate audio spec rate=${s.sample_rate} n=${s.n_samples} for id ${s.id}")
          val pcm = Array.ofDim[Byte](s.n_samples * 2)
          var i = 0
          while (i < s.n_samples) {
            // Long recurrence: phase + i·step stays well under 2^63 for any
            // sane clip length, and the mod-2^16 wrap is the waveform
            val v = (((s.phase + i * s.step) % 65536).toInt - 32768).toShort
            pcm(2 * i) = (v & 0xFF).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s.sample_rate.toFloat, 16, 1, 2, s.sample_rate.toFloat, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, s.n_samples.toLong)
          val baos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
          WavBytes(s.id, baos.toByteArray)
        }
      }(Encoders.product[WavBytes]).toDF()

  /** REAL audio decode (javax.sound.sampled) → per-clip sample statistics:
    * parsed format fields (rate, channels, frame count) plus EXACT integer
    * aggregates over the decoded PCM16 samples — Σ|v|, max|v|, and the
    * count of non-negative samples. All integers, so the oracle compare
    * needs no float tolerance; PCM is lossless, so for a synthesized clip
    * these are exactly recomputable from the generating parameters.
    */
  def decodeAudioStats(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    requireIntegralId(df, idCol, "decodeAudioStats")
    df.filter(col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          // a truncated payload with a valid RIFF prefix throws
          // EOFException (an IOException, not UnsupportedAudioFile) from
          // the header parse — both must keep the id-bearing contract
          val ais =
            try javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            catch {
              case e @ (_: javax.sound.sampled.UnsupportedAudioFileException |
                        _: java.io.IOException) =>
                throw new IllegalArgumentException(
                  s"undecodable audio payload for id $id", e)
            }
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"id $id: expected PCM_SIGNED 16-bit audio, got $fmt")
          val pcm = ais.readAllBytes()
          val nFrames = pcm.length / fmt.getFrameSize
          val ch = fmt.getChannels
          val big = fmt.isBigEndian
          var sumAbs = 0L; var maxAbs = 0; var nNonNeg = 0L
          var i = 0
          while (i < nFrames * ch) {
            val b0 = pcm(2 * i) & 0xFF; val b1 = pcm(2 * i + 1) & 0xFF
            val v = (if (big) (b0 << 8) | b1 else (b1 << 8) | b0).toShort.toInt
            val a = math.abs(v)
            sumAbs += a
            if (a > maxAbs) maxAbs = a
            if (v >= 0) nNonNeg += 1
            i += 1
          }
          AudioStats(id, fmt.getSampleRate.round, ch, nFrames.toLong,
            sumAbs, maxAbs, nNonNeg)
        }
      }(Encoders.product[AudioStats]).toDF()
      .withColumnRenamed("id", idCol)
  }

  // ------------------------------------------------------------ multi-frame
  // Real JDK-only multi-frame media path: animated GIF via javax.imageio.
  // This is the closest the JDK gets to a video codec — a timed frame
  // sequence in one binary payload — so the frame-extraction operator
  // ([[frameSample]]'s byte-window stub upgraded) runs a REAL container
  // parse + per-frame pixel decode. GIF is lossless for ≤256-color frames,
  // so solid-tone synthesized frames round-trip exactly.

  case class GifSpec(id: Long, w: Int, h: Int, n_frames: Int)
  case class GifBytes(id: Long, gif: Array[Byte])
  case class GifFrame(id: Long, frame_idx: Int, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Per-frame solid tone of the synthesized GIF: frame f of clip id is
    * rgb((id+61·f)%256, (id·7+13·f)%256, (id·13+29·f)%256). Shared by the
    * encoder and any oracle recomputing the decoded sums.
    */
  def gifTone(id: Long, f: Int): (Int, Int, Int) =
    (((id + 61L * f) % 256).toInt, ((id * 7 + 13L * f) % 256).toInt,
      ((id * 13 + 29L * f) % 256).toInt)

  /** Encode one real animated GIF per row from a [[GifSpec]]-shaped frame
    * (columns id, w, h, n_frames): `n_frames` solid-tone frames written
    * through `ImageWriter.writeToSequence`. Output (id, gif binary).
    */
  def synthesizeAnimatedGif(df: DataFrame): DataFrame =
    df.select(col("id").cast("long"), col("w").cast("int"),
        col("h").cast("int"), col("n_frames").cast("int"))
      .as(Encoders.product[GifSpec])
      .mapPartitions { rows =>
        rows.map { s =>
          require(s.w > 0 && s.h > 0 && s.n_frames > 0,
            s"degenerate gif spec ${s.w}x${s.h}x${s.n_frames} for id ${s.id}")
          val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
          require(writers.hasNext, "JDK GIF writer unavailable")
          val writer = writers.next()
          val baos = new java.io.ByteArrayOutputStream()
          val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
          try {
            writer.setOutput(mos)
            writer.prepareWriteSequence(null)
            var f = 0
            while (f < s.n_frames) {
              // indexed color with the exact tone in the palette: the GIF
              // writer emits an IndexColorModel's table verbatim, whereas a
              // TYPE_INT_RGB input could be re-quantized to a default
              // palette and break the exact round trip
              val (r, gch, b) = gifTone(s.id, f)
              val icm = new java.awt.image.IndexColorModel(
                1, 2, Array(r.toByte, 0.toByte), Array(gch.toByte, 0.toByte),
                Array(b.toByte, 0.toByte))
              val img = new java.awt.image.BufferedImage(
                s.w, s.h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
              // a fresh indexed raster is all zeros = palette entry 0 = tone
              writer.writeToSequence(
                new javax.imageio.IIOImage(img, null, null), null)
              f += 1
            }
            writer.endWriteSequence()
          } finally { writer.dispose(); mos.close() }
          GifBytes(s.id, baos.toByteArray)
        }
      }(Encoders.product[GifBytes]).toDF()

  /** REAL multi-frame decode (javax.imageio GIF reader) → one row per
    * decoded frame with its dimensions and exact per-channel pixel sums.
    * The container parse (frame count) and every pixel value come from the
    * actual bytes; for solid-tone synthesized clips an oracle recomputes
    * each sum as w·h·channel from the generating parameters.
    */
  def decodeGifFrames(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    requireIntegralId(df, idCol, "decodeGifFrames")
    df.filter(col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
          require(readers.hasNext, "JDK GIF reader unavailable")
          val reader = readers.next()
          val mis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          // materialize before dispose: the flatMap iterator is lazy and
          // would otherwise read from a disposed reader
          val out =
            try {
              reader.setInput(mis, false)
              val n =
                try reader.getNumImages(true)
                catch {
                  case e: java.io.IOException => throw new IllegalArgumentException(
                    s"undecodable gif payload for id $id", e)
                }
              require(n > 0, s"undecodable gif payload for id $id (no frames)")
              (0 until n).map { f =>
                // frame data can be truncated even when the container
                // parse succeeded — keep the id-bearing failure contract
                val img =
                  try reader.read(f)
                  catch {
                    case e: java.io.IOException => throw new IllegalArgumentException(
                      s"undecodable gif payload for id $id (frame $f)", e)
                  }
                var sr = 0L; var sg = 0L; var sb = 0L
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    val p = img.getRGB(x, y)
                    sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
                    x += 1
                  }
                  y += 1
                }
                GifFrame(id, f, img.getWidth, img.getHeight, sr, sg, sb)
              }
            } finally { reader.dispose(); mis.close() }
          out.iterator
        }
      }(Encoders.product[GifFrame]).toDF()
      .withColumnRenamed("id", idCol)
  }
}
