package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing: schema, determinism, null handling, frame shape,
  * and the batched-decoder path. The decode itself is a documented stub.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic fake payloads: jpeg/png magics + hash-derived bytes
  private val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte) ++
    Array.tabulate(60)(i => (i * 7 % 251).toByte)
  private val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47) ++
    Array.tabulate(40)(i => (i * 13 % 251).toByte)
  private val blobs = Seq((1L, jpeg), (2L, png), (3L, null)).toDF("id", "media")

  test("metadata extraction sniffs magic bytes and sizes") {
    val meta = Multimodal.extractMeta(blobs, "id", "media")
      .as[(Long, Option[Long], String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(meta(1L) == ((Some(64L), "jpeg")))
    assert(meta(2L) == ((Some(44L), "png")))
    assert(meta(3L) == ((None, "unknown")))
  }

  test("stub featurize: right shape, deterministic, bounded, null-safe") {
    val out = Multimodal.featurizeTable(blobs, "id", "media")
    assert(out.count() == 2, "null payloads dropped")
    val rows = out.as[(Long, Array[Float])].collect().toMap
    assert(rows(1L).length == Multimodal.EmbedDim)
    assert(rows(1L).forall(v => v >= -1.0f && v <= 1.0f))
    val again = Multimodal.featurizeTable(blobs, "id", "media")
      .as[(Long, Array[Float])].collect().toMap
    assert(rows(1L).sameElements(again(1L)), "must be deterministic")
    assert(!rows(1L).sameElements(rows(2L)), "different payloads differ")
  }

  test("frame sampling yields n evenly spaced byte windows") {
    val frames = Multimodal.frameSample(blobs, "id", "media", n = 4, frameBytes = 8)
    val f1 = frames.filter(col("id") === 1L)
      .orderBy("frame_idx").as[(Long, Int, Array[Byte])].collect()
    assert(f1.length == 4)
    assert(f1.map(_._2).toSeq == Seq(0, 1, 2, 3))
    assert(f1.forall(_._3.length == 8))
    assert(f1.head._3.sameElements(jpeg.take(8)), "frame 0 starts at offset 0")
    assert(f1.last._3.sameElements(jpeg.slice(56, 64)), "last frame ends at blob end")
  }

  test("batched decoder path produces the same schema as the column stub") {
    val viaDecoder = Multimodal.featurizeWithDecoder(
      blobs.filter(col("media").isNotNull), "id", "media",
      bytes => Array.tabulate(8)(i => (bytes(i % bytes.length) & 0xFF) / 255.0f))
    assert(viaDecoder.columns.toSeq == Seq("id", "embedding"))
    val rows = viaDecoder.as[(Long, Array[Float])].collect().toMap
    assert(rows.keySet == Set(1L, 2L) && rows(1L).length == 8)
  }

  test("REAL PNG round trip: encode on executors, ImageIO-decode exact pixel sums") {
    val specs = Seq(
      // (id, w, h, left rgb, right rgb) — odd width exercises the
      // floor(w/2) split; saturated channels exercise byte masking
      (10L, 5, 3, 255, 0, 7, 0, 128, 255),
      (11L, 4, 2, 1, 2, 3, 4, 5, 6))
      .toDF("id", "w", "h", "r1", "g1", "b1", "r2", "g2", "b2")
    val pngs = Multimodal.synthesizeTwoTonePng(specs)
    // the payloads are REAL PNGs: the magic-byte sniffer agrees
    val fmt = Multimodal.extractMeta(pngs, "id", "png")
      .select("format").distinct().as[String].collect().toSeq
    assert(fmt == Seq("png"), fmt.toString)
    val stats = Multimodal.decodeImageStats(pngs, "id", "png")
      .as[(Long, Int, Int, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // w=5: left 2 columns color1, right 3 color2, ×3 rows
    assert(stats(10L) == ((10L, 5, 3, (2 * 255 + 3 * 0) * 3L,
      (2 * 0 + 3 * 128) * 3L, (2 * 7 + 3 * 255) * 3L)), stats(10L).toString)
    assert(stats(11L) == ((11L, 4, 2, (2 * 1 + 2 * 4) * 2L,
      (2 * 2 + 2 * 5) * 2L, (2 * 3 + 2 * 6) * 2L)), stats(11L).toString)
    // a non-image payload fails LOUDLY, never returns garbage stats
    val e = intercept[Exception] {
      Multimodal.decodeImageStats(blobs.filter(col("id") === 2L), "id", "media")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("undecodable")), msgs(e).mkString(" | "))
  }

  test("luma grid: exact ITU-R 601 cell means on a decoded two-tone image") {
    // 4×2 image, left half pure red (luma 76.245), right half pure blue
    // (luma 29.07); a 2×1 grid puts each tone in its own cell exactly
    val specs = Seq((20L, 4, 2, 255, 0, 0, 0, 0, 255))
      .toDF("id", "w", "h", "r1", "g1", "b1", "r2", "g2", "b2")
    val grid = Multimodal.decodeLumaGrid(
      Multimodal.synthesizeTwoTonePng(specs), "id", "png", gx = 2, gy = 1)
      .as[(Long, Int, Int, Long, Long, Double)].collect()
      .map(r => (r._2, r._3) -> ((r._4, r._5, r._6))).toMap
    assert(grid.size == 2)
    // integer milli-luma sums are EXACT: 4 px of pure red / pure blue
    assert(grid((0, 0)) == ((4L, 4L * 299 * 255, 299 * 255 / 1000.0)), grid.toString)
    assert(grid((1, 0))._1 == 4L, grid.toString)
    assert(grid((1, 0))._2 == 4L * 114 * 255, grid.toString)
    assert(math.abs(grid((0, 0))._3 - 0.299 * 255) < 1e-9, grid.toString)
    assert(math.abs(grid((1, 0))._3 - 0.114 * 255) < 1e-9, grid.toString)
  }

  test("REAL WAV round trip: encode on executors, AudioSystem-decode exact sample stats") {
    // tiny deterministic sawtooth clips; expected aggregates computed
    // directly from the generating recurrence here, independently of the
    // codec under test
    val specs = Seq(
      (30L, 8000, 5, 1000L, 0L),     // 0, 1000, 2000, 3000, 4000 (pre-offset)
      (31L, 16000, 3, 40000L, 30000L)) // wraps mod 2^16: 30000, 4464, 44464
      .toDF("id", "sample_rate", "n_samples", "step", "phase")
    val wavs = Multimodal.synthesizeSawtoothWav(specs)
    // the payloads are REAL RIFF/WAVE files: the magic-byte sniffer agrees
    val fmt = Multimodal.extractMeta(wavs, "id", "wav")
      .select("format").distinct().as[String].collect().toSeq
    assert(fmt == Seq("riff-wav"), fmt.toString)
    def expected(n: Int, step: Long, phase: Long): (Long, Int, Long) = {
      val vs = (0 until n).map(i => ((phase + i * step) % 65536).toInt - 32768)
      (vs.map(v => math.abs(v).toLong).sum, vs.map(math.abs).max,
        vs.count(_ >= 0).toLong)
    }
    val stats = Multimodal.decodeAudioStats(wavs, "id", "wav")
      .as[(Long, Int, Int, Long, Long, Int, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (sa30, ma30, nn30) = expected(5, 1000L, 0L)
    assert(stats(30L) == ((30L, 8000, 1, 5L, sa30, ma30, nn30)), stats(30L).toString)
    val (sa31, ma31, nn31) = expected(3, 40000L, 30000L)
    assert(stats(31L) == ((31L, 16000, 1, 3L, sa31, ma31, nn31)), stats(31L).toString)
    // a non-audio payload fails LOUDLY, never returns garbage stats
    val e = intercept[Exception] {
      Multimodal.decodeAudioStats(blobs.filter(col("id") === 1L), "id", "media")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("undecodable")), msgs(e).mkString(" | "))
  }

  test("REAL animated-GIF round trip: encode frame sequence, decode exact per-frame sums") {
    val specs = Seq((40L, 3, 2, 3), (41L, 5, 4, 2))
      .toDF("id", "w", "h", "n_frames")
    val gifs = Multimodal.synthesizeAnimatedGif(specs)
    // the payloads are REAL GIFs (magic "GIF8" = 0x47494638)
    val magic = gifs.select(hex(substring(col("gif"), 1, 4))).as[String]
      .collect().toSet
    assert(magic == Set("47494638"), magic.toString)
    val frames = Multimodal.decodeGifFrames(gifs, "id", "gif")
      .as[(Long, Int, Int, Int, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(frames.size == 5, "3 + 2 frames decoded")
    for { (id, w, h, n) <- Seq((40L, 3, 2, 3), (41L, 5, 4, 2)); f <- 0 until n } {
      val (r, g, b) = Multimodal.gifTone(id, f)
      assert(frames((id, f)) ==
        ((id, f, w, h, w.toLong * h * r, w.toLong * h * g, w.toLong * h * b)),
        s"frame ($id, $f): ${frames((id, f))} expected tone ($r,$g,$b)")
    }
    // a non-gif payload fails LOUDLY, never returns garbage frames
    val e = intercept[Exception] {
      Multimodal.decodeGifFrames(blobs.filter(col("id") === 1L), "id", "media")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("undecodable")), msgs(e).mkString(" | "))
  }

  test("decode lanes reject non-integral id columns fast, not deep in the job") {
    // a blind long cast would NULL a string id and crash the non-nullable
    // encoder mid-job; the guard must fire at plan time with the type
    val strIds = Seq(("k1", png)).toDF("id", "media")
    def rejects(f: => Any): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("integral"), e.getMessage)
    }
    rejects(Multimodal.decodeImageStats(strIds, "id", "media"))
    rejects(Multimodal.decodeLumaGrid(strIds, "id", "media", 2, 2))
    rejects(Multimodal.decodeAudioStats(strIds, "id", "media"))
    rejects(Multimodal.decodeGifFrames(strIds, "id", "media"))
  }

  test("truncated payloads with valid magic still fail with the row id") {
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // valid RIFF prefix cut mid-header: the parse throws EOFException (an
    // IOException, not UnsupportedAudioFile) — the id-bearing loud-failure
    // contract must hold on that path too
    val wav = Multimodal.synthesizeSawtoothWav(
      Seq((50L, 8000, 4, 7L, 0L))
        .toDF("id", "sample_rate", "n_samples", "step", "phase"))
      .select(col("id"), expr("substring(wav, 1, 16)").as("wav"))
    val e = intercept[Exception] {
      Multimodal.decodeAudioStats(wav, "id", "wav").collect()
    }
    assert(msgs(e).exists(_.contains("undecodable audio payload for id 50")),
      msgs(e).mkString(" | "))
    // same for a GIF whose container starts valid but is cut short
    val gif = Multimodal.synthesizeAnimatedGif(
      Seq((51L, 3, 2, 2)).toDF("id", "w", "h", "n_frames"))
      .select(col("id"), expr("substring(gif, 1, 24)").as("gif"))
    val e2 = intercept[Exception] {
      Multimodal.decodeGifFrames(gif, "id", "gif").collect()
    }
    assert(msgs(e2).exists(_.contains("undecodable gif payload for id 51")),
      msgs(e2).mkString(" | "))
  }

  test("stubbed multimodal embeddings feed the ANN operator end-to-end") {
    val emb = Multimodal.featurizeTable(blobs, "id", "media")
    val out = graft.sim.Ann.bruteForceTopK(
      emb.toDF("q_id", "q_vec"), emb.toDF("c_id", "c_vec"), k = 1)
    assert(out.count() == 2, "each query gets its single neighbor")
  }
}
