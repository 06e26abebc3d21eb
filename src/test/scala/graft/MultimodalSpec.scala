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

  test("stubbed multimodal embeddings feed the ANN operator end-to-end") {
    val emb = Multimodal.featurizeTable(blobs, "id", "media")
    val out = graft.sim.Ann.bruteForceTopK(
      emb.toDF("q_id", "q_vec"), emb.toDF("c_id", "c_vec"), k = 1)
    assert(out.count() == 2, "each query gets its single neighbor")
  }
}
