package graft

import java.sql.Timestamp
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamIngest

/** Streaming ingest semantics vs their batch duals, driven by MemoryStream
  * micro-batches (no Kafka in the sandbox; the pipeline shape is identical).
  */
class StreamIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val tmp = Files.createTempDirectory("graft-stream").toString
  private def ts(s: String) = Timestamp.valueOf(s)
  private val created = ts("2026-02-01 00:00:00")

  private val turns: Seq[Turn] = Transcripts.syntheticRows(nConvs = 6, turnsPerConv = 14, seed = 5L)

  test("foreachBatch ingest dedups to latest per key within each batch") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Turn]
    val q = StreamIngest.ingest(mem.toDF(), Seq("conv_id"), "ts",
      Seq("turn_idx"), s"$tmp/out", s"$tmp/ckpt", created)
    val (b0, b1) = turns.splitAt(turns.length / 2)
    mem.addData(b0); q.processAllAvailable()
    mem.addData(b1); q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(s"$tmp/out")
    // one row per (conv_id, batch) that saw the conv
    val perBatch = out.groupBy("conv_id", "batch_id").count().collect()
    assert(perBatch.forall(_.getAs[Long]("count") == 1L))
    // each batch's winner is the max-ts turn of that conv within the batch
    for ((batch, id) <- Seq((b0, 0L), (b1, 1L))) {
      val expected = batch.groupBy(_.conv_id).map { case (c, ts) =>
        c -> ts.maxBy(t => (t.ts.getTime, t.turn_idx)).turn_idx
      }
      val got = out.filter(col("batch_id") === id)
        .select("conv_id", "turn_idx").as[(String, Int)].collect().toMap
      assert(got == expected, s"batch $id")
    }
    assert(out.select("created_ts").distinct().as[Timestamp].collect().toSeq == Seq(created))
  }

  test("readIngested restores batch_id as LongType regardless of partition inference") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Turn]
    val q = StreamIngest.ingest(mem.toDF(), Seq("conv_id"), "ts",
      Seq("turn_idx"), s"$tmp/typed-out", s"$tmp/typed-ckpt", created)
    mem.addData(turns.take(4)); q.processAllAvailable()
    mem.addData(turns.drop(4).take(4)); q.processAllAvailable()
    q.stop()
    // batch_id lives as a Hive partition directory on disk (idempotent
    // replay overwrite); inference would surface it as IntegerType — the
    // reader seam must hand consumers the LongType the pre-partitioned
    // layout's data column carried
    val out = StreamIngest.readIngested(spark, s"$tmp/typed-out")
    assert(out.schema("batch_id").dataType ==
      org.apache.spark.sql.types.LongType, out.schema.treeString)
    assert(out.select("batch_id").distinct().as[Long].collect().toSet == Set(0L, 1L))
  }

  test("ingest stamps created_ts PER BATCH, not once for the query lifetime") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Turn]
    // batch id → distinct timestamp: a long-running query must not stamp
    // Friday's rows with Monday's start time
    val q = StreamIngest.ingest(mem.toDF(), Seq("conv_id"), "ts",
      Seq("turn_idx"), s"$tmp/out_pb", s"$tmp/ckpt_pb",
      (batchId: Long) => new Timestamp(created.getTime + batchId * 60000L))
    val (b0, b1) = turns.splitAt(turns.length / 2)
    mem.addData(b0); q.processAllAvailable()
    mem.addData(b1); q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$tmp/out_pb")
    val stamps = out.select("batch_id", "created_ts").distinct()
      .as[(Long, Timestamp)].collect().toMap
    assert(stamps == Map(
      0L -> created,
      1L -> new Timestamp(created.getTime + 60000L)))
  }

  test("watermarked windowed agg equals the batch tumbling agg once complete") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Turn]
    val agged = StreamIngest.windowedAgg(mem.toDF(), Seq("conv_id"), "ts",
      windowSec = 3600L, watermarkSec = 60L,
      aggs = Seq(count(lit(1)).as("n_turns"), sum(length(col("text"))).as("sum_len")))
    val q = agged.writeStream.format("memory").queryName("winagg")
      .outputMode("append").start()
    mem.addData(turns)
    q.processAllAvailable()
    // advance the watermark far past every event so all windows finalize
    val flush = turns.head.copy(conv_id = "conv_flush",
      ts = new Timestamp(turns.map(_.ts.getTime).max + 7 * 24 * 3600 * 1000L))
    mem.addData(Seq(flush))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("winagg")
      .filter(col("conv_id") =!= "conv_flush")
      .select("conv_id", "win_start", "n_turns", "sum_len")
    val batch = graft.agg.Aggregations.tumbling(
      spark.createDataset(turns).toDF().withColumn("text_len", length(col("text"))),
      Seq("conv_id"), "ts", 3600L,
      Seq(Aggregation("text_len", "count", alias = Some("n_turns")),
        Aggregation("text_len", "sum", alias = Some("sum_len"))))
      .select("conv_id", "win_start", "n_turns", "sum_len")
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      "streamed windows must equal batch tumbling agg")
  }

  test("rows below the watermark are dropped; on-time windows finalize once") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Long)]
    val agged = StreamIngest.windowedAgg(
      mem.toDF().toDF("k", "ts", "v"), Seq("k"), "ts",
      windowSec = 600L, watermarkSec = 3600L,
      aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("s")))
    val q = agged.writeStream.format("memory").queryName("wm_drop")
      .outputMode("append").start()
    // batch 1: two on-time rows in one window
    mem.addData(Seq(("a", ts("2026-01-11 00:00:10"), 1L),
      ("a", ts("2026-01-11 00:05:00"), 2L)))
    q.processAllAvailable()
    // batch 2: a LATE row for the same key ten days below the watermark
    // (must be dropped, NOT merged into a's window) plus a flush row that
    // advances the watermark past every real window
    mem.addData(Seq(("a", ts("2026-01-01 00:00:10"), 100L),
      ("zz_flush", ts("2026-01-31 00:00:00"), 0L)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wm_drop").filter(col("k") === "a")
      .select("n", "s").as[(Long, Long)].collect().toSeq
    assert(rows == Seq((2L, 3L)),
      s"late row must be dropped and the window emitted exactly once: $rows")
  }

  test("session windows: exact-gap merges, gap+1 splits; " +
      "partial sessions merge across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val sess = StreamIngest.sessionAgg(
      mem.toDF().toDF("conv_id", "ts"), Seq("conv_id"), "ts",
      // delay larger than the fixture's 30-min span (so no row can be
      // dropped as late) but far smaller than the flush row's advance
      // (so the flush really closes every session)
      gapSec = 600L, watermarkSec = 24L * 3600)
    val q = sess.writeStream.format("memory").queryName("sess_gap")
      .outputMode("append").start()
    // conv a, pinning BOTH boundary sides (measured semantics: an event at
    // EXACTLY previous-ts + gap still MERGES — session_window's interval
    // is end-INCLUSIVE for the merge test — and gap+1 splits):
    //   00:00:00, 00:09:59 (delta 599 → merge), 00:19:59 (delta exactly
    //   600 → still merges), 00:30:00 (delta 601 → NEW session).
    // Batch 1 carries 00:00:00 and 00:19:59 — 1199 s apart, two DISJOINT
    // state entries — and only batch 2's 00:09:59 bridges them, so the
    // first session reaches its final extent by STATE MERGE alone.
    mem.addData(Seq(("a", ts("2026-01-11 00:00:00")),
      ("a", ts("2026-01-11 00:19:59"))))
    q.processAllAvailable()
    mem.addData(Seq(("a", ts("2026-01-11 00:09:59")),
      ("a", ts("2026-01-11 00:30:00")),
      ("zz_flush", ts("2027-06-01 00:00:00"))))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_gap").filter(col("conv_id") === "a")
      .select("session_start", "n_turns")
      .as[(Timestamp, Long)].collect().toSeq.sortBy(_._1.getTime)
    assert(rows == Seq(
      (ts("2026-01-11 00:00:00"), 3L),
      (ts("2026-01-11 00:30:00"), 1L)),
      s"gap must merge inclusively, gap+1 must split, batches must merge: $rows")
  }

  test("dedup-within-watermark emits each key once inside the horizon") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val deduped = StreamIngest.dedupWithinWatermark(
      mem.toDF().toDF("k", "ts"), Seq("k"), "ts", watermarkSec = 3600)
    val q = deduped.writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    mem.addData(("a", ts("2026-02-01 00:00:00")), ("a", ts("2026-02-01 00:00:10")),
      ("b", ts("2026-02-01 00:00:05")))
    q.processAllAvailable()
    // a second batch re-sends "a" within the watermark horizon — still dropped
    mem.addData(("a", ts("2026-02-01 00:00:20")), ("c", ts("2026-02-01 00:00:21")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_wm").select("k").as[String].collect().toSeq.sorted
    assert(out == Seq("a", "b", "c"), s"got $out")
  }

  test("streaming session_window splits on the inactivity gap") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Turn]
    val sess = StreamIngest.sessionAgg(mem.toDF(), Seq("conv_id"), "ts",
      gapSec = 1800L, watermarkSec = 60L)
    val q = sess.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    mem.addData(turns)
    val flush = turns.head.copy(conv_id = "conv_flush",
      ts = new Timestamp(turns.map(_.ts.getTime).max + 7 * 24 * 3600 * 1000L))
    mem.addData(Seq(flush))
    q.processAllAvailable()
    q.stop()

    // batch dual: sessionize counts per (conv, session)
    val batchSessions = graft.feat.TranscriptFeatures
      .sessionize(spark.createDataset(turns).toDF(), 1800L)
      .groupBy("conv_id", "session_id").agg(count(lit(1)).as("n_turns"))
      .select("conv_id", "n_turns")
    val streamed = spark.table("sess")
      .filter(col("conv_id") =!= "conv_flush")
      .select("conv_id", "n_turns")
    // session multiset per conv must match (ids differ, sizes must not)
    assert(streamed.except(batchSessions).isEmpty &&
      batchSessions.except(streamed).isEmpty,
      "streaming sessions must match batch sessionization")
    // fixture guarantees >1 session somewhere (gaps injected every ~12 turns)
    assert(spark.table("sess").filter(col("conv_id") =!= "conv_flush")
      .groupBy("conv_id").count().filter(col("count") > 1).count() > 0)
  }

  test("kafka connector is absent in this sandbox and the seam reports it") {
    assert(!graft.streaming.KafkaSource.available(spark),
      "sandbox has no spark-sql-kafka connector; if this starts passing, " +
        "activate the connector-level spec below")
    // the scan seam fails loudly (ClassNotFound through Spark's DataSource
    // lookup), never silently returns an empty stream
    intercept[Exception] {
      graft.streaming.KafkaSource.stream(spark, "localhost:9092", "turns")
    }
  }

  /** Connector-level spec — self-activating like the Iceberg e2e: skipped
    * (not silently passed) while `spark-sql-kafka` is off the classpath
    * (this sandbox has no jar, no broker, zero egress — BASELINE.md
    * documents the dated attempt). With a connector present this verifies
    * the scan shape and that the decode path composes over it; broker
    * contact only happens at query start, which still needs a deployment.
    */
  test("kafka scan shape + decode composition (skips without connector)") {
    assume(graft.streaming.KafkaSource.available(spark),
      "spark-sql-kafka not on classpath — explicit tested skip")
    val raw = graft.streaming.KafkaSource.stream(spark, "localhost:9092", "turns")
    assert(raw.isStreaming)
    assert(raw.columns.toSet == Set("key", "value", "topic", "partition",
      "offset", "timestamp", "timestampType"))
    // the reference's decode chain (spark_kafka_processor.py:96-111)
    // analyzes over the connector frame
    val decoded = StreamIngest.decodeJson(raw,
      org.apache.spark.sql.types.StructType.fromDDL(
        "conv_id STRING, turn_idx INT, ts TIMESTAMP"))
    assert(decoded.columns.toSeq == Seq("conv_id", "turn_idx", "ts"))
  }

  test("decodeJson fails loudly on malformed messages; permissive opts out") {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "conv_id STRING, turn_idx INT")
    val vals = Seq("""{"conv_id":"c1","turn_idx":3}""", """not json at all""")
      .toDF("value")
    // default: a corrupt message raises instead of becoming a silent
    // all-null row indistinguishable from data
    val e = intercept[Exception] {
      StreamIngest.decodeJson(vals, schema).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("MALFORMED") || m.contains("FAILFAST")
      || m.toLowerCase.contains("malformed")), msgs(e).mkString(" | "))
    // permissive mode restores drop-nothing decoding (null row for garbage)
    val rows = StreamIngest.decodeJson(vals, schema, permissive = true).collect()
    assert(rows.length == 2 && rows.count(_.isNullAt(0)) == 1)
  }
}
