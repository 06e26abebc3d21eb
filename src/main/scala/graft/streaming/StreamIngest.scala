package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Structured-Streaming ingest pipeline (SURVEY §2.7).
  *
  * Mirrors the reference's stream processor shape — readStream → decode →
  * transform → `writeStream.outputMode("update")` + `foreachBatch` with
  * per-batch dedup-to-latest and a created-timestamp stamp (reference:
  * infra/contrib/spark_kafka_processor.py:74-175) — with two deliberate
  * divergences, both documented there as reference weaknesses we must not
  * copy:
  *
  *  - the per-batch dedup runs **distributed** (max_by groupBy), not via
  *    `toPandas()` on the driver (`spark_kafka_processor.py:139` pulls every
  *    micro-batch to the driver — a scalability bug);
  *  - late data is handled with **watermarks** (`withWatermark` + windowed /
  *    session aggregations) instead of the reference's
  *    processing-time-only, `startingOffsets=latest` stance
  *    (`spark_kafka_processor.py:89` — its only late-data control is
  *    read-time TTL).
  */
object StreamIngest {

  /** Kafka-style decode: a `value` byte/string column of JSON → typed
    * columns (reference `_ingest_stream_data`,
    * spark_kafka_processor.py:106-130; F4 `from_json`).
    *
    * Default is FAILFAST: a malformed message raises instead of becoming a
    * silent all-null row that flows into the store indistinguishable from
    * data (from_json's PERMISSIVE default). `permissive = true` restores
    * drop-nothing decoding for pipelines that quarantine downstream.
    */
  def decodeJson(stream: DataFrame, schema: StructType,
                 permissive: Boolean = false): DataFrame =
    stream
      .select(from_json(col("value").cast("string"), schema,
        if (permissive) Map.empty[String, String]
        else Map("mode" -> "FAILFAST")).as("__r"))
      .select(col("__r.*"))

  /** Kafka-style decode, Avro branch (reference `message_format=avro`,
    * spark_kafka_processor.py:106-130 via `from_avro`): binary `value`
    * column → typed columns from the writer schema. The connector-free
    * bridge lives in [[AvroCodec]] (avro core is on the classpath; the
    * spark-avro module is not — README "Environment limits").
    */
  def decodeAvro(stream: DataFrame, schemaJson: String): DataFrame =
    AvroCodec.decode(stream, "value", schemaJson)

  /** Distributed per-batch dedup-to-latest (reference ST2,
    * spark_kafka_processor.py:138-153: sort desc + groupby.nth(0)): one row
    * per key — the max over (tsCol, tiebreaks) — computed with a
    * partial-aggregable max_by, stamped with `created_ts`.
    *
    * @param createdTs injected (never now() in tests — determinism)
    */
  def latestPerKeyBatch(
      batch: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieBreakCols: Seq[String],
      createdTs: java.sql.Timestamp
  ): DataFrame = {
    val payload = batch.columns.filterNot(keys.contains).toSeq
    val ord = struct((col(tsCol) +: tieBreakCols.map(col)): _*)
    batch
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), ord).as("__best"))
      .select(keys.map(col) ++ payload.map(c => col("__best." + c).as(c)): _*)
      .withColumn("created_ts", lit(createdTs))
  }

  /** ST1: the ingest query. Each micro-batch is deduped to latest per key
    * and appended to `outPath` with its batch id (the "online store write"
    * stand-in — the sandbox has no Kafka/Redis; the parquet append is the
    * offline path of `_write_stream_data`, spark_kafka_processor.py:155-175).
    *
    * `createdTsForBatch` stamps each batch's rows from its batch id — a
    * long-running query must NOT carry one constant created_ts for its
    * whole lifetime (it would make created_ts useless as a dedup
    * tie-breaker or anti-leak cutoff: Friday's rows stamped with Monday's
    * start time). Production passes a clock
    * (`_ => new Timestamp(System.currentTimeMillis())`, the reference's
    * per-batch ingest time); tests pass a deterministic function.
    */
  def ingest(
      stream: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieBreakCols: Seq[String],
      outPath: String,
      checkpoint: String,
      createdTsForBatch: Long => java.sql.Timestamp
  ): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // idempotent under micro-batch REPLAY: a crash between this write
        // and the checkpoint commit re-runs the batch with the same
        // batchId — a flat mode("append") would duplicate every replayed
        // row in the store. Each batch owns its partition directory, so
        // the replay overwrites its own previous (possibly partial)
        // output and nothing else; readers see `batch_id` as a partition
        // column via discovery, exactly as the data column read before.
        latestPerKeyBatch(batch, keys, tsCol, tieBreakCols,
          createdTsForBatch(batchId))
          .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        ()
      }
      .start()

  /** Read back an [[ingest]] output directory. `batch_id` is a Hive-style
    * PARTITION directory on disk (idempotent replay overwrite needs one
    * directory per batch), and partition-type inference would surface it as
    * IntegerType (or StringType with inference off) — NOT the LongType the
    * pre-partitioned layout's data column carried. This reader is the
    * compatibility seam: it restores `batch_id: LongType` explicitly so
    * consumers see the same schema regardless of inference settings.
    */
  def readIngested(spark: org.apache.spark.sql.SparkSession,
                   outPath: String): DataFrame =
    spark.read.parquet(outPath)
      .withColumn("batch_id", col("batch_id").cast("long"))

  /** Deterministic-constant form (tests and replays). */
  def ingest(
      stream: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieBreakCols: Seq[String],
      outPath: String,
      checkpoint: String,
      createdTs: java.sql.Timestamp
  ): StreamingQuery =
    ingest(stream, keys, tsCol, tieBreakCols, outPath, checkpoint,
      (_: Long) => createdTs)

  /** ST3 (idiomatic replacement): watermarked tumbling aggregation —
    * late rows beyond the watermark are dropped, windows finalize exactly
    * once in append mode.
    */
  def windowedAgg(
      stream: DataFrame,
      keys: Seq[String],
      tsCol: String,
      windowSec: Long,
      watermarkSec: Long,
      aggs: Seq[org.apache.spark.sql.Column]
  ): DataFrame =
    stream
      .withWatermark(tsCol, s"$watermarkSec seconds")
      .groupBy((keys.map(col) :+ window(col(tsCol), s"$windowSec seconds")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("win_start", col("window.start"))
      .drop("window")

  /** Streaming-native duplicate drop: state-bounded dedup on `keys` where
    * the state for a key is retained only within the watermark horizon
    * (`dropDuplicatesWithinWatermark`) — the streaming dual of the exact
    * batch dedup, and the piece the reference's processing-time-only
    * processor cannot express (its only dedup is per-micro-batch). State
    * size is O(keys within the watermark), not O(all keys ever seen).
    */
  def dedupWithinWatermark(
      stream: DataFrame,
      keys: Seq[String],
      tsCol: String,
      watermarkSec: Long
  ): DataFrame =
    stream
      .withWatermark(tsCol, s"$watermarkSec seconds")
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming sessionization: `session_window` by inactivity gap — the
    * streaming dual of TranscriptFeatures.sessionize (north rule).
    */
  def sessionAgg(
      stream: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gapSec: Long,
      watermarkSec: Long
  ): DataFrame =
    stream
      .withWatermark(tsCol, s"$watermarkSec seconds")
      .groupBy((keys.map(col) :+ session_window(col(tsCol), s"$gapSec seconds")): _*)
      .agg(count(lit(1)).as("n_turns"), max(col(tsCol)).as("last_ts"))
      .withColumn("session_start", col("session_window.start"))
      .drop("session_window")
}
