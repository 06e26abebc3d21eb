package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kafka stream-scan seam (SURVEY §2.1 S5; reference
  * infra/contrib/spark_kafka_processor.py:84-110 — `readStream
  * .format("kafka")` with `kafka.bootstrap.servers` / `subscribe` /
  * `startingOffsets` plus user-override options).
  *
  * This compiles against plain Spark; executing it requires the
  * `spark-sql-kafka` connector on the classpath plus a reachable broker.
  * The sandbox ships neither and has zero egress (BASELINE.md documents the
  * dated resolution attempt), so — exactly like [[graft.sources.IcebergSource]]
  * — [[available]] guards runtime use, the missing-connector failure is
  * loud and spec-pinned, and the connector-level spec self-activates the
  * moment a connector jar appears, with no code change here.
  *
  * Downstream composition is connector-independent and fully tested on
  * memory streams: [[StreamIngest.decodeJson]] / [[StreamIngest.decodeAvro]]
  * over the `value` column, then [[StreamIngest.ingest]]'s foreachBatch
  * dedup-to-latest.
  */
object KafkaSource {

  /** Is a Kafka DataSource implementation on the classpath? (Spark wraps
    * the missing-connector ClassNotFound in a deploy-hint AnalysisException,
    * QueryCompilationErrors.failedToFindKafkaDataSourceError — catch both.)
    */
  def available(spark: SparkSession): Boolean =
    try {
      org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
        "kafka", spark.sessionState.conf)
      true
    } catch {
      case _: ClassNotFoundException => false
      case _: org.apache.spark.sql.AnalysisException => false
    }

  /** The streaming scan. Returns Spark's standard Kafka frame (key, value,
    * topic, partition, offset, timestamp, timestampType) — broker contact
    * happens when a query STARTS, not here.
    *
    * @param startingOffsets defaults to "earliest": the reference hardcodes
    *        "latest" (spark_kafka_processor.py:90) and therefore silently
    *        skips everything published before the query starts — its only
    *        late-data control; callers wanting reference behavior pass
    *        "latest" explicitly. Watermark-based late handling lives in
    *        [[StreamIngest]].
    */
  def stream(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "earliest",
      options: Map[String, String] = Map.empty
  ): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .options(options)
      .load()
}
