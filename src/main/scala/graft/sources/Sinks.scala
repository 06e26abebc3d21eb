package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sink-side operators (SURVEY §2.1 S6–S9, §2.8 U7).
  *
  * The sandbox has no Iceberg runtime or online store; the parquet append /
  * `foreachPartition` shapes below are the exact integration points where
  * `writeTo(...).append()` and a Redis/SQL client would plug in.
  */
object Sinks {

  /** S6: schema-aligned append (reference offline append sink,
    * spark.py:357-407 + cast helper :1691-1706): columns are reordered and
    * cast to the target schema; struct/map columns whose target is a string
    * are JSON-serialized first (P11, offline_utils.py:305-333); extra
    * columns are dropped; missing columns error.
    */
  def appendWithSchemaCast(df: DataFrame, target: StructType, path: String): Unit = {
    val aligned = alignToSchema(df, target)
    aligned.write.mode("append").parquet(path)
  }

  def alignToSchema(df: DataFrame, target: StructType): DataFrame = {
    // case-INsensitive resolution, matching Spark's default analyzer
    // (spark.sql.caseSensitive=false): a frame with column "ID" satisfies
    // target field "id" everywhere else in Spark, so the sink must accept
    // it too (output uses the target's spelling). Ambiguity ("id" + "ID"
    // both present) fails loudly rather than picking one.
    // Locale.ROOT: the JVM default locale must not affect resolution (a
    // Turkish locale lowercases "ID" to dotless-ı and the lookup misses a
    // column Spark's own analyzer resolves fine)
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    val byName = df.schema.fields.groupBy(f => lc(f.name)).map {
      case (k, fields) => k -> fields.toSeq
    }
    // backtick-quoted resolution: bare col()/df() parse dots as
    // nested-field access, so a top-level column literally named
    // "user.id" (legal in parquet) would fail to resolve
    def q(name: String) = col("`" + name.replace("`", "``") + "`")
    val cols = target.fields.map { f =>
      val matches = byName.getOrElse(lc(f.name),
        throw new IllegalArgumentException(s"missing column ${f.name} for sink schema"))
      require(matches.size == 1,
        s"ambiguous column ${f.name} for sink schema: " +
          matches.map(_.name).mkString(","))
      val src = matches.head
      (src.dataType, f.dataType) match {
        case (_: StructType, StringType) => to_json(q(src.name)).as(f.name)
        case (_: MapType, StringType)    => to_json(q(src.name)).as(f.name)
        // arrays targeting STRING must serialize as JSON too — cast()
        // renders Spark's non-JSON '[{1, a}]' text
        case (_: ArrayType, StringType)  => to_json(q(src.name)).as(f.name)
        case (a, t) if a == t            => q(src.name).as(f.name)
        case (_, t)                      => q(src.name).cast(t).as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** S6 (Iceberg half): schema-aligned append into an Iceberg TABLE via the
    * DataFrameWriterV2 (`writeTo(tbl).append()`), the catalog-table dual of
    * [[appendWithSchemaCast]]'s path append (reference spark.py:357-407
    * appends through the session catalog). Columns align to the LIVE table
    * schema by default (same case-insensitive, JSON-serializing rules), so
    * a reordered or over-wide frame appends cleanly; each append is one
    * Iceberg snapshot commit. Fails loudly when no Iceberg runtime is on
    * the classpath — never a silent parquet fallback.
    */
  def appendIceberg(
      df: DataFrame,
      table: String,
      target: Option[StructType] = None
  ): Unit = {
    require(IcebergSource.available(df.sparkSession),
      s"appendIceberg('$table') needs iceberg-spark-runtime on the classpath")
    val tgt = target.getOrElse(df.sparkSession.table(table).schema)
    alignToSchema(df, tgt).writeTo(table).append()
  }

  /** S7/U7: executor-side write path (reference `mapInArrow` + `.count()`
    * to force, spark/utils.py:128-225): the writer runs once per partition
    * with the partition's rows — the shape a batched online-store client
    * needs (one connection per task, rows streamed through). Returns the
    * number of rows written.
    */
  def foreachPartitionSink(df: DataFrame, writer: Iterator[Row] => Long): Long = {
    val acc = df.sparkSession.sparkContext.longAccumulator("graft.sink.rows")
    df.foreachPartition { (rows: Iterator[Row]) =>
      acc.add(writer(rows))
    }
    acc.value
  }

  /** S8: remote-storage export (spark.py:1153-1201): write the result as
    * parquet under a staging directory and return the data-file URIs — the
    * hand-off contract for engines that ingest files. The staging URI may
    * carry any scheme Hadoop has a FileSystem for (s3a://, gs://, hdfs://,
    * abfs://, file://, …; the reference enumerates s3/gs/azure/hdfs) —
    * listing goes through the Hadoop FS API of the URI's own filesystem, so
    * no local-path assumption leaks in.
    */
  def exportToStaging(df: DataFrame, stagingDir: String): Seq[String] = {
    df.write.mode("overwrite").parquet(stagingDir)
    val dir = new org.apache.hadoop.fs.Path(stagingDir)
    val fs = dir.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
      .sorted
  }

  /** S9: persist a retrieval result as a saved dataset and read it back —
    * the reference's SavedDataset storage round trip (saved_dataset.py:78;
    * spark.py:1098-1148).
    */
  def saveDataset(df: DataFrame, path: String): Unit =
    df.write.mode("errorifexists").parquet(path)

  def loadDataset(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S10: feature logging sink (reference feature_logging.py:28-146;
    * offline_store.py:569-592): served feature rows stamped with the log
    * timestamp and request id, appended to the logging table with the
    * usual schema alignment. `loggedAt` is an explicit argument so logs
    * are deterministic and replayable (no wall clock inside the plan).
    */
  def logFeatures(
      served: DataFrame,
      requestId: String,
      loggedAt: java.sql.Timestamp,
      path: String
  ): Unit = {
    val stamped = served
      .withColumn("__log_timestamp", lit(loggedAt))
      .withColumn("__log_request_id", lit(requestId))
    stamped.write.mode("append").parquet(path)
  }

  /** S11: monitoring DDL (reference spark.py:671-744): idempotent
    * `CREATE TABLE IF NOT EXISTS … USING PARQUET` for the monitoring
    * tables; re-running is a no-op.
    */
  def ensureMonitoringTables(spark: SparkSession, prefix: String = "graft"): Seq[String] = {
    val ddls = Seq(
      s"""CREATE TABLE IF NOT EXISTS ${prefix}_value_stats (
         |  table_name STRING, column_name STRING, computed_at TIMESTAMP,
         |  n_rows BIGINT, n_nonnull BIGINT, mean DOUBLE, std DOUBLE,
         |  min_v DOUBLE, max_v DOUBLE, p50 DOUBLE, p75 DOUBLE, p90 DOUBLE,
         |  p95 DOUBLE, p99 DOUBLE) USING PARQUET""".stripMargin,
      s"""CREATE TABLE IF NOT EXISTS ${prefix}_histograms (
         |  table_name STRING, column_name STRING, computed_at TIMESTAMP,
         |  bucket INT, cnt BIGINT) USING PARQUET""".stripMargin,
      s"""CREATE TABLE IF NOT EXISTS ${prefix}_topn (
         |  table_name STRING, column_name STRING, computed_at TIMESTAMP,
         |  value STRING, cnt BIGINT) USING PARQUET""".stripMargin,
      s"""CREATE TABLE IF NOT EXISTS ${prefix}_freshness (
         |  table_name STRING, computed_at TIMESTAMP,
         |  max_event_ts TIMESTAMP, row_count BIGINT) USING PARQUET""".stripMargin)
    ddls.foreach(spark.sql(_))
    Seq(s"${prefix}_value_stats", s"${prefix}_histograms",
      s"${prefix}_topn", s"${prefix}_freshness")
  }
}
