package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native Iceberg scan support (SURVEY §2.1 S3).
  *
  * The reference reads Iceberg through a PyIceberg scan→Arrow→temp-view
  * detour (infra/data_sources/contrib/iceberg_catalog/iceberg_source.py:
  * 25,38-81, registered at spark_offline_store/spark.py:1212-1233) — a
  * Python-runtime limitation. The Spark-native path is a plain
  * `spark.read.format("iceberg")` scan: Catalyst pushes the PIT-derived
  * timestamp/partition predicates into the Iceberg scan (hidden
  * partitioning prunes data files via min/max stats), and time travel is a
  * reader option rather than a catalog RPC.
  *
  * This compiles against plain Spark; executing it requires
  * `iceberg-spark-runtime` + a catalog config on the cluster classpath.
  * The sandbox ships neither (README documents the attempt), so specs
  * exercise the format-agnostic seam with parquet and [[available]] guards
  * runtime use.
  */
object IcebergSource {

  /** Is an Iceberg DataSource implementation on the classpath? */
  def available(spark: SparkSession): Boolean =
    try {
      org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
        "iceberg", spark.sessionState.conf)
      true
    } catch { case _: ClassNotFoundException => false }

  /** Iceberg table scan with optional time travel — exactly one of
    * `snapshotId` / `asOfTimestampMs` (Iceberg reader options
    * `snapshot-id` / `as-of-timestamp`).
    */
  def table(
      spark: SparkSession,
      name: String,
      snapshotId: Option[Long] = None,
      asOfTimestampMs: Option[Long] = None
  ): DataFrame = {
    require(snapshotId.isEmpty || asOfTimestampMs.isEmpty,
      "snapshotId and asOfTimestampMs are mutually exclusive")
    var r = spark.read.format("iceberg")
    snapshotId.foreach(id => r = r.option("snapshot-id", id.toString))
    asOfTimestampMs.foreach(t => r = r.option("as-of-timestamp", t.toString))
    r.load(name)
  }

  /** Current snapshot id of an Iceberg table (via the `.snapshots` metadata
    * table), for pinning backfill lineage manifests. None when the Iceberg
    * runtime or the table is unavailable.
    */
  def currentSnapshotId(spark: SparkSession, name: String): Option[Long] =
    scala.util.Try {
      import org.apache.spark.sql.functions._
      table(spark, s"$name.snapshots")
        .agg(max_by(col("snapshot_id"), col("committed_at")))
        .head().getLong(0)
    }.toOption
}
