package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Resumable, per-partition checkpointed backfill (north rule).
  *
  * Generalizes the reference's resume mechanism — `materialization_intervals`
  * / `most_recent_end_time` per feature view (reference: sdk/python/feast/
  * feature_view.py:482-490,795-804; applied by the spark-submit app at
  * infra/compute_engines/spark_application/main.py:95-99) — from coarse
  * time-interval bookkeeping to **one lineage manifest per source partition**:
  *
  *   checkpointDir/<partition>.json   {partition, status, input_rows,
  *     output_rows, input_files, started_at_ms, duration_ms, rows_per_sec}
  *
  * A partition is skipped on re-run iff its manifest says `complete`, so a
  * backfill killed mid-run resumes exactly where it stopped; the manifest is
  * written atomically (temp file + move) so a crash mid-write re-runs that
  * partition rather than trusting a torn file. Partition outputs are
  * `overwrite` so re-running a partition is idempotent. Two drivers resuming
  * the same backfill SHARE the partition list: each partition is claimed with
  * a non-blocking OS file lock ([[Locks.withTryFileLock]]) plus an isComplete
  * re-check inside it — a partition another driver is running is skipped,
  * not queued on — so each partition's job and manifest write happen exactly
  * once across drivers and the drivers work disjoint partitions in parallel.
  *
  * Scale design: the *loop* is over source partitions (days of `ts` — the
  * Iceberg `days(ts)` layout; plain parquet `ds=` directories stand in here
  * because the sandbox has no Iceberg runtime). Each iteration is a fully
  * distributed Spark job over one partition plus `lookbackPartitions` of
  * history (windowed features need a bounded lookback across the boundary);
  * partition pruning keeps the scan at O(partition), and output rows are
  * re-filtered to the target partition so overlapping reads never duplicate
  * output. A 1000-executor cluster runs each day's job wide; checkpoint
  * granularity = restart granularity = one day.
  */
object Backfill {

  final case class PartitionResult(
      partition: String,
      status: String,
      inputRows: Long,
      outputRows: Long,
      durationMs: Long
  )

  /** One backfill pass. Returns the per-partition results of THIS run
    * (skipped partitions excluded).
    *
    * @param source       partitioned source (must contain `partitionCol`)
    * @param partitionCol partition column, e.g. `ds` = date of `ts`
    * @param job          the distributed feature job; receives the slice
    *                     [partition − lookback, partition] and must keep
    *                     `partitionCol` in its output
    * @param lookbackPartitions extra trailing partitions visible to `job`
    *                     (TTL windows / session lookback)
    * @param maxPartitions stop after N partitions (test hook simulating a
    *                     killed run)
    */
  def run(
      spark: SparkSession,
      source: DataFrame,
      partitionCol: String,
      outDir: String,
      checkpointDir: String,
      job: DataFrame => DataFrame,
      lookbackPartitions: Int = 0,
      maxPartitions: Int = Int.MaxValue,
      sourceSnapshot: Option[String] = None
  ): Seq[PartitionResult] = {
    Files.createDirectories(Paths.get(checkpointDir))
    val partitions = source
      .select(col(partitionCol).cast("string"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .sorted
      .toIndexedSeq
    val pending = partitions.filterNot(p => isComplete(checkpointDir, p))

    // The budget counts partitions this driver actually RAN: the lazy
    // iterator + trailing take means a partition skipped because another
    // driver claimed (or already finished) it does not consume the
    // caller's maxPartitions allowance — a pre-claim take would let two
    // contending drivers split one window and both stop early with work
    // still pending.
    pending.iterator.flatMap { p =>
      // Cross-driver claim: two drivers resuming the same backfill both
      // compute `pending` from the same manifests — without a lock they'd
      // run (and CONCURRENTLY overwrite) the same partition output, which
      // mode("overwrite") does not make safe (one delete interleaving the
      // other's write leaves mixed files). The per-partition OS file lock
      // makes the claim exclusive; tryLock (not a blocking lock) means a
      // partition someone else is ALREADY running is simply skipped — the
      // two drivers share the partition list instead of queueing — and the
      // isComplete RE-CHECK inside the lock skips work that finished
      // between the pending listing and the claim.
      Locks.withTryFileLock(manifestPath(checkpointDir, p).toString) {
        if (isComplete(checkpointDir, p)) None
        else Some {
          val idx = partitions.indexOf(p)
          val visible = partitions.slice(math.max(0, idx - lookbackPartitions), idx + 1)
          val t0 = System.currentTimeMillis()
          val slice = source.filter(col(partitionCol).cast("string").isin(visible: _*))
          // Observation metrics: input AND output rows counted inside the write
          // job itself (stays in whole-stage codegen — no second action over the
          // input, no accumulator map). The input observe sits on the slice so
          // one pass yields both counts; a truthful input count has to see every
          // slice row anyway, so the metrics barrier costs nothing the old
          // separate `slice.count()` scan didn't.
          val inObs = org.apache.spark.sql.Observation(s"backfill_in_$p")
          val outObs = org.apache.spark.sql.Observation(s"backfill_out_$p")
          val observed = slice.observe(inObs, count(lit(1)).as("in_rows"))
          val outRaw = job(observed).filter(col(partitionCol).cast("string") === p)
          outRaw.observe(outObs, count(lit(1)).as("out_rows"))
            .write.mode("overwrite").parquet(s"$outDir/$partitionCol=${escapeDirValue(p)}")
          val outputRows = outObs.get("out_rows").asInstanceOf[Long]
          val inputRows = inObs.get("in_rows").asInstanceOf[Long]
          val dur = System.currentTimeMillis() - t0
          val lineage = slice.inputFiles.toSeq.sorted
          writeManifest(checkpointDir, p, inputRows, outputRows, lineage, t0, dur,
            sourceSnapshot)
          PartitionResult(p, "complete", inputRows, outputRows, dur)
        }
      }.flatten // None = claimed by another driver OR completed meanwhile
    }.take(maxPartitions).toSeq
  }

  /** Read the backfilled output back (partition-discovering parquet read). */
  def readOutput(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("basePath", outDir).parquet(outDir)

  def isComplete(checkpointDir: String, partition: String): Boolean = {
    val f = manifestPath(checkpointDir, partition)
    Files.exists(f) && {
      val txt = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      // verify the partition FIELD too: filenames are sanitized, so two
      // values can collide on one manifest file — a collision must read
      // as incomplete (re-run, wasteful but safe), never alias another
      // partition's completion
      txt.contains("\"status\": \"complete\"") &&
      txt.contains("\"partition\": \"" + graft.Json.escape(partition) + "\"")
    }
  }

  def completedPartitions(checkpointDir: String): Seq[String] = {
    val d = Paths.get(checkpointDir)
    if (!Files.exists(d)) Nil
    else {
      // Files.list holds an open directory handle until closed — a driver
      // polling this in a loop would leak fds
      val stream = Files.list(d)
      // the true partition value lives in the manifest's `partition`
      // field, not the (sanitized) filename — recover it from the JSON
      val partField = "\"partition\"\\s*:\\s*\"([^\"\\\\]*(?:\\\\.[^\"\\\\]*)*)\"".r
      try
        stream.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".json"))
          .flatMap { f =>
            val txt = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
            if (!txt.contains("\"status\": \"complete\"")) None
            else partField.findFirstMatchIn(txt)
              .map(m => graft.Json.unescape(m.group(1)))
          }
          .toSeq
          .sorted
      finally stream.close()
    }
  }

  /** Partition values reach the manifest FILENAME and the output PATH:
    * a '/' (e.g. a `2024/01/01` date layout) would fail the tmp-file
    * write AFTER the distributed job already ran, or escape `outDir`
    * into nested directories partition discovery misparses. Filenames
    * sanitize to a safe charset (the true value lives in the manifest's
    * `partition` field); output dirs use Spark's own Hive-style
    * partition-path escaping so [[readOutput]] round-trips the value.
    */
  private def safeFileName(partition: String): String = {
    val sanitized = partition.replaceAll("[^A-Za-z0-9._-]", "_")
    // lossy sanitization (or truncation) appends a digest of the TRUE
    // value: otherwise "2024/01/01" and "2024_01_01" share one manifest
    // file and each run un-completes the other — resume never converges
    // to a no-op. Values that are already safe keep their plain filename.
    if (sanitized == partition && sanitized.length <= 120) sanitized
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(partition.getBytes(StandardCharsets.UTF_8))
      sanitized.take(120) + "-" + md.take(4).map("%02x".format(_)).mkString
    }
  }

  private def escapeDirValue(p: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(p)

  private def manifestPath(dir: String, partition: String): Path =
    Paths.get(dir, s"${safeFileName(partition)}.json")

  private def writeManifest(
      dir: String, partition: String, inputRows: Long, outputRows: Long,
      inputFiles: Seq[String], startedAtMs: Long, durationMs: Long,
      sourceSnapshot: Option[String]): Unit = {
    val rps = if (durationMs > 0) inputRows * 1000.0 / durationMs else 0.0
    val files = inputFiles.map(f => "\"" + graft.Json.escape(f) + "\"").mkString("[", ", ", "]")
    // Iceberg source: the snapshot id the whole backfill run is pinned to
    // (reference analog: materialization_intervals records time ranges,
    // feature_view.py:482-490 — a snapshot id is the stronger lineage fact)
    val snapshotLine = sourceSnapshot
      .map(s => s"""  "source_snapshot": "${graft.Json.escape(s)}",\n""")
      .getOrElse("")
    val json =
      s"""{
         |  "partition": "${graft.Json.escape(partition)}",
         |$snapshotLine  "status": "complete",
         |  "input_rows": $inputRows,
         |  "output_rows": $outputRows,
         |  "input_files": $files,
         |  "started_at_ms": $startedAtMs,
         |  "duration_ms": $durationMs,
         |  "rows_per_sec": $rps
         |}
         |""".stripMargin
    val tmp = Paths.get(dir, s".${safeFileName(partition)}.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(dir, partition),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** spark-submit entry point: backfill the transcript feature pack
    * (sessionize + lag/lead gaps + rolling tool usage) over a day-partitioned
    * transcript table.
    *
    *   spark-submit --class graft.engine.Backfill <jar> \
    *     <sourceDir> <outDir> <checkpointDir> [maxPartitions]
    */
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Backfill <sourceDir> <outDir> <checkpointDir> [maxPartitions]")
    val Array(sourceDir, outDir, checkpointDir) = args.take(3)
    val maxParts = if (args.length > 3) args(3).toInt else Int.MaxValue
    val spark = SparkSession.builder()
      .appName("graft-backfill")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val source = spark.read.option("basePath", sourceDir).parquet(sourceDir)
    val results = run(spark, source, "ds", outDir, checkpointDir,
      dailyFeatureJob, lookbackPartitions = 1, maxPartitions = maxParts)
    results.foreach { r =>
      println(s"""{"partition":"${r.partition}","input_rows":${r.inputRows},""" +
        s""""output_rows":${r.outputRows},"duration_ms":${r.durationMs}}""")
    }
    spark.stop()
  }

  /** The default backfill job: per-turn transcript features over the slice.
    * Keeps `ds` so the partition filter applies to the output.
    */
  def dailyFeatureJob(slice: DataFrame): DataFrame = {
    import graft.feat.TranscriptFeatures
    val withLen = slice.withColumn("text_len", length(col("text")))
    val sess = TranscriptFeatures.sessionize(slice, gapSec = 1800L)
    val tools = TranscriptFeatures.toolUsage(slice, windowSec = 4 * 3600L)
    withLen
      .join(sess, Seq("conv_id", "turn_idx"))
      .join(tools, Seq("conv_id", "turn_idx"))
  }
}
