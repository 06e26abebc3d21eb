package graft

import org.apache.spark.sql.functions._
import graft.engine.Backfill
import java.nio.file.Files

/** Resumable-backfill properties (north rule): kill mid-run → resume skips
  * completed partitions; re-run is a no-op; the resumed output equals a
  * fresh single-pass backfill; manifests carry lineage + metrics.
  */
class BackfillSpec extends SparkTestBase {

  private val tmp = Files.createTempDirectory("graft-backfill").toString
  private val srcDir = s"$tmp/src"

  private lazy val source = {
    Transcripts.synthetic(spark, nConvs = 40, turnsPerConv = 15, seed = 11L)
      .withColumn("ds", date_format(col("ts"), "yyyy-MM-dd"))
      .write.partitionBy("ds").mode("overwrite").parquet(srcDir)
    spark.read.option("basePath", srcDir).parquet(srcDir)
  }

  private def job(df: org.apache.spark.sql.DataFrame) = Backfill.dailyFeatureJob(df)

  test("kill mid-run, resume, and no-op re-run; output equals single pass") {
    val nParts = source.select("ds").distinct().count()
    assert(nParts >= 2, s"fixture must span several day partitions, got $nParts")

    // 1. killed run: only 2 partitions complete
    val r1 = Backfill.run(spark, source, "ds", s"$tmp/out", s"$tmp/ckpt",
      job, lookbackPartitions = 1, maxPartitions = 2)
    assert(r1.length == 2)
    assert(Backfill.completedPartitions(s"$tmp/ckpt") == r1.map(_.partition).sorted)

    // 2. resume: finishes the rest, does not redo the first two
    val r2 = Backfill.run(spark, source, "ds", s"$tmp/out", s"$tmp/ckpt",
      job, lookbackPartitions = 1)
    assert(r2.map(_.partition).toSet.intersect(r1.map(_.partition).toSet).isEmpty)
    assert((r1 ++ r2).map(_.partition).length == nParts)

    // 3. idempotent: nothing left to do
    val r3 = Backfill.run(spark, source, "ds", s"$tmp/out", s"$tmp/ckpt",
      job, lookbackPartitions = 1)
    assert(r3.isEmpty)

    // 4. resumed output == fresh single-pass output
    Backfill.run(spark, source, "ds", s"$tmp/out2", s"$tmp/ckpt2",
      job, lookbackPartitions = 1)
    val a = Backfill.readOutput(spark, s"$tmp/out")
    val b = Backfill.readOutput(spark, s"$tmp/out2")
    assert(a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty)

    // 5. every output row stayed in its own partition
    val base = source.withColumn("text_len", length(col("text")))
    assert(a.select("conv_id", "turn_idx", "ds").except(
      base.select("conv_id", "turn_idx", "ds")).isEmpty)
  }

  test("two interleaved resumes run each partition exactly once; manifests consistent") {
    import java.util.concurrent.CyclicBarrier
    val nParts = source.select("ds").distinct().count()
    val barrier = new CyclicBarrier(2)
    val results = new Array[Seq[Backfill.PartitionResult]](2)
    val threads = (0 to 1).map { i =>
      new Thread(() => {
        barrier.await() // both drivers list the same pending set
        results(i) = Backfill.run(spark, source, "ds",
          s"$tmp/out_race", s"$tmp/ckpt_race", job, lookbackPartitions = 1)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val all = results(0).map(_.partition) ++ results(1).map(_.partition)
    // the per-partition lock + isComplete re-check means no partition is
    // claimed by both drivers, and together they cover everything
    assert(all.distinct.length == all.length,
      s"a partition ran on both drivers: ${all.sorted.mkString(",")}")
    assert(all.toSet.size.toLong == nParts, s"coverage gap: $all")
    assert(Backfill.completedPartitions(s"$tmp/ckpt_race").length.toLong == nParts)
    // racing drivers produced exactly the single-pass output
    Backfill.run(spark, source, "ds", s"$tmp/out_single", s"$tmp/ckpt_single",
      job, lookbackPartitions = 1)
    val a = Backfill.readOutput(spark, s"$tmp/out_race")
    val b = Backfill.readOutput(spark, s"$tmp/out_single")
    assert(a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("maxPartitions budget counts RUN partitions, not ones another driver holds") {
    val ckpt = s"$tmp/ckpt_budget"; val out = s"$tmp/out_budget"
    val first = source.select(col("ds").cast("string")).distinct().orderBy("ds")
      .collect().map(_.getString(0)).head
    // a contending driver holds the first pending partition's claim for
    // the whole run
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      graft.engine.Locks.withFileLock(s"$ckpt/$first.json") {
        started.countDown(); release.await()
      })
    holder.start(); started.await()
    try {
      // budget 1 must complete ONE partition — spending the budget on the
      // held partition (pre-fix pending.take) would return empty with
      // work still pending
      val r = Backfill.run(spark, source, "ds", out, ckpt, job,
        lookbackPartitions = 1, maxPartitions = 1)
      assert(r.length == 1, r.toString)
      assert(r.head.partition != first, r.toString)
    } finally { release.countDown(); holder.join() }
  }

  test("manifest carries lineage and metrics") {
    // runs after the previous test (same ckpt dir) — read one manifest
    val parts = Backfill.completedPartitions(s"$tmp/ckpt")
    assert(parts.nonEmpty)
    val json = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/ckpt", s"${parts.head}.json")))
    for (k <- Seq("\"status\": \"complete\"", "input_rows", "output_rows",
        "input_files", "duration_ms", "rows_per_sec"))
      assert(json.contains(k), s"manifest missing $k:\n$json")
    // lineage points at real source files of this partition
    assert(json.contains(".parquet"))
  }

  test("manifest pins the source snapshot id when one is supplied") {
    val src = spark.read.option("basePath", s"$tmp/src").parquet(s"$tmp/src")
    val ckpt = s"$tmp/ckpt_snap"
    Backfill.run(spark, src, "ds", s"$tmp/out_snap", ckpt,
      identity, maxPartitions = 1, sourceSnapshot = Some("8772871634897"))
    val parts = Backfill.completedPartitions(ckpt)
    val json = new String(Files.readAllBytes(
      java.nio.file.Paths.get(ckpt, s"${parts.head}.json")))
    assert(json.contains("\"source_snapshot\": \"8772871634897\""), json)
    assert(json.contains("\"status\": \"complete\""), "snapshot line must not break the manifest")
  }

  test("incremental materialization resumes from the interval ledger") {
    import java.sql.Timestamp
    import graft.engine.Materialize
    val dir = s"$tmp/intervals"
    val src = Transcripts.synthetic(spark, nConvs = 8, turnsPerConv = 10, seed = 3L)
    val view = FeatureView("mview", src, Seq("conv_id"), "ts", None, 0L,
      features = Seq("turn_idx"), tieBreakCols = Seq("turn_idx"))
    val t1 = Timestamp.valueOf("2026-01-03 00:00:00")
    val t2 = Timestamp.valueOf("2026-01-09 00:00:00")

    val (df1, (s1, e1)) = Materialize.incremental(view, t1, dir)
    assert(s1 == Timestamp.valueOf("1970-01-01 00:00:00") && e1 == t1)
    assert(df1.count() > 0)
    Materialize.recordInterval(dir, view.name, s1, e1)

    // second run starts exactly where the ledger ends
    val (df2, (s2, e2)) = Materialize.incremental(view, t2, dir)
    assert(s2 == t1 && e2 == t2)
    val tsVals = df2.select(col("ts")).collect().map(_.getTimestamp(0))
    assert(tsVals.forall(_.after(t1)),
      "delta slice is (t1, t2] — boundary rows at exactly t1 belong to run 1")
    Materialize.recordInterval(dir, view.name, s2, e2)
    assert(Materialize.mostRecentEnd(dir, view.name).contains(t2))
  }

  test("incremental resume filters through the field mapping, not the raw source") {
    import java.sql.Timestamp
    import graft.engine.Materialize
    val dir = s"$tmp/intervals_mapped"
    // raw source column is event_time; the view's tsCol names the MAPPED
    // name — the resume filter on the raw source would fail (no 'ts'
    // column) or, with an unrelated raw 'ts', filter the wrong column
    val raw = Transcripts.synthetic(spark, nConvs = 6, turnsPerConv = 8, seed = 5L)
      .withColumnRenamed("ts", "event_time")
    val view = FeatureView("mapped_view", raw, Seq("conv_id"), "ts", None, 0L,
      features = Seq("turn_idx"), fieldMapping = Map("event_time" -> "ts"),
      tieBreakCols = Seq("turn_idx"))
    // t1 sits INSIDE the synthetic data's time range (convs start at
    // base + ci hours on 2026-01-01) so the resumed (t1, t2] slice is
    // provably non-empty — an always-empty delta would pass vacuously
    val t1 = Timestamp.valueOf("2026-01-01 03:00:00")
    val t2 = Timestamp.valueOf("2026-01-09 00:00:00")
    val (df1, (s1, e1)) = Materialize.incremental(view, t1, dir)
    assert(df1.count() > 0)
    Materialize.recordInterval(dir, view.name, s1, e1)
    val (df2, (s2, e2)) = Materialize.incremental(view, t2, dir)
    assert(s2 == t1 && e2 == t2)
    // the resumed slice must respect (t1, t2] through the mapping
    val tsVals = df2.select(col("ts")).collect().map(_.getTimestamp(0))
    assert(tsVals.nonEmpty && tsVals.forall(_.after(t1)))
  }

  test("partition values with path separators neither escape dirs nor lose resume state") {
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    val ckpt = s"$tmp/ckpt_slash"
    val out = s"$tmp/out_slash"
    val src = Seq(
      ("2024/01/01", "a", 1L), ("2024/01/01", "b", 2L),
      ("2024/01/02", "c", 3L)
    ).toDF("grp", "k", "v")
    val r1 = Backfill.run(spark, src, "grp", out, ckpt, (d: DataFrame) => d)
    assert(r1.map(_.partition).sorted == Seq("2024/01/01", "2024/01/02"))
    // manifests recover the TRUE values (not the sanitized filenames)
    assert(Backfill.completedPartitions(ckpt) == Seq("2024/01/01", "2024/01/02"))
    // re-run is a no-op (resume state survived the sanitization round trip)
    assert(Backfill.run(spark, src, "grp", out, ckpt, (d: DataFrame) => d).isEmpty)
    // output partition discovery round-trips the escaped value
    val back = Backfill.readOutput(spark, out)
    assert(back.count() == 3)
    assert(back.select("grp").distinct().collect().map(_.getString(0)).sorted
      === Array("2024/01/01", "2024/01/02"))
  }

  test("sanitize-colliding partition values keep separate manifests and converge") {
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    // "2024/01/01" sanitizes to "2024_01_01" — identical to the literal
    // value "2024_01_01". Sharing one manifest file would make each run
    // un-complete the other: a 'run until pending empty' driver loop never
    // terminates. The digest suffix keeps the files distinct.
    val ckpt = s"$tmp/ckpt_collide"
    val out = s"$tmp/out_collide"
    val src = Seq(
      ("2024/01/01", "a", 1L), ("2024_01_01", "b", 2L)
    ).toDF("grp", "k", "v")
    val r1 = Backfill.run(spark, src, "grp", out, ckpt, (d: DataFrame) => d)
    assert(r1.map(_.partition).sorted == Seq("2024/01/01", "2024_01_01"))
    assert(Backfill.completedPartitions(ckpt).sorted ==
      Seq("2024/01/01", "2024_01_01"))
    // BOTH complete → re-run is a no-op, and stays one on a third pass
    assert(Backfill.run(spark, src, "grp", out, ckpt, (d: DataFrame) => d).isEmpty)
    assert(Backfill.run(spark, src, "grp", out, ckpt, (d: DataFrame) => d).isEmpty)
    assert(Backfill.readOutput(spark, out).count() == 2)
  }

  test("ledger reader tolerates format drift in the writer (field-level parse)") {
    import java.sql.Timestamp
    import graft.engine.Materialize
    val dir = s"$tmp/intervals_fmt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // a compact-format line (no spaces after colons — the kind of tweak a
    // future recordInterval refactor would make) must still parse: an
    // exact-prefix reader would silently orphan every prior interval and
    // restart materialization from scratch
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "fmt_view.intervals.jsonl"),
      """{"view":"fmt_view","start":"1970-01-01 00:00:00","end":"2026-03-01 00:00:00"}""" + "\n")
    assert(Materialize.mostRecentEnd(dir, "fmt_view")
      .contains(Timestamp.valueOf("2026-03-01 00:00:00")))
    // and the current writer's own format round-trips (reader/writer coupling)
    val end2 = Timestamp.valueOf("2026-04-01 00:00:00")
    Materialize.recordInterval(dir, "fmt_view",
      Timestamp.valueOf("2026-03-01 00:00:00"), end2)
    assert(Materialize.mostRecentEnd(dir, "fmt_view").contains(end2))
  }

  test("ledger: filename-colliding view names do not share intervals") {
    import java.sql.Timestamp
    import graft.engine.Materialize
    // 'sales/eu' and 'sales:eu' both sanitize to the same ledger FILE;
    // resume state must still be per-view (matched on the JSON view field),
    // or a view would silently resume past data it never materialized
    val dir = s"$tmp/intervals_collide"
    val end = Timestamp.valueOf("2026-02-01 00:00:00")
    Materialize.recordInterval(dir, "sales/eu",
      Timestamp.valueOf("1970-01-01 00:00:00"), end)
    assert(Materialize.mostRecentEnd(dir, "sales/eu").contains(end))
    assert(Materialize.mostRecentEnd(dir, "sales:eu").isEmpty)
  }

  test("iceberg runtime is absent in this sandbox and the seam reports it") {
    assert(!graft.sources.IcebergSource.available(spark),
      "sandbox has no iceberg-spark-runtime; if this starts passing, wire the native scan")
    assert(graft.sources.IcebergSource.currentSnapshotId(spark, "cat.db.tbl").isEmpty)
    // the scan seam itself fails loudly (ClassNotFound through Spark's
    // DataSource lookup), never silently returns an empty frame
    intercept[Exception] {
      graft.sources.IcebergSource.table(spark, "cat.db.tbl").count()
    }
    // option validation is runtime-independent
    intercept[IllegalArgumentException] {
      graft.sources.IcebergSource.table(spark, "cat.db.tbl",
        snapshotId = Some(1L), asOfTimestampMs = Some(2L))
    }
  }

  /** End-to-end Iceberg scan + snapshot pinning — self-activating: skipped
    * (not silently passed) while `iceberg-spark-runtime` is off the
    * classpath (this sandbox has no jar and zero egress — BASELINE.md
    * documents the gap); the moment the engine meets a real Iceberg
    * deployment this exercises IcebergSource.table + currentSnapshotId
    * against a local Hadoop catalog with no code change.
    */
  test("iceberg e2e: table scan + snapshot pinning (skips without runtime)") {
    assume(graft.sources.IcebergSource.available(spark),
      "iceberg-spark-runtime not on classpath — explicit tested skip")
    val warehouse = Files.createTempDirectory("graft_iceberg").toString
    spark.conf.set("spark.sql.catalog.graft_ice", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.graft_ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.graft_ice.warehouse", warehouse)
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v")
      .writeTo("graft_ice.db.t").using("iceberg").createOrReplace()
    val snap1 = graft.sources.IcebergSource.currentSnapshotId(spark, "graft_ice.db.t")
    assert(snap1.nonEmpty)
    Seq((2L, "b")).toDF("id", "v").writeTo("graft_ice.db.t").append()
    assert(graft.sources.IcebergSource.table(spark, "graft_ice.db.t").count() == 2L)
    // time travel back to the pinned snapshot sees only the first row
    assert(graft.sources.IcebergSource.table(spark, "graft_ice.db.t",
      snapshotId = snap1).count() == 1L)
  }

  test("torn manifest is not treated as complete") {
    val ckpt = s"$tmp/ckpt3"
    Files.createDirectories(java.nio.file.Paths.get(ckpt))
    Files.write(java.nio.file.Paths.get(ckpt, "2026-01-01.json"),
      "{\"partition\": \"2026-01-01\", \"status\": \"running".getBytes)
    assert(!Backfill.isComplete(ckpt, "2026-01-01"))
    assert(Backfill.completedPartitions(ckpt).isEmpty)
  }
}
