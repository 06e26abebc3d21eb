package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import java.sql.Timestamp

/** Deterministic transcript-table construction.
  *
  * Two paths:
  *  1. [[fromEvents]] — derives the (conv_id, turn_idx, role, text, tool, ts)
  *     transcript shape (BASELINE.json:input_hint) from the driver-generated
  *     `events.parquet` via transforms that are expressible identically in
  *     ANSI SQL, so the DuckDB oracle can reconstruct the exact same table.
  *  2. [[synthetic]] — a pure seeded generator (never `now()`) used by
  *     ScalaTest golden tests per FIXTURES.md §F1, including hot-conversation
  *     skew and >30 min session gaps.
  */
object Transcripts {

  /** Transcript derived from events.parquet. One event = one turn;
    * conversations are per user; turn order is (ts, event_id) — event_id is
    * unique so the ordering (and thus turn_idx) is total and deterministic.
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(
      concat(lit("conv_"), col("user_id").cast("string")).as("conv_id"),
      (row_number().over(w) - 1).as("turn_idx"),
      when(pmod(col("event_id"), lit(3)) === 0, lit("user"))
        .when(pmod(col("event_id"), lit(3)) === 1, lit("assistant"))
        .otherwise(lit("tool")).as("role"),
      concat(col("event_type"), lit(" "), col("props")).as("text"),
      when(pmod(col("event_id"), lit(3)) === 2, col("event_type"))
        .otherwise(lit(null).cast("string")).as("tool"),
      col("ts")
    )
  }

  /** Matching DuckDB CTE body for [[fromEvents]] (same table, same rows). */
  val fromEventsSql: String =
    """SELECT concat('conv_', CAST(user_id AS VARCHAR)) AS conv_id,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
      |  CASE WHEN event_id % 3 = 0 THEN 'user' WHEN event_id % 3 = 1 THEN 'assistant' ELSE 'tool' END AS role,
      |  concat(event_type, ' ', props) AS text,
      |  CASE WHEN event_id % 3 = 2 THEN event_type ELSE NULL END AS tool,
      |  ts
      |FROM events""".stripMargin

  /** Entity dataframe derived from events (FIXTURES.md §F2): a seeded mix of
    * exact-boundary timestamps (feature_ts == event_ts must match — `<=`
    * semantics, reference template spark.py:1793), mid-gap timestamps, and
    * ~unknown conv_ids that must surface all-null features (left-join
    * preservation, dask.py:1176-1195). `label` is a passthrough column.
    */
  def entityFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val conv = concat(lit("conv_"), col("user_id").cast("string"))
    val exact = ev.filter(pmod(col("event_id"), lit(7)) === 0)
      .select(conv.as("conv_id"), col("ts").as("event_ts"), col("value").as("label"))
    val midGap = ev.filter(pmod(col("event_id"), lit(7)) === 3)
      .select(conv.as("conv_id"),
        (col("ts") + expr("INTERVAL 30 SECONDS")).as("event_ts"),
        col("value").as("label"))
    val unknown = ev.filter(pmod(col("event_id"), lit(7)) === 5)
      .select(concat(lit("conv_"), (col("user_id") + 100000).cast("string")).as("conv_id"),
        col("ts").as("event_ts"), col("value").as("label"))
    exact.unionByName(midGap).unionByName(unknown)
  }

  /** Matching DuckDB CTE body for [[entityFrame]]. */
  val entityFrameSql: String =
    """SELECT concat('conv_', CAST(user_id AS VARCHAR)) AS conv_id, ts AS event_ts, value AS label
      |FROM events WHERE event_id % 7 = 0
      |UNION ALL
      |SELECT concat('conv_', CAST(user_id AS VARCHAR)), ts + INTERVAL 30 SECOND, value
      |FROM events WHERE event_id % 7 = 3
      |UNION ALL
      |SELECT concat('conv_', CAST(user_id + 100000 AS VARCHAR)), ts, value
      |FROM events WHERE event_id % 7 = 5""".stripMargin

  /** A versioned per-conversation quality view with a created-timestamp
    * column, for backfill-dedup semantics (FIXTURES.md §F3; reference
    * test_universal_historical_retrieval.py:538-633). Every event yields a
    * (conv_id, score, ts, created_ts) row where created_ts = ts + (event_id
    * mod 3) days — so the same logical ts appears with several versions.
    */
  def convQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    ev.select(
      concat(lit("conv_"), col("user_id").cast("string")).as("conv_id"),
      (col("value") + pmod(col("event_id"), lit(3)) * 1000.0).as("score"),
      col("ts"),
      (col("ts") + pmod(col("event_id"), lit(3)).cast("int") * expr("INTERVAL 1 DAY")).as("created_ts"),
      col("event_id")
    )
  }

  val convQualitySql: String =
    """SELECT concat('conv_', CAST(user_id AS VARCHAR)) AS conv_id,
      |  value + (event_id % 3) * 1000.0 AS score,
      |  ts,
      |  ts + CAST(event_id % 3 AS INT) * INTERVAL 1 DAY AS created_ts,
      |  event_id
      |FROM events""".stripMargin

  // ---------------------------------------------------------------------
  // Seeded synthetic generator (test-only input; FIXTURES.md §F1).
  // ---------------------------------------------------------------------

  private val baseTs = 1767225600000L // 2026-01-01T00:00:00Z, fixed — never now()

  /** Deterministic pure generator. ~1% of conversations are "hot" with 50x
    * more turns (skew fixtures); gaps > 30 min are injected every ~12 turns
    * to create session boundaries.
    */
  def synthetic(spark: SparkSession, nConvs: Int, turnsPerConv: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val rows = syntheticRows(nConvs, turnsPerConv, seed)
    spark.createDataset(rows).toDF()
  }

  /** Fully distributed deterministic generator for scale benchmarks: no
    * driver-side materialization, no RNG state — every column is a pure
    * function of (conv id, turn_idx) via xxhash64, so the same (nConvs,
    * turnsPerConv) always yields the same table at any parallelism.
    * Timestamps are strictly increasing per conversation (base + 600 s per
    * turn + hash jitter < 300 s). ~1% of conversations are hot with 50×
    * more turns (skew fixture, FIXTURES.md §F1).
    */
  def syntheticDistributed(spark: SparkSession, nConvs: Long, turnsPerConv: Int): DataFrame = {
    val id = col("id")
    spark.range(nConvs)
      .withColumn("n",
        when(pmod(id, lit(100)) === 7, lit(turnsPerConv * 50)).otherwise(lit(turnsPerConv)))
      .select(id, explode(sequence(lit(0), col("n") - 1)).as("turn_idx"))
      .select(
        concat(lit("conv_"), format_string("%09d", id)).as("conv_id"),
        col("turn_idx").cast("int").as("turn_idx"),
        when(pmod(col("turn_idx"), lit(3)) === 0, lit("user"))
          .when(pmod(col("turn_idx"), lit(3)) === 1, lit("assistant"))
          .otherwise(lit("tool")).as("role"),
        concat(lit("c="), id, lit(" t="), col("turn_idx")).as("text"),
        when(pmod(col("turn_idx"), lit(3)) === 2,
          element_at(lit(Array("search", "bash", "browser", "editor")),
            (pmod(xxhash64(id, col("turn_idx")), lit(4)) + 1).cast("int")))
          .otherwise(lit(null).cast("string")).as("tool"),
        timestamp_millis(
          lit(baseTs) + id * 3600000L + col("turn_idx") * 600000L +
            pmod(xxhash64(id, col("turn_idx"), lit(1)), lit(300000L))).as("ts"))
  }

  def syntheticRows(nConvs: Int, turnsPerConv: Int, seed: Long = 42L): Seq[Turn] = {
    val tools = Array("search", "bash", "browser", "editor")
    (0 until nConvs).flatMap { ci =>
      val rnd = new scala.util.Random(seed * 1000003L + ci)
      val hot = ci % 100 == 7
      val n = if (hot) turnsPerConv * 50 else turnsPerConv
      val convId = f"conv_$ci%06d"
      var t = baseTs + ci.toLong * 3600L * 1000L
      (0 until n).map { ti =>
        val gapMs =
          if (ti == 0) 0L
          else if (ti % 12 == 0) (31 + rnd.nextInt(90)) * 60L * 1000L // session break
          else (5 + rnd.nextInt(895)) * 1000L // 5 s .. 15 min
        t += gapMs
        val role = ti % 3 match {
          case 0 => "user"
          case 1 => "assistant"
          case _ => if (rnd.nextBoolean()) "tool" else "assistant"
        }
        val tool = if (role == "tool") tools(rnd.nextInt(tools.length)) else null
        Turn(convId, ti, role, s"c=$convId t=$ti r=$role seed=$seed", tool,
          new Timestamp(t))
      }
    }
  }
}
