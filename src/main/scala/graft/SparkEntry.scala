package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Historical
import graft.pit.PointInTimeJoin

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query reads the driver-generated parquet under `dir`, derives the
  * transcript/entity tables deterministically (Transcripts.scala), runs one
  * engine operator, and has a DuckDB-equivalent oracle in [[oracleSql]]
  * reconstructing the same tables in ANSI SQL.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("pit_latest_turn")(spark, "/root/testdata/sf0.001")

  // --- shared view builders -------------------------------------------------

  /** turn_stats feature view over the transcript (FIXTURES.md F1 derived
    * view): per-turn features turn_idx, role, text_len, is_tool, turn_ts. */
  private def turnStatsView(spark: SparkSession, dir: String, ttlSec: Long): FeatureView = {
    val src = Transcripts.fromEvents(spark, dir).select(
      col("conv_id"), col("ts"), col("turn_idx"), col("role"),
      length(col("text")).as("text_len"),
      col("tool").isNotNull.as("is_tool"),
      col("ts").as("turn_ts"))
    FeatureView("turn_stats", src, Seq("conv_id"), "ts", None, ttlSec,
      features = Seq("turn_idx", "role", "text_len", "is_tool", "turn_ts"),
      tieBreakCols = Seq("turn_idx"))
  }

  private def convQualityView(spark: SparkSession, dir: String): FeatureView =
    FeatureView("conv_quality", Transcripts.convQuality(spark, dir),
      Seq("conv_id"), "ts", Some("created_ts"), 0L,
      features = Seq("score"), tieBreakCols = Seq("event_id"))

  // --- queries ---------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1-J7: single-view PIT join with TTL (SURVEY §2.3).
    "pit_latest_turn" -> ((s, dir) =>
      Historical.getHistoricalFeatures(
        Transcripts.entityFrame(s, dir),
        Seq(turnStatsView(s, dir, ttlSec = 4 * 3600L)))),
    // No-TTL variant (offline_utils.py:144-147 — ttl 0 = unbounded below).
    "pit_no_ttl" -> ((s, dir) =>
      Historical.getHistoricalFeatures(
        Transcripts.entityFrame(s, dir),
        Seq(turnStatsView(s, dir, ttlSec = 0L).copy(
          features = Seq("turn_idx", "role"))))),
    // created_ts dedup tie-breaking (J4/J5; backfill semantics
    // test_universal_historical_retrieval.py:538-633).
    "pit_created_dedup" -> ((s, dir) =>
      Historical.getHistoricalFeatures(
        Transcripts.entityFrame(s, dir),
        Seq(convQualityView(s, dir)))),
    // created_ts anti-leak cutoff (P8; template spark.py:1799-1801).
    "pit_created_filter" -> ((s, dir) =>
      Historical.getHistoricalFeatures(
        Transcripts.entityFrame(s, dir),
        Seq(convQualityView(s, dir)), filterByCreatedTs = true))
  )

  // --- oracles ----------------------------------------------------------------

  private def withTables(body: String): String =
    s"""WITH transcript AS (${Transcripts.fromEventsSql}),
       |entity AS (${Transcripts.entityFrameSql}),
       |conv_quality AS (${Transcripts.convQualitySql})
       |$body""".stripMargin

  private val turnStatsSql =
    """SELECT conv_id, ts, turn_idx, role, length(text) AS text_len,
      |  tool IS NOT NULL AS is_tool, ts AS turn_ts FROM transcript""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "pit_latest_turn" -> withTables(
      s""", feat AS ($turnStatsSql),
         |j AS (
         |  SELECT e.conv_id, e.event_ts, f.turn_idx, f.role, f.text_len, f.is_tool, f.turn_ts,
         |    row_number() OVER (PARTITION BY e.conv_id, e.event_ts
         |                       ORDER BY f.ts DESC, f.turn_idx DESC) AS rn
         |  FROM (SELECT DISTINCT conv_id, event_ts FROM entity) e
         |  JOIN feat f ON f.conv_id = e.conv_id
         |   AND f.ts <= e.event_ts AND f.ts >= e.event_ts - INTERVAL 4 HOUR)
         |SELECT e.conv_id, e.event_ts, e.label, j.turn_idx, j.role, j.text_len, j.is_tool, j.turn_ts
         |FROM entity e LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
         |  ON j.conv_id = e.conv_id AND j.event_ts = e.event_ts""".stripMargin),
    "pit_no_ttl" -> withTables(
      s""", j AS (
         |  SELECT e.conv_id, e.event_ts, f.turn_idx, f.role,
         |    row_number() OVER (PARTITION BY e.conv_id, e.event_ts
         |                       ORDER BY f.ts DESC, f.turn_idx DESC) AS rn
         |  FROM (SELECT DISTINCT conv_id, event_ts FROM entity) e
         |  JOIN transcript f ON f.conv_id = e.conv_id AND f.ts <= e.event_ts)
         |SELECT e.conv_id, e.event_ts, e.label, j.turn_idx, j.role
         |FROM entity e LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
         |  ON j.conv_id = e.conv_id AND j.event_ts = e.event_ts""".stripMargin),
    "pit_created_dedup" -> withTables(
      s""", j AS (
         |  SELECT e.conv_id, e.event_ts, q.score,
         |    row_number() OVER (PARTITION BY e.conv_id, e.event_ts
         |                       ORDER BY q.ts DESC, q.created_ts DESC, q.event_id DESC) AS rn
         |  FROM (SELECT DISTINCT conv_id, event_ts FROM entity) e
         |  JOIN conv_quality q ON q.conv_id = e.conv_id AND q.ts <= e.event_ts)
         |SELECT e.conv_id, e.event_ts, e.label, j.score
         |FROM entity e LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
         |  ON j.conv_id = e.conv_id AND j.event_ts = e.event_ts""".stripMargin),
    "pit_created_filter" -> withTables(
      s""", j AS (
         |  SELECT e.conv_id, e.event_ts, q.score,
         |    row_number() OVER (PARTITION BY e.conv_id, e.event_ts
         |                       ORDER BY q.ts DESC, q.created_ts DESC, q.event_id DESC) AS rn
         |  FROM (SELECT DISTINCT conv_id, event_ts FROM entity) e
         |  JOIN conv_quality q ON q.conv_id = e.conv_id AND q.ts <= e.event_ts
         |   AND q.created_ts <= e.event_ts)
         |SELECT e.conv_id, e.event_ts, e.label, j.score
         |FROM entity e LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
         |  ON j.conv_id = e.conv_id AND j.event_ts = e.event_ts""".stripMargin)
  )
}
