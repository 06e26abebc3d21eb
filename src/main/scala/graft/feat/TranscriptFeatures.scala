package graft.feat

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** North-rule transcript feature pack (BASELINE.json:north_star): lag/lead,
  * per-role rolling aggregates, tool-usage counts over TTL windows, and
  * sessionization by inactivity gap. The reference has no lag/lead/session
  * operators (SURVEY §2.5) — these are the Catalyst Window idioms its users
  * would need on transcript data.
  *
  * All windows partition by conv_id (and role for per-role), so the only
  * shuffle is a hash partition on the conversation key — the natural
  * distribution key at 10^12 turns. Range frames order by epoch
  * microseconds (a long) so frames are exact and codegen-friendly.
  */
object TranscriptFeatures {

  private def us(c: String) = unix_micros(col(c).cast("timestamp"))

  /** lag/lead features per turn: previous role, previous ts gap, next gap.
    * Gaps in exact epoch microseconds.
    */
  def lagLead(transcript: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    transcript.select(
      col("conv_id"), col("turn_idx"), col("role"),
      lag(col("role"), 1).over(w).as("prev_role"),
      lead(col("role"), 1).over(w).as("next_role"),
      (us("ts") - lag(us("ts"), 1).over(w)).as("gap_prev_us"),
      (lead(us("ts"), 1).over(w) - us("ts")).as("gap_next_us"))
  }

  /** Per-role rolling aggregate: avg/count of `valueCol` over the trailing
    * `windowSec` seconds *within the same (conv_id, role)* stream.
    */
  def rollingPerRole(transcript: DataFrame, valueCol: String, windowSec: Long): DataFrame = {
    val w = Window.partitionBy(col("conv_id"), col("role"))
      .orderBy(us("ts"))
      .rangeBetween(-windowSec * 1000000L, 0L)
    transcript.select(
      col("conv_id"), col("turn_idx"), col("role"),
      count(col(valueCol)).over(w).as("role_cnt_w"),
      sum(col(valueCol)).over(w).as("role_sum_w"),
      avg(col(valueCol)).over(w).as("role_avg_w"))
  }

  /** Tool-usage count over a trailing TTL window per conversation:
    * count(tool) skips non-tool turns (tool is null there).
    */
  def toolUsage(transcript: DataFrame, windowSec: Long): DataFrame = {
    val w = Window.partitionBy(col("conv_id"))
      .orderBy(us("ts"))
      .rangeBetween(-windowSec * 1000000L, 0L)
    transcript.select(
      col("conv_id"), col("turn_idx"),
      count(col("tool")).over(w).as("tool_cnt_w"),
      count(lit(1)).over(w).as("turn_cnt_w"))
  }

  /** Sessionization by inactivity gap: session_id = running count of gaps
    * greater than `gapSec` (cumulative-sum-of-gap-flags; SURVEY §2.5 last
    * row), plus the turn's 1-based position inside its session.
    */
  def sessionize(transcript: DataFrame, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val flagged = transcript.select(
      col("conv_id"), col("turn_idx"), col("ts"),
      when(us("ts") - lag(us("ts"), 1).over(w) > gapSec * 1000000L, 1L)
        .otherwise(0L).as("__new_session"))
    val withSession = flagged.withColumn(
      "session_id",
      sum(col("__new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy(col("conv_id"), col("session_id")).orderBy(col("turn_idx"))
    withSession
      .withColumn("turn_in_session", row_number().over(ws))
      .drop("__new_session", "ts")
  }
}
