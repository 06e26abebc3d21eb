package graft.engine

import graft.FeatureView
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Materialization's core query: pull the latest feature row per entity key
  * within a time slice (reference: spark.py:98-166 `pull_latest_from_table_
  * or_query` — ROW_NUMBER() OVER (PARTITION BY join_keys ORDER BY ts DESC,
  * created DESC) = 1). We use the same partial-aggregable max_by trick as
  * the PIT join instead of a window sort.
  */
object Materialize {

  def latestPerKey(view: FeatureView, start: Timestamp, end: Timestamp): DataFrame = {
    val feats = view.resolvedFeatures
    val minTs = lit("1900-01-01 00:00:00").cast("timestamp")
    val ordCols = col(view.tsCol) +:
      (view.createdTsCol.map(c => coalesce(col(c), minTs)).toSeq ++
        view.tieBreakCols.map(col))
    val payloadCols = (feats :+ view.tsCol) ++ view.createdTsCol.toSeq
    val sliced = view.source
      .filter(col(view.tsCol) >= lit(start) && col(view.tsCol) <= lit(end))
    sliced
      .groupBy(view.joinKeys.map(col): _*)
      .agg(max_by(struct(payloadCols.distinct.map(col): _*), struct(ordCols: _*)).as("__best"))
      .select(view.joinKeys.map(col) ++
        payloadCols.distinct.map(c => col("__best." + c).as(c)): _*)
  }
}
