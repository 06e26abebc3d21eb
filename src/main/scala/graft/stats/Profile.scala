package graft.stats

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Monitoring / profiling pack (reference A9-A11: spark.py:777-963):
  * one-pass numeric stats, fixed-width histogram, categorical top-N.
  */
object Profile {

  /** One-pass numeric column stats (spark.py:777-854). Uses exact
    * `percentile` so results are oracle-comparable; swap for
    * `percentile_approx` at 100 TB (single-pass sketch, same call shape).
    * Doubles rounded to 6 places: cross-engine float sums are
    * order-dependent, the rounding makes hashes comparable.
    */
  def numericStats(df: DataFrame, column: String): DataFrame = {
    val c = col(column)
    df.agg(
      count(lit(1)).as("n_rows"),
      count(c).as("n_nonnull"),
      round(avg(c), 6).as("mean"),
      round(stddev_samp(c), 6).as("std"),
      round(min(c), 6).as("min_v"),
      round(max(c), 6).as("max_v"),
      round(percentile(c, lit(0.5)), 6).as("p50"),
      round(percentile(c, lit(0.75)), 6).as("p75"),
      round(percentile(c, lit(0.9)), 6).as("p90"),
      round(percentile(c, lit(0.95)), 6).as("p95"),
      round(percentile(c, lit(0.99)), 6).as("p99"))
  }

  /** Categorical cardinality (the COUNT(DISTINCT col) half of the
    * reference's top-N profile, spark.py:908-963). Exact here for oracle
    * comparability; at 100 TB swap `countDistinct` for
    * `approx_count_distinct` (single-pass HLL sketch, same call shape).
    */
  def distinctCount(df: DataFrame, column: String): DataFrame =
    df.agg(
      countDistinct(col(column)).as("n_distinct"),
      count(col(column)).as("n_nonnull"))

  /** Fixed-width histogram (spark.py:857-905): bucket =
    * LEAST(GREATEST(FLOOR((x−min)/w)+1, 1), bins). Two-pass: min/max first
    * (a tiny agg action), then one groupBy.
    */
  def histogram(df: DataFrame, column: String, bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val c = col(column)
    val boundsRow = df.agg(min(c).cast("double"), max(c).cast("double")).head()
    if (boundsRow.isNullAt(0) || boundsRow.isNullAt(1))
      // empty or all-NULL column: an empty histogram, not a MatchError
      return df.sparkSession.emptyDataFrame
        .select(lit(0).as("bucket"), lit(0L).as("cnt")).limit(0)
    val (mn, mx) = (boundsRow.getDouble(0), boundsRow.getDouble(1))
    val width = (mx - mn) / bins
    // a constant column (min == max) has zero bin width: the division
    // would raise DIVIDE_BY_ZERO under ANSI and silently NULL-route under
    // non-ANSI — every value IS the single occupied bucket instead
    val bucket =
      if (width == 0.0) lit(1)
      else least(greatest(floor((c - lit(mn)) / lit(width)) + 1, lit(1)), lit(bins))
    df.filter(c.isNotNull)
      .groupBy(bucket.cast("int").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Categorical top-N (spark.py:908-963), deterministically tie-broken.
    * Tie-break is asc NULLS LAST — Spark's bare asc sorts nulls FIRST
    * while standard SQL engines (the oracle included) sort them LAST, so a
    * NULL category tying at the limit-n cut would select different rows.
    */
  def topN(df: DataFrame, column: String, n: Int): DataFrame =
    df.groupBy(col(column))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(column).asc_nulls_last)
      .limit(n)

  /** Table freshness for the monitoring sink (the `_freshness` table of
    * Sinks.ensureMonitoringTables; reference monitoring DDL spark.py:
    * 671-744): newest event timestamp + row count in one agg pass.
    */
  def freshness(df: DataFrame, tsCol: String): DataFrame =
    df.agg(max(col(tsCol)).as("max_event_ts"), count(lit(1)).as("row_count"))
}
