package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sawtooth tiling: pre-aggregate events into fixed `hop`-sized tiles of
  * intermediate representations (IRs), forward-fill a dense hop grid per
  * entity, take cumulative IRs, and recover the windowed aggregate by tile
  * subtraction `windowed(T) = cumulative(T) − cumulative(T − W)`.
  *
  * Reference: aggregation/tiling/orchestrator.py:18-189 (tiles + grid +
  * cumsum, pure pandas there) and tiling/tile_subtraction.py:17-153
  * (algebraic sum/count subtract directly; holistic avg/std/var subtract the
  * IRs (sum, count, sum_sq) then recompute; max/min fall back to cumulative
  * — the sawtooth approximation; count_distinct is rejected,
  * tiling/base.py:89-93).
  *
  * Because we materialize a **dense** grid (reference forward-fills the
  * complete grid too), the `T − W` tile always exists once the window is
  * fully inside the grid, so the subtraction is exact there; earlier tiles
  * degrade to cumulative — which equals the true windowed value when the
  * grid starts at the entity's first event.
  *
  * Scale: one shuffle to build tiles (groupBy keys+hop with map-side
  * combine, input rows collapse ~hop-fold), one window pass over the tiny
  * tile stream per key. The raw event stream is never window-sorted.
  */
object Tiling {

  val Rejected = Set("count_distinct")

  /** Windowed sum/count/avg/std/var of `valueCol` per (keys, hop) via tile
    * subtraction. Window and hop in seconds; windowSec must be a multiple of
    * hopSec. Output: keys, hop_start (epoch seconds), sum_w, count_w, avg_w,
    * var_w, std_w, max_cum (sawtooth max — cumulative approximation).
    */
  def tiledAggregate(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      hopSec: Long,
      windowSec: Long
  ): DataFrame = {
    require(windowSec % hopSec == 0, "window must be a multiple of hop")
    val lagTiles = (windowSec / hopSec).toInt
    val k = keys.map(col)
    val hopUs = hopSec * 1000000L

    // 1. per-(keys, hop) IR tiles (orchestrator.py:18-90)
    val tiles = df
      .withColumn("__hop", floor(unix_micros(col(tsCol).cast("timestamp")) / hopUs))
      .groupBy(k :+ col("__hop"): _*)
      .agg(
        sum(col(valueCol)).as("__s"),
        count(col(valueCol)).as("__c"),
        sum(col(valueCol) * col(valueCol)).as("__ss"),
        max(col(valueCol)).as("__mx"))

    // 2. dense hop grid per key (orchestrator.py:96-140 forward-fill grid)
    val grid = tiles
      .groupBy(k: _*)
      .agg(min(col("__hop")).as("__mn"), max(col("__hop")).as("__mx_hop"))
      .select(k :+ explode(sequence(col("__mn"), col("__mx_hop"))).as("__hop"): _*)

    // 3. cumulative IRs over the grid (orchestrator.py:147-151)
    val w = Window.partitionBy(k: _*).orderBy(col("__hop"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid
      .join(tiles, keys :+ "__hop", "left")
      .select(
        (k :+ col("__hop")) ++ Seq(
          sum(coalesce(col("__s"), lit(0L))).over(w).as("__cs"),
          sum(coalesce(col("__c"), lit(0L))).over(w).as("__cc"),
          sum(coalesce(col("__ss"), lit(0L))).over(w).as("__css"),
          max(col("__mx")).over(w).as("__cmx")): _*)

    // 4. tile subtraction (tile_subtraction.py:17-153); dense grid makes
    //    lag(·, lagTiles) the exact T−W tile.
    val wl = Window.partitionBy(k: _*).orderBy(col("__hop"))
    val sW = col("__cs") - lag(col("__cs"), lagTiles, 0L).over(wl)
    val cW = col("__cc") - lag(col("__cc"), lagTiles, 0L).over(wl)
    val ssW = col("__css") - lag(col("__css"), lagTiles, 0L).over(wl)
    val varW = when(cW > 1,
      (ssW - sW * sW / cW) / (cW - 1)).otherwise(lit(null).cast("double"))
    cum.select(
      (k :+ (col("__hop") * hopSec).as("hop_start")) ++ Seq(
        when(cW > 0, sW).otherwise(lit(null)).as("sum_w"),
        cW.as("count_w"),
        when(cW > 0, sW / cW).otherwise(lit(null)).as("avg_w"),
        varW.as("var_w"),
        sqrt(varW).as("std_w"),
        col("__cmx").as("max_cum")): _*)
  }
}
