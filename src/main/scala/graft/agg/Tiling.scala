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

    // widen BEFORE squaring: int*int wraps negative at |v| > 46340
    // (non-ANSI), silently corrupting var/std downstream. ALL integral
    // types widen to decimal(38,0): exact — a max-long square (~8.5e37)
    // still fits 38 digits, whereas a double square rounds long values
    // above 2^53/2 ≈ 9.4e7. A SUM of near-max-long squares CAN exceed
    // 38 digits, though (two max-long squares already do; epoch-micro
    // squares after ~4e7 rows per key) — non-ANSI decimal overflow yields
    // NULL, and a null tile IR would then be silently DROPPED by the
    // downstream sum()s, corrupting var/std. So overflow fails LOUDLY
    // instead (guards below): the fix for hash-scale values is shifting
    // or pre-scaling the value column, never a silent wrong answer.
    // Fractional inputs go to double — a decimal cast would TRUNCATE them.
    val widened = {
      import org.apache.spark.sql.types._
      df.schema(valueCol).dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          col(valueCol).cast("decimal(38,0)")
        case _ => col(valueCol).cast("double")
      }
    }
    val overflowMsg = s"tiled sum of squares of '$valueCol' overflowed " +
      "decimal(38,0); shift or pre-scale the value column"
    val sumOverflowMsg = s"tiled windowed sum of '$valueCol' overflows " +
      "bigint; pre-scale the value column"
    val integral = {
      import org.apache.spark.sql.types._
      df.schema(valueCol).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }
    // the PLAIN sum of an integral column accumulates in decimal too: a
    // long sum wraps silently under non-ANSI (~5e3 epoch-micro values per
    // window suffice), which would corrupt sum_w/avg_w/var_w with no
    // signal — the decimal IR keeps it exact and the output casts back to
    // bigint under the same loud-overflow contract as the squares
    val sumInput = if (integral) widened else col(valueCol)
    val ssType = df.select(sum(widened * widened).as("s")).schema("s").dataType
    val sType = df.select(sum(sumInput).as("s")).schema("s").dataType

    // 1. per-(keys, hop) IR tiles (orchestrator.py:18-90).
    // Tile-level overflow guards: __c > 0 with a null sum can only be
    // decimal-sum overflow (values contributing to __c are non-null) —
    // raise instead of letting the null tile vanish from cumulative sums.
    val tiles = df
      .withColumn("__hop", floor(unix_micros(col(tsCol).cast("timestamp")) / hopUs))
      .groupBy(k :+ col("__hop"): _*)
      .agg(
        sum(sumInput).as("__s0"),
        count(col(valueCol)).as("__c"),
        sum(widened * widened).as("__ss0"),
        max(col(valueCol)).as("__mx"))
      .withColumn("__ss",
        when(col("__c") > 0 && col("__ss0").isNull,
          raise_error(lit(overflowMsg)).cast(ssType))
          .otherwise(col("__ss0")))
      .withColumn("__s",
        when(col("__c") > 0 && col("__s0").isNull,
          raise_error(lit(sumOverflowMsg)).cast(sType))
          .otherwise(col("__s0")))
      .drop("__ss0", "__s0")

    // 2.+3. sparse breakpoint stream instead of a dense grid join.
    //
    // The dense-grid formulation (grid ⟕ tiles, cumsum, lag(·, lagTiles))
    // amplifies N tile rows into (span/hop) grid rows per key — 126× on the
    // bench table — and shuffles + window-sorts the amplified stream twice.
    // But windowed(T) = cum(T) − cum(T−W) is piecewise constant: it only
    // changes where a tile ENTERS the window (its own hop) or LEAVES it
    // (hop + lagTiles). So: emit those ≤2N breakpoints, run ONE window pass
    // over the sparse stream accumulating (entered − left) IRs, and explode
    // each breakpoint's constant segment into the dense grid afterwards —
    // a narrow generate, no dense shuffle/sort/join. Output is identical
    // (orchestrator.py:96-151 semantics, exact T−W subtraction).
    val zero = lit(0L)
    val enter = tiles.select(
      (k :+ col("__hop")) ++ Seq(
        col("__s").as("__in_s"), col("__c").as("__in_c"), col("__ss").as("__in_ss"),
        zero.as("__out_s"), zero.as("__out_c"), zero.as("__out_ss"),
        col("__mx"), lit(1).as("__enter")): _*)
    val leave = tiles.select(
      (k :+ (col("__hop") + lagTiles).as("__hop")) ++ Seq(
        zero.as("__in_s"), zero.as("__in_c"), zero.as("__in_ss"),
        col("__s").as("__out_s"), col("__c").as("__out_c"), col("__ss").as("__out_ss"),
        lit(null).cast(tiles.schema("__mx").dataType).as("__mx"),
        lit(0).as("__enter")): _*)
    val breakpoints = enter.unionByName(leave)
      .groupBy(k :+ col("__hop"): _*)
      .agg(
        sum(col("__in_s")).as("__in_s"), sum(col("__in_c")).as("__in_c"),
        sum(col("__in_ss")).as("__in_ss"),
        sum(col("__out_s")).as("__out_s"), sum(col("__out_c")).as("__out_c"),
        sum(col("__out_ss")).as("__out_ss"),
        max(col("__mx")).as("__mx"),
        max(col("__enter")).as("__enter"))

    val wcum = Window.partitionBy(k: _*).orderBy(col("__hop"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val word = Window.partitionBy(k: _*).orderBy(col("__hop"))
    val wpart = Window.partitionBy(k: _*)
    // tile PRESENCE (any enter row), not non-null count: a tile whose
    // values are all NULL still extends the grid (count_w = 0 rows), same
    // as the reference's dense min..max grid over all tile hops
    val isReal = col("__enter") === 1
    val stepped = breakpoints.select(
      (k :+ col("__hop")) ++ Seq(
        (sum(col("__in_s")).over(wcum) - sum(col("__out_s")).over(wcum)).as("__sw"),
        (sum(col("__in_c")).over(wcum) - sum(col("__out_c")).over(wcum)).as("__cw"),
        (sum(col("__in_ss")).over(wcum) - sum(col("__out_ss")).over(wcum)).as("__ssw"),
        max(col("__mx")).over(wcum).as("__cmx"),
        lead(col("__hop"), 1).over(word).as("__next"),
        max(when(isReal, col("__hop"))).over(wpart).as("__mx_hop")): _*)

    // 4. explode each constant segment [hop, min(next, mx_hop+1)) into dense
    //    hops; segments tile [min_hop, mx_hop] contiguously.
    val segEnd = least(coalesce(col("__next"), col("__mx_hop") + 1), col("__mx_hop") + 1)
    val dense = stepped
      .filter(col("__hop") <= col("__mx_hop"))
      .select(
        (k ++ Seq(col("__sw"), col("__cw"), col("__ssw"), col("__cmx"))) :+
          explode(sequence(col("__hop"), segEnd - 1)).as("__hop"): _*)

    val cW = col("__cw")
    // Cumulative-level sum guard at the DEFINITION, not the output: tile
    // IRs are non-null (guarded above), so a null running __sw with rows
    // in the window means the RUNNING decimal sum overflowed. Guarding
    // here makes every consumer (sum_w, avg_w, var_w) raise — a guard on
    // sum_w alone is pruned away by Catalyst when the caller selects only
    // avg_w, silently nulling it.
    val sW = when(cW > 0 && col("__sw").isNull,
      raise_error(lit(sumOverflowMsg)).cast(sType)).otherwise(col("__sw"))
    val ssW = col("__ssw")
    // double-first multiply (same order as the oracle's CAST AS DOUBLE):
    // long·long would overflow on large windowed sums.
    // Cumulative-level overflow guard: tile IRs are non-null (guarded
    // above), so a null __ssw with cW > 1 means the RUNNING decimal sum
    // overflowed — assert_true raises then (and passes as a no-op null
    // folded in via coalesce, keeping the expression inside codegen).
    val ssGuard = coalesce(
      assert_true(cW <= 1 || ssW.isNotNull, lit(overflowMsg)).cast("double"),
      lit(0.0))
    val varW = when(cW > 1,
      (ssW.cast("double") - sW.cast("double") * sW / cW) / (cW - 1) + ssGuard)
      .otherwise(lit(null).cast("double"))
    // integral inputs: the exact decimal running sum casts back to the
    // bigint the caller always saw — a true sum past long range raises
    // (ANSI natively; the guard under non-ANSI, where the cast nulls)
    // instead of the silent wraparound the old long accumulation had
    val sumOut =
      if (integral) {
        val castBack = sW.cast("long")
        // sW itself raises on running-sum overflow; this catches the
        // narrower case of an exact decimal sum past long range (cast
        // nulls under non-ANSI, raises natively under ANSI)
        when(castBack.isNull && sW.isNotNull,
          raise_error(lit(sumOverflowMsg)).cast("long")).otherwise(castBack)
      } else sW
    val avgOut = if (integral) sW.cast("double") / cW else sW / cW
    dense.select(
      (k :+ (col("__hop") * hopSec).as("hop_start")) ++ Seq(
        when(cW > 0, sumOut).otherwise(lit(null)).as("sum_w"),
        cW.as("count_w"),
        when(cW > 0, avgOut).otherwise(lit(null)).as("avg_w"),
        varW.as("var_w"),
        sqrt(varW).as("std_w"),
        col("__cmx").as("max_cum")): _*)
  }
}
