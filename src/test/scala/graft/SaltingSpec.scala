package graft

import org.apache.spark.sql.functions._
import graft.pit.PointInTimeJoin
import graft.skew.Salting

/** Salted PIT join must be byte-identical to the unsalted plan on skewed
  * data (Transcripts.synthetic marks ~1% of conversations hot with 50×
  * turns — FIXTURES.md §F1).
  */
class SaltingSpec extends SparkTestBase {
  import spark.implicits._

  private val turns = Transcripts.synthetic(spark, nConvs = 120, turnsPerConv = 10, seed = 3L)

  private def view(ttl: Long): FeatureView =
    FeatureView("turn_stats",
      turns.select(col("conv_id"), col("ts"), col("turn_idx"), col("role")),
      Seq("conv_id"), "ts", None, ttl,
      features = Seq("turn_idx", "role"), tieBreakCols = Seq("turn_idx"))

  private val entityDf = turns
    .filter(pmod(col("turn_idx"), lit(4)) === 1)
    .select(col("conv_id"),
      (col("ts") + expr("INTERVAL 10 SECONDS")).as("event_ts"),
      col("turn_idx").cast("double").as("label"))

  test("hot-key detection finds exactly the hot conversations") {
    val hot = Salting.detectHotKeys(turns.toDF(), Seq("conv_id"),
      rowThreshold = 100L, buckets = 8).collect()
    // synthetic: ci % 100 == 7 is hot (500 turns), cold convs have 10
    val hotIds = hot.map(_.getString(0)).toSet
    assert(hotIds == Set("conv_000007", "conv_000107"))
    assert(hot.forall(_.getAs[Int]("__nsalt") == 8))
  }

  test("salted PIT join equals unsalted on skewed transcripts") {
    val plain = PointInTimeJoin.enrich(entityDf, view(ttl = 3600L))
    val salted = PointInTimeJoin.enrich(entityDf, view(ttl = 3600L),
      saltBuckets = 8, hotKeyRowThreshold = 100L)
    assert(salted.schema == plain.schema)
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty,
      "salted and unsalted results must match exactly")
    assert(salted.count() == entityDf.count())
  }

  test("salting with no hot keys degrades to the plain result") {
    val salted = PointInTimeJoin.enrich(entityDf, view(ttl = 0L),
      saltBuckets = 4, hotKeyRowThreshold = 1000000L)
    val plain = PointInTimeJoin.enrich(entityDf, view(ttl = 0L))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
