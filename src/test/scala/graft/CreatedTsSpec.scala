package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.pit.PointInTimeJoin

/** Backfill / created_timestamp dedup semantics (FIXTURES.md §F3; reference
  * test_universal_historical_retrieval.py:538-633 and
  * tests/unit/infra/offline_stores/test_filter_by_created_timestamp.py).
  */
class CreatedTsSpec extends SparkTestBase {
  import spark.implicits._

  private val T = Timestamp.valueOf("2026-01-01 00:00:00")
  private def plusD(t: Timestamp, d: Int) = new Timestamp(t.getTime + d * 86400000L)

  // (conv, score, ts, created)
  private val rows = Seq(
    ("conv_A", 10.0, T, T),
    ("conv_A", 20.0, T, plusD(T, 1)),          // same ts, later created → wins
    ("conv_B", 30.0, T, plusD(T, 1)),
    ("conv_B", 40.0, plusD(T, 1), T)           // later ts beats later created
  )

  private def mkView(rows: Seq[(String, Double, Timestamp, Timestamp)]) = {
    val src = rows.toDF("conv_id", "score", "ts", "created_ts")
    FeatureView("q", src, Seq("conv_id"), "ts", Some("created_ts"), 0L,
      features = Seq("score"))
  }

  private def entity(at: Timestamp) =
    Seq(("conv_A", at), ("conv_B", at)).toDF("conv_id", "event_ts")

  test("backfill dedup: (ts desc, created desc) picks 20 and 40") {
    val out = PointInTimeJoin.enrich(entity(plusD(T, 2)), mkView(rows))
      .collect().map(r => r.getAs[String]("conv_id") -> r.getAs[Double]("score")).toMap
    assert(out == Map("conv_A" -> 20.0, "conv_B" -> 40.0))
  }

  test("filter_by_created_timestamp hides too-new versions") {
    // At event_ts = T, conv_A's score=20 was created T+1d → with the filter
    // the older version 10 must win instead; conv_B's 30 (created T+1d) is
    // also hidden and 40 has ts T+1d > T, so conv_B gets NULL — but the
    // entity row must survive (dask.py:1203-1226 masking semantics).
    val out = PointInTimeJoin.enrich(entity(T), mkView(rows), filterByCreatedTs = true)
      .collect().map(r => r.getAs[String]("conv_id") -> Option(r.getAs[Any]("score"))).toMap
    assert(out("conv_A").contains(10.0))
    assert(out("conv_B").isEmpty)
    assert(out.size == 2)
  }

  test("null created_ts loses ties (nulls-last-on-desc, dask na_position)") {
    val withNull = Seq(
      ("conv_A", 1.0, T, null.asInstanceOf[Timestamp]),
      ("conv_A", 2.0, T, T)) // non-null created wins the ts tie
    val out = PointInTimeJoin.enrich(entity(plusD(T, 1)), mkView(withNull))
      .filter(col("conv_id") === "conv_A").collect().head
    assert(out.getAs[Double]("score") == 2.0)
  }
}
