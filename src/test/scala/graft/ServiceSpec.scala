package graft

import org.apache.spark.sql.functions._
import graft.engine.Historical

/** FeatureService projections (join-key map, feature subset, alias) and the
  * DAG-path multi-view key join (J8).
  */
class ServiceSpec extends SparkTestBase {
  import spark.implicits._

  private val turns = Transcripts.synthetic(spark, nConvs = 8, turnsPerConv = 10, seed = 9L)

  private def view = FeatureView("turn_stats",
    turns.select(col("conv_id"), col("ts"), col("turn_idx"), col("role")),
    Seq("conv_id"), "ts", None, 0L,
    features = Seq("turn_idx", "role"), tieBreakCols = Seq("turn_idx"))

  test("projection join-key map binds a view to renamed entity keys") {
    val entity = turns.filter(col("turn_idx") === 5)
      .select(col("conv_id").as("conversation"), col("ts").as("event_ts"))
    val svc = FeatureService("svc", Seq(
      Projection(view, features = Seq("turn_idx"),
        joinKeyMap = Map("conv_id" -> "conversation"),
        nameAlias = Some("tv"))))
    val out = Historical.getHistoricalFeaturesService(entity, svc,
      fullFeatureNames = true)
    assert(out.columns.toSeq == Seq("conversation", "event_ts", "tv__turn_idx"))
    assert(out.count() == 8)
    // at each turn-5 timestamp the as-of winner is turn 5 itself
    assert(out.filter(col("tv__turn_idx") =!= 5).isEmpty)
  }

  test("J8: multi-view key join prefixes features and preserves entity rows") {
    val vA = turns.groupBy("conv_id").agg(count(lit(1)).as("n_turns"))
    val vB = turns.groupBy("conv_id").agg(max(col("turn_idx")).as("max_idx"))
    val entity = turns.select("conv_id").distinct()
      .unionByName(Seq("conv_unknown").toDF("conv_id"))
    val out = Historical.joinViewsOnKeys(entity, Seq("conv_id"),
      Seq("a" -> vA, "b" -> vB))
    assert(out.columns.toSeq == Seq("conv_id", "a__n_turns", "b__max_idx"))
    assert(out.count() == entity.count())
    val unknown = out.filter(col("conv_id") === "conv_unknown").head()
    assert(unknown.isNullAt(1) && unknown.isNullAt(2), "unmatched keys keep nulls")
  }

  test("joinViewsOnKeys: a key missing from the FIRST view still gets later views' features") {
    import spark.implicits._
    val vA = Seq(("k1", 10L)).toDF("conv_id", "a_val")
    val vB = Seq(("k1", 1L), ("k2", 2L)).toDF("conv_id", "b_val")
    val entity = Seq("k1", "k2").toDF("conv_id")
    val out = Historical.joinViewsOnKeys(entity, Seq("conv_id"),
      Seq("a" -> vA, "b" -> vB))
    val k2 = out.filter(col("conv_id") === "k2").head()
    assert(k2.isNullAt(1), "view a has no k2")
    assert(k2.getLong(2) == 2L,
      "view b's k2 feature must survive even though view a lacks the key")
  }

  test("nonEntityRetrieval rejects views with mismatched join keys upfront") {
    import java.sql.Timestamp
    val a = Seq(("u1", Timestamp.valueOf("2026-01-01 00:00:00"), 1L))
      .toDF("user_id", "ts", "v")
    val b = Seq(("a1", Timestamp.valueOf("2026-01-01 00:00:00"), 2L))
      .toDF("account_id", "ts", "w")
    val va = FeatureView("va", a, Seq("user_id"), "ts", None, 0L,
      features = Seq("v"), tieBreakCols = Seq("v"))
    val vb = FeatureView("vb", b, Seq("account_id"), "ts", None, 0L,
      features = Seq("w"), tieBreakCols = Seq("w"))
    // without the guard, vb's account ids would be silently misfiled into
    // the user_id universe column (same arity, positional toDF rename)
    val e = intercept[IllegalArgumentException] {
      graft.engine.Historical.nonEntityRetrieval(Seq(va, vb),
        Timestamp.valueOf("2026-01-02 00:00:00"))
    }
    assert(e.getMessage.contains("share join keys"), e.getMessage)
  }

  test("positionalKeys maps same-arity keys declared equivalent; arity mismatch still fails") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val a = Seq(("u1", t0, 1L), ("u2", t0, 3L)).toDF("user_id", "ts", "v")
    // same entity, legacy column name `uid` — positionalKeys declares the
    // equivalence without forcing a fieldMapping rename on the caller
    val b = Seq(("u2", t0, 2L), ("u3", t0, 4L)).toDF("uid", "ts", "w")
    val va = FeatureView("va", a, Seq("user_id"), "ts", None, 0L,
      features = Seq("v"), tieBreakCols = Seq("v"))
    val vb = FeatureView("vb", b, Seq("uid"), "ts", None, 0L,
      features = Seq("w"), tieBreakCols = Seq("w"))
    val out = graft.engine.Historical.nonEntityRetrieval(Seq(va, vb),
      Timestamp.valueOf("2026-01-02 00:00:00"), positionalKeys = true)
      .select("user_id", "v", "w").collect()
      .map(r => (r.getString(0), Option(r.getAs[Any](1)), Option(r.getAs[Any](2))))
      .toSet
    // universe = union of both views' keys under the canonical name;
    // vb's features attach to the SAME ids, not a misfiled column
    assert(out == Set(
      ("u1", Some(1L), None),
      ("u2", Some(3L), Some(2L)),
      ("u3", None, Some(4L))), out.toString)
    // different arity has no positional meaning — still a hard error
    val c = Seq(("u1", "x", t0, 9L)).toDF("k1", "k2", "ts", "z")
    val vc = FeatureView("vc", c, Seq("k1", "k2"), "ts", None, 0L,
      features = Seq("z"), tieBreakCols = Seq("z"))
    val e = intercept[IllegalArgumentException] {
      graft.engine.Historical.nonEntityRetrieval(Seq(va, vc),
        Timestamp.valueOf("2026-01-02 00:00:00"), positionalKeys = true)
    }
    assert(e.getMessage.contains("share join keys"), e.getMessage)
    // a positional rename landing on a column the view already has would
    // silently duplicate it — hard error naming the collision instead
    val d = Seq(("u1", 7L, t0, 5L)).toDF("uid", "user_id", "ts", "w")
    val vd = FeatureView("vd", d, Seq("uid"), "ts", None, 0L,
      features = Seq("w"), tieBreakCols = Seq("w"))
    val e2 = intercept[IllegalArgumentException] {
      graft.engine.Historical.nonEntityRetrieval(Seq(va, vd),
        Timestamp.valueOf("2026-01-02 00:00:00"), positionalKeys = true)
    }
    assert(e2.getMessage.contains("collides"), e2.getMessage)
  }

  test("positionalKeys renames apply simultaneously: chained and swapped key names work") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    // canonical keys (grp, usr); the second view's keys are (usr, sess) —
    // the mapping usr->grp, sess->usr CHAINS through a name the first
    // rename is moving away; a sequential fold (or a collision check
    // against the original columns) falsely rejects or duplicates it
    val a = Seq(("g1", "u1", t0, 1L)).toDF("grp", "usr", "ts", "v")
    val b = Seq(("g1", "u1", t0, 2L)).toDF("usr", "sess", "ts", "w")
    val va = FeatureView("va", a, Seq("grp", "usr"), "ts", None, 0L,
      features = Seq("v"), tieBreakCols = Seq("v"))
    val vb = FeatureView("vb", b, Seq("usr", "sess"), "ts", None, 0L,
      features = Seq("w"), tieBreakCols = Seq("w"))
    val out = graft.engine.Historical.nonEntityRetrieval(Seq(va, vb),
      Timestamp.valueOf("2026-01-02 00:00:00"), positionalKeys = true)
      .select("grp", "usr", "v", "w").collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getAs[Any](2)), Option(r.getAs[Any](3)))).toSet
    assert(out == Set(("g1", "u1", Some(1L), Some(2L))), out.toString)
    // fully SWAPPED key NAMES: the view's `usr` column positionally holds
    // canonical-grp values and its `grp` column canonical-usr values —
    // the simultaneous rename swaps them with no duplicate columns
    val c = Seq(("g1", "u1", t0, 3L)).toDF("usr", "grp", "ts", "z")
    val vc = FeatureView("vc", c, Seq("usr", "grp"), "ts", None, 0L,
      features = Seq("z"), tieBreakCols = Seq("z"))
    val out2 = graft.engine.Historical.nonEntityRetrieval(Seq(va, vc),
      Timestamp.valueOf("2026-01-02 00:00:00"), positionalKeys = true)
      .select("grp", "usr", "v", "z").collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getAs[Any](2)), Option(r.getAs[Any](3)))).toSet
    assert(out2 == Set(("g1", "u1", Some(1L), Some(3L))), out2.toString)
  }
}
