package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.AnalysisException
import graft.engine.{Historical, OnDemand, Registry}

/** ODFV input isolation, RequestSource validation, and "view:feature"
  * string-ref retrieval through the registry (reference utils.py:820-844,
  * data_source.py:591, feature_store.py:1942-2142).
  */
class OnDemandSpec extends SparkTestBase {
  import spark.implicits._

  private val turns = Transcripts.synthetic(spark, nConvs = 6, turnsPerConv = 8, seed = 3L)

  private def view = FeatureView("turn_stats",
    turns.select(col("conv_id"), col("ts"), col("turn_idx"),
      length(col("text")).as("text_len")),
    Seq("conv_id"), "ts", None, 0L,
    features = Seq("turn_idx", "text_len"), tieBreakCols = Seq("turn_idx"))

  private val entity = turns.filter(col("turn_idx") === 7)
    .select(col("conv_id"), col("ts").as("event_ts"))

  test("ODFV sees only declared inputs: undeclared column reference fails analysis") {
    val odfv = OnDemandView("bad",
      inputs = Seq("turn_idx"),
      transform = df => df.withColumn("leak", col("text_len") * 2))
    val ex = intercept[AnalysisException] {
      Historical.getHistoricalFeatures(entity, Seq(view), onDemand = Seq(odfv))
        .collect()
    }
    assert(ex.getMessage.contains("text_len"), s"unexpected error: ${ex.getMessage}")
  }

  test("ODFV computes from declared inputs + request column; outputs appended") {
    val e = entity.withColumn("req_mult", lit(3))
    val odfv = OnDemandView("boost",
      inputs = Seq("turn_idx"),
      requestCols = Seq("req_mult"),
      outputs = Seq("idx_boost"),
      transform = df => df.withColumn("idx_boost", col("turn_idx") * col("req_mult")))
    val out = Historical.getHistoricalFeatures(e, Seq(view), onDemand = Seq(odfv))
    assert(out.columns.toSeq ==
      Seq("conv_id", "event_ts", "req_mult", "turn_idx", "text_len", "idx_boost"))
    assert(out.filter(col("idx_boost") =!= col("turn_idx") * 3).isEmpty)
  }

  test("ODFVs work under fullFeatureNames: bare inputs resolve to prefixed columns") {
    // retrieval prefixes view features (turn_stats__turn_idx); the ODFV
    // declares 'turn_idx' bare — applyView must resolve it, and a SECOND
    // ODFV must be able to read the first's (prefixed) output
    val e = entity.withColumn("req_mult", lit(3))
    val first = OnDemandView("boost",
      inputs = Seq("turn_idx"), requestCols = Seq("req_mult"),
      outputs = Seq("idx_boost"),
      transform = df => df.withColumn("idx_boost", col("turn_idx") * col("req_mult")))
    val second = OnDemandView("chain",
      inputs = Seq("idx_boost"), outputs = Seq("idx_boost2"),
      transform = df => df.withColumn("idx_boost2", col("idx_boost") * 2))
    val out = Historical.getHistoricalFeatures(e, Seq(view),
      fullFeatureNames = true, onDemand = Seq(first, second))
    assert(out.columns.contains("boost__idx_boost") &&
      out.columns.contains("chain__idx_boost2"), out.columns.mkString(","))
    assert(out.filter(col("chain__idx_boost2") =!=
      col("turn_stats__turn_idx") * 6).isEmpty)
  }

  test("unrelated entity column ending in __<input> is never consumed as an ODFV input") {
    // `legacy__turn_idx` merely LOOKS prefixed — it is an entity column,
    // not a view output. knownPrefixes (resolved view names + earlier
    // ODFV names) must restrict resolution to turn_stats__turn_idx; a
    // bare endsWith match would either consume the legacy column or
    // throw a spurious ambiguity.
    val e = entity.withColumn("legacy__turn_idx", lit(999))
    val odfv = OnDemandView("boost",
      inputs = Seq("turn_idx"), outputs = Seq("idx2"),
      transform = df => df.withColumn("idx2", col("turn_idx") * 2))
    val out = Historical.getHistoricalFeatures(e, Seq(view),
      fullFeatureNames = true, onDemand = Seq(odfv))
    assert(out.filter(col("boost__idx2") =!=
      col("turn_stats__turn_idx") * 2).isEmpty)
    assert(out.filter(col("boost__idx2") === 1998).isEmpty,
      "legacy__turn_idx (999) must never feed the ODFV")
  }

  test("empty known-prefix set falls back to the permissive suffix match") {
    // Chained retrieval: the frame comes from a PRIOR fullFeatureNames
    // retrieval (carries turn_stats__turn_idx), and THIS application
    // resolves no views at all — knownPrefixes = Some(Set()) must not
    // reject the prefixed candidate (request-data-only ODFVs over a
    // saved retrieval were valid before the prefix tightening).
    val prior = Historical.getHistoricalFeatures(entity, Seq(view),
      fullFeatureNames = true)
    val odfv = OnDemandView("boost",
      inputs = Seq("turn_idx"), outputs = Seq("idx2"),
      transform = df => df.withColumn("idx2", col("turn_idx") * 2))
    val out = OnDemand.applyAll(prior, Seq(odfv),
      fullFeatureNames = true, knownPrefixes = Some(Set.empty))
    assert(out.columns.contains("boost__idx2"), out.columns.mkString(","))
    assert(out.filter(col("boost__idx2") =!=
      col("turn_stats__turn_idx") * 2).isEmpty)
  }

  test("the permissive empty-prefix marker survives a CHAIN of ODFVs") {
    // Both ODFVs read the prior retrieval's prefixed column by bare name.
    // Accumulating the first ODFV's name into the EMPTY marker set would
    // flip the second apply from permissive to restricted and reject a
    // previously-valid shape — order-dependently.
    val prior = Historical.getHistoricalFeatures(entity, Seq(view),
      fullFeatureNames = true)
    val o1 = OnDemandView("boost1",
      inputs = Seq("turn_idx"), outputs = Seq("idx2"),
      transform = df => df.withColumn("idx2", col("turn_idx") * 2))
    val o2 = OnDemandView("boost2",
      inputs = Seq("turn_idx"), outputs = Seq("idx3"),
      transform = df => df.withColumn("idx3", col("turn_idx") * 3))
    for (chain <- Seq(Seq(o1, o2), Seq(o2, o1))) {
      val out = OnDemand.applyAll(prior, chain,
        fullFeatureNames = true, knownPrefixes = Some(Set.empty))
      assert(out.filter(col("boost1__idx2") =!=
        col("turn_stats__turn_idx") * 2).isEmpty, chain.map(_.name).toString)
      assert(out.filter(col("boost2__idx3") =!=
        col("turn_stats__turn_idx") * 3).isEmpty, chain.map(_.name).toString)
    }
  }

  test("missing request data fails BEFORE retrieval runs") {
    val odfv = OnDemandView("boost",
      inputs = Seq("turn_idx"), requestCols = Seq("req_mult"),
      transform = df => df.withColumn("x", col("turn_idx") * col("req_mult")))
    val ex = intercept[OnDemand.MissingRequestDataException] {
      Historical.getHistoricalFeatures(entity, Seq(view), onDemand = Seq(odfv))
    }
    assert(ex.getMessage.contains("req_mult"))
  }

  test("ODFV transform dropping a column violates the append-only contract") {
    val odfv = OnDemandView("dropper",
      inputs = Seq("turn_idx", "text_len"),
      transform = df => df.drop("text_len"))
    val ex = intercept[IllegalArgumentException] {
      Historical.getHistoricalFeatures(entity, Seq(view), onDemand = Seq(odfv))
    }
    assert(ex.getMessage.contains("text_len"))
  }

  test("registry resolves view refs, errors on unknown refs") {
    val reg = new Registry().register(view)
    val out = reg.getHistoricalFeatures(entity, Seq("turn_stats:turn_idx"))
    assert(out.columns.toSeq == Seq("conv_id", "event_ts", "turn_idx"))
    assert(out.count() == entity.count())
    intercept[IllegalArgumentException] {
      reg.getHistoricalFeatures(entity, Seq("nope:feature"))
    }
    intercept[IllegalArgumentException] {
      reg.getHistoricalFeatures(entity, Seq("turn_stats:nope"))
    }
    intercept[IllegalArgumentException] {
      reg.getHistoricalFeatures(entity, Seq("no-colon-ref"))
    }
  }

  test("registry ODFV ref pulls backing views via sourceRefs; inputs projected away") {
    val reg = new Registry()
      .register(view)
      .register(OnDemandView("od",
        inputs = Seq("text_len"),
        outputs = Seq("len_sq"),
        sourceRefs = Seq("turn_stats:text_len"),
        transform = df => df.withColumn("len_sq", col("text_len") * col("text_len"))))
    val out = reg.getHistoricalFeatures(entity, Seq("turn_stats:turn_idx", "od:len_sq"))
    // text_len retrieved for the ODFV but not requested -> projected away
    assert(out.columns.toSeq == Seq("conv_id", "event_ts", "turn_idx", "len_sq"))
    assert(out.filter(col("len_sq").isNull).isEmpty)
    intercept[IllegalArgumentException] {
      reg.getHistoricalFeatures(entity, Seq("od:not_an_output"))
    }
  }

  test("registry resolves a request-data-only ODFV ref with zero backing views") {
    // empty sourceRefs is a legitimate reference shape (transform computed
    // purely from request columns) — it must apply straight to the entity
    // frame instead of tripping Historical's >=1-view requirement
    val reg = new Registry()
      .register(OnDemandView("reqonly",
        inputs = Nil,
        requestCols = Seq("req_mult"),
        outputs = Seq("mult_sq"),
        transform = df => df.withColumn("mult_sq", col("req_mult") * col("req_mult"))))
    val withReq = entity.withColumn("req_mult", col("event_ts").cast("long") % 7)
    val out = reg.getHistoricalFeatures(withReq, Seq("reqonly:mult_sq"))
    assert(out.columns.toSeq ==
      Seq("conv_id", "event_ts", "req_mult", "mult_sq"))
    assert(out.count() == withReq.count())
    assert(out.filter(col("mult_sq") =!= col("req_mult") * col("req_mult")).isEmpty)
  }

  test("registry fullFeatureNames prefixes view and ODFV outputs") {
    val reg = new Registry()
      .register(view)
      .register(OnDemandView("od",
        inputs = Seq("text_len"),
        outputs = Seq("len_sq"),
        sourceRefs = Seq("turn_stats:text_len"),
        transform = df => df.withColumn("len_sq", col("text_len") * col("text_len"))))
    val out = reg.getHistoricalFeatures(entity,
      Seq("turn_stats:turn_idx", "od:len_sq"), fullFeatureNames = true)
    assert(out.columns.toSeq ==
      Seq("conv_id", "event_ts", "turn_stats__turn_idx", "od__len_sq"))
    assert(out.filter(col("od__len_sq").isNull).isEmpty)
  }

  test("registered service retrieval by name") {
    val reg = new Registry()
      .register(FeatureService("svc", Seq(Projection(view, features = Seq("turn_idx")))))
    val out = reg.getHistoricalFeaturesService(entity, "svc", fullFeatureNames = true)
    assert(out.columns.toSeq == Seq("conv_id", "event_ts", "turn_stats__turn_idx"))
    intercept[IllegalArgumentException] {
      reg.getHistoricalFeaturesService(entity, "nope")
    }
  }
}
