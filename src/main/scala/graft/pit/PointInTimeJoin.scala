package graft.pit

import graft.FeatureView
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Point-in-time ("as-of") join: for each entity row (join keys, event_ts),
  * attach the feature values of the **latest** source row with
  * `feature_ts <= event_ts` (and `feature_ts >= event_ts - ttl` when a TTL is
  * set), tie-broken by `created_ts` descending with nulls losing.
  *
  * Semantics match the reference's SQL template
  * MULTIPLE_FEATURE_VIEW_POINT_IN_TIME_JOIN (reference: infra/offline_stores/
  * contrib/spark_offline_store/spark.py:1709-1887 — J1..J7 in SURVEY.md §2.3)
  * and the dask dataframe program (infra/offline_stores/dask.py:1093-1270).
  *
  * Two physical strategies, neither of which is the reference's
  * (range join → row_number → join back):
  *
  *  1. **Merge path** ([[enrichMerge]], the default): union feature and
  *     probe rows, one sort per key on (ts, side, created, tiebreaks), one
  *     window pass of `last(payload, ignoreNulls)` — each probe row reads
  *     the latest qualifying feature row directly. No join, no pair
  *     blow-up, no aggregation: cost is a single shuffle + sort of
  *     |features| + |probes| rows regardless of TTL width. This is the
  *     classic sort-merge as-of algorithm expressed in pure Catalyst.
  *     The created-ts *filter* mode stays on this path: a feature row is
  *     visible to a probe iff `event_ts >= greatest(ts, created_ts)`, so
  *     ordering the merge stream by that visibility time and keeping a
  *     running `max_by(payload, (ts, created, tiebreaks))` (instead of
  *     `last`) yields the exact filtered winner with the same single
  *     sort — no join, no per-key pair blow-up at TTL = 0.
  *  2. **Join path** ([[enrichJoin]]): time-bucketed range inner join
  *     (bounded fan-out) → partial-aggregated max_by → left join back.
  *     Needed for hot-key salting (explicit replication).
  *
  * Shared scale levers (both paths):
  *   - scan bounds [min(event_ts) − ttl, max(event_ts)] derived from the
  *     entity frame are pushed into the source scan (reference
  *     offline_utils.py:168-189), plus derived date-partition predicates
  *   - only (keys, ts, created, features) survive into the shuffle — wide
  *     columns like `text` never shuffle unless they are requested features
  *   - join path: time-bucket equi-keys, optional hot-key salting
  *     (graft.skew.Salting), AQE skew join.
  */
object PointInTimeJoin {

  val DefaultBroadcastRows = 4000000L

  /** Enrich `entityDf` with the features of `view` as of each row's
    * `entityTsCol`. Preserves every entity row and column; feature columns
    * are null where no source row qualifies.
    *
    * @param filterByCreatedTs also require created_ts <= event_ts (anti-leak
    *        for backfilled rows; reference template spark.py:1799-1801).
    *        Entity rows whose only candidates are too new keep null features
    *        rather than being dropped (dask.py:1203-1226).
    */
  def enrich(
      entityDf: DataFrame,
      view: FeatureView,
      entityTsCol: String = "event_ts",
      fullFeatureNames: Boolean = false,
      filterByCreatedTs: Boolean = false,
      broadcastThresholdRows: Long = DefaultBroadcastRows,
      saltBuckets: Int = 0,
      hotKeyRowThreshold: Long = 5000000L,
      precomputedBounds: Option[Row] = None
  ): DataFrame =
    if (saltBuckets > 1 || view.joinKeys.isEmpty)
      enrichJoin(entityDf, view, entityTsCol, fullFeatureNames,
        filterByCreatedTs, broadcastThresholdRows, saltBuckets,
        hotKeyRowThreshold, precomputedBounds)
    else
      enrichMerge(entityDf, view, entityTsCol, fullFeatureNames,
        filterByCreatedTs, precomputedBounds)

  /** One entity-frame (min, max) event-ts scan, shared across views of a
    * retrieval (reference computes it once per job too,
    * offline_utils.py:168-189; spark.py:1499-1535).
    */
  def entityBounds(entityDf: DataFrame, entityTsCol: String): Row =
    entityDf.agg(min(col(entityTsCol)).as("mn"), max(col(entityTsCol)).as("mx")).head()

  /** Shared prep: field mapping (P1), early projection, scan bounds from the
    * entity range (P4/P5), date-partition predicates (P6), probe dedup (J2).
    */
  private def prepare(
      entityDf: DataFrame, view: FeatureView, entityTsCol: String,
      precomputedBounds: Option[Row]
  ): (DataFrame, DataFrame) = {
    val keys = view.joinKeys
    val feats = view.resolvedFeatures
    val neededCols =
      (keys :+ view.tsCol) ++ view.createdTsCol.toSeq ++ feats ++
        view.tieBreakCols ++ view.datePartitionCol.toSeq
    var src = view.mappedSource.select(neededCols.distinct.map(col): _*)
    // SQL join semantics for NULL keys, on BOTH physical strategies: a
    // null-key source row matches no probe (NULL = NULL is never true in
    // the reference's join template), so drop it here — otherwise the
    // merge path's window partitioning would group null keys together and
    // attach features the join path (and the reference) never would. A
    // null-key PROBE row still flows through and comes back with null
    // features (left-join semantics). Also a free scan predicate.
    if (keys.nonEmpty)
      src = src.filter(keys.map(col(_).isNotNull).reduce(_ && _))

    val bounds: Row = precomputedBounds.getOrElse(entityBounds(entityDf, entityTsCol))
    val lowerTs =
      if (view.ttlSeconds > 0 && !bounds.isNullAt(0))
        Some(lit(bounds.get(0)) - expr(s"INTERVAL ${view.ttlSeconds} SECONDS"))
      else None
    if (!bounds.isNullAt(1))
      src = src.filter(col(view.tsCol) <= lit(bounds.get(1)))
    lowerTs.foreach(lo => src = src.filter(col(view.tsCol) >= lo))
    view.datePartitionCol.foreach { dpc =>
      // the pruning below compares partition STRINGS — chronological only
      // for year-first, most-significant-first formats; "MM-dd-yyyy" would
      // silently prune QUALIFYING partitions (December sorts above January
      // of the next year), returning null features with no error
      val sig = "yMdHms"
      // strip single-quoted literal sections first (a literal like
      // 'month' contains pattern letters that are NOT fields — e.g.
      // yyyy-'month'-MM is a valid most-significant-first format whose
      // literal 'm' would otherwise spuriously fail the order check);
      // '' (escaped quote) matches the same regex and drops harmlessly
      val fieldsOnly = view.datePartitionFormat.replaceAll("'[^']*'", "")
      val order = fieldsOnly.filter(sig.contains(_)).distinct
      require(order.nonEmpty && order.head == 'y' &&
        sig.filter(order.contains(_)) == order,
        s"datePartitionFormat '${view.datePartitionFormat}' is not " +
          "most-significant-first (year, month, day, …); lexicographic " +
          "partition pruning would silently drop qualifying partitions")
      if (!bounds.isNullAt(1))
        src = src.filter(
          col(dpc) <= date_format(lit(bounds.get(1)), view.datePartitionFormat))
      lowerTs.foreach(lo =>
        src = src.filter(col(dpc) >= date_format(lo, view.datePartitionFormat)))
    }

    val probe = entityDf.select((keys :+ entityTsCol).map(col): _*)
    (src, probe)
  }

  /** The sort-merge as-of path (see object doc, strategy 1).
    *
    * Ordering per key: (ts asc, side asc [features before probes at equal
    * ts — `<=` semantics], created asc nulls-first [nulls lose], tiebreaks
    * asc); the running `last` of the feature-row payload struct at each
    * probe row is therefore exactly the max_by(ts, created, tiebreaks)
    * winner of the prefix. The payload is one struct so a feature row's
    * columns travel atomically (a legitimately-null feature value must NOT
    * fall through to an older row). TTL is applied afterwards: the latest
    * winner is the only candidate — anything older is further below the
    * window's lower bound.
    *
    * Created-ts filter mode (`filterByCreatedTs`, reference template
    * spark.py:1799-1801 / dask masking dask.py:1203-1226): visibility time
    * of a feature row becomes `greatest(ts, created_ts)` — `__t <= event_ts`
    * is then exactly `ts <= event_ts AND created_ts <= event_ts`. The
    * stream is no longer sorted by the (ts, created, tiebreaks) winner
    * order, so the running `last` is replaced by a running
    * `max_by(payload, ord)` over the same window — still one sort, one
    * pass; the TTL = 0 case stays linear instead of the join path's
    * per-key quadratic fan-out.
    */
  def enrichMerge(
      entityDf: DataFrame,
      view: FeatureView,
      entityTsCol: String = "event_ts",
      fullFeatureNames: Boolean = false,
      filterByCreatedTs: Boolean = false,
      precomputedBounds: Option[Row] = None
  ): DataFrame = {
    val keys = view.joinKeys
    val feats = view.resolvedFeatures
    val (src0, probe) = prepare(entityDf, view, entityTsCol, precomputedBounds)
    val minTs = lit("1900-01-01 00:00:00").cast("timestamp")
    val createdFilter = filterByCreatedTs && view.createdTsCol.nonEmpty
    // created-filter mode hides rows with NULL created_ts (SQL semantics of
    // the reference's `created <= entity_ts` join predicate, spark.py:1799;
    // dask's NaT compare masks them too, dask.py:1203-1226) — without this,
    // greatest() below would skip the null and leave the row visible,
    // diverging from the join path (PropertySpec pins the equivalence)
    val src =
      if (createdFilter) src0.filter(col(view.createdTsCol.get).isNotNull)
      else src0

    // Comparison type for the merged time axis: never cast the feature ts
    // DOWN to a coarser entity type — a DateType entity frame would
    // truncate feature times to midnight and leak same-day future rows
    // (the join path's `fts <= ets` promotes instead; the two strategies
    // must agree). Dates promote to the feature ts type; otherwise the
    // entity type wins (e.g. tz vs ntz normalization).
    val etsType = probe.schema(entityTsCol).dataType match {
      case org.apache.spark.sql.types.DateType => src.schema(view.tsCol).dataType
      case t => t
    }
    val ordNames = view.createdTsCol.map(_ => "__ord_created").toSeq ++
      view.tieBreakCols.indices.map(i => s"__ord_tb$i")

    // visibility time: when created-filtering, a row only becomes usable
    // once BOTH its event ts and its created ts have passed (greatest
    // skips nulls, so a null created_ts falls back to ts alone)
    val visTime =
      if (createdFilter)
        greatest(col(view.tsCol), col(view.createdTsCol.get)).cast(etsType)
      else col(view.tsCol).cast(etsType)

    // winner order of the created-filter max_by: (ts, created nulls-lose,
    // tiebreaks) — identical to the join path's ordering struct
    val ordStruct =
      if (createdFilter)
        Seq(when(lit(true), struct((col(view.tsCol).cast(etsType).as("__o_ts") +:
          (view.createdTsCol.map(c => coalesce(col(c), minTs).as("__o_cr")).toSeq ++
            view.tieBreakCols.zipWithIndex.map { case (c, i) => col(c).as(s"__o_tb$i") })): _*))
          .as("__ord"))
      else Nil
    val fSide = src.select(
      keys.map(col) ++
        Seq(visTime.as("__t"), lit(0).as("__p"),
          lit(null).cast(etsType).as("__ets"),
          when(lit(true), struct((feats.map(col) :+
            col(view.tsCol).cast(etsType).as("__fts")): _*)).as("__payload")) ++
        ordStruct ++
        (view.createdTsCol.map(c => coalesce(col(c), minTs).as("__ord_created")).toSeq ++
          view.tieBreakCols.zipWithIndex.map { case (c, i) => col(c).as(s"__ord_tb$i") }): _*)
    val payloadType = fSide.schema("__payload").dataType
    val pSide = probe.select(
      keys.map(col) ++
        Seq(col(entityTsCol).cast(etsType).as("__t"), lit(1).as("__p"),
          col(entityTsCol).as("__ets"),
          lit(null).cast(payloadType).as("__payload")) ++
        (if (createdFilter)
           Seq(lit(null).cast(fSide.schema("__ord").dataType).as("__ord"))
         else Nil) ++
        ordNames.map(n => lit(null).cast(
          fSide.schema(n).dataType).as(n)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((Seq(col("__t").asc, col("__p").asc) ++
        ordNames.map(n => col(n).asc_nulls_first)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Slim fast path: when the entity frame is exactly (keys, event_ts),
    // the final left join's only job is restoring entity-side columns and
    // duplicate multiplicity — but every probe row already flows through
    // the window pass (duplicates are adjacent and read the same running
    // `last`), so the window output IS the result. Saves the join-back
    // (one full shuffle of both sides) and the second entity scan — the
    // whole retrieval becomes scan → one shuffle → sort+window → project.
    val slim = entityDf.columns.toSet == (keys :+ entityTsCol).toSet

    // running winner: the sorted-stream `last` in normal mode; a running
    // max_by over (ts, created, tiebreaks) in created-filter mode, where
    // the stream is visibility-ordered, not winner-ordered (probe rows
    // carry a null ord and are skipped by max_by)
    val runningBest =
      if (createdFilter) max_by(col("__payload"), col("__ord")).over(w)
      else last(col("__payload"), ignoreNulls = true).over(w)
    val unioned = fSide.unionByName(pSide)
      .withColumn("__best", runningBest)
    val filled =
      if (slim) unioned.filter(col("__p") === 1)
      else {
        // Duplicate entity rows collapse WITHOUT a dedup exchange:
        // duplicates are adjacent under this sort, so a lag() over the same
        // window spec (one physical sort serves both functions) marks all
        // but the first; the join-back below restores multiplicity.
        val wLag = Window.partitionBy(keys.map(col): _*)
          .orderBy((Seq(col("__t").asc, col("__p").asc) ++
            ordNames.map(n => col(n).asc_nulls_first)): _*)
        unioned
          .withColumn("__dupProbe",
            col("__p") === 1 && lag(col("__p"), 1).over(wLag) === 1 &&
              lag(col("__t"), 1).over(wLag) === col("__t"))
          .filter(col("__p") === 1 && !coalesce(col("__dupProbe"), lit(false)))
      }

    val qualified =
      if (view.ttlSeconds > 0)
        filled.withColumn("__best",
          when(col("__best.__fts") >=
            col("__ets") - expr(s"INTERVAL ${view.ttlSeconds} SECONDS"),
            col("__best")))
      else filled

    if (slim)
      // original entity column order, then features
      qualified.select(
        entityDf.columns.toSeq.map(c =>
          if (c == entityTsCol) col("__ets").as(entityTsCol) else col(c)) ++
          feats.map(f => col("__best." + f).as(outName(view, f, fullFeatureNames))): _*)
    else {
      val latest = qualified.select(
        keys.map(col) ++ Seq(col("__ets").as(entityTsCol)) ++
          feats.map(f => col("__best." + f).as(outName(view, f, fullFeatureNames))): _*)
      entityDf.join(latest, keys :+ entityTsCol, "left")
    }
  }

  /** Fused multi-view merge path: N views sharing the SAME join keys enrich
    * the entity frame through ONE union → ONE shuffle/sort → ONE window pass,
    * instead of N sequential merges — which cost N full shuffles of the
    * probe+feature stream plus, for every view after the first, a join-back
    * (the accumulated frame is no longer slim). At cluster scale the fused
    * plan reads every source once, shuffles once on the shared keys, and
    * sorts once.
    *
    * Mechanics: each view contributes its own payload struct and order
    * columns, null on every other view's rows and on probe rows. The global
    * per-key sort is (visibility ts, side, view-0 ord…, view-N ord…): two
    * rows of the SAME view order among themselves by that view's ord columns
    * (all other views' ord columns are null on both, comparing equal), and
    * rows of other views are invisible to view i's running
    * `last(__payload_i, ignoreNulls)` — so each view's winner is exactly its
    * single-view merge winner. TTL qualification stays per view.
    *
    * Created-ts filter mode fuses too (`filterByCreatedTs`): each view with
    * a created column contributes a per-view visibility time
    * `greatest(ts, created)` as its merge axis and a per-view running
    * `max_by(payload_i, (ts, created, tiebreaks))` winner — exactly the
    * single-view created-filter mechanics ([[enrichMerge]]), per view,
    * under the same single sort. Views without a created column keep the
    * running-`last` winner; the two winner kinds coexist in one window
    * pass because every view's payload and order columns are null on
    * every other view's rows.
    *
    * Preconditions (the caller, [[graft.engine.Historical]], falls back to
    * the sequential fold otherwise): ≥ 2 views, identical non-empty
    * joinKeys, non-Date entity timestamp.
    */
  def enrichMergeFused(
      entityDf: DataFrame,
      views: Seq[FeatureView],
      entityTsCol: String = "event_ts",
      fullFeatureNames: Boolean = false,
      filterByCreatedTs: Boolean = false,
      precomputedBounds: Option[Row] = None
  ): DataFrame = {
    val keys = views.head.joinKeys
    require(keys.nonEmpty && views.forall(_.joinKeys == keys),
      "fused merge requires identical non-empty join keys across views")
    // Enforce the documented precondition, don't just document it: a
    // DateType entity ts would cast every feature ts down to midnight here
    // (no per-view promotion in the fused axis) and leak same-day future
    // rows — the single-view path promotes instead (enrichMerge), so a
    // direct caller must go through Historical's fallback for Date frames.
    require(entityDf.schema(entityTsCol).dataType !=
      org.apache.spark.sql.types.DateType,
      "fused merge requires a non-Date entity timestamp; " +
        "use the sequential enrich path for DateType entity frames")
    val bounds = precomputedBounds.getOrElse(entityBounds(entityDf, entityTsCol))
    val prepared = views.map(v => prepare(entityDf, v, entityTsCol, Some(bounds)))
    val probe = prepared.head._2
    val etsType = probe.schema(entityTsCol).dataType
    val minTs = lit("1900-01-01 00:00:00").cast("timestamp")

    // per-view column descriptors: payload struct + (ord name, expr, type).
    // A created-filtered view additionally carries (a) a visibility merge
    // axis greatest(ts, created) and (b) an order STRUCT for its running
    // max_by — null on every other view's rows and on probes, so max_by
    // skips them (mirrors the single-view created-filter path).
    case class ViewCols(
        view: FeatureView, src: DataFrame, feats: Seq[String],
        visTime: Column,
        payload: Column, payloadType: org.apache.spark.sql.types.DataType,
        ordStruct: Option[(String, Column, org.apache.spark.sql.types.DataType)],
        ords: Seq[(String, Column, org.apache.spark.sql.types.DataType)])
    val infos = views.zipWithIndex.map { case (v, i) =>
      val createdFilter = filterByCreatedTs && v.createdTsCol.nonEmpty
      // created-filter mode hides NULL-created rows (SQL semantics of the
      // reference's `created <= entity_ts` join predicate) — same filter
      // as the single-view path; PropertySpec pins the equivalence
      val src =
        if (createdFilter) prepared(i)._1.filter(col(v.createdTsCol.get).isNotNull)
        else prepared(i)._1
      val feats = v.resolvedFeatures
      val payload = struct((feats.map(col) :+
        col(v.tsCol).cast(etsType).as("__fts")): _*)
      val payloadType = src.select(payload.as("p")).schema("p").dataType
      val visTime =
        if (createdFilter)
          greatest(col(v.tsCol), col(v.createdTsCol.get)).cast(etsType)
        else col(v.tsCol).cast(etsType)
      val ordStruct =
        if (createdFilter) {
          val e = struct((col(v.tsCol).cast(etsType).as("__o_ts") +:
            (v.createdTsCol.map(c => coalesce(col(c), minTs).as("__o_cr")).toSeq ++
              v.tieBreakCols.zipWithIndex.map { case (c, k) =>
                col(c).as(s"__o_tb$k")
              })): _*)
          Some((s"__mord_$i", e, src.select(e.as("o")).schema("o").dataType))
        } else None
      val ords =
        v.createdTsCol.map { c =>
          val e = coalesce(col(c), minTs)
          (s"__ord_${i}_cr", e, src.select(e.as("o")).schema("o").dataType)
        }.toSeq ++
          v.tieBreakCols.zipWithIndex.map { case (c, k) =>
            (s"__ord_${i}_tb$k", col(c), src.schema(c).dataType)
          }
      ViewCols(v, src, feats, visTime, payload, payloadType, ordStruct, ords)
    }
    val allOrds = infos.zipWithIndex.flatMap { case (inf, i) =>
      inf.ords.map { case (name, e, dt) => (name, i, e, dt) }
    }
    val allOrdStructs = infos.zipWithIndex.flatMap { case (inf, i) =>
      inf.ordStruct.map { case (name, e, dt) => (name, i, e, dt) }
    }

    def sideSelect(df: DataFrame, head: Seq[Column], ownerIdx: Int): DataFrame =
      df.select(
        keys.map(col) ++ head ++
          infos.zipWithIndex.map { case (inf, j) =>
            if (j == ownerIdx) inf.payload.as(s"__payload_$j")
            else lit(null).cast(inf.payloadType).as(s"__payload_$j")
          } ++
          allOrds.map { case (name, owner, e, dt) =>
            if (owner == ownerIdx) e.as(name) else lit(null).cast(dt).as(name)
          } ++
          allOrdStructs.map { case (name, owner, e, dt) =>
            if (owner == ownerIdx) e.as(name) else lit(null).cast(dt).as(name)
          }: _*)

    val fSides = infos.zipWithIndex.map { case (inf, i) =>
      sideSelect(inf.src, Seq(
        inf.visTime.as("__t"), lit(0).as("__p"),
        lit(null).cast(etsType).as("__ets")), i)
    }
    val pSide = sideSelect(probe, Seq(
      col(entityTsCol).cast(etsType).as("__t"), lit(1).as("__p"),
      col(entityTsCol).as("__ets")), ownerIdx = -1)

    val sortCols = Seq(col("__t").asc, col("__p").asc) ++
      allOrds.map { case (name, _, _, _) => col(name).asc_nulls_first }
    val w = Window.partitionBy(keys.map(col): _*).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val slim = entityDf.columns.toSet == (keys :+ entityTsCol).toSet
    val unioned = (fSides :+ pSide).reduce(_ unionByName _)
    // per-view running winner: the sorted-stream `last` normally; a running
    // max_by over the view's own (ts, created, tiebreaks) struct in
    // created-filter mode, where the stream is visibility-ordered rather
    // than winner-ordered (other views' rows and probes carry a null ord
    // and are skipped)
    val withBests = infos.zipWithIndex.foldLeft(unioned) { case (acc, (inf, i)) =>
      val best = inf.ordStruct match {
        case Some((name, _, _)) => max_by(col(s"__payload_$i"), col(name)).over(w)
        case None => last(col(s"__payload_$i"), ignoreNulls = true).over(w)
      }
      acc.withColumn(s"__best_$i", best)
    }
    val filled =
      if (slim) withBests.filter(col("__p") === 1)
      else {
        // duplicate probes are adjacent under the sort (all ord columns
        // null); mark all but the first with a lag over the same window
        // spec — one physical sort serves every window function here
        val wLag = Window.partitionBy(keys.map(col): _*).orderBy(sortCols: _*)
        withBests
          .withColumn("__dupProbe",
            col("__p") === 1 && lag(col("__p"), 1).over(wLag) === 1 &&
              lag(col("__t"), 1).over(wLag) === col("__t"))
          .filter(col("__p") === 1 && !coalesce(col("__dupProbe"), lit(false)))
      }
    val qualified = infos.zipWithIndex.foldLeft(filled) { case (acc, (inf, i)) =>
      if (inf.view.ttlSeconds > 0)
        acc.withColumn(s"__best_$i",
          when(col(s"__best_$i.__fts") >=
            col("__ets") - expr(s"INTERVAL ${inf.view.ttlSeconds} SECONDS"),
            col(s"__best_$i")))
      else acc
    }

    val featCols = infos.zipWithIndex.flatMap { case (inf, i) =>
      inf.feats.map(f =>
        col(s"__best_$i." + f).as(outName(inf.view, f, fullFeatureNames)))
    }
    if (slim)
      qualified.select(
        entityDf.columns.toSeq.map(c =>
          if (c == entityTsCol) col("__ets").as(entityTsCol) else col(c)) ++
          featCols: _*)
    else {
      val latest = qualified.select(
        keys.map(col) ++ Seq(col("__ets").as(entityTsCol)) ++ featCols: _*)
      entityDf.join(latest, keys :+ entityTsCol, "left")
    }
  }

  /** The bucketed range-join path (see object doc, strategy 2). */
  def enrichJoin(
      entityDf: DataFrame,
      view: FeatureView,
      entityTsCol: String = "event_ts",
      fullFeatureNames: Boolean = false,
      filterByCreatedTs: Boolean = false,
      broadcastThresholdRows: Long = DefaultBroadcastRows,
      saltBuckets: Int = 0,
      hotKeyRowThreshold: Long = 5000000L,
      precomputedBounds: Option[Row] = None
  ): DataFrame = {
    val keys = view.joinKeys
    val feats = view.resolvedFeatures
    val (src, probeAll) = prepare(entityDf, view, entityTsCol, precomputedBounds)
    // J2: deduplicated probe side — one row per (keys, event_ts).
    val probeRaw = probeAll.dropDuplicates(keys :+ entityTsCol)

    // Hot-conversation salting (north rule; graft.skew.Salting): split keys
    // with > hotKeyRowThreshold source rows into saltBuckets sub-keys. The
    // feature side spreads by xxhash64(ts); the probe side replicates per
    // salt. The groupBy below re-merges across salts (max_by is
    // order-associative), so results are byte-identical to the unsalted
    // plan — SaltingSpec asserts this.
    val saltKeys = if (saltBuckets > 1 && keys.nonEmpty) Seq("__salt") else Nil
    val (srcS, probeS) =
      if (saltKeys.nonEmpty) {
        val hot = graft.skew.Salting.detectHotKeys(
          src.select(keys.map(col): _*), keys, hotKeyRowThreshold, saltBuckets)
        (graft.skew.Salting.saltLarge(src, hot, keys, col(view.tsCol)),
          graft.skew.Salting.saltSmall(probeRaw, hot, keys))
      } else (src, probeRaw)

    // Bounded-fan-out range join (the classic time-bucketing rewrite — OSS
    // Spark has no range-join optimization): with a TTL, add a coarse
    // time-bucket equi-key — feature rows at floor(ts/ttl), probe rows
    // exploded over the 2 buckets covering [event_ts − ttl, event_ts].
    // SMJ/HashJoin then pairs only rows within 2·ttl of each other instead
    // of EVERY (turn, probe) pair of a conversation. Theta conditions below
    // keep the semantics exact.
    val bucketKeys = if (view.ttlSeconds > 0) Seq("__tb") else Nil
    val bucketUs = view.ttlSeconds * 1000000L
    val (srcB, probeB) =
      if (bucketKeys.nonEmpty) {
        (srcS.withColumn("__tb",
          floor(unix_micros(col(view.tsCol).cast("timestamp")) / bucketUs)),
          probeS.withColumn("__tb",
            explode(sequence(
              floor((unix_micros(col(entityTsCol).cast("timestamp")) - bucketUs) / bucketUs),
              floor(unix_micros(col(entityTsCol).cast("timestamp")) / bucketUs)))))
      } else (srcS, probeS)

    val probe =
      if (saltKeys.isEmpty && bucketKeys.isEmpty &&
        shouldBroadcast(entityDf, broadcastThresholdRows))
        broadcast(probeB)
      else probeB

    // J3: equi+theta range join. The theta condition seeds the fold — a
    // keyless view with no TTL has no equi keys at all and must still
    // plan (an empty .reduce would throw).
    val fts = col("__src." + view.tsCol)
    val ets = col("__probe." + entityTsCol)
    var cond: Column = (keys ++ saltKeys ++ bucketKeys)
      .map(k => col("__src." + k) === col("__probe." + k))
      .foldLeft(fts <= ets)(_ && _)
    if (view.ttlSeconds > 0)
      cond = cond && (fts >= ets - expr(s"INTERVAL ${view.ttlSeconds} SECONDS"))
    view.createdTsCol.foreach { c =>
      if (filterByCreatedTs) cond = cond && (col("__src." + c) <= ets)
    }
    val joined = srcB.alias("__src").join(probe.alias("__probe"), cond, "inner")

    // J4+J5+J6 fused: latest-row selection as a single partial-aggregable
    // max_by instead of row_number + join-back. Ordering: (ts desc, created
    // desc nulls-last, tiebreaks desc) — nulls must LOSE ties, matching
    // dask's na_position="first", keep="last" (dask.py:1240-1268), hence the
    // coalesce to -infinity.
    val minTs = lit("1900-01-01 00:00:00").cast("timestamp")
    val ordCols: Seq[Column] =
      fts +:
        (view.createdTsCol.map(c => coalesce(col("__src." + c), minTs)).toSeq ++
          view.tieBreakCols.map(c => col("__src." + c)))
    val ord = struct(ordCols: _*)
    val payload = struct(feats.map(f => col("__src." + f).as(f)): _*)
    val latest = joined
      .groupBy((keys.map(k => col("__probe." + k)) :+ ets): _*)
      .agg(max_by(payload, ord).as("__best"))
      .select(
        keys.map(col) ++ Seq(col(entityTsCol)) ++
          feats.map(f => col("__best." + f).as(outName(view, f, fullFeatureNames))): _*)

    // J7: final assembly — every entity row and column survives.
    entityDf.join(latest, keys :+ entityTsCol, "left")
  }

  private def outName(view: FeatureView, feat: String, full: Boolean): String =
    if (full) s"${view.name}__$feat" else feat

  private def shouldBroadcast(df: DataFrame, thresholdRows: Long): Boolean = {
    // Cheap static heuristic: trust Catalyst/AQE unless the caller forces it.
    // We only auto-broadcast when the plan's row-count estimate is known and
    // small; otherwise the join still benefits from AQE's runtime broadcast.
    try {
      val stats = df.queryExecution.optimizedPlan.stats
      stats.rowCount.exists(_ <= BigInt(thresholdRows)) ||
      stats.sizeInBytes <= 64L * 1024 * 1024
    } catch { case _: Throwable => false }
  }
}
