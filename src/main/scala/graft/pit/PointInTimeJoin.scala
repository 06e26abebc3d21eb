package graft.pit

import graft.FeatureView
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

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
  * The physical plan is deliberately NOT the reference's
  * (range join → row_number → join back). We compute
  *
  *   range inner join → partial-aggregated max_by(struct(features),
  *   struct(ts, created, tiebreaks)) groupBy (keys, event_ts) → single left
  *   join back to the entity frame
  *
  * which is one shuffle cheaper (no window sort, no second join) and keeps
  * everything inside whole-stage codegen with map-side partial aggregation.
  * Scale levers:
  *   - scan bounds [min(event_ts) - ttl, max(event_ts)] derived from the
  *     entity frame are pushed into the source scan (parquet/Iceberg
  *     predicate + partition pruning; reference offline_utils.py:168-189)
  *   - the deduplicated (keys, event_ts) probe frame is broadcast when small
  *   - only (keys, ts, created, features) survive into the shuffle — wide
  *     columns like `text` never shuffle unless they are requested features
  *   - optional salting for hot keys (graft.skew.Salting) + AQE skew join.
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
      hotKeyRowThreshold: Long = 5000000L
  ): DataFrame = {
    val keys = view.joinKeys
    val feats = view.resolvedFeatures

    // P1/P2: apply field mapping + early projection (column pruning reaches
    // the scan; keeps wide columns out of the shuffle).
    val mapped = view.fieldMapping.foldLeft(view.source) {
      case (df, (src, dst)) => df.withColumnRenamed(src, dst)
    }
    val neededCols =
      (keys :+ view.tsCol) ++ view.createdTsCol.toSeq ++ feats ++
        view.tieBreakCols ++ view.datePartitionCol.toSeq
    var src = mapped.select(neededCols.distinct.map(col): _*)

    // P4/P5: scan bounds from the entity frame — one tiny agg action whose
    // result becomes a pushable predicate (reference A8 spark.py:1499-1535
    // + template spark.py:1772-1782).
    val bounds: Row = entityDf
      .agg(min(col(entityTsCol)).as("mn"), max(col(entityTsCol)).as("mx"))
      .head()
    val lowerTs =
      if (view.ttlSeconds > 0 && !bounds.isNullAt(0))
        Some(lit(bounds.get(0)) - expr(s"INTERVAL ${view.ttlSeconds} SECONDS"))
      else None
    if (!bounds.isNullAt(1))
      src = src.filter(col(view.tsCol) <= lit(bounds.get(1)))
    lowerTs.foreach(lo => src = src.filter(col(view.tsCol) >= lo))
    // P6: redundant date-partition predicates derived from the same bounds —
    // these hit the partition columns directly, so the file index prunes
    // whole day-directories (Iceberg hidden partitioning would prune from
    // the ts predicate alone; explicit `ds=` layouts need this).
    view.datePartitionCol.foreach { dpc =>
      if (!bounds.isNullAt(1))
        src = src.filter(
          col(dpc) <= date_format(lit(bounds.get(1)), view.datePartitionFormat))
      lowerTs.foreach(lo =>
        src = src.filter(col(dpc) >= date_format(lo, view.datePartitionFormat)))
    }

    // J2: deduplicated probe side — one row per (keys, event_ts).
    val probeRaw = entityDf
      .select((keys :+ entityTsCol).map(col): _*)
      .dropDuplicates(keys :+ entityTsCol)

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

    val probe =
      if (saltKeys.isEmpty && shouldBroadcast(entityDf, broadcastThresholdRows))
        broadcast(probeS)
      else probeS

    // J3: equi+theta range join.
    val fts = col("__src." + view.tsCol)
    val ets = col("__probe." + entityTsCol)
    var cond: Column = (keys ++ saltKeys)
      .map(k => col("__src." + k) === col("__probe." + k))
      .reduce(_ && _) && (fts <= ets)
    if (view.ttlSeconds > 0)
      cond = cond && (fts >= ets - expr(s"INTERVAL ${view.ttlSeconds} SECONDS"))
    view.createdTsCol.foreach { c =>
      if (filterByCreatedTs) cond = cond && (col("__src." + c) <= ets)
    }
    val joined = srcS.alias("__src").join(probe.alias("__probe"), cond, "inner")

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
