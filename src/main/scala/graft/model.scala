package graft

import org.apache.spark.sql.DataFrame
import java.sql.Timestamp

/** Typed core row of the engine per BASELINE.json:input_hint — an agent /
  * conversation transcript turn. Mirrors the reference's source record for a
  * feature view over a batch source (reference: sdk/python/feast/
  * feature_view.py:111, infra/offline_stores/contrib/spark_offline_store/
  * spark_source.py:31).
  */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String, // null for non-tool turns
    ts: Timestamp
)

/** Left side of the point-in-time join: one row per requested
  * (entity key, event timestamp). Reference: the "entity dataframe" of
  * get_historical_features (sdk/python/feast/feature_store.py:1942).
  */
case class EntityRow(conv_id: String, event_ts: Timestamp)

/** FeatureView analog (reference: sdk/python/feast/feature_view.py:111,
  * 224-225, 336-337): a named group of features over one batch source.
  *
  * @param joinKeys      entity join key column names (entity.py:48)
  * @param tsCol         event-timestamp column of the source
  * @param createdTsCol  optional created-timestamp column used as dedup
  *                      tie-breaker and anti-leak cutoff
  * @param ttlSeconds    lower-bound window: feature rows older than
  *                      event_ts - ttl are invisible. 0 = no lower bound
  *                      (offline_utils.py:144-147, 170-173).
  * @param features      feature column names after field mapping; empty =
  *                      every column that is not a key/timestamp
  * @param fieldMapping  source-column -> feature-name renames
  *                      (data_source.py:179 field_mapping)
  * @param tieBreakCols  deterministic extra ORDER BY ... DESC tiebreakers
  *                      applied after (ts, created_ts). The reference's
  *                      row_number pick is nondeterministic on full ties
  *                      (spark.py:1837-1840); we pin it down for golden
  *                      comparability.
  * @param datePartitionCol physical date-partition column of the source
  *                      (reference date_partition_column, data_source.py:179;
  *                      spark.py:90-93,310-327): when set, the PIT join adds
  *                      redundant partition predicates derived from the
  *                      entity time range + TTL so the scan prunes whole
  *                      partitions (P6)
  * @param datePartitionFormat strftime-style format of that column
  */
case class FeatureView(
    name: String,
    source: DataFrame,
    joinKeys: Seq[String],
    tsCol: String,
    createdTsCol: Option[String] = None,
    ttlSeconds: Long = 0L,
    features: Seq[String] = Nil,
    fieldMapping: Map[String, String] = Map.empty,
    tieBreakCols: Seq[String] = Nil,
    datePartitionCol: Option[String] = None,
    datePartitionFormat: String = "yyyy-MM-dd"
) {
  /** Resolved feature columns (post field-mapping source). */
  def resolvedFeatures: Seq[String] =
    if (features.nonEmpty) features
    else {
      val excluded = (joinKeys :+ tsCol) ++ createdTsCol.toSeq ++ datePartitionCol.toSeq
      source.columns.toSeq
        .map(c => fieldMapping.getOrElse(c, c))
        .filterNot(excluded.contains)
    }

  /** Source with `fieldMapping` applied — tsCol/joinKeys/features name
    * columns of THIS frame. Every engine entry point that touches the
    * source directly (Materialize, non-entity key discovery, date bounds)
    * must read through it, not through the raw `source`; renaming a
    * missing column is a no-op, so applying it twice is harmless.
    */
  def mappedSource: org.apache.spark.sql.DataFrame =
    fieldMapping.foldLeft(source) { case (df, (src, dst)) => df.withColumnRenamed(src, dst) }
}

/** Per-use view projection (reference FeatureViewProjection,
  * sdk/python/feast/feature_view_projection.py:17; join_key_map applied at
  * infra/offline_stores/dask.py:1053-1056): a feature subset and join-key
  * renames binding a view to an entity frame whose key columns are named
  * differently.
  */
case class Projection(
    view: FeatureView,
    features: Seq[String] = Nil,
    joinKeyMap: Map[String, String] = Map.empty,
    nameAlias: Option[String] = None
) {
  /** The view rebound to the entity frame's column names. */
  def resolved: FeatureView = {
    val renamedSource = joinKeyMap.foldLeft(view.source) {
      case (df, (from, to)) => df.withColumnRenamed(from, to)
    }
    view.copy(
      name = nameAlias.getOrElse(view.name),
      source = renamedSource,
      joinKeys = view.joinKeys.map(k => joinKeyMap.getOrElse(k, k)),
      features = if (features.nonEmpty) features else view.features)
  }
}

/** Named bundle of view projections — the query users actually serve
  * (reference FeatureService, sdk/python/feast/feature_service.py:33).
  */
case class FeatureService(name: String, projections: Seq[Projection])

/** On-demand feature view (reference OnDemandFeatureView,
  * sdk/python/feast/on_demand_feature_view.py:74): a post-retrieval
  * row-level transform computed from *declared* input feature columns and
  * request-time columns only.
  *
  * @param inputs      retrieved feature / entity columns the transform may
  *                    read (the reference isolates transform inputs to the
  *                    declared source columns, utils.py:820-844)
  * @param requestCols request-time columns that must arrive with the entity
  *                    frame (reference RequestSource, data_source.py:591);
  *                    missing request data is an error before retrieval runs
  * @param outputs     feature columns the transform appends (its schema,
  *                    used for projection and full-name prefixing)
  * @param sourceRefs  "view:feature" refs of the inputs, so a registry can
  *                    pull the backing views when the ODFV is requested by
  *                    ref (reference source_feature_view_projections)
  * @param transform   the row-level transform; must append columns, never
  *                    drop or re-key rows (the reference applies ODFVs to
  *                    the assembled retrieval frame row-by-row)
  */
case class OnDemandView(
    name: String,
    inputs: Seq[String],
    requestCols: Seq[String] = Nil,
    outputs: Seq[String] = Nil,
    sourceRefs: Seq[String] = Nil,
    transform: DataFrame => DataFrame
)

/** A feature view DERIVED from other views' data (reference
  * BatchFeatureView.source_views, sdk/python/feast/batch_feature_view.py;
  * resolved into an execution DAG by
  * infra/compute_engines/feature_resolver.py:40-80).
  *
  * `derive` receives the resolved source DataFrames of `sourceViews` in
  * declaration order and returns this view's source DataFrame. Everything
  * stays a lazy logical plan: resolving a derivation chain composes ONE
  * Catalyst plan end-to-end (filters still push down through the hops, and
  * a diamond dependency resolves its shared upstream once), so derivation
  * depth adds zero extra scans or actions at any scale.
  *
  * The remaining fields carry the same meaning as on [[FeatureView]]; the
  * resolver turns a spec into a concrete FeatureView with the derived
  * source bound.
  */
case class DerivedViewSpec(
    name: String,
    sourceViews: Seq[String],
    derive: Seq[DataFrame] => DataFrame,
    joinKeys: Seq[String],
    tsCol: String,
    createdTsCol: Option[String] = None,
    ttlSeconds: Long = 0L,
    features: Seq[String] = Nil,
    tieBreakCols: Seq[String] = Nil
)

/** Aggregation spec (reference: sdk/python/feast/aggregation/__init__.py:
  * 15-48): (column, function, optional time window, optional slide).
  * Supported functions: sum, max, min, count, avg/mean, count_distinct,
  * std, var (reference list at aggregation/__init__.py:21).
  */
case class Aggregation(
    column: String,
    function: String,
    timeWindowSec: Option[Long] = None,
    slideSec: Option[Long] = None,
    alias: Option[String] = None
) {
  /** Reference alias scheme fn_col[_Ns] (aggregation/__init__.py:106-118). */
  def outputName: String = alias.getOrElse {
    val base = s"${function}_$column"
    timeWindowSec.map(w => s"${base}_${w}s").getOrElse(base)
  }
}
