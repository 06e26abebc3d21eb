package graft.engine

import graft.{DerivedViewSpec, FeatureService, FeatureView, OnDemandView, Projection}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import scala.collection.mutable

/** In-memory feature registry + `"view:feature"` string-ref retrieval —
  * the reference's user-facing API surface
  * (sdk/python/feast/feature_store.py:1942-2142 `get_historical_features(
  * features=[...])`; ref parsing utils._get_features / _validate_feature_refs
  * utils.py:562,1171; registry lookup infra/registry/registry.py).
  *
  * The registry is session-scoped metadata only (name → definition); all
  * data stays in the views' DataFrame sources, so nothing here limits
  * scale. Registration order is preserved for deterministic resolution.
  */
final class Registry {

  /** Raised for refs naming no registered view/ODFV, or an ODFV output the
    * ODFV does not declare (reference FeatureViewNotFoundException).
    */
  final class UnknownFeatureRefException(msg: String)
      extends IllegalArgumentException(msg)

  private val views = mutable.LinkedHashMap[String, FeatureView]()
  private val odfvs = mutable.LinkedHashMap[String, OnDemandView]()
  private val services = mutable.LinkedHashMap[String, FeatureService]()
  private val derivations = mutable.LinkedHashMap[String, DerivedViewSpec]()

  /** `feast apply` analog: register (or replace) a definition. */
  def register(v: FeatureView): this.type = { views(v.name) = v; this }
  def register(v: OnDemandView): this.type = { odfvs(v.name) = v; this }
  def register(s: FeatureService): this.type = { services(s.name) = s; this }
  def register(d: DerivedViewSpec): this.type = { derivations(d.name) = d; this }

  /** Looks through derivations: a derived name resolves its DAG
    * ([[ViewResolver]]) into a concrete view, so derived views are
    * first-class retrieval targets for every `"view:feature"` ref.
    */
  def featureView(name: String): FeatureView =
    if (derivations.contains(name) || views.contains(name))
      ViewResolver.resolve(name, views.get, derivations.get)
    else
      throw new UnknownFeatureRefException(s"feature view '$name' not registered")
  def onDemandView(name: String): OnDemandView =
    odfvs.getOrElse(name,
      throw new UnknownFeatureRefException(s"on-demand view '$name' not registered"))
  def featureService(name: String): FeatureService =
    services.getOrElse(name,
      throw new UnknownFeatureRefException(s"feature service '$name' not registered"))

  private def parseRef(ref: String): (String, String) = ref.split(":", 2) match {
    case Array(v, f) if v.nonEmpty && f.nonEmpty => (v, f)
    case _ => throw new UnknownFeatureRefException(
      s"feature ref '$ref' is not of the form view:feature")
  }

  /** Retrieval by string feature refs. Each ref is `view:feature` or
    * `odfv:output`; an ODFV ref pulls the ODFV's declared `sourceRefs`
    * (its backing view features) into the retrieval automatically
    * (reference source_feature_view_projections,
    * on_demand_feature_view.py:74). Output = entity columns, then the
    * requested features in ref order; ODFV input features that were not
    * themselves requested are retrieved but projected away, matching the
    * reference's output contract.
    */
  def getHistoricalFeatures(
      entityDf: DataFrame,
      features: Seq[String],
      entityTsCol: String = "event_ts",
      fullFeatureNames: Boolean = false
  ): DataFrame = {
    require(features.nonEmpty, "at least one feature ref required")
    val parsed = features.map(parseRef)
    // one DAG resolution per referenced view for the whole call —
    // featureView() re-walks the derivation DAG each time, so the
    // validation loop, sourceRef pull, and final projection must share
    // resolved instances (plan sharing only holds within one resolution)
    val viewCache = scala.collection.mutable.Map[String, graft.FeatureView]()
    def cachedView(n: String): graft.FeatureView =
      viewCache.getOrElseUpdate(n, featureView(n))
    val (odfvRefs, viewRefs) = parsed.partition { case (n, _) => odfvs.contains(n) }
    viewRefs.foreach { case (n, f) =>
      val v = cachedView(n) // throws UnknownFeatureRefException if absent
      require(v.resolvedFeatures.contains(f),
        s"view '$n' has no feature '$f' (has: ${v.resolvedFeatures.mkString(",")})")
    }
    odfvRefs.foreach { case (n, f) =>
      val v = odfvs(n)
      if (v.outputs.nonEmpty && !v.outputs.contains(f))
        throw new UnknownFeatureRefException(
          s"on-demand view '$n' does not produce '$f' (outputs: ${v.outputs.mkString(",")})")
    }
    val requestedOdfvs = odfvRefs.map(_._1).distinct.map(odfvs)
    // Backing-view features the requested ODFVs need, resolved from their
    // declared sourceRefs.
    val sourceRefs = requestedOdfvs.flatMap(_.sourceRefs).map(parseRef)
    sourceRefs.foreach { case (n, _) => cachedView(n) }
    val needed = (viewRefs ++ sourceRefs).distinct
    val viewOrder = needed.map(_._1).distinct
    val perView = needed.groupBy(_._1).map { case (n, refs) =>
      n -> refs.map(_._2).distinct
    }
    val resolvedViews = viewOrder.map(n =>
      Projection(cachedView(n), features = perView(n)).resolved)
    // a request-data-only ODFV (empty sourceRefs — legitimate reference
    // shape) resolves ZERO backing views; Historical requires ≥ 1, so the
    // ODFV applies straight to the entity frame instead
    val retrieved =
      if (resolvedViews.isEmpty) entityDf
      else Historical.getHistoricalFeatures(
        entityDf, resolvedViews, entityTsCol, fullFeatureNames)
    val withOdfv = OnDemand.applyAll(retrieved, requestedOdfvs,
      fullFeatureNames, knownPrefixes = Some(viewOrder.toSet))
    // Final projection: entity columns + requested refs in ref order.
    val outName: ((String, String)) => String = { case (n, f) =>
      if (fullFeatureNames) s"${n}__$f" else f
    }
    val cols = entityDf.columns.toSeq ++ parsed.map(outName)
    withOdfv.select(cols.distinct.map(col): _*)
  }

  /** Retrieval through a registered [[graft.FeatureService]] by name. */
  def getHistoricalFeaturesService(
      entityDf: DataFrame,
      serviceName: String,
      entityTsCol: String = "event_ts",
      fullFeatureNames: Boolean = false
  ): DataFrame =
    Historical.getHistoricalFeaturesService(
      entityDf, featureService(serviceName), entityTsCol, fullFeatureNames)

}
