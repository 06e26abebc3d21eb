package graft.engine

import graft.{DerivedViewSpec, FeatureView}
import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Resolves view-derivation DAGs (reference FeatureResolver,
  * sdk/python/feast/infra/compute_engines/feature_resolver.py:40-80:
  * `_walk` with a resolution-path cycle check + node cache, then
  * topological order).
  *
  * Differences from the reference, deliberate and Spark-first:
  *  - resolution returns a concrete [[FeatureView]] whose source is the
  *    fully composed LAZY DataFrame — there is no per-node "execute"
  *    step, because Catalyst already executes a DAG of transformations as
  *    one plan (the reference materializes each DAG node through its
  *    compute engine);
  *  - a diamond dependency shares the SAME DataFrame instance for the
  *    common upstream, so the physical planner can reuse the exchange
  *    instead of rescanning.
  */
object ViewResolver {

  final class CycleException(val path: Seq[String])
      extends IllegalArgumentException(
        s"cycle detected in view-derivation DAG: ${path.mkString(" -> ")}")

  final class UnknownViewException(name: String, referrer: String)
      extends IllegalArgumentException(
        // a top-level lookup miss (referrer == name) is a plain unknown
        // name, not a self-referencing derivation — say so, or the user
        // hunts for a derivation spec that never existed
        if (name == referrer)
          s"unknown view '$name' (not registered as a base or derived view)"
        else s"derived view '$referrer' references unknown source view '$name'")

  /** Resolve `name` into a concrete FeatureView. `base` supplies leaf
    * views; `derived` supplies derivation specs (a name present in both is
    * taken as derived — the spec shadows the leaf).
    */
  def resolve(
      name: String,
      base: String => Option[FeatureView],
      derived: String => Option[DerivedViewSpec]
  ): FeatureView = {
    val cache = mutable.Map[String, DataFrame]()
    val path = mutable.ListBuffer[String]()

    def walk(n: String, referrer: String): DataFrame = {
      if (path.contains(n)) throw new CycleException((path :+ n).toSeq)
      cache.getOrElseUpdate(n, {
        path += n
        val df = derived(n) match {
          case Some(spec) => spec.derive(spec.sourceViews.map(walk(_, n)))
          case None => base(n) match {
            case Some(v) => v.source
            case None => throw new UnknownViewException(n, referrer)
          }
        }
        path.remove(path.length - 1)
        df
      })
    }

    derived(name) match {
      case Some(spec) =>
        val src = walk(name, name)
        FeatureView(spec.name, src, spec.joinKeys, spec.tsCol,
          spec.createdTsCol, spec.ttlSeconds, spec.features,
          tieBreakCols = spec.tieBreakCols)
      case None => base(name).getOrElse(throw new UnknownViewException(name, name))
    }
  }

  /** Dependency-order listing of `name`'s transitive DAG (upstream first,
    * `name` last, each node once) — the reference's `topological_sort`
    * analog, for inspection/tests; resolution itself needs no explicit
    * ordering pass because the recursive composition IS a post-order walk.
    */
  def topoOrder(
      name: String,
      derived: String => Option[DerivedViewSpec]
  ): Seq[String] = {
    val out = mutable.LinkedHashSet[String]()
    val path = mutable.ListBuffer[String]()
    def walk(n: String): Unit = {
      if (path.contains(n)) throw new CycleException((path :+ n).toSeq)
      if (!out.contains(n)) {
        path += n
        derived(n).foreach(_.sourceViews.foreach(walk))
        path.remove(path.length - 1)
        out += n
      }
    }
    walk(name)
    out.toSeq
  }
}
