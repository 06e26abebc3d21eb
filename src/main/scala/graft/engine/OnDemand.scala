package graft.engine

import graft.OnDemandView
import org.apache.spark.sql.DataFrame

/** On-demand feature view (ODFV) application with input isolation and
  * request-time columns.
  *
  * Reference semantics: an ODFV transform sees ONLY its declared source
  * columns — the reference physically subsets the retrieval frame to the
  * transform's declared inputs before calling it
  * (sdk/python/feast/utils.py:820-844) — and request-time data arrives with
  * the entity rows via RequestSource (sdk/python/feast/data_source.py:591);
  * missing request columns are an error raised before retrieval work runs
  * (sdk/python/feast/utils.py:532-555 RequestDataNotFoundInEntityDfException).
  *
  * Spark-first isolation: physically subsetting would force a join-back
  * (a shuffle) to re-attach the appended columns. Instead the frame handed
  * to the transform has every NON-declared column renamed to a reserved
  * `__odfv_hidden_N` name — a transform referencing an undeclared column
  * fails analysis (column does not exist), exactly like the reference's
  * subset, while declared inputs and appended outputs stay plain
  * projections: zero extra shuffles, zero join-back, and Catalyst still
  * prunes unused hidden columns end-to-end.
  */
object OnDemand {

  /** Raised when an ODFV's declared request columns are absent from the
    * entity frame (reference RequestDataNotFoundInEntityDfException).
    */
  final class MissingRequestDataException(msg: String)
      extends IllegalArgumentException(msg)

  /** Validate request-time columns BEFORE any retrieval work: every
    * `requestCols` entry of every ODFV must exist on the entity frame.
    */
  def requireRequestData(entityDf: DataFrame, odfvs: Seq[OnDemandView]): Unit = {
    val have = entityDf.columns.toSet
    val missing = odfvs.flatMap(v =>
      v.requestCols.filterNot(have.contains).map(c => s"${v.name}:$c"))
    if (missing.nonEmpty)
      throw new MissingRequestDataException(
        s"request data columns missing from the entity frame: ${missing.mkString(", ")}")
  }

  /** Apply one ODFV to the assembled retrieval frame.
    *
    * Contract (reference on_demand_feature_view.py:1023 — applied row-wise
    * post-join): the transform must APPEND columns; it must not drop,
    * re-key, or reorder-drop rows. Isolation: only `inputs ++ requestCols`
    * are visible under their real names; everything else is renamed away
    * for the duration of the transform and restored after.
    *
    * @param fullFeatureNames prefix appended outputs `odfvName__output`
    *        (same collision rule as view features, utils.py:562)
    */
  def applyView(
      retrieved: DataFrame,
      v: OnDemandView,
      fullFeatureNames: Boolean = false
  ): DataFrame = {
    val allowed = (v.inputs ++ v.requestCols).distinct
    val absent = allowed.filterNot(retrieved.columns.contains)
    require(absent.isEmpty,
      s"ODFV ${v.name}: declared inputs not present in the retrieval frame: " +
        absent.mkString(", "))
    // Hide undeclared columns behind reserved names (pure projection).
    val hidden = retrieved.columns.toSeq.filterNot(allowed.contains)
    val hiddenMap = hidden.zipWithIndex.map { case (c, i) => c -> s"__odfv_hidden_$i" }
    val iso = hiddenMap.foldLeft(retrieved) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to)
    }
    val out = v.transform(iso)
    // Appended-columns contract: every pre-existing column must survive.
    val dropped = iso.columns.filterNot(out.columns.contains)
    require(dropped.isEmpty,
      s"ODFV ${v.name}: transform dropped columns ${dropped.mkString(", ")}; " +
        "ODFV transforms must only append")
    val appended = out.columns.toSeq.filterNot(iso.columns.contains)
    // An appended column named like a HIDDEN (undeclared) column would
    // collide on restore and poison every later reference with an
    // ambiguous-column error — fail loudly at the source instead.
    val shadowing = appended.filter(hidden.contains)
    require(shadowing.isEmpty,
      s"ODFV ${v.name}: transform appended column(s) ${shadowing.mkString(", ")} " +
        "that shadow undeclared retrieval columns; declare them as inputs or rename the outputs")
    if (v.outputs.nonEmpty) {
      val missingOut = v.outputs.filterNot(appended.contains)
      require(missingOut.isEmpty,
        s"ODFV ${v.name}: declared outputs not produced: ${missingOut.mkString(", ")}")
    }
    // Restore hidden names, then apply the full-name prefix to the outputs.
    val restored = hiddenMap.foldLeft(out) { case (d, (from, to)) =>
      d.withColumnRenamed(to, from)
    }
    if (fullFeatureNames)
      appended.foldLeft(restored)((d, c) =>
        d.withColumnRenamed(c, s"${v.name}__$c"))
    else restored
  }

  /** Apply a sequence of ODFVs in order (later ODFVs may read earlier
    * outputs by declaring them as inputs).
    */
  def applyAll(
      retrieved: DataFrame,
      odfvs: Seq[OnDemandView],
      fullFeatureNames: Boolean = false
  ): DataFrame =
    odfvs.foldLeft(retrieved)((acc, v) => applyView(acc, v, fullFeatureNames))
}
