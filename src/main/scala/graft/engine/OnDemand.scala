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
      fullFeatureNames: Boolean = false,
      knownPrefixes: Option[Set[String]] = None
  ): DataFrame = {
    // A fullFeatureNames retrieval carries view features as
    // `view__feature` (and earlier ODFV outputs as `odfv__output`), but an
    // ODFV declares its inputs by BARE name — resolve each missing input
    // to its uniquely-prefixed column for the duration of the transform
    // and restore after, so ODFVs work identically under both naming
    // modes (this was previously special-cased one level up, in
    // Registry.applyOdfv, and only for registry-ref'd inputs).
    // `knownPrefixes` (the resolved views' names + earlier ODFV names,
    // threaded by the orchestrators) restricts candidates so an unrelated
    // entity/request column that merely ENDS in `__<input>` (e.g.
    // `legacy__turn_idx`) is never silently consumed as the ODFV input.
    val prefixResolved: Seq[(String, String)] =
      v.inputs.filterNot(retrieved.columns.contains).flatMap { in =>
        val candidates = knownPrefixes match {
          // An EMPTY prefix set means this retrieval resolved no views at
          // all (request-data-only ODFVs over a frame from a PRIOR
          // fullFeatureNames retrieval) — there is nothing to restrict
          // against, so fall back to the permissive unique-suffix match
          // rather than rejecting every prefixed candidate.
          case Some(ps) if ps.nonEmpty => retrieved.columns.toSeq.filter(c =>
            c.endsWith(s"__$in") && ps.contains(c.dropRight(in.length + 2)))
          case _ => retrieved.columns.toSeq.filter(_.endsWith(s"__$in"))
        }
        candidates match {
          case Seq(one) => Seq(one -> in)
          case Seq() => Nil // reported by the absent require below
          case many => throw new IllegalArgumentException(
            s"ODFV ${v.name}: input '$in' is ambiguous under full feature " +
              s"names: ${many.mkString(", ")}")
        }
      }
    val frame = prefixResolved.foldLeft(retrieved) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to)
    }
    val allowed = (v.inputs ++ v.requestCols).distinct
    val absent = allowed.filterNot(frame.columns.contains)
    require(absent.isEmpty,
      s"ODFV ${v.name}: declared inputs not present in the retrieval frame: " +
        absent.mkString(", "))
    // Hide undeclared columns behind reserved names (pure projection).
    val hidden = frame.columns.toSeq.filterNot(allowed.contains)
    val hiddenMap = hidden.zipWithIndex.map { case (c, i) => c -> s"__odfv_hidden_$i" }
    val iso = hiddenMap.foldLeft(frame) { case (d, (from, to)) =>
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
    // Restore hidden names and prefixed-input names, then apply the
    // full-name prefix to the outputs.
    val restored0 = hiddenMap.foldLeft(out) { case (d, (from, to)) =>
      d.withColumnRenamed(to, from)
    }
    val restored = prefixResolved.foldLeft(restored0) { case (d, (from, to)) =>
      d.withColumnRenamed(to, from)
    }
    if (fullFeatureNames)
      appended.foldLeft(restored) { (d, c) =>
        val prefixed = s"${v.name}__$c"
        // the same collision rule as view features (utils.py:562): a
        // silent duplicate name would poison every later reference with
        // an ambiguous-column error far from the cause
        require(!d.columns.contains(prefixed),
          s"ODFV ${v.name}: prefixed output '$prefixed' collides with an " +
            "existing column; rename the output or the view")
        d.withColumnRenamed(c, prefixed)
      }
    else restored
  }

  /** Apply a sequence of ODFVs in order (later ODFVs may read earlier
    * outputs by declaring them as inputs — each applied ODFV's name joins
    * the known-prefix set so its prefixed outputs resolve downstream).
    */
  def applyAll(
      retrieved: DataFrame,
      odfvs: Seq[OnDemandView],
      fullFeatureNames: Boolean = false,
      knownPrefixes: Option[Set[String]] = None
  ): DataFrame =
    odfvs.foldLeft((retrieved, knownPrefixes)) { case ((acc, kp), v) =>
      // The EMPTY prefix set is a marker — "this frame came from a prior
      // retrieval, its prefixes are unknown, match permissively" (see
      // applyView). Adding the applied ODFV's name to it would flip every
      // LATER apply from permissive to restricted, so only a chain's first
      // request-data-only ODFV could resolve prefixed columns. Keep the
      // marker empty; the permissive suffix match already covers earlier
      // ODFV outputs.
      (applyView(acc, v, fullFeatureNames, kp),
        kp.map(ps => if (ps.isEmpty) ps else ps + v.name))
    }._1
}
