package graft.plans

import graft.{FeatureView, TypeBridge}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}

/** Schema-validation node (P10; reference spark/nodes.py:623-724
  * SparkValidationNode): missing declared columns are an error, type
  * incompatibilities beyond the widening rules are warnings, and declared
  * JSON columns are well-formedness-checked on a bounded sample.
  */
object Validate {

  final case class Result(
      missingColumns: Seq[String],
      typeWarnings: Seq[String],
      invalidJsonCounts: Map[String, Long]
  ) {
    def ok: Boolean = missingColumns.isEmpty
  }

  /** Validate `view.source` against declared feature types.
    *
    * @param declared  feature column → expected Spark type
    * @param jsonCols  columns that must parse as JSON objects/arrays
    * @param sampleRows bounded sample for the JSON check (reference uses
    *        1000, nodes.py:695)
    */
  def validate(
      view: FeatureView,
      declared: Map[String, DataType],
      jsonCols: Seq[String] = Nil,
      sampleRows: Int = 1000
  ): Result = {
    val schema = view.source.schema
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap

    // a declared-JSON column that does not exist is a MISSING column (a
    // typo here must flip ok=false, not silently skip the check), and one
    // that exists with a non-string type cannot be json-checked — surface
    // that as a type warning rather than letting the caller believe the
    // column was checked and clean
    val required = (view.joinKeys :+ view.tsCol) ++ view.createdTsCol.toSeq ++
      declared.keys.toSeq ++ jsonCols
    val missing = required.distinct.filterNot(byName.contains)

    val jsonTypeWarnings = jsonCols.distinct.sorted.collect {
      case c if byName.get(c).exists(_ != StringType) =>
        s"$c: declared JSON but typed ${byName(c)} — json check skipped"
    }
    val warnings = declared.toSeq.sorted(Ordering.by((x: (String, DataType)) => x._1))
      .flatMap { case (name, expected) =>
        byName.get(name).collect {
          case actual if !TypeBridge.compatible(expected, actual) =>
            s"$name: expected $expected, found $actual (not widenable)"
        }
      } ++ jsonTypeWarnings

    val invalidJson: Map[String, Long] =
      if (missing.nonEmpty) Map.empty
      else jsonCols.filter(byName.get(_).contains(StringType)).map { c =>
        // a JSON document is valid iff the root path extracts non-null
        val bad = view.source
          .select(col(c)).filter(col(c).isNotNull).limit(sampleRows)
          .filter(get_json_object(col(c), "$").isNull)
          .count()
        c -> bad
      }.toMap

    Result(missing, warnings, invalidJson)
  }
}
