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

    val required = (view.joinKeys :+ view.tsCol) ++ view.createdTsCol.toSeq ++
      declared.keys.toSeq
    val missing = required.distinct.filterNot(byName.contains)

    val warnings = declared.toSeq.sorted(Ordering.by((x: (String, DataType)) => x._1))
      .flatMap { case (name, expected) =>
        byName.get(name).collect {
          case actual if !TypeBridge.compatible(expected, actual) =>
            s"$name: expected $expected, found $actual (not widenable)"
        }
      }

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
