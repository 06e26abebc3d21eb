package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Dataset validation profiles — the reference's SavedDataset +
  * ValidationReference flow (sdk/python/feast/saved_dataset.py:259
  * `as_reference(profiler)`; dqm/errors.py ValidationFailed): persist a
  * statistical profile alongside a saved dataset, later validate a fresh
  * retrieval against it and fail loudly on drift.
  *
  * Profile = long format (column, metric, value double) — one agg pass over
  * the dataset (map-side partial aggregation; approx sketches by default so
  * the pass stays scalable), melted to rows driver-side-free via
  * explode(array(struct…)).
  *
  * `exact = true` swaps approx_percentile/approx_count_distinct for their
  * exact counterparts — for small-scale oracle comparability only; the
  * exact percentile buffers a column's values per group and must not run
  * at 100 TB.
  */
object DatasetProfile {

  final class ValidationFailedException(msg: String)
      extends RuntimeException(msg)

  private val Pcts = Seq(0.5, 0.95)

  /** One-pass profile of `columns` (default: every column).
    * Numeric columns: n_rows, n_nonnull, n_distinct, mean, stddev, min,
    * max, p50, p95. Other columns: n_rows, n_nonnull, n_distinct.
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil, exact: Boolean = false): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def distinctAgg(c: String) =
      if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
    def pct(c: String, q: Double) =
      if (exact) expr(s"percentile(`$c`, $q)")
      else expr(s"approx_percentile(`$c`, $q)")
    // (column, metric) -> aggregate expression, flattened into ONE agg pass
    val metricExprs: Seq[(String, String, org.apache.spark.sql.Column)] =
      cols.flatMap { c =>
        val common = Seq(
          (c, "n_rows", count(lit(1)).cast("double")),
          (c, "n_nonnull", count(col(c)).cast("double")),
          (c, "n_distinct", distinctAgg(c).cast("double")))
        types(c) match {
          case _: NumericType => common ++ Seq(
            (c, "mean", avg(col(c))),
            (c, "stddev", stddev_samp(col(c))),
            (c, "min", min(col(c)).cast("double")),
            (c, "max", max(col(c)).cast("double"))) ++
            Pcts.map(q => (c, s"p${(q * 100).toInt}", pct(c, q).cast("double")))
          case _ => common
        }
      }
    val aggd = df.agg(
      metricExprs.head._3.as("m0"),
      metricExprs.tail.zipWithIndex.map { case ((_, _, e), i) => e.as(s"m${i + 1}") }: _*)
    val melted = explode(array(metricExprs.zipWithIndex.map { case ((c, m, _), i) =>
      struct(lit(c).as("column"), lit(m).as("metric"), col(s"m$i").as("value"))
    }: _*)).as("kv")
    aggd.select(melted).select(col("kv.column"), col("kv.metric"), col("kv.value"))
  }

  /** S9 + profile: persist the dataset AND its profile (`<path>.profile`)
    * in one go — the saved dataset becomes usable as a validation
    * reference (saved_dataset.py:248-276).
    */
  def saveWithProfile(df: DataFrame, path: String,
      columns: Seq[String] = Nil, exact: Boolean = false): Unit = {
    df.write.mode("errorifexists").parquet(path)
    profile(df, columns, exact).write.mode("errorifexists").parquet(s"$path.profile")
  }

  def loadProfile(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path.profile")

  /** Compare a candidate dataset against a reference profile. Returns one
    * row per (column, metric): (column, metric, ref_value, got_value,
    * passed). A metric passes when |got − ref| ≤ absTol + relTol·|ref|
    * (NULL-vs-NULL passes; NULL on one side fails). Count-like metrics use
    * the same relative rule, so a reference of 1 000 rows tolerates
    * 1000·relTol drift.
    */
  def validate(
      candidate: DataFrame,
      referenceProfile: DataFrame,
      columns: Seq[String] = Nil,
      relTol: Double = 0.1,
      absTol: Double = 1e-9,
      exact: Boolean = false
  ): DataFrame = {
    // a requested column MISSING from the candidate (schema drift — the
    // case a validation reference exists to catch) must become failed
    // report rows via the full-outer join below, not an opaque
    // NoSuchElementException out of profile()'s type lookup
    val have = candidate.columns.toSet
    val present = columns.filter(have.contains)
    val got = (if (columns.isEmpty || present.nonEmpty)
                 profile(candidate, present, exact)
               else {
                 import candidate.sparkSession.implicits._
                 Seq.empty[(String, String, Option[Double])]
                   .toDF("column", "metric", "value")
               })
      .withColumnRenamed("value", "got_value")
    val ref = referenceProfile.withColumnRenamed("value", "ref_value")
    ref.join(got, Seq("column", "metric"), "full_outer")
      .withColumn("passed",
        (col("ref_value").isNull && col("got_value").isNull) ||
          (abs(col("got_value") - col("ref_value")) <=
            lit(absTol) + lit(relTol) * abs(col("ref_value"))))
      .withColumn("passed", coalesce(col("passed"), lit(false)))
      .select("column", "metric", "ref_value", "got_value", "passed")
  }

  /** Validate-or-throw (reference ValidationFailed): collects the failing
    * (column, metric) rows into the exception message. The report is tiny
    * (|columns|·|metrics| rows), so the collect is driver-safe.
    */
  def requireValid(
      candidate: DataFrame,
      referenceProfile: DataFrame,
      columns: Seq[String] = Nil,
      relTol: Double = 0.1,
      absTol: Double = 1e-9,
      exact: Boolean = false
  ): Unit = {
    val failures = validate(candidate, referenceProfile, columns, relTol, absTol, exact)
      .filter(!col("passed"))
      .select("column", "metric", "ref_value", "got_value")
      .collect()
    if (failures.nonEmpty)
      throw new ValidationFailedException(
        "dataset failed validation: " + failures.map(r =>
          s"${r.getString(0)}.${r.getString(1)} ref=${r.get(2)} got=${r.get(3)}")
          .mkString("; "))
  }
}
