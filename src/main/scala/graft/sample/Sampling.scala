package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting operators for training-data
  * pipelines. The reference has no sampling operators (its closest analog
  * is the 1000-row validation sample, SURVEY §2.2 P10); at 100 TB a corpus
  * engine needs reproducible, engine-portable splits — so everything here
  * derives randomness from `md5` of the row id, never from `rand()`:
  * the same row lands in the same split on any engine, any partitioning,
  * any run, and adding rows never reshuffles existing assignments.
  *
  * All operators are pure Catalyst column programs (md5 + string compare
  * are codegen'd); `hashSplit` is a narrow map with zero shuffles, and
  * `stratifiedSample` shuffles once on the strata key.
  */
object Sampling {

  /** First-4-hex-digit md5 bucket of the id rendered as a string —
    * 65536 buckets, uniform, engine-portable (md5 of the decimal string
    * is identical everywhere; the hex prefix compares lexicographically).
    */
  private def hashBucket(idCol: String): Column =
    substring(md5(col(idCol).cast("string")), 1, 4)

  /** Cumulative-fraction cutoffs as 4-hex-digit strings. */
  private[sample] def cutoffs(fractions: Seq[Double]): Seq[String] = {
    val cum = fractions.scanLeft(0.0)(_ + _).tail
    cum.init.map(f => f"${math.floor(f * 65536).toLong}%04x")
  }

  /** Assign every row to a named split (e.g. train/val/test) with the given
    * fractions, deterministically by id hash. Zero shuffles — a narrow
    * projection that composes with any downstream partitioning. Fractions
    * must sum to 1; realized sizes are within ~1/256 of the target (65536
    * hash buckets).
    */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val cuts = cutoffs(splits.map(_._2))
    val b = hashBucket(idCol)
    val assign = splits.init.map(_._1).zip(cuts).foldRight(lit(splits.last._1): Column) {
      case ((name, cut), acc) => when(b < lit(cut), lit(name)).otherwise(acc)
    }
    df.withColumn("split", assign)
  }

  /** Deterministic Bernoulli-style sample: keep ~fraction of rows by id
    * hash. Zero shuffles; stable under reruns and row additions.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction must be in (0, 1]")
    if (fraction >= 1.0) df
    else df.filter(hashBucket(idCol) < lit(cutoffs(Seq(fraction, 1 - fraction)).head))
  }

  /** Deterministic stratified sample: exactly ceil(fraction × |stratum|)
    * rows per stratum, chosen by md5-of-id order (a reproducible uniform
    * draw). One shuffle on the strata key; per-stratum `row_number` +
    * windowed count in a single window exchange.
    *
    * Skew note: a stratum is processed on one task — for the hot-stratum
    * case (one language = 90 % of a 100 TB corpus) prefer [[hashSample]]
    * per stratum (zero-shuffle, approximate counts) over the exact window.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCols: Seq[String], fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction must be in (0, 1]")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val cw = Window.partitionBy(strataCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("__rn") <= ceil(col("__n") * fraction))
      .drop("__rn", "__n")
  }
}
