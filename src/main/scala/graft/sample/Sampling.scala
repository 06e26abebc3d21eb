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

  /** Bucket count: first-8-hex-digit md5 space, 2³² buckets. Wide enough
    * for 1e-6-grade smoke-sample fractions and mixture weights (the old
    * 4-hex 65536-bucket space loudly rejected anything finer than ~1.5e-5);
    * still a plain long and still an 8-char fixed-width hex prefix an
    * oracle can compare lexicographically.
    *
    * COMPATIBILITY CONTRACT: "deterministic by id hash" means deterministic
    * FOR A FIXED BUCKET WIDTH. The prefix digits of md5 are mutually
    * independent, so changing this width reassigns essentially every id
    * (an id in `test` under a 4-hex cutoff lands in `train` under the
    * 8-hex cutoff with probability ≈ 1 − fraction). Splits that must
    * survive library upgrades should PERSIST the computed `split` column
    * (Sinks.saveDataset / the durable registry), never recompute it across
    * versions; this constant is fixed at 8 hex digits from here on.
    */
  private[sample] val Buckets = 1L << 32

  /** First-8-hex-digit md5 bucket of the id as a NUMBER in [0, 2³²−1] —
    * uniform, engine-portable (md5 of the decimal string is identical
    * everywhere; hex→int is standard SQL `conv`/`from_hex`). Numeric, not
    * lexicographic: for fixed-width hex the two orders agree, but a
    * cumulative fraction of exactly 1.0 (legal: a trailing zero-fraction
    * split) needs cutoff 2³² — representable as a number, while its 9-char
    * hex rendering compares BELOW almost every 8-char bucket and would
    * misroute ~94 % of rows.
    */
  private def hashBucket(idCol: String): Column =
    conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long")

  /** Cumulative-fraction cutoffs as bucket numbers in [0, 2³²]. */
  private[sample] def cutoffs(fractions: Seq[Double]): Seq[Long] = {
    val cum = fractions.scanLeft(0.0)(_ + _).tail
    cum.init.map(f => math.min(math.floor(f * Buckets).toLong, Buckets))
  }

  /** Assign every row to a named split (e.g. train/val/test) with the given
    * fractions, deterministically by id hash. Zero shuffles — a narrow
    * projection that composes with any downstream partitioning. Fractions
    * must sum to 1; cutoff quantization error is at most 2⁻³².
    */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    require(splits.forall(_._2 >= 0), "split fractions must be non-negative")
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
    // 2³² hash buckets cannot express rates below 2⁻³² — the filter
    // would silently match nothing
    require(fraction >= 1.0 || fraction * Buckets >= 1.0,
      s"fraction $fraction is below the 1/$Buckets bucket granularity")
    if (fraction >= 1.0) df
    else df.filter(hashBucket(idCol) < lit(cutoffs(Seq(fraction, 1 - fraction)).head))
  }

  /** Deterministic stratified sample: exactly ceil(fraction × |stratum|)
    * rows per stratum, chosen by md5-of-id order (a reproducible uniform
    * draw).
    *
    * Hot-stratum-safe by construction: a naive per-stratum window ranks a
    * whole stratum on ONE task (fatal when one language is 90 % of a
    * 100 TB corpus). Here the global md5 order is decomposed as
    * (salt, key) where salt = the key's first `saltDigits` hex digits —
    * a prefix, so ordering by (salt, key) IS ordering by key — and the
    * stratum rank is computed as
    *   rank = offset(stratum, salt) + local row_number within (stratum, salt)
    * with offsets from a tiny per-(stratum, salt) count aggregate (map-side
    * combined; |strata|·16^saltDigits rows). Every shuffle and window runs
    * at (stratum, salt) granularity, so per-task work shrinks 16^saltDigits×
    * for the hottest stratum while the selected rows stay byte-identical to
    * the single-window formulation.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCols: Seq[String], fraction: Double,
      saltDigits: Int = 1): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction must be in (0, 1]")
    require(saltDigits >= 1 && saltDigits <= 4, "saltDigits must be in [1, 4]")
    val strata = strataCols.map(col)
    val key = md5(col(idCol).cast("string"))
    val salt = substring(key, 1, saltDigits)

    val keyed = df.withColumn("__key", key).withColumn("__salt", salt)
    // per-(stratum, salt) counts -> exclusive running offset + stratum total
    val saltW = Window.partitionBy(strata: _*).orderBy(col("__salt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totW = Window.partitionBy(strata: _*)
    // renamed join keys + null-safe equality: a NULL stratum (e.g.
    // unidentified language) is a legitimate stratum and must sample like
    // any other — a plain equi-join would silently drop those rows. No
    // broadcast hint: offsets is |strata|·16^saltDigits rows, tiny for
    // normal strata but unbounded for high-cardinality keys; AQE broadcasts
    // it at runtime when it is actually small.
    val offsets = keyed.groupBy(strata :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset", coalesce(sum(col("__cnt")).over(saltW), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(totW))
      .select(strataCols.map(c => col(c).as(s"__o_$c")) ++
        Seq(col("__salt").as("__o_salt"), col("__offset"), col("__n")): _*)
    // salt comparison is ALSO null-safe: md5 of a NULL id is NULL, and a
    // plain === would silently drop NULL-id rows
    val joinCond = strataCols.map(c => col(c) <=> col(s"__o_$c"))
      .reduce(_ && _) && (col("__salt") <=> col("__o_salt"))
    val localW = Window.partitionBy(strata :+ col("__salt"): _*)
      .orderBy(col("__key"), col(idCol))
    keyed
      .join(offsets, joinCond)
      .withColumn("__rn", col("__offset") + row_number().over(localW))
      .filter(col("__rn") <= ceil(col("__n") * fraction))
      .select(df.columns.toIndexedSeq.map(col): _*)
  }

  /** Deterministic source re-weighting ("data mixing" / epoch
    * upsampling): emit each row ⌊w⌋ or ⌈w⌉ times for its stratum's weight
    * w, the fractional part resolved per (id, copy) by the same
    * engine-portable md5 bucket as [[hashSplit]] — weight 2.25 yields
    * exactly 2 copies for ~75 % of ids and 3 for ~25 %, stable across
    * runs, engines, and partitionings. Weights < 1 downsample (0 or 1
    * copies), 0 drops the stratum, ≥ 1 upsamples — the standard primitive
    * for assembling a training corpus from heterogeneous sources at set
    * mixture rates. Strata absent from `weights` take `default`.
    *
    * Output = input columns + `copy_idx` (0-based). Zero shuffles: a
    * narrow generate + filter, so at 100 TB this is a pure map stage that
    * chains into the downstream shuffle (packing, [[shuffled]]) for free.
    */
  def reweight(
      df: DataFrame, idCol: String, strataCol: String,
      weights: Map[String, Double], default: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(default)).forall(w => w >= 0 && w <= 10000),
      "weights must be in [0, 10000]")
    // same loud sub-granularity contract as hashSample: a fractional part
    // below 2⁻³² would silently truncate to the integral weight
    (weights.values ++ Seq(default)).foreach { w =>
      val frac = w - math.floor(w)
      require(frac == 0.0 || frac * Buckets >= 1.0,
        s"weight $w has a fractional part below the 1/$Buckets bucket granularity")
    }
    val w = coalesce(element_at(typedLit(weights), col(strataCol)), lit(default))
    val wFloor = floor(w).cast("int")
    // fractional-part cutoff in 2³² buckets; frac < 1 so cutoff ≤ 2³²−1
    val cutoff = floor((w - floor(w)) * Buckets).cast("long")
    val c = col("copy_idx")
    // concat, NOT concat_ws: a NULL id must yield a NULL key (dropping the
    // fractional copy, matching SQL-engine semantics) — concat_ws would
    // silently skip the NULL and hash the bare copy index, giving every
    // NULL-id row in a stratum the same correlated verdict
    val bucket = conv(substring(
      md5(concat(col(idCol).cast("string"), lit(":"), c.cast("string"))),
      1, 8), 16, 10).cast("long")
    df.select(col("*"), explode(sequence(lit(0), wFloor)).as("copy_idx"))
      .filter(c < wFloor || bucket < cutoff)
  }

  /** Deterministic global shuffle for training order: a total order by a
    * seeded per-row key, exposed as `shuffle_key` (md5 — engine-portable,
    * so an oracle can reproduce the exact permutation). Spark executes
    * this as a range-partitioned sort — sample ranges, one shuffle, sort
    * within partitions — which IS the 100 TB corpus-shuffle plan; no
    * single-partition window, no driver collect. Downstream sharded
    * writers consume the order directly.
    */
  def shuffled(df: DataFrame, idCol: String, seed: Long): DataFrame =
    // concat (NULL-propagating), not concat_ws: a NULL id gets a NULL key
    // (sorted together, matching an oracle's NULL) instead of every
    // NULL-id row colliding onto md5("<seed>") with a NULL tiebreak
    df.withColumn("shuffle_key",
        md5(concat(col(idCol).cast("string"), lit(":" + seed))))
      .orderBy(col("shuffle_key"), col(idCol))
}
