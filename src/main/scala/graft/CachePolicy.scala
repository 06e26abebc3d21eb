package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization policy for intermediate frames that feed several
  * downstream stages (dedup shingles, LSH band signatures, clustering
  * rounds): each must be computed ONCE and shared — recomputing the shingle
  * pass per consumer would dominate a 100 TB dedup job — but HOW the
  * materialized blocks survive is a deployment decision, not an algorithm
  * one, so it is a session-conf knob (`spark.graft.cachePolicy`), not a
  * hard-coded call.
  *
  *  - `local` (default): eager `localCheckpoint` — executor-local blocks,
  *    lineage truncated. Fastest; an executor loss mid-job kills the blocks
  *    and fails the job. Right for single-node runs and restartable batch.
  *  - `memory_and_disk`: eager `persist(MEMORY_AND_DISK)` — blocks
  *    recompute from lineage on executor loss, so the job survives.
  *    Lineage is retained (plans grow across iterative rounds; correctness
  *    unaffected, CachePolicySpec pins byte-identical results).
  *  - `reliable`: `checkpoint()` to the session's checkpoint dir — survives
  *    executor loss AND truncates lineage; requires
  *    `sparkContext.setCheckpointDir` and pays a full write through the
  *    checkpoint filesystem.
  */
sealed trait CachePolicy {

  /** Materialize `df` eagerly; consumers of the returned frame re-read the
    * materialized blocks instead of recomputing the plan.
    */
  def materialize(df: DataFrame): DataFrame

  /** Release a frame previously returned by [[materialize]] once no
    * consumer remains — iterative loops would otherwise accumulate a round's
    * worth of blocks per iteration.
    */
  def release(df: DataFrame): Unit
}

object CachePolicy {

  val ConfKey = "spark.graft.cachePolicy"

  case object Local extends CachePolicy {
    def materialize(df: DataFrame): DataFrame = df.localCheckpoint()
    // localCheckpoint blocks are dropped with the frame's RDD on GC; an
    // explicit release has no public API and is not needed
    def release(df: DataFrame): Unit = ()
  }

  case object MemoryAndDisk extends CachePolicy {
    def materialize(df: DataFrame): DataFrame = {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      // persist alone is lazy — force the single shared computation now,
      // matching localCheckpoint's eagerness (two consumers racing a lazy
      // cache can both compute it)
      p.count()
      p
    }
    def release(df: DataFrame): Unit = { df.unpersist(blocking = false); () }
  }

  case object Reliable extends CachePolicy {
    def materialize(df: DataFrame): DataFrame = df.checkpoint()
    def release(df: DataFrame): Unit = ()
  }

  /** Resolve the active policy from `df`'s session conf. */
  def resolve(df: DataFrame): CachePolicy =
    df.sparkSession.conf.get(ConfKey, "local").toLowerCase match {
      case "local" => Local
      case "memory_and_disk" | "persist" => MemoryAndDisk
      case "reliable" | "checkpoint" => Reliable
      case other => throw new IllegalArgumentException(
        s"unknown $ConfKey '$other' (expected local | memory_and_disk | reliable)")
    }

  /** Materialize under the session's configured policy. */
  def materialize(df: DataFrame): DataFrame = resolve(df).materialize(df)
}
