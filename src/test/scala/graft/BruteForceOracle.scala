package graft

import java.sql.Timestamp

/** Brute-force O(rows²) reference oracle — a Scala port of the reference's
  * golden-test helper `find_latest_record` (reference: sdk/python/tests/
  * utils/feature_records.py:23-47): linear scan for the max-(ts, created,
  * tiebreak) record in [event_ts − ttl, event_ts] matching the join keys.
  * Used ONLY in tests, against tiny fixtures.
  */
object BruteForceOracle {

  case class Rec(key: String, ts: Timestamp, created: Option[Timestamp],
                 tiebreak: Long, value: Double)

  /** Latest record at or before `eventTs` (bounded below by ttl if > 0),
    * created-ts cutoff optional, ordering (ts, created nulls-lose, tiebreak)
    * descending. None when nothing qualifies (entity row must survive with
    * null features).
    */
  def findLatest(
      records: Seq[Rec],
      key: String,
      eventTs: Timestamp,
      ttlSeconds: Long,
      filterByCreated: Boolean = false
  ): Option[Rec] = {
    val lower = if (ttlSeconds > 0) eventTs.getTime - ttlSeconds * 1000L else Long.MinValue
    val candidates = records.filter { r =>
      r.key == key &&
      r.ts.getTime <= eventTs.getTime &&
      r.ts.getTime >= lower &&
      (!filterByCreated || r.created.forall(_.getTime <= eventTs.getTime))
    }
    if (candidates.isEmpty) None
    else Some(candidates.maxBy(r =>
      (r.ts.getTime, r.created.map(_.getTime).getOrElse(Long.MinValue), r.tiebreak)))
  }
}
