package graft.delta.txn

import graft.delta.{Action, AddFile, DomainMetadata, JsonCodec}

/** Row tracking (PROTOCOL.md "Row Tracking", writer feature `rowTracking`
  * riding on `domainMetadata`): every data file reserves the row-id range
  * `[baseRowId, baseRowId + numRecords)` from a table-wide counter stored
  * in the `delta.rowTracking` domain (`{"rowIdHighWaterMark": N}`), and
  * records the commit version that added it (`defaultRowCommitVersion`).
  * A row's id is then `baseRowId + its physical position` — stable across
  * deletion-vector DML (positions never shift under a shade) and across
  * RESTORE (re-added files keep their reserved range), fresh on rewrites
  * (preserving ids through OPTIMIZE would need materialized id columns).
  *
  * Scale shape: assignment is a driver-side fold over the commit's OWN
  * AddFile actions (a commit serializes its actions on the driver
  * regardless), one counter, no data read — numRecords comes from the
  * already-collected file stats. Concurrency: the high-water mark
  * ratchets past every winning racer exactly like the in-commit-timestamp
  * floor, so ranges stay disjoint under races without aborting either
  * writer (the domain is system-controlled — the conflict that matters is
  * range overlap, resolved by reassignment, not last-writer-wins). */
object RowTracking {

  val Domain = "delta.rowTracking"

  /** Current high-water mark from a domain-metadata map; -1 before any
    * row id was ever reserved (first baseRowId is 0). */
  def highWaterMark(domains: Map[String, String]): Long =
    domains.get(Domain).map(parseHwm).getOrElse(-1L)

  def parseHwm(configuration: String): Long = {
    val node = JsonCodec.mapper.readTree(configuration)
    val f = node.get("rowIdHighWaterMark")
    require(f != null && f.canConvertToLong,
      s"Malformed $Domain domain configuration: $configuration")
    f.asLong()
  }

  def renderHwm(hwm: Long): String = s"""{"rowIdHighWaterMark":$hwm}"""

  /** The file's record count, from pre-parsed or raw JSON stats. Row
    * tracking cannot reserve a range for a file of unknown size. */
  def numRecords(add: AddFile): Long =
    numRecordsOpt(add).getOrElse(throw new IllegalStateException(
      s"Row tracking requires numRecords stats on every added file; " +
        s"${add.path} has none"))

  def numRecordsOpt(add: AddFile): Option[Long] =
    add.stats_parsed.flatMap(_.numRecords).orElse(
      add.stats.flatMap { s =>
        val n = JsonCodec.mapper.readTree(s).get("numRecords")
        if (n != null && n.canConvertToLong) Some(n.asLong()) else None
      })

  /** Stamp `baseRowId`/`defaultRowCommitVersion` onto every AddFile that
    * lacks one (files that already carry a range — DV shades, RESTORE
    * re-adds — keep it: that is what makes their row ids stable), and
    * return the new high-water mark (== `floor` when nothing needed
    * assignment). */
  def assign(actions: Seq[Action], attemptVersion: Long,
             floor: Long): (Seq[Action], Long) = {
    var cursor = floor
    val stamped = actions.map {
      case a: AddFile if a.baseRowId.isEmpty =>
        val base = cursor + 1
        // a zero-record file still consumes one id: every assigned
        // baseRowId must be unique, or downstream consumers keying on it
        // see two files sharing a base
        cursor += math.max(numRecords(a), 1L)
        a.copy(baseRowId = Some(base),
          defaultRowCommitVersion = Some(attemptVersion))
      case a: AddFile if a.defaultRowCommitVersion.isEmpty =>
        // a pre-ranged file from a path that never stamped the version
        a.copy(defaultRowCommitVersion = Some(attemptVersion))
      case other => other
    }
    (stamped, cursor)
  }
}
