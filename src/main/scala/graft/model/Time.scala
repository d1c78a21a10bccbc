package graft.model

import java.sql.Timestamp

/** Full-precision timestamp keys. `Timestamp.getTime` is
  * millisecond-truncated — sorting on it ties sub-millisecond bars
  * nondeterministically — so every per-ticker sort in the engine,
  * strategies, and optimizer keys on epoch NANOS through this one
  * helper (2262-07 overflow bound; fine for market data).
  */
object Time {
  def epochNanos(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000000L + t.getNanos

  def fromEpochNanos(ns: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(ns, 1000000000L) * 1000L)
    t.setNanos(math.floorMod(ns, 1000000000L).toInt)
    t
  }
}
