package graft

import java.sql.Timestamp
import java.time.Instant

/** Timezone-independent timestamp literal construction.
  *
  * `Timestamp.valueOf("…")` parses the wall-clock string in the JVM
  * default zone — correct only when the JVM runs in UTC. Sessions pin
  * `spark.sql.session.timeZone=UTC`, so literals must be built as the
  * matching UTC instants regardless of the host JVM's zone (build.sbt
  * also pins -Duser.timezone=UTC for forked runs, but library code must
  * not depend on it — the driver may call into us from its own JVM).
  */
object Ts {
  /** "yyyy-MM-dd HH:mm:ss" interpreted as UTC wall-clock. */
  def utc(s: String): Timestamp =
    Timestamp.from(Instant.parse(s.replace(' ', 'T') + "Z"))
}
