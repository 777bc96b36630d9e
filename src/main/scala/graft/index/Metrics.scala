package graft.index

import scala.collection.concurrent.TrieMap

/** Per-index maintenance counters — the session-side half of the
  * reference's `sdb_metrics` system table
  * (tests/sqllogic/sdb/pg/index/inverted_index_sdb_metrics.test: commit /
  * consolidation / cleanup counts, failure counts, average timings, plus
  * durable size/doc/segment gauges). The gauges are re-derived from index
  * metadata at read time (durable across JVMs); the counters here cover
  * THIS session's maintenance activity, exactly like the reference's
  * in-memory metrics registry that zeroes at restart. */
object Metrics {
  final case class Counter(n: Long = 0, totalMs: Long = 0, failed: Long = 0) {
    def avgMs: Long = if (n == 0) 0 else totalMs / n
  }

  /** (index dir, kind) → counter; kinds: commit / consolidation / cleanup. */
  private val counters = TrieMap.empty[(String, String), Counter]

  def record(dir: String, kind: String, ms: Long, ok: Boolean = true): Unit =
    counters.updateWith((dir, kind)) { c =>
      val cur = c.getOrElse(Counter())
      Some(if (ok) cur.copy(n = cur.n + 1, totalMs = cur.totalMs + ms)
           else cur.copy(failed = cur.failed + 1))
    }

  /** Time `body`, record under (dir, kind), rethrow on failure. */
  def timed[A](dir: String, kind: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try {
      val r = body
      record(dir, kind, (System.nanoTime() - t0) / 1000000)
      r
    } catch {
      case e: Throwable => record(dir, kind, 0, ok = false); throw e
    }
  }

  def counter(dir: String, kind: String): Counter =
    counters.getOrElse((dir, kind), Counter())

  private[graft] def reset(): Unit = counters.clear()
}
