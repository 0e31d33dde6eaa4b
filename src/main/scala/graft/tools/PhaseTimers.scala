package graft.tools

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Wall-clock accumulators for the write/commit path's driver phases —
  * profiling instrumentation for the optimization rounds (guide §1:
  * attribute the per-commit driver cost to a phase before touching it).
  * Negligible overhead (two nanoTime reads + a LongAdder per phase per
  * commit); dumped and reset by ProfileQuery between samples. */
object PhaseTimers {
  private val sums = new ConcurrentHashMap[String, LongAdder]()
  private val counts = new ConcurrentHashMap[String, LongAdder]()

  def time[T](phase: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally {
      sums.computeIfAbsent(phase, _ => new LongAdder).add(System.nanoTime() - t0)
      counts.computeIfAbsent(phase, _ => new LongAdder).increment()
    }
  }

  def dumpAndReset(): Seq[(String, Double, Long)] = {
    import scala.jdk.CollectionConverters._
    val out = sums.asScala.keys.toSeq.sorted.map { k =>
      (k, sums.get(k).sum() / 1e9, counts.get(k).sum())
    }
    sums.clear(); counts.clear()
    out
  }
}
