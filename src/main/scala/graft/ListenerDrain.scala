package graft
import org.apache.spark.sql.SparkSession

/** The ONE copy of the listener-bus drain Bench and Probe share: job-start
  * events deliver asynchronously, so a per-query job counter read without a
  * drain can attribute a query's trailing events (or unrelated
  * ContextCleaner jobs) to the NEXT query's window. `waitUntilEmpty` is
  * `private[spark]` (public bytecode) — reflect, and fall back to a short
  * sleep if the internal API ever moves; keeping the reflection in one
  * place means it cannot half-rot between the two callers.
  */
object ListenerDrain {
  def drain(spark: SparkSession): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch { case _: Throwable => Thread.sleep(30) }
}
