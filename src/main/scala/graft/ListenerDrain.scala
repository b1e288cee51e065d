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
    } catch {
      // an interrupt is a request to STOP, not to nap: restore the flag so
      // the caller's next blocking point sees it (reflection delivers it
      // wrapped in InvocationTargetException)
      case _: InterruptedException => Thread.currentThread().interrupt()
      case e: java.lang.reflect.InvocationTargetException
          if e.getCause.isInstanceOf[InterruptedException] =>
        Thread.currentThread().interrupt()
      // fatal errors (OOM etc.) propagate; only the expected
      // internal-API-moved case falls back to the short settle sleep
      case scala.util.control.NonFatal(_) =>
        try Thread.sleep(30)
        catch { case _: InterruptedException => Thread.currentThread().interrupt() }
    }
}
