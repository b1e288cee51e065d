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
      // the caller's next blocking point sees it
      case _: InterruptedException => Thread.currentThread().interrupt()
      // Method.invoke wraps EVERY throwable from the target in
      // InvocationTargetException — which NonFatal would match — so the
      // cause must be unwrapped first or a wrapped OutOfMemoryError would
      // be swallowed into a 30 ms nap. Fatal causes rethrow; an
      // interrupted target restores the flag; only genuinely non-fatal
      // failures (the internal API moved) fall back to the settle sleep.
      case e: java.lang.reflect.InvocationTargetException =>
        e.getCause match {
          case _: InterruptedException => Thread.currentThread().interrupt()
          case c if c != null && !scala.util.control.NonFatal(c) => throw c
          case _ => settle()
        }
      case scala.util.control.NonFatal(_) => settle()
    }

  private def settle(): Unit =
    try Thread.sleep(30)
    catch { case _: InterruptedException => Thread.currentThread().interrupt() }
}
