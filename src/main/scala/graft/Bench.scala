package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    // Warm pass (untimed): JIT, codegen, parquet footers and scheduler
    // spin-up all land here, so the timed pass measures steady-state
    // per-query cost instead of charging JVM warm-up to whichever query
    // happens to run first.
    qs.foreach { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch {
        case t: Throwable => System.err.println(s"[bench] warm-pass failure in $name: $t")
      }
    }
    val results = qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case t: Throwable => System.err.println(s"[bench] $name threw: $t"); false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qjson = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // -1.0 marks a query that threw; a failing run must read as broken, not
    // fast — any failure forces the headline total to -1.0 and is counted
    val failed = results.count(_._2 < 0)
    val total = if (failed > 0) -1.0 else results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
