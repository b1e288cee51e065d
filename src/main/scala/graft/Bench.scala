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
      // The generated-class cache defaults to 100 entries; this suite runs
      // 140+ plans with several codegen units each, so under the default
      // the tail of the suite evicts the head's classes and a handful of
      // compile-heavy queries (the st* streaming family, p2) read 3-5x
      // their steady-state time (r4→r5 bench delta with UNCHANGED query
      // code; warm probe reps confirm 0.2-0.3s steady state). One process-
      // wide cache sized to the suite removes that artifact.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    // Warm + timed run back-to-back PER QUERY (not two full passes): JIT,
    // codegen compilation, parquet footers and scheduler spin-up land in the
    // warm run, and the timed run immediately reuses the still-hot generated
    // classes. A whole-suite warm pass followed by a whole-suite timed pass
    // breaks down once the suite outgrows Spark's ~100-entry codegen cache:
    // the timed pass then re-compiles every evicted plan and the most
    // compilation-heavy queries read 5-10x slower than steady state.
    val results = qs.map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch {
        case t: Throwable => System.err.println(s"[bench] warm failure in $name: $t")
      }
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case t: Throwable => System.err.println(s"[bench] $name threw: $t"); false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // Millisecond precision keeps the line compact; -1.0 marks a query that
    // threw — a failing run must read as broken, not fast, so any failure
    // forces the headline total to -1.0 and is counted.
    def r3(v: Double): Double = if (v < 0) -1.0 else math.rint(v * 1000) / 1000
    val qjson = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = if (failed > 0) -1.0 else r3(results.map(_._2).sum)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qjson,"sf":"$sfDir"}"""
    println(line)
    // Durable copy: stdout goes through sbt's logger and a log-tail capture,
    // either of which can truncate the (long) per-query line. The file is
    // the parse-safe record.
    try {
      val p = java.nio.file.Paths.get("target", "bench_summary.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    } catch {
      case t: Throwable => System.err.println(s"[bench] summary write failed: $t")
    }
    // The per-query line above can exceed a log tail window; repeat the
    // headline as a short self-contained JSON line (same shape, queries map
    // limited to the 10 slowest) so a truncated capture still contains one
    // complete parseable record (it is printed LAST).
    val slow = results.sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"n_queries":${results.size},"queries":$slow,"sf":"$sfDir"}""")
    spark.stop()
  }
}
