package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe: run selected queries N times in one session. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE", "d2_minhash_pairs").split(",")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val builder = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
    // SPARK_GRAFT_CONF="k=v;k=v" — ad-hoc session conf for A/B probing
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_PROBE_GC=1 reproduces the Bench inter-query System.gc()
    // so warm-defeat hypotheses can be tested in isolation
    val gcBetween = sys.env.get("SPARK_GRAFT_PROBE_GC").contains("1")
    for (r <- 1 to reps; n <- names) {
      if (gcBetween) System.gc()
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"PROBE $n rep=$r rows=$cnt t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
