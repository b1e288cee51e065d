package graft

import org.apache.spark.sql.SparkSession

/** t1 smoke: run the flagship entry the same way the driver does and print
  * the row count (must be > 0). Usage: runMain graft.Smoke
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = 40)
    println(s"ENTRY_ROWS=${df.count()}")
    spark.stop()
  }
}
