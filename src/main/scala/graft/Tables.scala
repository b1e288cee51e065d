package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Table access helpers for the driver-generated test data
  * (`/root/testdata/sf*`; see TESTDATA.md). All queries take the sf
  * directory as a parameter so the same plan runs at any scale factor.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Sessions must set spark.sql.legacy.parquet.nanosAsLong=true: the events
    * table stores TIMESTAMP(NANOS), which Spark's vectorized reader rejects
    * as a timestamp type. We read it as long and rebuild a microsecond
    * TimestampType column (exact — the generator emits µs-aligned values).
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (df.schema.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register all tables as temp views (for spark.sql entry points). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
