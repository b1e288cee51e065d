package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Table access helpers for the driver-generated test data
  * (`/root/testdata/sf*`; see TESTDATA.md). All queries take the sf
  * directory as a parameter so the same plan runs at any scale factor.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Sessions must set spark.sql.legacy.parquet.nanosAsLong=true: older
    * generator runs stored the events table as TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects as a timestamp type. We read it as
    * long and rebuild a microsecond TimestampType column (exact — the
    * generator emits µs-aligned values).
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Checkpoint/broadcast/shuffle state is freed by the ContextCleaner,
      // which only learns an RDD is dead after a GC collects its reference.
      // A large-heap driver may not GC for the life of a mid-sized job, so
      // eagerly-checkpointed blocks (the dedup family) accumulate until
      // storage pressure evicts them mid-query. Spark's own periodic-GC
      // escape hatch defaults to 30min; 2min bounds the accumulation
      // window for long multi-query sessions at negligible cost.
      .config("spark.cleaner.periodicGC.interval", "2min")

  /** Normalize the `ts` column to session-local TimestampType regardless of
    * how the generator wrote it: TIMESTAMP(NANOS) (read as long under the
    * legacy flag), TIMESTAMP_NTZ (µs, no zone — current generator), or plain
    * TIMESTAMP all become the same µs instants under the UTC session zone.
    * Downstream epoch extractors (`unix_millis`/`unix_micros`) require
    * TimestampType and reject NTZ, so this is the one place the difference
    * is absorbed.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Key/count columns the whole query surface (and every DuckDB oracle's
    * `CAST(… AS BIGINT)`) assumes are 64-bit. Today's generator writes them
    * as int64; narrowing them in a future regeneration would silently flip
    * ~100 result schemas (the ts encoding did exactly that at round 8), so
    * widen any integral narrowing back to long at the source. Identity on
    * current data.
    */
  private val LongColumns = Set(
    "doc_id", "vec_id", "event_id", "user_id", "n_chars",
    "o_orderkey", "o_custkey", "l_orderkey", "l_partkey", "l_suppkey",
    "l_quantity", "c_custkey", "s_suppkey", "p_partkey")
  // NOT listed: the columns that are int32 in the current parquet (label,
  // l_linenumber, the nation/region keys, p_size) — both sides (our
  // queries and the oracles reading the raw files) already agree on that
  // width, and widening only our side breaks schema parity (measured:
  // 3 oracle dtype mismatches). The guard covers exactly the columns
  // whose int64-ness the oracles bake in via CAST(... AS BIGINT).

  private def normalizeInts(df: DataFrame): DataFrame = {
    val narrow = df.schema.filter(f => LongColumns(f.name) &&
      (f.dataType == IntegerType || f.dataType == ShortType || f.dataType == ByteType))
    narrow.foldLeft(df)((d, f) => d.withColumn(f.name, col(f.name).cast("long")))
  }

  // Memoized per (session, sfDir, table): `spark.read.parquet` performs
  // file listing + footer schema read + analysis on EVERY call, and the
  // multi-table queries pay it 4-6x per execution — measured ~0.42s of
  // q05's ~1.0s wall at sf0.1 (FloorProbe: fresh-build 0.98s vs reused-
  // DataFrame 0.56s). Production engines hold this in a catalog; here the
  // analyzed DataFrame is the catalog entry. Safe because every load
  // target is driver-generated read-only testdata (mutable job outputs go
  // through spark.read directly, never through load). WeakHashMap keyed
  // on the session so stopped sessions don't pin their plans.
  private val loadCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), DataFrame]]())

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = loadCache.synchronized {
      var m = loadCache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
        loadCache.put(spark, m)
        // First contact with a session: make graft's function registry
        // available to every gate that reads a table (gates reference
        // call_function names like graft_para_windows without a session
        // at hand to register on).
        graft.functions.GraftFunctions.register(spark)
      }
      m
    }
    perSession.getOrElseUpdate((sfDir, name),
      normalizeInts(normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))))
  }

  /** Register all tables as temp views (for spark.sql entry points). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
