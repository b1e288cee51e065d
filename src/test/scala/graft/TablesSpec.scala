package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** `Tables.load` must absorb every `ts` encoding the testdata generator has
  * produced across rounds: TIMESTAMP(NANOS) (read as long under the legacy
  * flag) and TIMESTAMP_NTZ µs (current). Round 8 lost two gate queries to
  * an unannounced NANOS→NTZ regeneration (`unix_millis` rejects NTZ); this
  * pins the normalization on synthetic parquet of each flavor.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val instantMs = 1723569845123L // 2024-08-13T17:24:05.123Z

  private def loadTs(dir: String): (Any, Long) = {
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
    val ms = df.select(unix_millis(col("ts"))).as[Long].head()
    (df.schema("ts").dataType, ms)
  }

  test("NTZ µs parquet ts normalizes to TimestampType, same instant under UTC") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz").toString
    spark.sql(s"SELECT TIMESTAMP_NTZ '2024-08-13 17:24:05.123' AS ts, 1L AS event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // written column really is NTZ
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == TimestampNTZType)
    val (_, ms) = loadTs(dir)
    assert(ms == instantMs)
  }

  test("long-nanos ts (legacy NANOS encoding read as long) rebuilds the µs instant") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ns").toString
    Seq((instantMs * 1000000L, 1L)).toDF("ts", "event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (_, ms) = loadTs(dir)
    assert(ms == instantMs)
  }

  test("tables without ts pass through untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plain").toString
    Seq((1L, "x")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = Tables.load(spark, dir, "documents")
    assert(df.columns.toSeq == Seq("doc_id", "text"))
    assert(df.count() == 1)
  }

  test("narrowed integral key columns widen back to long; others untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft-int").toString
    Seq((7, 42, "x", 3.5f)).toDF("doc_id", "n_chars", "text", "score")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = Tables.load(spark, dir, "documents")
    assert(df.schema("doc_id").dataType.typeName == "long")
    assert(df.schema("n_chars").dataType.typeName == "long")
    assert(df.schema("score").dataType.typeName == "float") // not a key column
    assert(df.select(sum($"doc_id")).as[Long].head() == 7L)
  }

  test("real sf0.001 events load with TimestampType ts and epoch extractors work") {
    val df = Tables.load(spark, TestSpark.sf, "events")
    assert(df.schema("ts").dataType == TimestampType)
    val n = df.select(unix_millis(max(col("ts")))).as[Long].head()
    assert(n > 0L)
  }

  test("parquetLongStats memo stays bounded across rewrites and serves fresh stats") {
    val dir = java.nio.file.Files.createTempDirectory("graft-memo").toString + "/t"
    val before = Tables.statsMemoSize
    // a rewrite-heavy loop (the zOrderWrite usage pattern): each rewrite
    // changes the fingerprint, so a fingerprint-keyed memo would grow by
    // one dead entry per pass — the bounded memo REPLACES its entry
    for (i <- 1 to 5) {
      Seq((i.toLong, i.toLong * 10), (i.toLong + 100, i.toLong * 20))
        .toDF("a", "b").write.mode("overwrite").parquet(dir)
      val s = Tables.parquetLongStats(spark, dir, Seq("a", "b"))
      assert(s.isDefined, s"pass $i must read footer stats")
      assert(s.get("a") == ((i.toLong, i.toLong + 100)),
        s"pass $i must see the FRESH min/max, not a stale memo entry")
      // memoized path returns the same result
      assert(Tables.parquetLongStats(spark, dir, Seq("a", "b")) == s)
    }
    assert(Tables.statsMemoSize <= before + 1,
      "five rewrites of one path must hold at most ONE memo entry")
    // a failed read (missing column) is not cached: the entry for the
    // path is dropped, and a subsequent good read succeeds
    assert(Tables.parquetLongStats(spark, dir, Seq("a", "nope")).isEmpty)
    assert(Tables.parquetLongStats(spark, dir, Seq("a", "b")).isDefined)
  }
}
