package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.Tables.load
import graft.core.{TextKeys, Vtt}
import graft.services.HashingEmbedder

/** Coverage wave 4: the remaining SURVEY §2 rows that lacked a correctness
  * query — VTT transcript parsing (C4/S13), the NL2SQL map-explode chunker
  * (C6) and blob scan (S11), title derivation (X1), UTF-8-safe byte
  * truncation (X4), token-bounded truncation (X6), URL parsing (X14),
  * ext→content-type mapping (X16), and paged scans (W4). Every query here is
  * oracle-matched (constant-table VALUES oracles where the fixture is
  * builder-authored).
  */
object Coverage3 {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic VTT document per user: one cue per event ordered by
    * (ts, event_id), voice = event_type, text = "e<event_id>".
    */
  private def vttPerUser(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    load(s, d, "events")
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"ts", $"event_id", $"event_type"))).as("cues"))
      .withColumn("vtt",
        concat(lit("WEBVTT\n\n"),
          array_join(transform($"cues", c => concat(
            lit("00:00:01.000 --> 00:00:02.000\n"),
            lit("<v "), c.getField("event_type"), lit(">e"),
            c.getField("event_id"), lit("</v>"))), "\n\n")))
      .select($"user_id", $"vtt")
  }

  val queries: Map[String, Q] = Map(
    // C4/S13: full WebVTT decode + A7 speaker-turn merge. The transcript is
    // rendered then parsed back, so the oracle (run-length over the raw
    // events) checks the whole parse→merge→render path.
    "c4_vtt_transcript" -> ((s, d) => {
      import s.implicits._
      val toTranscript = udf((v: String) => Vtt.toTranscript(v))
      vttPerUser(s, d)
        .withColumn("transcript", toTranscript($"vtt"))
        .select($"user_id",
          (size(split($"transcript", "\n"))).cast("long").as("n_lines"),
          length($"transcript").cast("long").as("total_chars"))
        .orderBy($"user_id")
    }),

    // C6: one chunk per top-level key of a JSON object — JSON round-trip
    // through to_json → from_json(Map) → explode(map_entries)
    // (nl2sql_chunker.py:44-78 semantics).
    "c6_nl2sql_chunks" -> ((s, d) => {
      import s.implicits._
      val payload = load(s, d, "documents")
        .groupBy($"source")
        .agg(to_json(map_from_entries(sort_array(collect_list(
          struct(concat(lit("d"), $"doc_id").as("k"),
            struct(substring($"text", 1, 40).as("question")).as("v")))))).as("js"))
      val schema = MapType(StringType, StructType(Seq(StructField("question", StringType))))
      payload
        .select($"source", explode(map_entries(from_json($"js", schema))).as("e"))
        .select($"source", $"e.key".as("k"),
          length($"e.value.question").cast("long").as("q_len"))
        .orderBy($"source", $"k")
    }),

    // S11: NL2SQL blob scan + embed over builder-authored JSON fixtures;
    // oracle is the constant expected table.
    "s11_nl2sql_docs" -> ((s, _) => {
      import s.implicits._
      // per-process dir (no cross-JVM races), wiped each call so stale files
      // from an earlier in-process run can't skew the constant oracle
      val root = s"${System.getProperty("java.io.tmpdir")}/graft-nl2sql-fixture-" +
        ProcessHandle.current().pid()
      def clear(dir: java.nio.file.Path): Unit =
        if (java.nio.file.Files.exists(dir)) {
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(dir)
          try walk.iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
          finally walk.close()
        }
      clear(java.nio.file.Paths.get(root))
      def write(sub: String, name: String, body: String): Unit = {
        val dir = java.nio.file.Paths.get(root, sub)
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.writeString(dir.resolve(name), body)
      }
      write("queries", "q1.json",
        """{"datasource": "sales", "question": "total revenue by region", "query": "SELECT 1"}""")
      write("queries", "q2.json",
        """{"datasource": "sales", "question": "orders per customer", "query": "SELECT 2"}""")
      write("tables", "t1.json",
        """{"table": "fact_sale", "description": "sales fact table", "datasource": "sales", "columns": [{"name": "qty", "description": "quantity"}]}""")
      write("measures", "m1.json",
        """{"datasource": "sales", "name": "gm", "description": "gross margin ratio", "type": "ratio", "source_table": "fact_sale", "data_type": "double"}""")
      graft.pipeline.Nl2Sql.buildDocs(s, root, new HashingEmbedder(16))
        .groupBy($"kind")
        .agg(count(lit(1)).as("n"),
          sum(length($"embedding_text")).as("chars"))
        .orderBy($"kind")
    }),

    // X1: title from filename — separator split + camelCase boundary split +
    // title-case (base_chunker.py:236-264).
    "x1_title_case" -> ((s, d) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      load(s, d, "documents")
        .withColumn("f1", concat(lit("quarterly_report-"), $"doc_id", lit(".pdf")))
        .withColumn("f2", concat(lit("annualReport"), $"doc_id", lit(".txt")))
        .select($"doc_id",
          call_function("graft_title", $"f1").as("title1"),
          call_function("graft_title", $"f2").as("title2"))
        .orderBy($"doc_id")
    }),

    // X4: UTF-8-safe byte truncation. A multibyte prefix (é=2B §=2B 中=3B)
    // plus the ASCII corpus makes both the no-split-needed and the
    // continuation-byte-backoff paths visible to the oracle.
    "x4_utf8_truncate" -> ((s, d) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      load(s, d, "documents")
        .withColumn("s", concat(lit("é§中"), $"text"))
        .select($"doc_id",
          octet_length(call_function("graft_utf8_truncate", $"s", lit(100))).cast("long").as("b100"),
          octet_length(call_function("graft_utf8_truncate", $"s", lit(6))).cast("long").as("b6"))
        .orderBy($"doc_id")
    }),

    // X6: iterative token-bounded truncation — the invariant the reference
    // guarantees (≤ maxTokens, prefix of the input) as boolean columns.
    "x6_token_truncate" -> ((s, d) => {
      import s.implicits._
      val trunc = udf((t: String) => TextKeys.truncateToTokens(t, 50))
      val nTok = udf((t: String) => graft.core.RegexTokenizer.count(t))
      load(s, d, "documents")
        .withColumn("out", trunc($"text"))
        .select($"doc_id",
          (nTok($"out") <= 50).as("within"),
          ($"text".startsWith($"out")).as("is_prefix"))
        .orderBy($"doc_id")
    }),

    // X14: URL decomposition (tools/blob.py:26-35) via parse_url — stays in
    // codegen; oracle re-derives with RE2 regexes.
    "x14_url_parse" -> ((s, d) => {
      import s.implicits._
      load(s, d, "documents")
        .withColumn("url", concat(lit("https://acct1.blob.example.com/cont"),
          $"doc_id" % 5, lit("/docs/file_"), $"doc_id", lit(".pdf?sig=s"), $"doc_id"))
        .select($"doc_id",
          parse_url($"url", lit("HOST")).as("host"),
          parse_url($"url", lit("PATH")).as("path"),
          parse_url($"url", lit("QUERY")).as("query"))
        .orderBy($"doc_id")
    }),

    // X16: extension → content-type via a map literal lookup
    // (tools/doc_intelligence.py:69-86).
    "x16_content_type" -> ((s, d) => {
      import s.implicits._
      val ctMap = map(
        lit("pdf"), lit("application/pdf"),
        lit("docx"), lit("application/vnd.openxmlformats-officedocument.wordprocessingml.document"),
        lit("txt"), lit("text/plain"),
        lit("vtt"), lit("text/vtt"),
        lit("json"), lit("application/json"))
      val exts = array(lit("pdf"), lit("docx"), lit("txt"), lit("vtt"), lit("json"))
      load(s, d, "documents")
        .withColumn("ext", element_at(exts, ($"doc_id" % 5 + 1).cast("int")))
        .withColumn("content_type", element_at(ctMap, $"ext"))
        .groupBy($"content_type").agg(count(lit(1)).as("n"))
        .orderBy($"content_type")
    }),

    // W4: top/skip paged scan — 4 pages of 25 over a sorted key, summarized
    // per page (blob_storage_indexer.py:838-891 paging shape).
    "w4_paged_scan" -> ((s, d) => {
      import s.implicits._
      val w = Window.orderBy($"o_orderkey")
      load(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 100)
        .withColumn("page", (($"rn" - 1) / 25).cast("long"))
        .groupBy($"page")
        .agg(count(lit(1)).as("n"), min($"o_orderkey").as("first_key"),
          max($"o_orderkey").as("last_key"))
        .orderBy($"page")
    })
  )

  val oracles: Map[String, String] = Map(
    "c4_vtt_transcript" ->
      """WITH r AS (
        | SELECT user_id, event_id, ts, event_type,
        |  CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |       IS NOT DISTINCT FROM event_type THEN 0 ELSE 1 END AS chg
        | FROM events),
        |s AS (
        | SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id FROM r),
        |runs AS (
        | SELECT user_id, run_id, any_value(event_type) AS voice,
        |        string_agg('e' || event_id, ' ' ORDER BY ts, event_id) AS txt
        | FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_lines,
        | CAST(sum(length(voice) + 2 + length(txt)) + count(*) - 1 AS BIGINT) AS total_chars
        |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin,
    "c6_nl2sql_chunks" ->
      """SELECT source, 'd' || doc_id AS k, CAST(least(n_chars, 40) AS BIGINT) AS q_len
        |FROM documents ORDER BY source, k""".stripMargin,
    "s11_nl2sql_docs" ->
      """SELECT * FROM (VALUES
        | ('measures', CAST(1 AS BIGINT), CAST(18 AS BIGINT)),
        | ('queries',  CAST(2 AS BIGINT), CAST(42 AS BIGINT)),
        | ('tables',   CAST(1 AS BIGINT), CAST(16 AS BIGINT))) AS t(kind, n, chars)
        |ORDER BY kind""".stripMargin,
    "x1_title_case" ->
      """SELECT doc_id,
        | 'Quarterly Report ' || doc_id AS title1,
        | 'Annual Report' || doc_id AS title2
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x4_utf8_truncate" ->
      """SELECT doc_id,
        | CAST(least(n_chars + 7, 100) AS BIGINT) AS b100,
        | CAST(4 AS BIGINT) AS b6
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x6_token_truncate" ->
      """SELECT doc_id, true AS within, true AS is_prefix
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x14_url_parse" ->
      """SELECT doc_id,
        | 'acct1.blob.example.com' AS host,
        | '/cont' || (doc_id % 5) || '/docs/file_' || doc_id || '.pdf' AS path,
        | 'sig=s' || doc_id AS query
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x16_content_type" ->
      """WITH e AS (
        | SELECT ['pdf','docx','txt','vtt','json'][CAST(doc_id % 5 + 1 AS INTEGER)] AS ext
        | FROM documents)
        |SELECT CASE ext
        |  WHEN 'pdf' THEN 'application/pdf'
        |  WHEN 'docx' THEN 'application/vnd.openxmlformats-officedocument.wordprocessingml.document'
        |  WHEN 'txt' THEN 'text/plain'
        |  WHEN 'vtt' THEN 'text/vtt'
        |  WHEN 'json' THEN 'application/json' END AS content_type,
        | count(*) AS n
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "w4_paged_scan" ->
      """WITH r AS (
        | SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rn FROM orders)
        |SELECT CAST((rn-1)//25 AS BIGINT) AS page, count(*) AS n,
        | min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
        |FROM r WHERE rn <= 100 GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
