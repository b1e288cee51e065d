package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.load

/** Coverage wave 5a — remaining SURVEY §2.3 filters and §2.8 scalars:
  * skew-guarded freshness (F2), blocked-file state filter (F3), dir-marker
  * skip (F5), min-chunk-token filter (F6), include-field projection (F9),
  * unchanged-skip (F12), key sanitization (X2), lossy decode round-trip (X7),
  * HTML-table placeholder swap/restore (X8), markdown table render (X9),
  * row→embedding-text compaction (X10), tolerant ACL parse (X12),
  * path→(collection,item) parse (X17), and keyed dedupe (§2.11
  * dropDuplicates analog). All oracle-matched.
  *
  * Scale notes: every filter is a codegen'd predicate over a columnar scan;
  * the two stateful filters (F2/F3) broadcast their (small) state side; no
  * query collects to the driver.
  */
object Coverage4 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // F2: strict-newer freshness with a 1-second clock-skew allowance
    // (sharepoint_ingestion_config.py:111-114).
    "f2_skew_guard" -> ((s, d) => {
      import s.implicits._
      val events = load(s, d, "events")
      val state = events.filter($"ts" < to_timestamp(lit("2024-01-15")))
        .groupBy($"user_id").agg(max($"ts").as("state_ts"))
      events.join(broadcast(state), Seq("user_id"), "left")
        .filter($"state_ts".isNull || $"ts" > $"state_ts" + expr("INTERVAL 1 SECOND"))
        .groupBy($"user_id").agg(count(lit(1)).as("n_fresh"))
        .orderBy($"user_id")
    }),

    // F3: blocked-file filter — attempts counted from an error-event state
    // table, block past 3 attempts (blob_storage_indexer.py:449-505).
    "f3_blocked_filter" -> ((s, d) => {
      import s.implicits._
      val ev = load(s, d, "events")
      val state = ev.filter($"event_type" === "error")
        .groupBy($"user_id").agg(count(lit(1)).as("attempts"))
      ev.groupBy($"user_id").agg(count(lit(1)).as("n_events"))
        .join(broadcast(state), Seq("user_id"), "left")
        .withColumn("attempts", coalesce($"attempts", lit(0L)))
        .filter($"attempts" <= 3)
        .select($"user_id", $"n_events", $"attempts")
        .orderBy($"user_id")
    }),

    // F5: zero-size directory-marker skip (blob_storage_indexer.py:290-291).
    "f5_dir_markers" -> ((s, d) => {
      import s.implicits._
      load(s, d, "documents")
        .withColumn("name", concat(lit("docs/"), $"doc_id",
          when($"doc_id" % 7 === 0, lit("/")).otherwise(lit(".txt"))))
        .withColumn("size", when($"doc_id" % 7 === 0, lit(0L)).otherwise($"n_chars"))
        .filter(!($"size" === 0 && $"name".endsWith("/")))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_files"), sum($"size").as("total_bytes"))
        .orderBy($"source")
    }),

    // F6: post-explode min-chunk-token filter
    // (doc_analysis_chunker.py:304-320; threshold CHUNKING_MIN_CHUNK_SIZE).
    "f6_min_chunk" -> ((s, d) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      load(s, d, "documents").filter($"n_chars" > 0)
        .withColumn("chunk_id", explode(sequence(lit(0L), floor(($"n_chars" - 1) / 96))))
        .withColumn("chunk", substring($"text", ($"chunk_id" * 96 + 1).cast("int"), lit(128)))
        .withColumn("tok", call_function("graft_token_count", $"chunk"))
        .filter($"tok" >= 25)
        .groupBy($"source").agg(count(lit(1)).as("n_chunks"))
        .orderBy($"source")
    }),

    // F9: includeFields projection over a schema-less fields map
    // (sharepoint_indexer.py:1470-1483).
    "f9_field_projection" -> ((s, d) => {
      import s.implicits._
      val include = array(lit("k"), lit("type"))
      load(s, d, "events")
        .withColumn("fields", map(
          lit("k"), get_json_object($"props", "$.k"),
          lit("type"), $"event_type",
          lit("value"), $"value".cast("string")))
        .withColumn("kept", map_filter($"fields", (k, _) => array_contains(include, k)))
        .select($"event_id",
          array_join(sort_array(map_keys($"kept")), ",").as("kept_keys"),
          element_at($"kept", "k").as("k_val"))
        .orderBy($"event_id")
    }),

    // F12: unchanged-skip — skip iff (logged with same etag) AND (still in
    // index); both sides are joins, not modular shortcuts
    // (nl2sql_indexer.py:249-271).
    "f12_unchanged_skip" -> ((s, d) => {
      import s.implicits._
      val docs = load(s, d, "documents")
      val log = docs.filter($"doc_id" % 3 === 0).select($"doc_id", $"n_chars".as("etag"))
      val idx = docs.filter($"doc_id" % 2 === 0)
        .select($"doc_id").withColumn("present", lit(true))
      docs.join(broadcast(log), Seq("doc_id"), "left")
        .join(broadcast(idx), Seq("doc_id"), "left")
        .filter(!($"etag" <=> $"n_chars" && $"present" <=> lit(true)))
        .groupBy($"source").agg(count(lit(1)).as("n_to_process"))
        .orderBy($"source")
    }),

    // X2: key-safe slug sanitization (blob_storage_indexer.py:1402-1412).
    "x2_key_sanitize" -> ((s, d) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      load(s, d, "documents")
        .withColumn("raw", concat(lit("Report #"), $"doc_id", lit(" (final)!.pdf")))
        .select($"doc_id", call_function("graft_sanitize_key", $"raw").as("skey"))
        .orderBy($"doc_id")
    }),

    // X7: byte→string lossy decode round-trip (base_chunker.py:295-306).
    "x7_lossy_decode" -> ((s, d) => {
      import s.implicits._
      load(s, d, "documents")
        .withColumn("bytes", encode($"text", "UTF-8"))
        .select($"doc_id",
          octet_length($"bytes").cast("long").as("n_bytes"),
          (decode($"bytes", "UTF-8") === $"text").as("roundtrip"))
        .orderBy($"doc_id")
    }),

    // X7b: charset DETECTION before decode (base_chunker.py:295-306) —
    // BOM sniffing, strict UTF-8 validation, BOM-less UTF-16 NUL heuristic,
    // windows-1252 fallback; every case must identify its encoding and
    // round-trip the original text exactly.
    "x7b_charset_detect" -> ((s, _) => {
      import s.implicits._
      val cases = Seq(
        ("ascii_plain", "plain ascii text, nothing fancy", "UTF-8", false),
        ("utf8_accents", "héllo wörld — naïve café 日本", "UTF-8", false),
        ("utf8_bom", "bom then héllo", "UTF-8", true),
        ("utf16le_bom", "utf-16 little endian", "UTF-16LE", true),
        ("utf16be_bom", "utf-16 big endian", "UTF-16BE", true),
        ("utf16le_raw", "bomless little endian text", "UTF-16LE", false),
        ("utf16be_raw", "bomless big endian text", "UTF-16BE", false),
        ("win1252_text", "café résumé £99 naïve", "windows-1252", false)
      ).toDF("case_id", "text", "enc", "bom")
      val encodeU = udf((t: String, enc: String, bom: Boolean) => {
        val cs = java.nio.charset.Charset.forName(enc)
        val body = t.getBytes(cs)
        val bomBytes: Array[Byte] = if (!bom) Array.emptyByteArray else enc match {
          case "UTF-8" => Array(0xEF, 0xBB, 0xBF).map(_.toByte)
          case "UTF-16LE" => Array(0xFF, 0xFE).map(_.toByte)
          case "UTF-16BE" => Array(0xFE, 0xFF).map(_.toByte)
          case _ => Array.emptyByteArray
        }
        bomBytes ++ body
      })
      val detectU = udf((bytes: Array[Byte]) => graft.core.Charsets.detect(bytes).charset)
      val decodeU = udf((bytes: Array[Byte]) => graft.core.Charsets.decodeDetected(bytes)._1)
      cases.withColumn("payload", encodeU($"text", $"enc", $"bom"))
        .select($"case_id",
          detectU($"payload").as("detected"),
          (decodeU($"payload") === $"text").as("roundtrip"))
        .orderBy($"case_id")
    }),

    // X8: HTML-table placeholder swap before splitting, restore after
    // (doc_analysis_chunker.py:338-369).
    "x8_table_placeholder" -> ((s, d) => {
      import s.implicits._
      load(s, d, "documents")
        .withColumn("html", concat(lit("<p>"), substring($"text", 1, 50),
          lit("</p><table><tr><td>"), $"doc_id",
          lit("</td></tr></table><p>tail</p>")))
        .withColumn("tables",
          regexp_extract_all($"html", lit("(?s)<table>.*?</table>"), lit(0)))
        .withColumn("swapped",
          regexp_replace($"html", "(?s)<table>.*?</table>", "[[TBL]]"))
        .withColumn("restored", replace($"swapped", lit("[[TBL]]"), element_at($"tables", 1)))
        .select($"doc_id",
          size($"tables").cast("long").as("n_tables"),
          ($"restored" === $"html").as("restored_ok"),
          length($"swapped").cast("long").as("swapped_len"))
        .orderBy($"doc_id")
    }),

    // X9: markdown table row render with cell-whitespace cleanup
    // (spreadsheet_chunker.py:354-376).
    "x9_md_table" -> ((s, d) => {
      import s.implicits._
      load(s, d, "nation")
        .join(broadcast(load(s, d, "region")), $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey",
          concat(lit("| "), $"n_name", lit(" | "),
            regexp_replace($"r_name", "\\s+", " "), lit(" | "),
            $"n_nationkey", lit(" |")).as("md_row"))
        .orderBy($"n_nationkey")
    }),

    // X10: row→embedding-text compaction with trailing-empty-column trim
    // (spreadsheet_chunker.py:267-327).
    "x10_row_compact" -> ((s, d) => {
      import s.implicits._
      load(s, d, "customer")
        .withColumn("vals", array($"c_mktsegment",
          when($"c_custkey" % 3 === 0, lit("")).otherwise($"c_name")))
        .withColumn("cols", array(lit("mktsegment"), lit("name")))
        .withColumn("keep_n",
          when(element_at($"vals", 2) === "", lit(1)).otherwise(lit(2)).cast("int"))
        .withColumn("compact", concat(
          lit("file=customers.xlsx sheet=s1 row="), $"c_custkey",
          lit(" cols="), array_join(slice($"cols", lit(1), $"keep_n"), "|"),
          lit(" vals="), array_join(slice($"vals", lit(1), $"keep_n"), "|")))
        .select($"c_custkey", $"compact")
        .orderBy($"c_custkey")
    }),

    // X12: tolerant ACL-list parse — JSON array, Python-literal fallback,
    // csv fallback (blob_storage_indexer.py:1442-1477).
    "x12_acl_parse" -> ((s, d) => {
      import s.implicits._
      load(s, d, "documents")
        .withColumn("raw",
          when($"doc_id" % 3 === 0, lit("""["u1","u2"]"""))
            .when($"doc_id" % 3 === 1, lit("u1,u2,u3"))
            .otherwise(lit("['u1']")))
        .withColumn("ids", coalesce(
          from_json($"raw", ArrayType(StringType)),
          from_json(translate($"raw", "'", "\""), ArrayType(StringType)),
          split($"raw", ",")))
        .select($"doc_id",
          size($"ids").cast("long").as("n_ids"),
          array_join($"ids", ";").as("joined"))
        .orderBy($"doc_id")
    }),

    // X17: index-doc path → (collection, item) parse for purge membership
    // (sharepoint_purger.py:415-425).
    "x17_path_parse" -> ((s, d) => {
      import s.implicits._
      load(s, d, "documents")
        .withColumn("path", concat(lit("sites/contoso/lists/l"), $"doc_id" % 4,
          lit("/items/"), $"doc_id"))
        .withColumn("parts", split($"path", "/"))
        .select(element_at($"parts", 4).as("collection"),
          element_at($"parts", 6).cast("long").as("item_id"))
        .groupBy($"collection")
        .agg(count(lit(1)).as("n"), max($"item_id").as("max_item"))
        .orderBy($"collection")
    }),

    // §2.5 note: grouping sets come free from Spark SQL — declared here so
    // the correctness matrix covers them (ROLLUP over two keys + grand total).
    "a10_rollup" -> ((s, d) => {
      import s.implicits._
      load(s, d, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        // subtotal rows carry null keys; surface them as an explicit marker
        // so the compare is null-free on both sides
        .select(coalesce($"l_returnflag", lit("ALL")).as("rflag"),
          coalesce($"l_linestatus", lit("ALL")).as("lstatus"), $"n", $"sum_qty")
        .orderBy($"rflag", $"lstatus")
    }),

    // §2.5 note: CUBE — all four grouping combinations in one pass.
    "a11_cube" -> ((s, d) => {
      import s.implicits._
      load(s, d, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("sum_price"))
        .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"), $"n", $"sum_price")
        .orderBy($"status", $"priority")
    }),

    // §7.1: sketch-based distinct — approx_count_distinct within 10 % of the
    // exact count per group (HLL++; the 100 TB form of A4-style distincts).
    "d6_approx_distinct" -> ((s, d) => {
      import s.implicits._
      load(s, d, "documents")
        .groupBy($"source")
        .agg(approx_count_distinct(md5($"text")).as("approx"),
          countDistinct(md5($"text")).as("exact"))
        .select($"source",
          (abs($"approx" - $"exact") <= $"exact" * 0.1).as("within_10pct"))
        .orderBy($"source")
    }),

    // Language-id on clear-cut synthetic samples — oracle-gated detection
    // (t3 measures agreement on the real corpus, whose text is English-only,
    // so detection itself can only be gated on unambiguous inputs).
    "t4_langid_samples" -> ((s, _) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      Seq(
        ("en", "the cat and the dog are in the house with the big red ball"),
        ("es", "el perro y el gato en la casa por la noche con los amigos"),
        ("de", "der Hund und die Katze sind nicht im Haus mit dem Ball"),
        ("fr", "le chien et le chat dans la maison pour la nuit avec les amis"),
        ("zh", "这是一个中文句子没有空格也没有标点符号只有汉字"))
        .toDF("lang", "text")
        .select($"lang", (call_function("graft_langid", $"text") === $"lang").as("detected"))
        .orderBy($"lang")
    }),

    // §2.11: keyed dedupe — dropDuplicates on (user, type, day), the batch
    // analog of streaming dropDuplicates-within-watermark.
    "st2_dedupe_keys" -> ((s, d) => {
      import s.implicits._
      load(s, d, "events")
        .withColumn("day", to_date($"ts"))
        .dropDuplicates("user_id", "event_type", "day")
        .groupBy($"event_type").agg(count(lit(1)).as("n_keys"))
        .orderBy($"event_type")
    })
  )

  val oracles: Map[String, String] = Map(
    // fixed cases, and every one must both identify its charset and
    // round-trip — a detector regression flips a constant
    "x7b_charset_detect" ->
      """SELECT * FROM (VALUES
        | ('ascii_plain', 'UTF-8', true),
        | ('utf8_accents', 'UTF-8', true),
        | ('utf8_bom', 'UTF-8', true),
        | ('utf16le_bom', 'UTF-16LE', true),
        | ('utf16be_bom', 'UTF-16BE', true),
        | ('utf16le_raw', 'UTF-16LE', true),
        | ('utf16be_raw', 'UTF-16BE', true),
        | ('win1252_text', 'windows-1252', true)
        |) AS t(case_id, detected, roundtrip) ORDER BY case_id""".stripMargin,
    "f2_skew_guard" ->
      """WITH state AS (
        | SELECT user_id, max(ts) AS state_ts FROM events
        | WHERE ts < TIMESTAMP '2024-01-15' GROUP BY 1)
        |SELECT e.user_id, count(*) AS n_fresh FROM events e
        |LEFT JOIN state s ON e.user_id = s.user_id
        |WHERE s.state_ts IS NULL OR e.ts > s.state_ts + INTERVAL 1 SECOND
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "f3_blocked_filter" ->
      """WITH a AS (
        | SELECT user_id, count(*) AS attempts FROM events
        | WHERE event_type = 'error' GROUP BY 1),
        |t AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1)
        |SELECT t.user_id, t.n_events, coalesce(a.attempts, 0) AS attempts
        |FROM t LEFT JOIN a USING (user_id)
        |WHERE coalesce(a.attempts, 0) <= 3 ORDER BY 1""".stripMargin,
    "f5_dir_markers" ->
      """SELECT source, count(*) AS n_files, CAST(sum(n_chars) AS BIGINT) AS total_bytes
        |FROM documents WHERE doc_id % 7 <> 0 GROUP BY 1 ORDER BY 1""".stripMargin,
    "f6_min_chunk" ->
      """WITH c AS (
        | SELECT d.source,
        |  len(regexp_extract_all(substr(d.text, CAST(t.i*96+1 AS INTEGER), 128),
        |      '[A-Za-z]+|[0-9]+|[^ A-Za-z0-9]')) AS tok
        | FROM documents d, generate_series(0, 255) t(i)
        | WHERE d.n_chars > 0 AND t.i <= (d.n_chars-1)//96)
        |SELECT source, count(*) AS n_chunks FROM c WHERE tok >= 25
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "f9_field_projection" ->
      """SELECT event_id, 'k,type' AS kept_keys,
        | json_extract_string(props, '$.k') AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "f12_unchanged_skip" ->
      """SELECT source, count(*) AS n_to_process FROM documents
        |WHERE NOT (doc_id % 6 = 0) GROUP BY 1 ORDER BY 1""".stripMargin,
    "x2_key_sanitize" ->
      """SELECT doc_id, 'Report-' || doc_id || '-final-pdf' AS skey
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x7_lossy_decode" ->
      """SELECT doc_id, CAST(n_chars AS BIGINT) AS n_bytes, true AS roundtrip
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x8_table_placeholder" ->
      """SELECT doc_id, CAST(1 AS BIGINT) AS n_tables, true AS restored_ok,
        | CAST(least(n_chars, 50) + 25 AS BIGINT) AS swapped_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x9_md_table" ->
      """SELECT n_nationkey,
        | '| ' || n_name || ' | ' || regexp_replace(r_name, '\s+', ' ', 'g')
        |   || ' | ' || n_nationkey || ' |' AS md_row
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY 1""".stripMargin,
    "x10_row_compact" ->
      """SELECT c_custkey,
        | CASE WHEN c_custkey % 3 = 0
        |  THEN 'file=customers.xlsx sheet=s1 row=' || c_custkey
        |    || ' cols=mktsegment vals=' || c_mktsegment
        |  ELSE 'file=customers.xlsx sheet=s1 row=' || c_custkey
        |    || ' cols=mktsegment|name vals=' || c_mktsegment || '|' || c_name
        | END AS compact
        |FROM customer ORDER BY 1""".stripMargin,
    "x12_acl_parse" ->
      """SELECT doc_id,
        | CAST(CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 1 END AS BIGINT) AS n_ids,
        | CASE doc_id % 3 WHEN 0 THEN 'u1;u2' WHEN 1 THEN 'u1;u2;u3' ELSE 'u1' END AS joined
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x17_path_parse" ->
      """SELECT 'l' || (doc_id % 4) AS collection, count(*) AS n, max(doc_id) AS max_item
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "a10_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        | coalesce(l_linestatus, 'ALL') AS lstatus,
        | count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin,
    "a11_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "d6_approx_distinct" ->
      """SELECT source, true AS within_10pct FROM
        | (SELECT DISTINCT source FROM documents) ORDER BY 1""".stripMargin,
    "t4_langid_samples" ->
      """SELECT * FROM (VALUES
        | ('de', true), ('en', true), ('es', true), ('fr', true), ('zh', true)
        |) AS t(lang, detected) ORDER BY lang""".stripMargin,
    "st2_dedupe_keys" ->
      """SELECT event_type, count(*) AS n_keys FROM (
        | SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS day FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
