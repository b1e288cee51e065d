package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Second coverage wave over SURVEY §2: the purge-family joins (J3/J4/J6),
  * remaining aggregations (A4/A6/A8/A9), guard filters (F4/F7 + X16 mapping),
  * pagination (W4/W6), and scalar functions X11/X15/X17. All oracle-matched.
  */
object Extended {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // J3+X17: parse (site, item) out of a path and anti-join against the live
    // id set per collection (jobs/sharepoint_purger.py:415-520).
    "j3_purge_path_parse" -> ((s, d) => {
      import s.implicits._
      val indexDocs = load(s, d, "events")
        .select(concat(lit("site/"), $"user_id", lit("/item/"), $"event_id").as("path"))
      val parsed = indexDocs
        .withColumn("site_id", element_at(split($"path", "/"), 2).cast("long"))
        .withColumn("item_id", element_at(split($"path", "/"), 4).cast("long"))
      val live = load(s, d, "events").filter($"value" > 30.0)
        .select($"user_id".as("site_id"), $"event_id".as("item_id"))
      parsed.join(live, Seq("site_id", "item_id"), "left_anti")
        .select($"path", $"site_id", $"item_id")
        .orderBy($"item_id")
    }),

    // J4+A4: orphaned images = image universe − union of all referenced ids
    // (jobs/multimodal_images_purger.py:55-110).
    "j4_orphan_images" -> ((s, d) => {
      import s.implicits._
      val images = s.range(0, 50).select($"id".as("img_id"))
      val referenced = load(s, d, "documents")
        .select(explode(array($"doc_id" % 50, ($"doc_id" * 7 + 3) % 50)).as("img_id"))
        .distinct()
      images.join(referenced, Seq("img_id"), "left_anti")
        .orderBy($"img_id")
    }),

    // J6: explode token refs → join a small dimension → re-aggregate per doc
    // (figure attach, chunking/chunkers/multimodal_chunker.py:207-345).
    "j6_ref_join_reagg" -> ((s, d) => {
      import s.implicits._
      val dim = Seq("spark", "join", "window", "stream", "batch")
        .toDF("w").withColumn("weight", length($"w"))
      load(s, d, "documents")
        .select($"doc_id", explode(split($"text", " ")).as("w"))
        .join(broadcast(dim), Seq("w"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_refs"), sum($"weight").as("total_weight"))
        .orderBy($"doc_id")
    }),

    // A4: referenced-set distinct across the corpus.
    "a4_distinct_tokens" -> ((s, d) => {
      import s.implicits._
      load(s, d, "documents")
        .select($"source", explode(split($"text", " ")).as("w"))
        .groupBy($"source")
        .agg(countDistinct($"w").as("n_distinct_tokens"))
        .orderBy($"source")
    }),

    // A6+X9: per-sheet markdown render with summary substitution when the
    // rendered table exceeds the token cap (spreadsheet_chunker.py:105-129).
    "a6_sheet_summary" -> ((s, d) => {
      import s.implicits._
      val rendered = load(s, d, "documents")
        .groupBy($"source")
        .agg(sort_array(collect_list(struct($"doc_id", substring($"text", 1, 30).as("t")))).as("rows"))
        .withColumn("table_md",
          concat(lit("| doc | text |\n"),
            array_join(transform($"rows", r =>
              concat(lit("| "), r.getField("doc_id"), lit(" | "), r.getField("t"), lit(" |"))), "\n")))
      rendered
        .withColumn("n_chars_tbl", length($"table_md").cast("long"))
        .withColumn("content",
          when($"n_chars_tbl" > 600, concat(lit("SUMMARY: "), substring($"table_md", 1, 100)))
            .otherwise($"table_md"))
        .select($"source", $"n_chars_tbl", length($"content").cast("long").as("n_chars_out"),
          ($"n_chars_tbl" > 600).as("summarized"))
        .orderBy($"source")
    }),

    // A8: per-table doc counts (jobs/nl2sql_purger.py:182-195).
    "a8_table_counts" -> ((s, d) => {
      import s.implicits._
      Seq("documents", "embeddings", "events").map { t =>
        load(s, d, t).select(lit(t).as("tbl"), lit(1).as("one"))
          .groupBy($"tbl").agg(count(lit(1)).as("n"))
      }.reduce(_ unionByName _).orderBy($"tbl")
    }),

    // A9+X18: cost accumulation — pages·rate + tokens/1000·rate
    // (jobs/blob_storage_indexer.py:634-699).
    "a9_cost_rollup" -> ((s, d) => {
      import s.implicits._
      load(s, d, "documents")
        .withColumn("pages", ceil($"n_chars" / 2000.0))
        .withColumn("toks", size(split(trim($"text"), "\\s+")))
        .groupBy($"source")
        .agg(sum($"pages").as("total_pages"),
          round(sum($"pages" * 0.01 + $"toks" / 1000.0 * 0.00013), 6).as("cost_usd"))
        .orderBy($"source")
    }),

    // F4+X16: extension allow-list over an ext derived via indexed mapping
    // (jobs/sharepoint_indexer.py:1001-1009; tools/doc_intelligence.py:69-86).
    "f4_ext_allowlist" -> ((s, d) => {
      import s.implicits._
      val exts = array(lit("pdf"), lit("docx"), lit("pptx"), lit("txt"), lit("vtt"))
      load(s, d, "documents")
        .withColumn("ext", element_at(exts, ($"doc_id" % 5 + 1).cast("int")))
        .filter($"ext".isin("pdf", "docx", "pptx"))
        .groupBy($"ext").agg(count(lit(1)).as("n"))
        .orderBy($"ext")
    }),

    // F7: drop rows whose cells are all blank (spreadsheet_chunker.py:152-154)
    // via an exists() higher-order predicate.
    "f7_nonempty_rows" -> ((s, d) => {
      import s.implicits._
      load(s, d, "documents")
        .filter(exists(split($"text", " "), t => length(t) > 4))
        .groupBy($"lang").agg(count(lit(1)).as("n"))
        .orderBy($"lang")
    }),

    // W4/W6: deterministic sort + limit/offset page (api/admin.py:287-357).
    "w6_sort_page" -> ((s, d) => {
      import s.implicits._
      load(s, d, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .select($"o_orderkey", $"o_totalprice")
        .offset(40).limit(20)
    }),

    // W8: the admin listing envelope through the EXACT plan the HTTP
    // handlers serve (AdminServer.searchFilter + pageSlice; admin.py
    // 287-357): all-columns substring search, deterministic sort +
    // tie-break, page 3 of 20, with the envelope's `total` riding along
    // as a broadcast 1-row aggregate.
    "w8_admin_page" -> ((s, d) => {
      import s.implicits._
      val orders = load(s, d, "orders")
      val filtered = graft.pipeline.AdminServer.searchFilter(orders, Some("1-urgent"))
      val total = filtered.agg(count(lit(1)).as("total"))
      graft.pipeline.AdminServer.pageSlice(filtered, "o_totalprice",
        desc = true, tieBreak = "o_orderkey", offset = 40, pageSize = 20)
        .select($"o_orderkey", $"o_totalprice")
        .crossJoin(broadcast(total))
    }),

    // X11: ISO parse with invalid-value epoch fallback
    // (jobs/sharepoint_ingestion_config.py:76-86).
    "x11_ts_parse_fallback" -> ((s, d) => {
      import s.implicits._
      load(s, d, "events")
        .withColumn("ts_str",
          when($"event_id" % 100 === 0, lit("not-a-date"))
            .otherwise(date_format($"ts", "yyyy-MM-dd HH:mm:ss")))
        .withColumn("parsed",
          coalesce(try_to_timestamp($"ts_str", lit("yyyy-MM-dd HH:mm:ss")),
            to_timestamp(lit("1970-01-01"))))
        .select($"event_id", unix_millis($"parsed").as("parsed_ms"))
        .orderBy($"event_id")
    }),

    // X15: base64 encode of content prefix (doc_intelligence.py:137-139).
    "x15_base64" -> ((s, d) => {
      import s.implicits._
      load(s, d, "documents")
        .select($"doc_id",
          base64(encode(substring($"text", 1, 24), "UTF-8")).as("b64"))
        .orderBy($"doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "j3_purge_path_parse" ->
      """WITH idx AS (
        | SELECT 'site/' || user_id || '/item/' || event_id AS path,
        |        user_id AS site_id, event_id AS item_id
        | FROM events),
        |live AS (SELECT user_id AS site_id, event_id AS item_id FROM events WHERE value > 30.0)
        |SELECT i.path, i.site_id, i.item_id FROM idx i
        |WHERE NOT EXISTS (SELECT 1 FROM live l
        |  WHERE l.site_id = i.site_id AND l.item_id = i.item_id)
        |ORDER BY i.item_id""".stripMargin,
    "j4_orphan_images" ->
      """SELECT t.img_id FROM generate_series(0, 49) t(img_id)
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM (
        |    SELECT doc_id % 50 AS r FROM documents
        |    UNION ALL SELECT (doc_id * 7 + 3) % 50 FROM documents) u
        |  WHERE u.r = t.img_id)
        |ORDER BY t.img_id""".stripMargin,
    "j6_ref_join_reagg" ->
      """WITH dim AS (SELECT * FROM (VALUES ('spark',5),('join',4),('window',6),
        |  ('stream',6),('batch',5)) AS v(w, weight)),
        |toks AS (SELECT d.doc_id, u.w FROM documents d, unnest(string_split(d.text,' ')) AS u(w))
        |SELECT t.doc_id, count(*) AS n_refs, CAST(sum(dim.weight) AS BIGINT) AS total_weight
        |FROM toks t JOIN dim ON t.w = dim.w
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "a4_distinct_tokens" ->
      """SELECT d.source, count(DISTINCT u.w) AS n_distinct_tokens
        |FROM documents d, unnest(string_split(d.text,' ')) AS u(w)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "a6_sheet_summary" ->
      """WITH rendered AS (
        | SELECT source,
        |  '| doc | text |' || chr(10) ||
        |  string_agg('| ' || doc_id || ' | ' || substr(text,1,30) || ' |', chr(10)
        |    ORDER BY doc_id, substr(text,1,30)) AS table_md
        | FROM documents GROUP BY source)
        |SELECT source, CAST(length(table_md) AS BIGINT) AS n_chars_tbl,
        | CAST(length(CASE WHEN length(table_md) > 600
        |   THEN 'SUMMARY: ' || substr(table_md,1,100) ELSE table_md END) AS BIGINT) AS n_chars_out,
        | (length(table_md) > 600) AS summarized
        |FROM rendered ORDER BY source""".stripMargin,
    "a8_table_counts" ->
      """SELECT 'documents' AS tbl, count(*) AS n FROM documents
        |UNION ALL SELECT 'embeddings', count(*) FROM embeddings
        |UNION ALL SELECT 'events', count(*) FROM events
        |ORDER BY tbl""".stripMargin,
    "a9_cost_rollup" ->
      """SELECT source,
        | CAST(sum(ceil(n_chars / 2000.0)) AS BIGINT) AS total_pages,
        | round(sum(ceil(n_chars / 2000.0) * 0.01
        |   + len(string_split_regex(trim(text), '\s+')) / 1000.0 * 0.00013), 6) AS cost_usd
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "f4_ext_allowlist" ->
      """SELECT ['pdf','docx','pptx','txt','vtt'][CAST(doc_id % 5 + 1 AS INTEGER)] AS ext,
        | count(*) AS n
        |FROM documents
        |WHERE ['pdf','docx','pptx','txt','vtt'][CAST(doc_id % 5 + 1 AS INTEGER)]
        |   IN ('pdf','docx','pptx')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "f7_nonempty_rows" ->
      """SELECT lang, count(*) AS n FROM documents
        |WHERE len(list_filter(string_split(text,' '), t -> length(t) > 4)) > 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "w6_sort_page" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 40""".stripMargin,
    "w8_admin_page" ->
      """WITH hit AS (SELECT * FROM orders
        | WHERE contains(lower(concat_ws(chr(1),
        |   CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
        |   o_orderstatus, CAST(o_totalprice AS VARCHAR),
        |   CAST(o_orderdate AS VARCHAR), o_orderpriority)), '1-urgent'))
        |SELECT o_orderkey, o_totalprice,
        | (SELECT CAST(count(*) AS BIGINT) FROM hit) AS total
        |FROM hit ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 40""".stripMargin,
    "x11_ts_parse_fallback" ->
      """SELECT event_id,
        | epoch_ms(coalesce(
        |   try_strptime(CASE WHEN event_id % 100 = 0 THEN 'not-a-date'
        |     ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END, '%Y-%m-%d %H:%M:%S'),
        |   TIMESTAMP '1970-01-01')) AS parsed_ms
        |FROM events ORDER BY event_id""".stripMargin,
    "x15_base64" ->
      """SELECT doc_id, to_base64(encode(substr(text,1,24))) AS b64
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
