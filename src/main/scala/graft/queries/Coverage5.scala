package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.load
import graft.services.HashingEmbedder

import java.nio.file.{Files, Paths}

/** Coverage wave 5b — remaining SURVEY §2.1 sources, §2.2 sinks, §2.10
  * embedding ops, and the C2 figure-attach chunker join:
  * binary-file scan with dir-marker skip (S1/S2), recursive folder walk (S7),
  * jobs-log JSON scan (S12), batched upload partitioning (K1), keyed delete
  * (K2), write-then-verify state round-trip (K6), deterministic batched
  * embedder invariants (E1/E3), and figure-reference join with area filter
  * (C2 = J6 + F8). Filesystem fixtures are builder-authored, deterministic,
  * and rewritten on every call (idempotent), so oracles are constant tables.
  *
  * Scale notes: binaryFile scans parallelize by file; K1 batch assignment is
  * a per-partition-key window (no global sort); K2 is a shuffle-free
  * broadcast anti-join when the delete set is small and AQE-planned
  * otherwise; the embedder runs batched per partition (one client per task).
  */
object Coverage5 {
  type Q = (SparkSession, String) => DataFrame

  // pid-scoped so concurrent JVMs never share a dir. The FIRST use of a
  // sub-dir in this JVM wipes it (stale files from an older fixture layout
  // on a pid-reusing machine must not leak into glob scans); every later
  // use only replaces files atomically — a suite re-invoking a query while
  // another suite's returned DataFrame still scans the same path sees
  // either the old or the new byte-identical file, never a missing one.
  private val initializedRoots = scala.collection.mutable.HashSet.empty[String]
  private def tmpRoot(sub: String): String = synchronized {
    val p = Paths.get(System.getProperty("java.io.tmpdir"),
      s"$sub-${ProcessHandle.current().pid()}")
    if (initializedRoots.add(p.toString) && Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
      finally walk.close()
    }
    Files.createDirectories(p)
    p.toString
  }

  private def writeBytes(root: String, rel: String, body: Array[Byte]): Unit = synchronized {
    val p = Paths.get(root, rel)
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp, body)
    Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeFile(root: String, rel: String, body: String): Unit =
    writeBytes(root, rel, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  val queries: Map[String, Q] = Map(
    // S1/S2: container scan via binaryFile — names, sizes, full bytes; the
    // zero-length marker is dropped (F5) (blob_storage_indexer.py:286-303).
    "s1_binary_scan" -> ((s, _) => {
      import s.implicits._
      val root = tmpRoot("graft-s1-binscan")
      writeFile(root, "a.txt", "hello world")
      writeFile(root, "b.txt", "spark")
      writeFile(root, "empty.txt", "")
      s.read.format("binaryFile").option("pathGlobFilter", "*.txt").load(root)
        .filter($"length" > 0)
        .select(element_at(split($"path", "/"), -1).as("name"),
          $"length", decode($"content", "UTF-8").as("text"))
        .orderBy($"name")
    }),

    // S13: real binary-format decode — xlsx (zip + sheet XML + shared
    // strings), docx (zip + document XML) and pdf (content streams, both
    // FlateDecode and raw) are written as real container files by the
    // format writers, read back via binaryFile, and decoded by the same
    // extractText the chunking pipeline dispatches through. The snapshot
    // oracle pins extraction output (length, line structure, head).
    "s13_binary_decode" -> ((s, _) => {
      import s.implicits._
      val root = tmpRoot("graft-s13-formats")
      val xlsx = graft.formats.Ooxml.writeXlsx(Seq(
        graft.formats.Ooxml.XlsxSheet("Sales", Seq(
          Seq("region", "amount"), Seq("east", "100"), Seq("west", "250.5"))),
        graft.formats.Ooxml.XlsxSheet("Notes", Seq(
          Seq("note"), Seq("quarterly <review> & outlook")))))
      val docx = graft.formats.Ooxml.writeDocx(Seq(
        "Heading paragraph", "Body with naïve café text", "Final & <closing>"))
      val pdfZ = graft.formats.Pdf.writePdf(Seq(
        "Quarterly results", "Revenue up 12% (estimate)"), compress = true)
      val pdfR = graft.formats.Pdf.writePdf(Seq(
        "raw stream \\ with (escapes)"), compress = false)
      val pptx = graft.formats.Ooxml.writePptx(Seq(
        Seq("Agenda", "Q3 targets & risks"),
        Seq("Summary <slide>", "", "Next steps")))
      // legacy BIFF8-in-CFB container, same spreadsheet chunker as xlsx.
      // The Bulk sheet's cells each exceed the 8224-byte BIFF record-data
      // ceiling (one 8-bit, one UTF-16), so the SST writer must split their
      // character data mid-string across CONTINUE records — the gate then
      // covers the re-stated-flag framing, not just whole-string breaks.
      val xls = graft.formats.Biff.writeXls(Seq(
        graft.formats.Ooxml.XlsxSheet("Ledger", Seq(
          Seq("account", "balance"), Seq("ops", "1200"), Seq("r&d", "980.25"))),
        graft.formats.Ooxml.XlsxSheet("Bulk", Seq(
          Seq((0 until 2400).map(i => s"tok$i").mkString(" ")),
          Seq((0 until 2400).map(i => s"値$i").mkString("·"))))))
      Seq(("table.xlsx", xlsx), ("notes.docx", docx),
        ("report.pdf", pdfZ), ("memo.pdf", pdfR),
        ("deck.pptx", pptx), ("ledger.xls", xls)).foreach { case (n, b) =>
        writeBytes(root, n, b)
      }
      val extract = udf((path: String, bytes: Array[Byte]) =>
        graft.pipeline.Chunkers.extractText(bytes,
          path.substring(path.lastIndexOf('.') + 1)))
      s.read.format("binaryFile")
        .option("pathGlobFilter", "{*.xlsx,*.docx,*.pdf,*.pptx,*.xls}").load(root)
        .select(element_at(split($"path", "/"), -1).as("name"),
          extract($"path", $"content").as("text"))
        .select($"name",
          length($"text").cast("long").as("n_chars"),
          (size(split($"text", "\n"))).cast("long").as("n_lines"),
          element_at(split($"text", "\n"), 1).as("head"))
        .orderBy($"name")
    }),

    // S15: Office TABLE extraction — docx `w:tbl` and pptx `graphicFrame`
    // DrawingML tables render as markdown in body position (the layout
    // path's table→markdown contract, tools/doc_intelligence.py:88-198),
    // through the same extractText dispatch as s13. One output row per
    // extracted line pins the exact markdown the chunkers will see.
    "s15_office_tables" -> ((s, _) => {
      import s.implicits._
      val root = tmpRoot("graft-s15-tables")
      import graft.formats.Ooxml
      val docx = Ooxml.writeDocxBlocks(Seq(
        Ooxml.DocPara("Inventory report"),
        Ooxml.DocTable(Seq(
          Seq("item", "qty", "price"),
          Seq("bolts", "12", "0.30"),
          Seq("nuts & washers", "7", "0.10"))),
        Ooxml.DocPara("End of report")))
      val pptx = Ooxml.writePptxBlocks(Seq(
        Seq(Ooxml.DocPara("Quarterly metrics"),
          Ooxml.DocTable(Seq(
            Seq("quarter", "revenue"), Seq("Q1", "1000"), Seq("Q2", "1250"))))))
      Seq(("inventory.docx", docx), ("metrics.pptx", pptx)).foreach {
        case (n, b) => writeBytes(root, n, b)
      }
      val extract = udf((path: String, bytes: Array[Byte]) =>
        graft.pipeline.Chunkers.extractText(bytes,
          path.substring(path.lastIndexOf('.') + 1)))
      s.read.format("binaryFile").option("pathGlobFilter", "{*.docx,*.pptx}")
        .load(root)
        .select(element_at(split($"path", "/"), -1).as("name"),
          extract($"path", $"content").as("text"))
        .select($"name", posexplode(split($"text", "\n")).as(Seq("line_no", "line")))
        .orderBy($"name", $"line_no")
    }),

    // S14: binary PDF part-splitting — the reference splits large PDFs
    // into real sub-PDFs before analysis (utils/file_utils.py:71-138).
    // Per doc: build an n-page PDF (n from doc_id), split the object tree
    // at 3 pages/part, and verify the part count, the page-count sum, and
    // that re-extracting every part's text reassembles the whole document
    // byte-for-byte — all reproducible arithmetically by the oracle.
    "s14_pdf_split" -> ((s, d) => {
      import s.implicits._
      val splitUdf = udf((id: Long) => {
        val nPages = (id % 6 + 2).toInt
        val pages = (1 to nPages).map(p =>
          Seq(s"doc $id page $p alpha", s"doc $id page $p beta"))
        val whole = graft.formats.Pdf.writePdfPages(pages)
        val parts = graft.formats.Pdf.splitByPages(whole, 3)
        val roundtrip = parts.map(graft.formats.Pdf.extractText).mkString("\n") ==
          graft.formats.Pdf.extractText(whole)
        (nPages, parts.length, parts.map(graft.formats.Pdf.pageCount).sum, roundtrip)
      })
      load(s, d, "documents").select($"doc_id", splitUdf($"doc_id").as("r"))
        .select($"doc_id", $"r._1".as("n_pages"), $"r._2".as("n_parts"),
          $"r._3".as("pages_sum"), $"r._4".as("roundtrip"))
        .orderBy($"doc_id")
    }),

    // S7: recursive folder walk with extension filter
    // (tools/sharepoint.py:54-120).
    "s7_recursive_walk" -> ((s, _) => {
      import s.implicits._
      val root = tmpRoot("graft-s7-walk")
      writeFile(root, "a.txt", "aa")
      writeFile(root, "sub/b.txt", "bbb")
      writeFile(root, "sub/deep/c.txt", "cccc")
      writeFile(root, "sub/skip.md", "zz")
      s.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.txt")
        .load(root)
        .agg(count(lit(1)).as("n_files"), sum($"length").as("total_bytes"))
    }),

    // S6: drive-item resolve + download — one client per partition, 429
    // throttling retried through the shared Retry envelope on every row,
    // 404-ing items dropped (sharepoint_graph_client.py:127-175).
    "s6_drive_fetch" -> ((s, _) => {
      import s.implicits._
      val items = (0 until 20).map { i =>
        ("site" + (i % 2), "c", "it" + i + (if (i % 5 == 0) "gone" else ""))
      }.toDF("site_id", "collection_id", "item_id")
      val fetched = graft.sources.DriveItems.fetchDriveItems(items,
        () => new graft.sources.DriveItems.SyntheticDriveClient(throttleFirst = 2))
      fetched.groupBy($"site_id")
        .agg(count(lit(1)).as("n_fetched"),
          sum(octet_length($"content")).as("total_bytes"))
        .orderBy($"site_id")
    }),

    // S8: config-container scan — schema-less job-config JSON normalized
    // with the reference's duck-typed defaults (tools/cosmosdb.py:21-37,
    // blob_storage_indexer.py:93-102).
    "s8_config_scan" -> ((s, _) => {
      import s.implicits._
      val root = tmpRoot("graft-s8-config")
      writeFile(root, "jobA.json",
        """{"id":"jobA","batch_size":100,"input_is_base64":"yes","blob_prefix":"in/"}""")
      writeFile(root, "jobB.json", """{"id":"jobB","max_concurrency":16}""")
      writeFile(root, "jobC.json", """{"id":"jobC"}""")
      graft.sources.ConfigScan.loadJobConfigs(s, s"$root/*.json")
        .orderBy($"id")
    }),

    // S12: jobs-log scan — schema-on-read JSON over run summaries
    // (api/admin.py:106-180).
    "s12_log_scan" -> ((s, _) => {
      import s.implicits._
      val root = tmpRoot("graft-s12-logs")
      writeFile(root, "jobA/runs/r1.json",
        """{"runId": "r1", "status": "ok", "files": 3, "chunks": 10}""")
      writeFile(root, "jobA/runs/r2.json",
        """{"runId": "r2", "status": "failed", "files": 1, "chunks": 2}""")
      writeFile(root, "jobB/runs/r3.json",
        """{"runId": "r3", "status": "ok", "files": 5, "chunks": 25}""")
      s.read.json(s"$root/*/runs/*.json")
        .groupBy($"status")
        .agg(count(lit(1)).as("n_runs"), sum($"chunks").as("total_chunks"))
        .orderBy($"status")
    }),

    // K1: batched upload — fixed-size batches per source partition
    // (blob_storage_indexer.py:1220-1257; reference default 500, 100 here so
    // several batches materialize at test scale); window is per-key, no
    // global sort.
    "k1_upload_batches" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      load(s, d, "documents")
        .withColumn("batch", floor((row_number().over(w) - 1) / 100))
        .groupBy($"source", $"batch").agg(count(lit(1)).as("n_docs"))
        .orderBy($"source", $"batch")
    }),

    // K2: keyed delete — drop every chunk whose parent is in the delete set,
    // expressed as an anti-join (blob_storage_indexer.py:1259-1328).
    "k2_keyed_delete" -> ((s, d) => {
      import s.implicits._
      val li = load(s, d, "lineitem")
      val parents = load(s, d, "orders")
        .filter($"o_orderstatus" === "F").select($"o_orderkey")
      li.join(parents, li("l_orderkey") === parents("o_orderkey"), "left_anti")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_remaining"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag")
    }),

    // K6: state sink with write-then-read-back verification
    // (sharepoint_indexer.py:1118-1237).
    "k6_state_roundtrip" -> ((s, d) => {
      import s.implicits._
      val out = tmpRoot("graft-k6-state") + "/run_summary"
      val summary = load(s, d, "events").groupBy($"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      summary.write.mode("overwrite").parquet(out)
      val back = s.read.parquet(out)
      summary.as("a").join(back.as("b"), Seq("event_type"))
        .select($"event_type",
          ($"a.n" === $"b.n" && abs($"a.sum_value" - $"b.sum_value") < 1e-9).as("verified"))
        .orderBy($"event_type")
    }),

    // E1/E3: batched deterministic embedder — stable across calls, fixed
    // dim, unit L2 norm (tools/aoai.py:210-264 → HashingEmbedder).
    "e1_embed_invariants" -> ((s, d) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val embedder = new HashingEmbedder(32)
      val embed = udf((t: String) => embedder.embed(t))
      load(s, d, "documents").filter($"n_chars" > 0)
        .withColumn("v1", embed($"text"))
        .withColumn("v2", embed($"text"))
        .select($"doc_id",
          size($"v1").cast("long").as("dim"),
          ($"v1" === $"v2").as("stable"),
          (abs(call_function("l2norm_f32", $"v1") - 1.0) < 1e-4).as("unit_norm"))
        .orderBy($"doc_id")
    }),

    // Multimodal pipeline (builder brief): real PNG media column → ImageIO
    // decode (real dims + exact pixel-luma sum) → frame-sample explode over
    // a byte stream. The PNG pixels follow a closed formula, so decode
    // results and frame counts are both recomputable in SQL.
    "m2_media_pipeline" -> ((s, d) => {
      import s.implicits._
      val synth = udf((id: Long) =>
        graft.pipeline.Multimodal.synthPng((8 + id % 24).toInt, (8 + id * 3 % 24).toInt, id))
      val docs = load(s, d, "documents").filter($"n_chars" > 0)
        .withColumn("media", synth($"doc_id"))
        .withColumn("stream", encode(substring($"text", 1, 200), "UTF-8"))
      val feat = graft.pipeline.Multimodal.withMediaFeatures(docs, "media")
      graft.pipeline.Multimodal.explodeFrames(feat, "stream", frameSize = 16, everyNth = 2)
        .groupBy($"doc_id", $"media_width", $"media_height", $"media_luma")
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy($"doc_id")
    }),

    // M3: real bilinear resize through the codec — constant-gray pages make
    // the resample exactly predictable (interpolating equal values is the
    // identity), so the oracle pins the decoded target dims AND the
    // post-resize pixel-luma sum of the re-encoded PNG arithmetically.
    "m3_media_resize" -> ((s, d) => {
      import s.implicits._
      val mk = udf((id: Long) => graft.pipeline.Multimodal.constPng(
        (16 + id % 32).toInt, (16 + id * 5 % 32).toInt, (id % 256).toInt))
      val docs = load(s, d, "documents").withColumn("media", mk($"doc_id"))
      val resized = graft.pipeline.Multimodal.withResized(docs, "media", 12, 9)
      graft.pipeline.Multimodal.withMediaFeatures(resized, "media_resized")
        .select($"doc_id", $"media_width", $"media_height", $"media_luma")
        .orderBy($"doc_id")
    }),

    // M4: REAL multi-frame decode — animated GIFs (the JDK's multi-frame
    // container) stand in for video: every 2nd stored frame is decoded and
    // its dims + pixel-luma sum emitted. Constant-gray frames survive GIF
    // palette quantization exactly, so the oracle recomputes everything.
    "m4_media_frames" -> ((s, d) => {
      import s.implicits._
      val mk = udf((id: Long) => graft.pipeline.Multimodal.synthGif(
        (10 + id % 6).toInt, 8,
        (0 until (id % 5 + 2).toInt).map(i => ((id * 31 + i * 17) % 256).toInt)))
      val docs = load(s, d, "documents").withColumn("media", mk($"doc_id"))
      graft.pipeline.Multimodal.explodeImageFrames(docs, "media", everyNth = 2)
        .select($"doc_id", $"frame_idx", $"frame_width", $"frame_height", $"frame_luma")
        .orderBy($"doc_id", $"frame_idx")
    }),

    // M5: perceptual-hash image near-dup — the image-side counterpart of
    // d3's SimHash text dedup, sharing its pigeonhole blocking engine. Each
    // doc renders its group's spectral pattern (seed = doc_id % 25) at a
    // doc-specific pixel size, so every cluster mixes NINE different
    // resolutions of the "same" image; DCT pHash over the real ImageIO
    // decode must pull them back together (scale invariance) without ever
    // merging different seeds (~32-bit Hamming apart). The oracle predicts
    // the full clustering arithmetically from the planted group structure.
    "m5_phash_dedup" -> ((s, d) => {
      import s.implicits._
      val mk = udf((id: Long) => graft.pipeline.Multimodal.spectralPng(id % 25,
        (48 + id % 3 * 16).toInt, (48 + (id / 3) % 3 * 16).toInt))
      val ph = udf((b: Array[Byte]) => graft.pipeline.Multimodal.phash64(b))
      val docs = load(s, d, "documents").select($"doc_id")
      // the small parquet arrives as one split; spread the codec-heavy
      // render/hash stage across the cluster before it runs. The rendered
      // PNGs are FIXTURE, not operator input in the wild — memoized +
      // checkpointed so the bench times pHash + near-dup, not synthesis
      val payloads = Fixtures.cached(s, s"m5_png:$d")(
        docs.repartition($"doc_id").withColumn("payload", mk($"doc_id")))
      val sk = payloads.select($"doc_id".as("id"), ph($"payload").as("sh"))
      // low star-expansion cap: resolution-variant groups are mega-clusters
      // of near-identical hashes, where all-pairs edges buy no connectivity
      // the rep star doesn't already give
      val pairs = graft.operators.Dedup.hammingNearDupPairs(sk,
        maxHamming = 3, maxBucketSize = 64)
      val clusters = graft.operators.Dedup.nearDupClusters(sk.select($"id"), pairs)
      docs.select($"doc_id".as("id"))
        .join(clusters, Seq("id"), "left")
        .select($"id", coalesce($"cluster", $"id").as("rep_id"))
        .groupBy($"rep_id").agg(count(lit(1)).as("n_docs"))
        .orderBy($"rep_id")
    }),

    // §2.11 end-to-end: two incremental runs over unchanged input — run 2
    // must process nothing, skip everything, write no chunks and purge no
    // parents, leaving the index byte-identical (idempotent replace, the
    // reference's cost-defining semantic; blob_storage_indexer.py:293-305).
    "p2_incremental_rerun" -> ((s, d) => {
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft-p2").toString
      // a 10 % sample proves the no-op-rerun semantics at 10× less cost;
      // the full-corpus variant runs in IncrementalIndexerSpec
      val docs = load(s, d, "documents").filter($"doc_id" % 10 === 0)
      val r1 = graft.pipeline.IncrementalIndexer.runOnce(
        s, docs, s"$root/index", s"$root/state", "r1")
      val r2 = graft.pipeline.IncrementalIndexer.runOnce(
        s, docs, s"$root/index", s"$root/state", "r2")
      Seq((r1.processed, r2.processed, r2.skippedNoChange, r2.chunksWritten,
        r2.purgedParents, r1.indexSize == r2.indexSize))
        .toDF("r1_processed", "r2_processed", "r2_skipped", "r2_chunks",
          "r2_purged", "idempotent")
    }),

    // §2.12 Generator: chunk_document as a native Catalyst Generator driven
    // from pure SQL (LATERAL VIEW). Invariants (every non-empty doc chunks,
    // every chunk within the token budget) are oracle-checkable.
    "c8_chunk_sql" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      load(s, d, "documents").createOrReplaceTempView("c8_docs")
      s.sql(
        """SELECT doc_id, (count(*) > 0) AS has_chunks,
          |       (max(c.n_tokens) <= 64) AS within_budget
          |FROM c8_docs LATERAL VIEW chunk_document(text, 'txt', 64, 8, 1) c
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    }),

    // §4 TopK: grouped top-k via the bounded-heap aggregator — partial-agg
    // streaming top-k, no per-key sort (vs the window formulation).
    "v7_topk_per_key" -> ((s, d) => {
      import s.implicits._
      val topk = udaf(new graft.functions.TopKByScore(3))
      load(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(topk($"o_orderkey", $"o_totalprice").as("top"))
        .select($"o_custkey", posexplode($"top").as(Seq("r", "p")))
        .select($"o_custkey", ($"r" + 1).cast("int").as("rank"),
          $"p._1".as("o_orderkey"), $"p._2".as("o_totalprice"))
        .orderBy($"o_custkey", $"rank")
    }),

    // C2 = J6 + F8: figure-reference extraction from chunk content, join to
    // the figures dimension, area filter, re-aggregate captions per chunk
    // (multimodal_chunker.py:207-345, 267-274).
    "c2_figure_attach" -> ((s, d) => {
      import s.implicits._
      val figures = Seq((0, "f0", 3.0), (1, "f1", 5.0), (2, "f2", 10.0))
        .toDF("fig_id", "caption", "area_pct")
      load(s, d, "documents")
        .withColumn("content",
          concat(lit("<figure"), $"doc_id" % 3, lit("/> body <figure1/>")))
        .withColumn("ref",
          explode(regexp_extract_all($"content", lit("<figure(\\d+)/>"), lit(1))))
        .withColumn("fig_id", $"ref".cast("int"))
        .join(broadcast(figures), Seq("fig_id"))
        .filter($"area_pct" > 4.0)
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_figs"),
          array_join(sort_array(collect_list($"caption")), ",").as("captions"))
        .orderBy($"doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "s1_binary_scan" ->
      """SELECT * FROM (VALUES
        | ('a.txt', CAST(11 AS BIGINT), 'hello world'),
        | ('b.txt', CAST(5 AS BIGINT), 'spark')) AS t(name, length, text)
        |ORDER BY name""".stripMargin,
    "s7_recursive_walk" ->
      """SELECT CAST(3 AS BIGINT) AS n_files, CAST(9 AS BIGINT) AS total_bytes""",
    "s15_office_tables" ->
      """SELECT * FROM (VALUES
        | ('inventory.docx', CAST(0 AS INTEGER), 'Inventory report'),
        | ('inventory.docx', CAST(1 AS INTEGER), '| item | qty | price |'),
        | ('inventory.docx', CAST(2 AS INTEGER), '| --- | --- | --- |'),
        | ('inventory.docx', CAST(3 AS INTEGER), '| bolts | 12 | 0.30 |'),
        | ('inventory.docx', CAST(4 AS INTEGER), '| nuts & washers | 7 | 0.10 |'),
        | ('inventory.docx', CAST(5 AS INTEGER), 'End of report'),
        | ('metrics.pptx', CAST(0 AS INTEGER), 'Quarterly metrics'),
        | ('metrics.pptx', CAST(1 AS INTEGER), '| quarter | revenue |'),
        | ('metrics.pptx', CAST(2 AS INTEGER), '| --- | --- |'),
        | ('metrics.pptx', CAST(3 AS INTEGER), '| Q1 | 1000 |'),
        | ('metrics.pptx', CAST(4 AS INTEGER), '| Q2 | 1250 |')
        |) AS t(name, line_no, line) ORDER BY name, line_no""".stripMargin,
    "s14_pdf_split" ->
      """SELECT doc_id, CAST(doc_id % 6 + 2 AS INTEGER) AS n_pages,
        | CAST((doc_id % 6 + 4) // 3 AS INTEGER) AS n_parts,
        | CAST(doc_id % 6 + 2 AS INTEGER) AS pages_sum,
        | true AS roundtrip
        |FROM documents ORDER BY doc_id""".stripMargin,
    "s12_log_scan" ->
      """SELECT * FROM (VALUES
        | ('failed', CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
        | ('ok', CAST(2 AS BIGINT), CAST(35 AS BIGINT))) AS t(status, n_runs, total_chunks)
        |ORDER BY status""".stripMargin,
    "k1_upload_batches" ->
      """WITH r AS (
        | SELECT source,
        |  (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1) // 100 AS batch
        | FROM documents)
        |SELECT source, CAST(batch AS BIGINT) AS batch, count(*) AS n_docs
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "k2_keyed_delete" ->
      """SELECT l_returnflag, count(*) AS n_remaining, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "k6_state_roundtrip" ->
      """SELECT event_type, true AS verified FROM
        | (SELECT DISTINCT event_type FROM events) ORDER BY 1""".stripMargin,
    "e1_embed_invariants" ->
      """SELECT doc_id, CAST(32 AS BIGINT) AS dim, true AS stable, true AS unit_norm
        |FROM documents WHERE n_chars > 0 ORDER BY doc_id""".stripMargin,
    "m2_media_pipeline" ->
      """WITH m AS (SELECT doc_id, least(n_chars, 200) AS len,
        |            8 + doc_id % 24 AS w, 8 + (doc_id*3) % 24 AS h
        |           FROM documents WHERE n_chars > 0),
        |l AS (SELECT m.doc_id, sum((m.doc_id*31 + x.x*7 + y.y*13) % 256) AS media_luma
        |      FROM m, LATERAL (SELECT unnest(range(m.w)) AS x) x,
        |              LATERAL (SELECT unnest(range(m.h)) AS y) y
        |      GROUP BY 1)
        |SELECT m.doc_id,
        | CAST(m.w AS INTEGER) AS media_width,
        | CAST(m.h AS INTEGER) AS media_height,
        | CAST(l.media_luma AS BIGINT) AS media_luma,
        | CAST(((m.len + 15) // 16 + 1) // 2 AS BIGINT) AS n_sampled
        |FROM m JOIN l USING (doc_id) ORDER BY m.doc_id""".stripMargin,
    "m4_media_frames" ->
      """WITH f AS (
        | SELECT doc_id, CAST(u.i AS INTEGER) AS frame_idx
        | FROM documents, LATERAL (SELECT unnest(range(doc_id % 5 + 2)) AS i) u
        | WHERE u.i % 2 = 0)
        |SELECT doc_id, frame_idx,
        | CAST(10 + doc_id % 6 AS INTEGER) AS frame_width,
        | CAST(8 AS INTEGER) AS frame_height,
        | CAST((doc_id*31 + frame_idx*17) % 256 * (10 + doc_id % 6) * 8 AS BIGINT)
        |   AS frame_luma
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    // m5's clustering is fully determined by the planted seed groups: the
    // probe margins (in-group Hamming 0, cross-group ≥ 21 on these exact
    // renders) leave τ=3 blocking no way to split or merge a group
    "m5_phash_dedup" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS rep_id, count(*) AS n_docs
        |FROM documents GROUP BY doc_id % 25 ORDER BY 1""".stripMargin,
    "m3_media_resize" ->
      """SELECT doc_id, CAST(12 AS INTEGER) AS media_width,
        | CAST(9 AS INTEGER) AS media_height,
        | CAST(doc_id % 256 * 108 AS BIGINT) AS media_luma
        |FROM documents ORDER BY doc_id""".stripMargin,
    "p2_incremental_rerun" ->
      """SELECT count(*) AS r1_processed, CAST(0 AS BIGINT) AS r2_processed,
        | count(*) AS r2_skipped, CAST(0 AS BIGINT) AS r2_chunks,
        | CAST(0 AS BIGINT) AS r2_purged, true AS idempotent
        |FROM documents WHERE doc_id % 10 = 0""".stripMargin,
    "c8_chunk_sql" ->
      """SELECT doc_id, true AS has_chunks, true AS within_budget
        |FROM documents WHERE n_chars > 0 ORDER BY doc_id""".stripMargin,
    "v7_topk_per_key" ->
      """WITH r AS (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rank
        | FROM orders)
        |SELECT o_custkey, CAST(rank AS INTEGER) AS rank, o_orderkey, o_totalprice
        |FROM r WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin,
    "c2_figure_attach" ->
      """SELECT doc_id,
        | CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END AS BIGINT) AS n_figs,
        | CASE doc_id % 3 WHEN 0 THEN 'f1' WHEN 1 THEN 'f1,f1' ELSE 'f1,f2' END AS captions
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
