package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.core.{PageAttribution, SplitParams, TextSplitters}
import graft.functions.Aggregators
import graft.pipeline.{Multimodal, Spreadsheet}

/** Domain operators wave 3: the custom DSv2 paged source (S4/F10), the
  * spreadsheet row chunker (C3/X10), figure geometry (X13/F8), the A5
  * ordered-capped-distinct Aggregator, multimodal feature plumbing (C2),
  * and W2 page attribution.
  */
object DomainQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // S4/S5/F10: paged-API DSv2 source; site filter + column prune push into
    // the scan, one partition per page. Deterministic synthetic service.
    "s4_paged_pushdown" -> ((s, _) => {
      import s.implicits._
      s.read.format("graft.sources.PagedItemsSource")
        .option("pages", 8).option("pageSize", 250).load()
        .filter($"site" === "site3" && $"modified_ms" > 1701000000000L)
        .groupBy($"site")
        .agg(count(lit(1)).as("n"), sum($"size_bytes").as("total_bytes"))
        .orderBy($"site")
    }),

    // C3/X10: compact per-row embedding text over lineitem-as-spreadsheet.
    "c3_row_chunks" -> ((s, d) => {
      import s.implicits._
      load(s, d, "lineitem")
        .filter($"l_orderkey" % 50 === 0)
        .withColumn("row_text", concat(
          lit("file=lineitem sheet="), $"l_returnflag",
          lit(" row="), $"l_orderkey" * 10 + $"l_linenumber",
          lit(" cols=okey|lnum|qty vals="),
          $"l_orderkey", lit("|"), $"l_linenumber", lit("|"), $"l_quantity".cast("int")))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_rows"), sum(length($"row_text")).as("total_chars"))
        .orderBy($"l_returnflag")
    }),

    // X13/F8: shoelace polygon area — validated against the rectangle
    // closed form in the oracle; keeps figures covering > 4% of the page.
    "x13_figure_area" -> ((s, d) => {
      import s.implicits._
      val areaPct = udf((p: Seq[Double], w: Double, h: Double) =>
        Multimodal.figureAreaPct(p, w, h))
      load(s, d, "documents")
        .withColumn("x0", ($"doc_id" % 10).cast("double"))
        .withColumn("y0", ($"doc_id" % 7).cast("double"))
        .withColumn("w", ($"doc_id" % 5 + 1).cast("double"))
        .withColumn("h", ($"doc_id" % 3 + 1).cast("double"))
        .withColumn("polygon", array($"x0", $"y0", $"x0" + $"w", $"y0",
          $"x0" + $"w", $"y0" + $"h", $"x0", $"y0" + $"h"))
        .withColumn("area_pct", round(areaPct($"polygon", lit(20.0), lit(20.0)), 6))
        .filter($"area_pct" > 1.0)
        .select($"doc_id", $"area_pct")
        .orderBy($"doc_id")
    }),

    // A5 as a typed Aggregator: first-occurrence-ordered distinct tokens per
    // source, capped at 32 (deterministic via min-position semantics).
    "a5b_ordered_capped" -> ((s, d) => {
      import s.implicits._
      val agg = new Aggregators.OrderedCappedDistinct(32).toColumn
      load(s, d, "documents")
        .select($"source", $"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
        .select($"source", struct(($"doc_id" * 100000 + $"pos" + 1).as("pos"), $"w".as("value")).as("pv"))
        .as[(String, Aggregators.PosVal)]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(agg.name("toks"))
        .toDF("source", "toks")
        .select($"source", array_join($"toks", ",").as("first_tokens"),
          size($"toks").cast("long").as("n"))
        .orderBy($"source")
    }),

    // C2: multimodal binary columns → REAL PNG decode (javax.imageio) →
    // pixel features → polygon bbox crop re-encoded as PNG (the K5 figure
    // payload), per-source. Pages are deterministic synthetic PNGs whose
    // pixel values follow a closed formula, so the oracle recomputes the
    // decoded dims, the exact page/crop pixel-luma sums (pinning both
    // decode round-trips), and the crop geometry — entirely in SQL.
    "m1_multimodal_features" -> ((s, d) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val synth = udf((id: Long) =>
        Multimodal.synthPng((8 + id % 24).toInt, (8 + id * 3 % 24).toInt, id))
      val lumaOf = udf((b: Array[Byte]) => Multimodal.lumaSum(b))
      val bin = load(s, d, "documents")
        .withColumn("payload", synth($"doc_id"))
        .withColumn("x0", ($"doc_id" % 10).cast("double"))
        .withColumn("y0", ($"doc_id" % 7).cast("double"))
        .withColumn("polygon", array($"x0", $"y0",
          $"x0" + ($"doc_id" % 5 + 1), $"y0",
          $"x0" + ($"doc_id" % 5 + 1), $"y0" + ($"doc_id" % 3 + 1),
          $"x0", $"y0" + ($"doc_id" % 3 + 1)))
        .withColumn("page_width", lit(20.0)).withColumn("page_height", lit(20.0))
      val feat = Multimodal.withFigureCrops(
        Multimodal.withMediaFeatures(bin, "payload"), "payload")
      feat.groupBy($"source")
        .agg(count(lit(1)).as("n"),
          round(avg(graft.functions.GraftFunctions.l2norm_f32($"media_features")), 2).as("avg_feat_norm"),
          sum($"media_width").as("total_width"),
          sum($"media_luma").as("page_luma"),
          sum($"crop_width" * $"crop_height").as("total_crop_px"),
          sum(lumaOf($"figure_bytes")).as("crop_luma"))
        .orderBy($"source")
    }),

    // W2: marker numbering + <50% page attribution over synthesized paged
    // markdown (deterministic; exercised exactly in unit tests too).
    "w2_marker_pages" -> ((s, _) => {
      import s.implicits._
      val mk = udf((docId: Long) => {
        val pages = (1 to (docId % 4 + 2).toInt).map(p => s"page $p content " * (docId % 7 + 3).toInt)
        val raw = pages.mkString(PageAttribution.RawMarker)
        val (numbered, _) = PageAttribution.numberMarkers(raw)
        val chunks = TextSplitters.recursiveSplit(numbered,
          SplitParams(maxTokens = 24, overlapTokens = 0, minChunkTokens = 1))
        val attributed = PageAttribution.attributePages(chunks)
        chunks.zip(attributed).map { case (c, p) => s"$p:${c.length}" }
      })
      s.range(0, 200).select($"id".as("doc_id"), explode(mk($"id")).as("page_len"))
        .groupBy($"page_len").agg(count(lit(1)).as("n"))
        .orderBy($"page_len")
    })
  )

  val oracles: Map[String, String] = Map(
    // m1 pins the REAL ImageIO decode round-trip: pages are synthetic PNGs
    // with pixel (x,y) = (doc_id*31 + 7x + 13y) mod 256, so the decoded
    // dims, the exact page/crop luma sums, and the bbox geometry are all
    // recomputable arithmetically — if decode, getSubimage, or the PNG
    // re-encode corrupted a single pixel, the luma sums would diverge.
    "m1_multimodal_features" ->
      """WITH d AS (
        | SELECT doc_id, source,
        |  8 + doc_id % 24 AS w, 8 + (doc_id*3) % 24 AS h,
        |  CAST(doc_id % 10 AS DOUBLE) AS x0, CAST(doc_id % 7 AS DOUBLE) AS y0,
        |  CAST(doc_id % 5 + 1 AS DOUBLE) AS dx, CAST(doc_id % 3 + 1 AS DOUBLE) AS dy
        | FROM documents),
        |b AS (
        | SELECT doc_id, source, w, h,
        |  CAST(round(x0/20*w) AS BIGINT) AS px0, CAST(round((x0+dx)/20*w) AS BIGINT) AS px1,
        |  CAST(round(y0/20*h) AS BIGINT) AS py0, CAST(round((y0+dy)/20*h) AS BIGINT) AS py1
        | FROM d),
        |pg AS (
        | SELECT b.doc_id, sum((b.doc_id*31 + x.x*7 + y.y*13) % 256) AS page_luma
        | FROM b, LATERAL (SELECT unnest(range(b.w)) AS x) x,
        |         LATERAL (SELECT unnest(range(b.h)) AS y) y
        | GROUP BY 1),
        |cr AS (
        | SELECT b.doc_id,
        |  CASE WHEN px1 > px0 AND py1 > py0 THEN (px1-px0)*(py1-py0) ELSE 0 END AS crop_px,
        |  coalesce(cl.s, 0) AS crop_luma
        | FROM b LEFT JOIN LATERAL (
        |   SELECT sum((b.doc_id*31 + x.x*7 + y.y*13) % 256) AS s
        |   FROM (SELECT unnest(range(b.px0, b.px1)) AS x) x,
        |        (SELECT unnest(range(b.py0, b.py1)) AS y) y) cl ON true)
        |SELECT b.source, count(*) AS n, CAST(1.0 AS DOUBLE) AS avg_feat_norm,
        | CAST(sum(b.w) AS BIGINT) AS total_width,
        | CAST(sum(pg.page_luma) AS BIGINT) AS page_luma,
        | CAST(sum(cr.crop_px) AS BIGINT) AS total_crop_px,
        | CAST(sum(cr.crop_luma) AS BIGINT) AS crop_luma
        |FROM b JOIN pg USING (doc_id) JOIN cr USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the paged service is a deterministic generator — expected values are
    // constants for pages=8 x pageSize=250 with the pushed filters
    "s4_paged_pushdown" ->
      """SELECT 'site3' AS site, CAST(243 AS BIGINT) AS n,
        | CAST(119940830 AS BIGINT) AS total_bytes""".stripMargin,
    // w2 is sf-independent and fully deterministic, so the expected
    // page:length histogram is a snapshot constant — it pins the splitter +
    // <50%-rule attribution behavior (SURVEY §7.4's hardest fidelity item)
    // into the correctness gate. If the splitter intentionally changes,
    // regenerate via scripts/local_verify.py before committing.
    "w2_marker_pages" ->
      """SELECT * FROM (VALUES
        | ('1:105', CAST(28 AS BIGINT)), ('1:110', CAST(29 AS BIGINT)),
        | ('1:120', CAST(56 AS BIGINT)), ('1:78', CAST(29 AS BIGINT)),
        | ('1:93', CAST(29 AS BIGINT)), ('1:95', CAST(29 AS BIGINT)),
        | ('1:98', CAST(73 AS BIGINT)), ('2:108', CAST(21 AS BIGINT)),
        | ('2:15', CAST(8 AS BIGINT)), ('2:30', CAST(14 AS BIGINT)),
        | ('2:45', CAST(14 AS BIGINT)), ('2:75', CAST(7 AS BIGINT)),
        | ('2:95', CAST(21 AS BIGINT)), ('2:98', CAST(113 AS BIGINT)),
        | ('3:108', CAST(14 AS BIGINT)), ('3:110', CAST(14 AS BIGINT)),
        | ('3:15', CAST(14 AS BIGINT)), ('3:30', CAST(8 AS BIGINT)),
        | ('3:60', CAST(7 AS BIGINT)), ('3:83', CAST(21 AS BIGINT)),
        | ('3:90', CAST(7 AS BIGINT)), ('3:98', CAST(100 AS BIGINT)),
        | ('4:108', CAST(14 AS BIGINT)), ('4:110', CAST(14 AS BIGINT)),
        | ('4:15', CAST(7 AS BIGINT)), ('4:30', CAST(14 AS BIGINT)),
        | ('4:48', CAST(7 AS BIGINT)), ('4:68', CAST(7 AS BIGINT)),
        | ('4:88', CAST(7 AS BIGINT)), ('4:90', CAST(14 AS BIGINT)),
        | ('4:98', CAST(43 AS BIGINT)), ('5:45', CAST(8 AS BIGINT)),
        | ('5:60', CAST(7 AS BIGINT)), ('5:98', CAST(22 AS BIGINT))
        |) AS t(page_len, n) ORDER BY page_len""".stripMargin,
    "c3_row_chunks" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        | CAST(sum(length('file=lineitem sheet=' || l_returnflag ||
        |   ' row=' || (l_orderkey*10 + l_linenumber) ||
        |   ' cols=okey|lnum|qty vals=' || l_orderkey || '|' || l_linenumber || '|' ||
        |   CAST(l_quantity AS INTEGER))) AS BIGINT) AS total_chars
        |FROM lineitem WHERE l_orderkey % 50 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x13_figure_area" ->
      """SELECT doc_id,
        | round(((doc_id % 5 + 1) * (doc_id % 3 + 1)) / 400.0 * 100.0, 6) AS area_pct
        |FROM documents
        |WHERE ((doc_id % 5 + 1) * (doc_id % 3 + 1)) / 400.0 * 100.0 > 1.0
        |ORDER BY doc_id""".stripMargin,
    "a5b_ordered_capped" ->
      """WITH toks AS (
        | SELECT source, doc_id,
        |   unnest(string_split(text,' ')) AS w,
        |   generate_subscripts(string_split(text,' '), 1) AS i
        | FROM documents),
        |pos AS (
        | SELECT source, w, min(doc_id * 100000 + i) AS mp FROM toks GROUP BY 1, 2),
        |ranked AS (
        | SELECT source, w, mp,
        |   row_number() OVER (PARTITION BY source ORDER BY mp, w) AS rn
        | FROM pos)
        |SELECT source,
        | string_agg(w, ',' ORDER BY mp, w) AS first_tokens,
        | count(*) AS n
        |FROM ranked WHERE rn <= 32
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
