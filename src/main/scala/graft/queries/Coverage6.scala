package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.operators.{AsOfJoin, Quality}

/** Coverage wave 6 — corpus-hygiene operators for training-data pipelines
  * (Gopher-style repetition metrics, C4-style PII scrubbing, Lee-et-al
  * exact-span dedup, benchmark decontamination) and the as-of join.
  * Every query carries an exact DuckDB oracle; the fractions are kept as
  * integer counters so no comparison ever hinges on float rounding.
  */
object Coverage6 {
  type Q = (SparkSession, String) => DataFrame

  private val SpanK = 10   // d9: non-overlapping shingle width (words)
  private val DecontamK = 8 // dc1: overlapping n-gram width (words)

  val queries: Map[String, Q] = Map(
    // T6: Gopher-style repetition counters. Per-doc metrics are pure array
    // expressions (zero shuffle); the top-word mode is the one genuinely
    // aggregating piece ((id, word) groupBy with map-side combine).
    "t6_repetition_metrics" -> ((s, d) => {
      import s.implicits._
      val docs = load(s, d, "documents")
      val base = Quality.withRepetitionMetrics(docs, "text")
      base.join(Quality.topWordCounts(docs, "doc_id", "text"), Seq("doc_id"), "left")
        .select($"doc_id", $"n_words", $"n_distinct_words",
          $"n_bigrams", $"n_distinct_bigrams",
          coalesce($"top_word_count", lit(0L)).as("top_word_count"),
          $"is_repetitive")
        .orderBy($"doc_id")
    }),

    // T7: PII counting + masking over text with deterministically injected
    // PII-shaped spans (the synthetic corpus contains none). Counts come
    // from regexp_count, masking from chained global regexp_replace — all
    // codegen'd builtins, no shuffle beyond the scan.
    "t7_pii_redact" -> ((s, d) => {
      import s.implicits._
      val withPii = load(s, d, "documents")
        .withColumn("text2", concat($"text",
          lit(" contact user"), $"doc_id", lit("@example.com or +1-555-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
          lit(" at 10."), ($"doc_id" % 250).cast("string"), lit(".0.1")))
      Quality.withPiiRedaction(withPii, "text2")
        .select($"doc_id", $"n_emails", $"n_phones", $"n_ips",
          length($"redacted").cast("long").as("redacted_len"),
          expr("right(redacted, 40)").as("redacted_tail"))
        .orderBy($"doc_id")
    }),

    // D9: corpus-level duplicated-span counters (exact-substring dedup in
    // shingle form): one shuffle on the shingle with map-side combine, one
    // join back — never an all-pairs surface.
    "d9_dup_spans" -> ((s, d) => {
      import s.implicits._
      Quality.dupSpanCounts(load(s, d, "documents"), "doc_id", "text", SpanK)
        .withColumn("has_dup_span", $"n_dup_shingles" > 0)
        .orderBy($"doc_id")
    }),

    // DC1: benchmark decontamination. Benchmark slice = doc_id % 97 == 0;
    // contamination is injected into every 10th corpus doc by appending a
    // 12-word span of benchmark doc 0, so the gate exercises real hits.
    // The benchmark gram set is broadcast — the corpus side never shuffles.
    "dc1_decontam" -> ((s, d) => {
      import s.implicits._
      val docs = load(s, d, "documents")
      val bench = docs.filter($"doc_id" % 97 === 0)
      val snip = bench.filter($"doc_id" === 0)
        .select(concat_ws(" ", slice(split(trim($"text"), " +"), 1, 12)).as("snip"))
      val corpus = docs.filter($"doc_id" % 97 =!= 0)
        .crossJoin(broadcast(snip))
        .withColumn("text", when($"doc_id" % 10 === 0,
          concat($"text", lit(" "), $"snip")).otherwise($"text"))
        .select($"doc_id", $"text")
      Quality.contaminationCounts(corpus, bench, "doc_id", "text", DecontamK)
        .orderBy($"doc_id")
    }),

    // DC2: benchmark decontamination as a TRANSFORM — dc1's counters tell
    // you WHICH docs leak; this cuts the leaked spans out. Same corpus
    // construction as dc1 (bench = every 97th doc, its 12-word lead snippet
    // appended to every 10th corpus doc), so the injected passage must come
    // back out as one merged hole. Broadcast bench-gram probe: the corpus
    // side never shuffles; only matched windows reach the island merge.
    "dc2_decontam_spans" -> ((s, d) => {
      import s.implicits._
      val docs = load(s, d, "documents")
      val bench = docs.filter($"doc_id" % 97 === 0)
      val snip = bench.filter($"doc_id" === 0)
        .select(concat_ws(" ", slice(split(trim($"text"), " +"), 1, 12)).as("snip"))
      val corpus = docs.filter($"doc_id" % 97 =!= 0)
        .crossJoin(broadcast(snip))
        .withColumn("text", when($"doc_id" % 10 === 0,
          concat($"text", lit(" "), $"snip")).otherwise($"text"))
        .select($"doc_id", $"text")
      Quality.removeContaminatedSpans(corpus, bench, "doc_id", "text", DecontamK)
        .withColumnRenamed("id", "doc_id")
        .orderBy($"doc_id")
    }),

    // AJ1: as-of (point-in-time) join — every 20th event is a "reference
    // update"; each remaining event attaches the latest reference at-or-
    // before its timestamp for the same user. Single-window merge: ONE
    // shuffle on the key, no range explosion (vs the naive join+filter+max
    // which is |events| x |refs-per-user|).
    "aj1_asof_join" -> ((s, d) => {
      import s.implicits._
      val events = load(s, d, "events")
      val refs = events.filter($"event_id" % 20 === 0)
        .select($"user_id", $"ts".as("rts"),
          $"event_id".as("ref_event"), $"value".as("ref_value"))
      val probes = events.filter($"event_id" % 20 =!= 0)
        .select($"event_id", $"user_id", $"ts")
      AsOfJoin.asOf(probes, refs, key = "user_id",
          leftTime = "ts", rightTime = "rts",
          payload = Seq("ref_event", "ref_value"),
          rightOrder = Some("ref_event"))
        // null-free gate output: the driver's hash compare (and pandas'
        // NaN semantics) make null vs null risky across engines
        .select($"event_id", $"user_id",
          coalesce($"ref_event", lit(-1L)).as("ref_event"),
          coalesce($"ref_value", lit(-1.0)).as("ref_value"))
        .orderBy($"event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "t6_repetition_metrics" ->
      """WITH w AS (
        | SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> len(x) > 0) AS ws
        | FROM documents),
        |base AS (
        | SELECT doc_id, ws,
        |  list_transform(generate_series(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1]) AS bg
        | FROM w),
        |tw AS (
        | SELECT doc_id, max(c) AS top_word_count FROM (
        |   SELECT doc_id, wd, count(*) AS c
        |   FROM (SELECT doc_id, unnest(ws) AS wd FROM w) GROUP BY 1, 2)
        | GROUP BY 1)
        |SELECT b.doc_id,
        | CAST(len(b.ws) AS BIGINT) AS n_words,
        | CAST(len(list_distinct(b.ws)) AS BIGINT) AS n_distinct_words,
        | CAST(len(b.bg) AS BIGINT) AS n_bigrams,
        | CAST(len(list_distinct(b.bg)) AS BIGINT) AS n_distinct_bigrams,
        | CAST(coalesce(tw.top_word_count, 0) AS BIGINT) AS top_word_count,
        | (len(list_distinct(b.ws))*2 < len(b.ws)
        |  OR len(list_distinct(b.bg))*5 < len(b.bg)*2) AS is_repetitive
        |FROM base b LEFT JOIN tw USING (doc_id) ORDER BY b.doc_id""".stripMargin,
    "t7_pii_redact" ->
      """WITH t AS (
        | SELECT doc_id,
        |  text || ' contact user' || doc_id || '@example.com or +1-555-' ||
        |  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |  ' at 10.' || CAST(doc_id % 250 AS VARCHAR) || '.0.1' AS text2
        | FROM documents),
        |m AS (
        | SELECT doc_id,
        |  len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text2, '\+1-[0-9]{3}-[0-9]{4}')) AS n_phones,
        |  len(regexp_extract_all(text2, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(text2,
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
        | FROM t)
        |SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
        | CAST(n_phones AS BIGINT) AS n_phones, CAST(n_ips AS BIGINT) AS n_ips,
        | CAST(length(redacted) AS BIGINT) AS redacted_len,
        | right(redacted, 40) AS redacted_tail
        |FROM m ORDER BY doc_id""".stripMargin,
    "d9_dup_spans" ->
      s"""WITH w AS (
         | SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> len(x) > 0) AS ws
         | FROM documents),
         |sh AS (
         | SELECT doc_id,
         |  unnest(list_transform(generate_series(0, len(ws)//$SpanK - 1),
         |    i -> array_to_string(list_slice(ws, i*$SpanK+1, i*$SpanK+$SpanK), ' '))) AS shingle
         | FROM w WHERE len(ws) >= $SpanK),
         |own AS (SELECT shingle, min(doc_id) AS owner FROM sh GROUP BY 1)
         |SELECT sh.doc_id, count(*) AS n_shingles,
         | count(CASE WHEN own.owner < sh.doc_id THEN 1 END) AS n_dup_shingles,
         | (count(CASE WHEN own.owner < sh.doc_id THEN 1 END) > 0) AS has_dup_span
         |FROM sh JOIN own USING (shingle) GROUP BY 1 ORDER BY 1""".stripMargin,
    "dc1_decontam" ->
      s"""WITH w0 AS (
         | SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> len(x) > 0) AS ws
         | FROM documents),
         |snip AS (
         | SELECT array_to_string(list_slice(ws, 1, 12), ' ') AS s FROM w0 WHERE doc_id = 0),
         |corpus AS (
         | SELECT doc_id, CASE WHEN doc_id % 10 = 0
         |   THEN text || ' ' || (SELECT s FROM snip) ELSE text END AS text
         | FROM documents WHERE doc_id % 97 <> 0),
         |cw AS (
         | SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> len(x) > 0) AS ws
         | FROM corpus),
         |bg AS (
         | SELECT DISTINCT unnest(list_transform(generate_series(0, len(ws)-$DecontamK),
         |   i -> array_to_string(list_slice(ws, i+1, i+$DecontamK), ' '))) AS gram
         | FROM w0 WHERE doc_id % 97 = 0 AND len(ws) >= $DecontamK),
         |cg AS (
         | SELECT doc_id, unnest(list_transform(generate_series(0, len(ws)-$DecontamK),
         |   i -> array_to_string(list_slice(ws, i+1, i+$DecontamK), ' '))) AS gram
         | FROM cw WHERE len(ws) >= $DecontamK),
         |hits AS (
         | SELECT doc_id, count(*) AS n FROM cg
         | WHERE gram IN (SELECT gram FROM bg) GROUP BY 1)
         |SELECT c.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated,
         | (coalesce(h.n, 0) > 0) AS is_contaminated
         |FROM corpus c LEFT JOIN hits h USING (doc_id) ORDER BY c.doc_id""".stripMargin,
    "dc2_decontam_spans" ->
      s"""WITH w0 AS (
         | SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> len(x) > 0) AS ws
         | FROM documents),
         |snip AS (
         | SELECT array_to_string(list_slice(ws, 1, 12), ' ') AS s FROM w0 WHERE doc_id = 0),
         |corpus AS (
         | SELECT doc_id, CASE WHEN doc_id % 10 = 0
         |   THEN text || ' ' || (SELECT s FROM snip) ELSE text END AS text
         | FROM documents WHERE doc_id % 97 <> 0),
         |cw AS (
         | SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> len(x) > 0) AS toks
         | FROM corpus),
         |bg AS (
         | SELECT DISTINCT unnest(list_transform(generate_series(0, len(ws)-$DecontamK),
         |   i -> array_to_string(list_slice(ws, i+1, i+$DecontamK), ' '))) AS gram
         | FROM w0 WHERE doc_id % 97 = 0 AND len(ws) >= $DecontamK),
         |cov AS (
         | SELECT doc_id, u.p AS s, u.p + $DecontamK - 1 AS e
         | FROM cw JOIN (SELECT unnest(range(512)) AS p) u
         |   ON u.p + $DecontamK <= len(cw.toks)
         | WHERE array_to_string(cw.toks[u.p+1 : u.p+$DecontamK], ' ')
         |       IN (SELECT gram FROM bg)),
         |isl AS (
         | SELECT doc_id, s, e,
         |  sum(CASE WHEN pm IS NULL OR s > pm + 1 THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY doc_id ORDER BY s
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
         | FROM (SELECT doc_id, s, e,
         |         max(e) OVER (PARTITION BY doc_id ORDER BY s
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         |       FROM cov)),
         |spans AS (SELECT doc_id, g, min(s) AS ss, max(e) AS se FROM isl GROUP BY 1, 2),
         |tok AS (
         | SELECT cw.doc_id, u.i AS i, cw.toks[u.i+1] AS t
         | FROM cw JOIN (SELECT unnest(range(512)) AS i) u ON u.i < len(cw.toks)),
         |keptt AS (
         | SELECT t.doc_id, t.i, t.t FROM tok t
         | WHERE NOT EXISTS (SELECT 1 FROM spans sp
         |   WHERE sp.doc_id = t.doc_id AND t.i BETWEEN sp.ss AND sp.se)),
         |agg AS (SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS text_clean
         |        FROM keptt GROUP BY 1),
         |sp2 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |         CAST(sum(se - ss + 1) AS BIGINT) AS toks_removed
         |        FROM spans GROUP BY 1)
         |SELECT c.doc_id, coalesce(sp2.n_spans, 0) AS n_spans,
         | coalesce(sp2.toks_removed, 0) AS toks_removed,
         | coalesce(agg.text_clean, '') AS text_clean
         |FROM corpus c LEFT JOIN sp2 USING (doc_id) LEFT JOIN agg USING (doc_id)
         |ORDER BY c.doc_id""".stripMargin,
    "aj1_asof_join" ->
      """WITH r AS (
        | SELECT user_id, ts AS rts, event_id AS ref_event, value AS ref_value
        | FROM events WHERE event_id % 20 = 0
        | QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
        |l AS (SELECT event_id, user_id, ts FROM events WHERE event_id % 20 <> 0)
        |SELECT l.event_id, l.user_id,
        | coalesce(r.ref_event, -1) AS ref_event,
        | coalesce(r.ref_value, -1.0) AS ref_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.rts
        |ORDER BY l.event_id""".stripMargin
  )
}
