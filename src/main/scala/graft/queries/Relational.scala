package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.load

/** Relational operator coverage for SURVEY.md §2 (joins J*, aggregations A*,
  * windows W*, filters F*, set ops §2.7) re-expressed as declarative Spark
  * plans over the driver test tables. Each query has a DuckDB oracle in
  * [[oracles]] with identical column names/types (aggregates aliased, integer
  * sums cast to BIGINT, timestamps emitted as epoch millis, doubles rounded).
  *
  * Scale notes (100 TB posture): every query below is shuffle-minimal —
  * dimension joins are broadcast, aggregations are partial-agg friendly
  * (sum/count/max), windows partition on high-cardinality keys, and no
  * operator collects to the driver. AQE handles skew at the target scale.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // A1/A2-class: TPC-H Q1 pricing summary — partial aggregation, 2 group keys.
    // Reference analog: run-summary counters (jobs/blob_storage_indexer.py:324-338).
    "q01_pricing_summary" -> ((s, d) => {
      import s.implicits._
      load(s, d, "lineitem")
        .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // F1/F10-class: predicate-pushdown filter + single-pass agg (TPC-H Q6 shape).
    "q02_filtered_revenue" -> ((s, d) => {
      import s.implicits._
      load(s, d, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01")) &&
          $"l_shipdate" < to_timestamp(lit("1997-01-01")) &&
          $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"))
    }),

    // J5-class: fact ⋈ broadcast dims (lookup-column resolution,
    // jobs/sharepoint_indexer.py:370-502 → dimension joins). The
    // supplier⋈nation snowflake folds into ONE broadcast dim before the
    // fact join — two broadcast exchanges against the fact instead of
    // three (each is its own job under AQE), and the fact rows carry
    // one join column fewer through the probe side. The fold itself is
    // dim-sized work (nation broadcasts into supplier).
    "j5_dim_join_revenue" -> ((s, d) => {
      import s.implicits._
      val supNation = load(s, d, "supplier")
        .join(broadcast(load(s, d, "nation")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name")
      load(s, d, "lineitem")
        .join(broadcast(load(s, d, "part")), $"l_partkey" === $"p_partkey")
        .join(broadcast(supNation), $"l_suppkey" === $"s_suppkey")
        .groupBy($"n_name", $"p_brand")
        .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"n_name", $"p_brand")
    }),

    // 6-table join with region/date pruning (TPC-H Q5 shape). The whole
    // dim snowflake folds BEFORE the fact chain: region(ASIA)⋈nation
    // (≤25 rows at every SF) prunes 4/5 of nations, and that prunes 4/5
    // of SUPPLIERS in a dim-sized join — so the fact side meets ONE
    // ASIA-only broadcast dim (s_suppkey, s_nationkey, n_name) instead
    // of a full-supplier join followed by a nation filter. Strictly
    // less data through every downstream exchange at any scale, and two
    // fewer broadcast exchanges (each is its own job under AQE). The
    // supplier table is the reference's lookup-dim shape (j5 broadcasts
    // it too); a deployment whose supplier dim outgrows the broadcast
    // threshold drops the hint and AQE picks the shuffle join.
    "q05_regional_revenue" -> ((s, d) => {
      import s.implicits._
      val asiaNations = load(s, d, "nation")
        .join(load(s, d, "region").filter($"r_name" === "ASIA"),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name")
      val asiaSuppliers = load(s, d, "supplier")
        .join(broadcast(asiaNations), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_nationkey", $"n_name")
      load(s, d, "customer")
        .join(load(s, d, "orders"), $"c_custkey" === $"o_custkey")
        .join(load(s, d, "lineitem"), $"o_orderkey" === $"l_orderkey")
        .join(broadcast(asiaSuppliers),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .filter($"o_orderdate" >= to_timestamp(lit("1996-01-01")) &&
          $"o_orderdate" < to_timestamp(lit("1998-01-01")))
        .groupBy($"n_name")
        .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
        .orderBy($"n_name")
    }),

    // J1+F1/F2: change-detection join — incoming rows kept iff strictly newer
    // than per-key state snapshot (jobs/blob_storage_indexer.py:293-302).
    "j1_change_detect" -> ((s, d) => {
      import s.implicits._
      val events = load(s, d, "events")
      val cutoff = to_timestamp(lit("2024-01-15"))
      val state = events.filter($"ts" < cutoff)
        .groupBy($"user_id").agg(max($"ts").as("state_ts"))
      events.join(broadcast(state), Seq("user_id"), "left")
        .filter($"state_ts".isNull || $"ts" > $"state_ts")
        .select($"event_id", $"user_id")
        .orderBy($"event_id")
    }),

    // J2: purge anti-join — keys present in index but absent at source
    // (jobs/blob_storage_indexer.py:1586-1676).
    "j2_purge_anti" -> ((s, d) => {
      import s.implicits._
      load(s, d, "customer")
        .join(load(s, d, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // J7: existence probe as semi join (jobs/nl2sql_indexer.py:405-418).
    "j7_exists_semi" -> ((s, d) => {
      import s.implicits._
      val bigOrders = load(s, d, "orders").filter($"o_totalprice" > 450000.0)
      load(s, d, "customer")
        .join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_mktsegment")
        .orderBy($"c_custkey")
    }),

    // J8/X12: JSON field extraction + aggregation (api/admin.py:258-278;
    // tolerant props parse jobs/blob_storage_indexer.py:1442-1477).
    "j8_json_extract_agg" -> ((s, d) => {
      import s.implicits._
      load(s, d, "events")
        .withColumn("k_mod", (get_json_object($"props", "$.k").cast("int") % 10))
        .groupBy($"k_mod")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
        .orderBy($"k_mod")
    }),

    // A1: state snapshot — max last-modified per parent key
    // (jobs/blob_storage_indexer.py:867-878).
    "a1_state_snapshot" -> ((s, d) => {
      import s.implicits._
      load(s, d, "events")
        .groupBy($"user_id")
        .agg(unix_millis(max($"ts")).as("max_ts_ms"), count(lit(1)).as("n"))
        .orderBy($"user_id")
    }),

    // A2: run-summary counters with conditional counts
    // (jobs/blob_storage_indexer.py:324-338).
    "a2_run_counters" -> ((s, d) => {
      import s.implicits._
      load(s, d, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          count(when($"value" > 50, 1)).as("n_big"),
          round(sum($"value"), 2).as("sum_value"))
        .orderBy($"event_type")
    }),

    // A3: per-kind pivot counters (jobs/nl2sql_indexer.py:120-177) as
    // conditional aggregation over a fixed key set.
    "a3_pivot_lang_counts" -> ((s, d) => {
      import s.implicits._
      val langs = Seq("en", "de", "es", "fr", "zh")
      val aggs = langs.map(l => count(when($"lang" === l, 1)).as(s"n_$l")) :+
        count(lit(1)).as("n_total")
      load(s, d, "documents")
        .groupBy($"source")
        .agg(aggs.head, aggs.tail: _*)
        .orderBy($"source")
    }),

    // A5: order-preserving capped distinct (ACL dedup cap 32,
    // jobs/blob_storage_indexer.py:1479-1508).
    "a5_capped_distinct" -> ((s, d) => {
      import s.implicits._
      load(s, d, "documents")
        .select($"doc_id",
          least(size(array_distinct(split($"text", " "))), lit(32)).cast("long").as("n_capped"))
        .orderBy($"doc_id")
    }),

    // A7: speaker-turn merge — fold consecutive same-key rows
    // (chunking/chunkers/transcription_chunker.py:83-102) through the
    // size-gated TurnMergeOp: the fused graft_turn_merge generator kernel
    // (ONE shuffle + per-group in-memory sort-and-fold replacing the
    // lag → running-sum → re-aggregate plan) below the max-group bound,
    // the spilling declarative window form above it. The gate's cheap
    // tier is the parquet footer row count — zero extra jobs here — so
    // the plan stays the audited aggregate+Generate shape; a planted
    // million-event hot key would take the window path instead of
    // holding the group as JVM objects (TurnMergeOpSpec pins both path
    // equality and the choice). The oracle below is the declarative spec.
    "a7_turn_merge" -> ((s, d) => {
      import s.implicits._
      graft.operators.TurnMergeOp.merge(load(s, d, "events"),
          "user_id", "ts", "event_id", "event_type", "value",
          totalRowsHint = graft.Tables.parquetRowCount(s, s"$d/events.parquet"))
        .select($"user_id", $"run_id", $"event_type", $"n_events",
          round($"sum_value", 2).as("sum_value"))
        .orderBy($"user_id", $"run_id")
    }),

    // W1: chunk-id sequencing (chunking/chunkers/doc_analysis_chunker.py:300-316).
    "w1_chunk_sequence" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"l_orderkey").orderBy($"l_linenumber")
      load(s, d, "lineitem")
        .filter($"l_orderkey" % 100 === 0)
        .withColumn("rn", row_number().over(w))
        .select($"l_orderkey", $"l_linenumber", $"rn")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // W2: carry-forward page marker — last non-null over unbounded-preceding
    // frame (doc_analysis_chunker.py:406-446).
    "w2_page_carry" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      load(s, d, "events")
        .withColumn("marker", when($"event_type" === "view", $"value"))
        .withColumn("page", coalesce(last($"marker", ignoreNulls = true).over(w), lit(-1.0)))
        .select($"event_id", $"user_id", $"page")
        .orderBy($"event_id")
    }),

    // W3: running char offset — cumulative sum over preceding rows
    // (chunking/chunkers/multimodal_chunker.py:188-205).
    "w3_running_offset" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      load(s, d, "documents")
        .withColumn("chunk_offset", coalesce(sum($"n_chars").over(w), lit(0L)))
        .select($"doc_id", $"source", $"chunk_offset")
        .orderBy($"doc_id")
    }),

    // W5: keep-latest-N GC — rank desc, delete the tail (api/admin.py:202-237).
    "w5_keep_latest_n" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      load(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" > 5)
        .groupBy($"user_id").agg(count(lit(1)).as("n_to_delete"))
        .orderBy($"user_id")
    }),

    // W7: top-k retrieval (tools/aisearch.py:162-212) — TakeOrderedAndProject,
    // no full sort at scale.
    "w7_topk_orders" -> ((s, d) => {
      import s.implicits._
      load(s, d, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .select($"o_orderkey", $"o_totalprice")
        .limit(10)
    }),

    // §2.7 set ops: EXCEPT DISTINCT (purge membership difference,
    // jobs/blob_storage_indexer.py:1671).
    "set1_except_users" -> ((s, d) => {
      import s.implicits._
      val ev = load(s, d, "events")
      ev.filter($"event_type" === "click").select($"user_id")
        .except(ev.filter($"event_type" === "purchase").select($"user_id"))
        .orderBy($"user_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q02_filtered_revenue" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        | AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "j5_dim_join_revenue" ->
      """SELECT n_name, p_brand,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey=p_partkey
        | JOIN supplier ON l_suppkey=s_suppkey JOIN nation ON s_nationkey=n_nationkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q05_regional_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer JOIN orders ON c_custkey=o_custkey
        | JOIN lineitem ON o_orderkey=l_orderkey
        | JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
        | JOIN nation ON s_nationkey=n_nationkey
        | JOIN region ON n_regionkey=r_regionkey
        |WHERE r_name='ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
        | AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j1_change_detect" ->
      """WITH state AS (
        | SELECT user_id, max(ts) AS state_ts FROM events
        | WHERE ts < TIMESTAMP '2024-01-15' GROUP BY 1)
        |SELECT e.event_id, e.user_id FROM events e
        |LEFT JOIN state s ON e.user_id = s.user_id
        |WHERE s.state_ts IS NULL OR e.ts > s.state_ts
        |ORDER BY e.event_id""".stripMargin,
    "j2_purge_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "j7_exists_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,
    "j8_json_extract_agg" ->
      """SELECT CAST(json_extract_string(props,'$.k') AS INTEGER) % 10 AS k_mod,
        | count(*) AS n, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a1_state_snapshot" ->
      """SELECT user_id, epoch_ms(max(ts)) AS max_ts_ms, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a2_run_counters" ->
      """SELECT event_type, count(*) AS n,
        | count(CASE WHEN value > 50 THEN 1 END) AS n_big,
        | round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a3_pivot_lang_counts" ->
      """SELECT source,
        | count(CASE WHEN lang='en' THEN 1 END) AS n_en,
        | count(CASE WHEN lang='de' THEN 1 END) AS n_de,
        | count(CASE WHEN lang='es' THEN 1 END) AS n_es,
        | count(CASE WHEN lang='fr' THEN 1 END) AS n_fr,
        | count(CASE WHEN lang='zh' THEN 1 END) AS n_zh,
        | count(*) AS n_total
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "a5_capped_distinct" ->
      """SELECT doc_id, least(len(list_distinct(string_split(text,' '))), 32) AS n_capped
        |FROM documents ORDER BY doc_id""".stripMargin,
    "a7_turn_merge" ->
      """WITH r AS (
        | SELECT user_id, event_id, ts, event_type, value,
        |  CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |       IS NOT DISTINCT FROM event_type THEN 0 ELSE 1 END AS chg
        | FROM events),
        |s AS (
        | SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id FROM r)
        |SELECT user_id, run_id, event_type, count(*) AS n_events,
        | round(sum(value),2) AS sum_value
        |FROM s GROUP BY 1,2,3 ORDER BY user_id, run_id""".stripMargin,
    "w1_chunk_sequence" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS INTEGER) AS rn
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "w2_page_carry" ->
      """SELECT event_id, user_id,
        | coalesce(last_value(CASE WHEN event_type='view' THEN value END IGNORE NULLS)
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0) AS page
        |FROM events ORDER BY event_id""".stripMargin,
    "w3_running_offset" ->
      """SELECT doc_id, source,
        | CAST(coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS chunk_offset
        |FROM documents ORDER BY doc_id""".stripMargin,
    "w5_keep_latest_n" ->
      """WITH r AS (
        | SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events)
        |SELECT user_id, count(*) AS n_to_delete FROM r WHERE rn > 5
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "w7_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "set1_except_users" ->
      """SELECT user_id FROM events WHERE event_type='click'
        |EXCEPT SELECT user_id FROM events WHERE event_type='purchase'
        |ORDER BY user_id""".stripMargin
  )
}
