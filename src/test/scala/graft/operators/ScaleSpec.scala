package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Skew-salting must be a pure rewrite: identical results to the direct
  * formulation, with the hot key spread over nSalts reducers.
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saltedAggregate matches direct groupBy on a skewed key") {
    import spark.implicits._
    // 90 % of rows share one hot key — the shape salting exists for
    val df = spark.range(0, 10000)
      .select(when($"id" % 10 === 0, $"id" % 7).otherwise(lit(999)).as("k"),
        ($"id" % 100).cast("double").as("v"), $"id")
    val direct = df.groupBy($"k".as("_key"))
      .agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Scale.saltedAggregate(df, $"k", Scale.saltOf(16, $"id"),
      Seq(sum($"v").as("s"), count(lit(1)).as("n")),
      Seq(sum($"s").as("s"), sum($"n").as("n")))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("saltedJoin matches plain join and spreads the hot key") {
    import spark.implicits._
    val facts = spark.range(0, 5000)
      .select(when($"id" % 20 === 0, $"id" % 5).otherwise(lit(3L)).as("k"),
        $"id".as("fact_id"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "hot"), (4L, "e"))
      .toDF("k", "label")
    val plain = facts.join(dim, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Scale.saltedJoin(facts, dim, "k", nSalts = 8, saltSource = $"fact_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    // the hot key's rows really do carry distinct salts
    val saltsUsed = facts.withColumn("_salt", Scale.saltOf(8, $"fact_id"))
      .filter($"k" === 3L).select("_salt").distinct().count()
    assert(saltsUsed > 1)
  }

  test("bucketed tables co-locate the join — no shuffle exchange in the plan") {
    import spark.implicits._
    // warehouse dir is a temp dir set at session creation (TestSpark)
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    docs.select($"doc_id", $"source", $"n_chars").write
      .mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("bkt_docs")
    docs.select($"doc_id", $"lang").write
      .mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("bkt_langs")
    // disable broadcast so the planner actually uses bucket co-location
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_docs").join(spark.table("bkt_langs"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan.take(2000))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle either side:\n${plan.take(2000)}")
      assert(joined.count() == docs.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_docs")
      spark.sql("DROP TABLE IF EXISTS bkt_langs")
    }
  }

  test("bloomSemiJoin is exact: identical rows to the direct semi-join") {
    import spark.implicits._
    val li = graft.Tables.load(spark, TestSpark.sf, "lineitem")
    val keys = graft.Tables.load(spark, TestSpark.sf, "orders")
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey".as("l_orderkey"))
    val viaBloom = Scale.bloomSemiJoin(li, keys, "l_orderkey", expectedKeys = 10000L)
      .select($"l_orderkey", $"l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val direct = li.join(keys, Seq("l_orderkey"), "left_semi")
      .select($"l_orderkey", $"l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(viaBloom == direct)
    assert(viaBloom.nonEmpty)
  }

  test("bloomSemiJoin pre-filter really drops non-members before the join") {
    import spark.implicits._
    // tiny key set against a wide probe range: the bloom stage alone must
    // reject the overwhelming majority (fpp 1% on 100 keys)
    val probe = spark.range(0, 100000).select($"id".cast("long").as("k"))
    val keys = spark.range(0, 100).select(($"id" * 1000).cast("long").as("k"))
    val bf = keys.stat.bloomFilter("k", 100L, 0.01)
    val passed = probe.filter(udf((x: Long) => bf.mightContainLong(x)).apply($"k")).count()
    assert(passed >= 100 && passed < 3000, s"bloom passed $passed of 100000")
    val exact = Scale.bloomSemiJoin(probe, keys, "k", expectedKeys = 100L).count()
    assert(exact == 100L)
  }
}
