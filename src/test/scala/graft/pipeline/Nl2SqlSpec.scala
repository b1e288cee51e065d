package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.TestSpark
import graft.services.HashingEmbedder

class Nl2SqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft-nl2sql")
    def write(sub: String, name: String, body: String): Unit = {
      val d = dir.resolve(sub); Files.createDirectories(d)
      Files.writeString(d.resolve(name), body)
    }
    write("queries", "q1.json",
      """{"datasource": "sales", "question": "total revenue by region last year",
        | "query": "SELECT r, sum(v) FROM f GROUP BY r", "reasoning": "joins fact to dim"}""".stripMargin)
    write("queries", "q2.json",
      """{"datasource": "sales", "question": "top ten customers by orders",
        | "query": "SELECT c, count(*) FROM o GROUP BY c ORDER BY 2 DESC LIMIT 10"}""".stripMargin)
    write("tables", "fact_sale.json",
      """{"table": "fact_sale", "description": "sales fact table with line items",
        | "datasource": "sales",
        | "columns": [{"name": "qty", "description": "quantity"},
        |             {"name": "price", "description": "unit price"}]}""".stripMargin)
    write("measures", "m1.json",
      """{"datasource": "sales", "name": "gross_margin",
        | "description": "revenue minus cost over revenue", "type": "ratio",
        | "source_table": "fact_sale", "data_type": "double"}""".stripMargin)
    dir.toString
  }

  test("S11 scan: three kinds load with ids, kinds and embedding text") {
    import spark.implicits._
    val docs = Nl2Sql.buildDocs(spark, root, new HashingEmbedder(16)).cache()
    assert(docs.count() == 4)
    val byKind = docs.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind == Map("queries" -> 2, "tables" -> 1, "measures" -> 1))
    val q1 = docs.filter($"id" === "queries-q1").head()
    assert(q1.getAs[String]("embedding_text") == "total revenue by region last year")
    assert(q1.getAs[scala.collection.Seq[Float]]("vector").length == 16)
    // nested columns survive in the payload round-trip
    val tbl = docs.filter($"id" === "tables-fact_sale").head()
    assert(tbl.getAs[String]("payload").contains("\"qty\""))
  }

  test("F12 unchanged-skip: only new or modified docs survive") {
    import spark.implicits._
    val docs = Nl2Sql.buildDocs(spark, root, new HashingEmbedder(16))
    val state = docs.withColumn("payload_hash",
      org.apache.spark.sql.functions.md5($"payload"))
      .select("id", "payload_hash")
      // pretend q2 changed since last run
      .withColumn("payload_hash",
        org.apache.spark.sql.functions.when($"id" === "queries-q2",
          org.apache.spark.sql.functions.lit("stale")).otherwise($"payload_hash"))
    val changed = Nl2Sql.changedOnly(docs, state)
    assert(changed.select("id").as[String].collect().toSet == Set("queries-q2"))
  }
}
