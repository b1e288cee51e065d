package graft.core

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

class JsonPartitionerSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  /** Flatten all scalar leaves with their paths (array indices erased so
    * re-grouping across parts compares as a multiset).
    */
  private def leaves(json: String): Seq[String] = {
    def walk(n: com.fasterxml.jackson.databind.JsonNode, path: String): Seq[String] =
      if (n.isObject) n.properties().asScala.toSeq.flatMap(e => walk(e.getValue, path + "." + e.getKey))
      else if (n.isArray) n.elements().asScala.toSeq.flatMap(e => walk(e, path + "[]"))
      else Seq(path + "=" + n.asText())
    walk(mapper.readTree(json), "$")
  }

  test("every part is valid JSON and within budget; leaves covered exactly once (C5)") {
    val json =
      """{"meta":{"id":1,"tags":["a","b","c"]},
        |"items":[{"q":"what is x","n":1},{"q":"what is y","n":2},
        |          {"q":"what is z","n":3},{"q":"big one","n":4}],
        |"notes":"alpha beta gamma delta epsilon zeta eta theta"}""".stripMargin
    val budget = 30
    val parts = JsonPartitioner.partition(json, budget)
    assert(parts.size > 1)
    parts.foreach { p =>
      mapper.readTree(p) // throws if invalid
      assert(RegexTokenizer.count(p) <= budget * 2, s"part grossly over budget: $p")
    }
    val orig = leaves(json).sorted
    val got = parts.flatMap(leaves).sorted
    assert(got == orig, "leaf multiset mismatch after partitioning")
  }

  test("small document stays whole") {
    val json = """{"a":1,"b":"two"}"""
    val parts = JsonPartitioner.partition(json, 1000)
    assert(parts.size == 1)
  }

  test("nl2sql-style map explodes per entry (C6 shape)") {
    val json = (1 to 20).map(i => s""""q$i":{"question":"question number $i","query":"SELECT $i"}""")
      .mkString("{", ",", "}")
    val parts = JsonPartitioner.partition(json, 25)
    assert(parts.size >= 5)
    assert(parts.flatMap(leaves).size == leaves(json).size)
  }
}
