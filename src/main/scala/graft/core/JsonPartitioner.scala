package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Greedy token-bounded JSON partitioner (SURVEY §2.9 C5).
  *
  * Behavioral spec from /root/reference/chunking/chunkers/json_chunker.py:24-147:
  * split a JSON document into parts whose pretty-printed form stays within a
  * token budget; arrays/objects are partitioned greedily in order; a single
  * oversized element is descended into recursively; leaves that still exceed
  * the budget are emitted as-is (warn-only). Each part is valid JSON and the
  * concatenation of parts covers every input element exactly once.
  */
object JsonPartitioner {
  private val mapper = new ObjectMapper()

  def partition(json: String, maxTokens: Int,
      tok: Tokenizer = Tokenize.default): Seq[String] = {
    val root = mapper.readTree(json)
    partitionNode(root, maxTokens, tok).map(pretty)
  }

  private def pretty(n: JsonNode): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(n)

  private def fits(n: JsonNode, maxTokens: Int, tok: Tokenizer): Boolean =
    tok.count(pretty(n)) <= maxTokens

  private def partitionNode(node: JsonNode, maxTokens: Int, tok: Tokenizer): Seq[JsonNode] = {
    if (fits(node, maxTokens, tok)) return Seq(node)
    node match {
      case arr: ArrayNode =>
        val parts = ArrayBuffer.empty[JsonNode]
        var cur = mapper.createArrayNode()
        arr.elements().asScala.foreach { el =>
          if (!fits(el, maxTokens, tok)) {
            if (cur.size() > 0) { parts += cur; cur = mapper.createArrayNode() }
            parts ++= partitionNode(el, maxTokens, tok)
          } else {
            cur.add(el)
            if (!fits(cur, maxTokens, tok)) {
              cur.remove(cur.size() - 1)
              if (cur.size() > 0) parts += cur
              cur = mapper.createArrayNode()
              cur.add(el)
            }
          }
        }
        if (cur.size() > 0) parts += cur
        parts.toSeq
      case obj: ObjectNode =>
        val parts = ArrayBuffer.empty[JsonNode]
        var cur = mapper.createObjectNode()
        obj.properties().asScala.foreach { e =>
          val (k, v) = (e.getKey, e.getValue)
          if (!fits(v, maxTokens, tok)) {
            if (cur.size() > 0) { parts += cur; cur = mapper.createObjectNode() }
            // descend: each sub-part keeps its key for context
            partitionNode(v, maxTokens, tok).foreach { sub =>
              val wrap = mapper.createObjectNode(); wrap.set(k, sub); parts += wrap
            }
          } else {
            cur.set(k, v)
            if (!fits(cur, maxTokens, tok)) {
              cur.remove(k)
              if (cur.size() > 0) parts += cur
              cur = mapper.createObjectNode()
              cur.set(k, v)
            }
          }
        }
        if (cur.size() > 0) parts += cur
        parts.toSeq
      case leaf => Seq(leaf) // oversized scalar: emit as-is (reference warns only)
    }
  }
}
