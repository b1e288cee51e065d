package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.SplitParams
import graft.pipeline.Chunkers

/** `chunk_document(text, ext, maxTokens, overlap, minTokens)` — the
  * one-to-many chunking operator as a native Catalyst Generator
  * (SURVEY §2.12: "Generator (UDTF-like)").
  *
  * Each input row yields (chunk_id, content, n_tokens) rows. Compared to the
  * UDF-returns-array + posexplode formulation, the Generator streams chunks
  * through the Volcano iterator without materializing the whole per-document
  * chunk array in an intermediate Catalyst array value — on 100 MB documents
  * that difference is an executor-memory guarantee, not a micro-optimization.
  * Splitting itself is the shared [[graft.core.TextSplitters]] logic, so the
  * Generator, the UDF path and the unit tests can never drift apart.
  *
  * Mirrors /root/reference/chunking/chunkers/base_chunker.py:150-152 (the
  * `get_chunks` contract) and chunker_factory.py:34-72 (extension dispatch).
  */
case class ChunkDocument(children: Seq[Expression])
    extends Generator with CodegenFallback {

  // validated so misuse (wrong arity, wrong argument types) is rejected at
  // analysis time instead of surfacing as a ClassCastException or
  // IndexOutOfBounds inside eval() on the executor
  private val expectedTypes: Seq[(DataType, String)] = Seq(
    StringType -> "text", StringType -> "ext", IntegerType -> "maxTokens",
    IntegerType -> "overlapTokens", IntegerType -> "minTokens")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length != expectedTypes.length)
      TypeCheckResult.TypeCheckFailure(
        s"chunk_document expects ${expectedTypes.length} arguments " +
          s"(text, ext, maxTokens, overlapTokens, minTokens); got ${children.length}")
    else children.zip(expectedTypes).collectFirst {
      // a literal NULL ext is legal — eval maps it to the "txt" default
      case (c, (t, name)) if c.dataType != t && !(name == "ext" && c.dataType == NullType) =>
        TypeCheckResult.TypeCheckFailure(
          s"chunk_document argument '$name' expects ${t.simpleString}, " +
            s"got ${c.dataType.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_id", IntegerType, nullable = false),
    StructField("content", StringType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = children.head.eval(input).asInstanceOf[UTF8String]
    if (text == null) return Iterator.empty
    val ext = children(1).eval(input) match {
      case null => "txt"
      case s: UTF8String => s.toString
    }
    val p = SplitParams(
      maxTokens = children(2).eval(input).asInstanceOf[Int],
      overlapTokens = children(3).eval(input).asInstanceOf[Int],
      minChunkTokens = children(4).eval(input).asInstanceOf[Int])
    Chunkers.chunkText(text.toString, ext, p).iterator
      .map(c => (c, p.tokenizer.count(c))) // tokenize once per chunk
      .filter(_._2 >= p.minChunkTokens)
      .zipWithIndex
      .map { case ((c, n), i) => InternalRow(i, UTF8String.fromString(c), n) }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
