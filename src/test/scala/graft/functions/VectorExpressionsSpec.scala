package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("dot/cosine/l2norm match reference math through the DataFrame API") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val df = Seq((a, b)).toDF("a", "b")
    val row = df.select(
      GraftFunctions.dot_f32($"a", $"b").as("dot"),
      GraftFunctions.cosine_f32($"a", $"b").as("cos"),
      GraftFunctions.l2norm_f32($"a").as("na")).head()
    val expDot = 1.0 * -1.0 + 2.0 * 0.5 + 3.0 * 2.0
    val na = math.sqrt(1 + 4 + 9)
    val nb = math.sqrt(1 + 0.25 + 4)
    assert(math.abs(row.getDouble(0) - expDot) < 1e-12)
    assert(math.abs(row.getDouble(1) - expDot / (na * nb)) < 1e-12)
    assert(math.abs(row.getDouble(2) - na) < 1e-12)
  }

  test("null inputs propagate null; zero vector cosine is 0") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Array(1.0f, 0.0f)), None: Option[Array[Float]]),
      (Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 1.0f)))
    ).toDF("a", "b")
    val rows = df.select(GraftFunctions.cosine_f32($"a", $"b")).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) == 0.0)
  }

  test("cosine_i8 approximates cosine_f32 tightly on quantized codes") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(50)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val probe = Array.fill(64)(rnd.nextGaussian().toFloat)
    def quant(v: Array[Float]): Array[Byte] = {
      val m = v.map(math.abs).max
      if (m == 0f) new Array[Byte](v.length)
      else v.map(x => math.round(x / (m / 127f)).toByte)
    }
    val df = vecs.map(v => (v, quant(v))).toDF("vec", "codes")
    val rows = df.select(
      GraftFunctions.cosine_f32($"vec", typedLit(probe)).as("exact"),
      GraftFunctions.cosine_i8($"codes", typedLit(probe)).as("approx")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.01,
        s"exact=${r.getDouble(0)} approx=${r.getDouble(1)}")
    }
  }

  test("cosine_i8: null propagates, zero codes give 0") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (None: Option[Array[Byte]], Some(Array(1.0f, 1.0f))),
      (Some(Array[Byte](0, 0)), Some(Array(1.0f, 1.0f)))
    ).toDF("codes", "p")
    val rows = df.select(GraftFunctions.cosine_i8($"codes", $"p")).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) == 0.0)
  }

  test("multiple vector expressions in ONE projection still compile (fresh locals)") {
    // Regression pin: fixed Java local names in doGenCode collide when two
    // of these expressions share a codegen scope (multi-probe scoring does
    // exactly that) and Janino's "Redefinition of local variable" silently
    // drops the whole projection to interpreted mode. Generating the
    // projection DIRECTLY (no interpreter fallback at this layer) makes a
    // recurrence a hard test failure instead of a hidden perf cliff.
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.{ArrayType, BinaryType, FloatType}
    val va = BoundReference(0, ArrayType(FloatType), nullable = true)
    val vb = BoundReference(1, ArrayType(FloatType), nullable = true)
    val codes = BoundReference(2, BinaryType, nullable = true)
    val proj = GenerateUnsafeProjection.generate(Seq(
      CosineSimF32(va, vb), CosineSimF32(vb, va),
      DotProductF32(va, vb), DotProductF32(vb, va),
      L2NormF32(va), L2NormF32(vb), CosineSimI8(codes, va)))
    val row = proj(InternalRow(
      new GenericArrayData(Array(1.0f, 0.0f)),
      new GenericArrayData(Array(0.0f, 2.0f)),
      Array[Byte](1, 0)))
    assert(row.getDouble(0) == 0.0 && row.getDouble(2) == 0.0)
    assert(row.getDouble(4) == 1.0 && row.getDouble(5) == 2.0)
    assert(row.getDouble(6) == 1.0) // codes [1,0] vs [1,0] direction
  }

  test("expressions work from SQL too (function registry)") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT dot_f32(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }
}
