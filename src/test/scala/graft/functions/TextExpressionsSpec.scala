package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Native token_count expression: agreement with the tokenizer and plan
  * placement (it replaced a hot-path UDF).
  */
class TextExpressionsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("token_count agrees with RegexTokenizer, including null and empty") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val samples = Seq(
      Some("hello, world!"), Some(""), Some("a b  c\nd"), None,
      Some("多语言 text with 123 numbers…"))
    val df = samples.toDF("text")
      .select($"text", GraftFunctions.token_count($"text").as("n"))
    df.collect().zip(samples).foreach { case (row, s) =>
      s match {
        case Some(t) => assert(row.getInt(1) == graft.core.RegexTokenizer.count(t), t)
        case None => assert(row.isNullAt(1), "null text must yield null count")
      }
    }
  }

  test("minhash/simhash agree with the kernels and follow null-in/null-out") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val samples = Seq(Some("alpha beta gamma delta epsilon zeta"), Some(""), None)
    val rows = samples.toDF("text")
      .select($"text", GraftFunctions.minhash($"text").as("sig"),
        GraftFunctions.simhash($"text").as("sh"))
      .collect()
    rows.zip(samples).foreach { case (row, s) =>
      s match {
        case Some(t) =>
          assert(row.getSeq[Long](1) ==
            graft.functions.Hashing.minhashSignature(t).toSeq)
          assert(row.getLong(2) == graft.functions.Hashing.simhash64(t))
        case None =>
          assert(row.isNullAt(1) && row.isNullAt(2), "null text must yield null sketches")
      }
    }
  }

  test("minhash/simhash stay inside whole-stage codegen (no UDF wrapper)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = spark.range(4)
      .select(concat(lit("doc word "), $"id").as("text"))
      .select(GraftFunctions.minhash($"text").as("sig"),
        GraftFunctions.simhash($"text").as("sh"))
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("UDF"), "sketches regressed to UDFs:\n" + p.take(1000))
    assert(p.contains("codegen id"), p.take(1000))
  }

  test("para_windows is value-identical to the HOF chain it replaced") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val w = 3
    // edge shapes: leading/trailing/multiple spaces, empty, exact multiple
    // of w, shorter-than-w tail, single token, tabs/newlines kept in tokens
    val samples = Seq(
      Some("  a b c d e f g  "), Some(""), Some("   "), Some("one"),
      Some("a b c"), Some("a b c d"), Some("a  b   c\td e\nf g h i j"),
      None) ++
      (0 until 50).map(i => Some((0 to i % 17).map(k => s"t${i}_$k").mkString(" ")))
    val toks = filter(split(trim($"text"), " "), t => length(t) > 0)
    val nP = ceil(size(toks) / lit(w.toDouble)).cast("int")
    val hof = when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nP - 1),
        g => array_join(slice(toks, g * w + 1, lit(w)), " ")))
    val rows = samples.toDF("text")
      .select($"text", GraftFunctions.para_windows($"text", lit(w)).as("k"),
        hof.as("h"))
      .collect()
    rows.zip(samples).foreach { case (row, s) =>
      s match {
        case Some(t) =>
          assert(row.getSeq[String](1) == row.getSeq[String](2), s"text=<$t>")
        case None => assert(row.isNullAt(1), "null text must yield null windows")
      }
    }
  }

  test("para_windows stays inside whole-stage codegen (no UDF wrapper)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = spark.range(4)
      .select(concat(lit("alpha beta gamma delta epsilon "), $"id").as("text"))
      .select(GraftFunctions.para_windows($"text", lit(2)).as("wins"))
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("UDF"), "para_windows regressed to a UDF:\n" + p.take(1000))
    assert(p.contains("codegen id"), p.take(1000))
  }

  test("para_windows rejects non-positive widths with a clear message") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      Seq("a b c").toDF("t")
        .select(GraftFunctions.para_windows($"t", lit(0))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("must be positive")),
      s"expected a clear width error, got: $e")
  }

  test("token_count stays inside whole-stage codegen (no UDF wrapper)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // range source so constant folding can't collapse the projection
    val df = spark.range(4)
      .select(concat(lit("word "), $"id").as("text"))
      .select(GraftFunctions.token_count($"text").as("n"))
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("UDF"), "token_count regressed to a UDF:\n" + p.take(1000))
    assert(p.contains("codegen id"), p.take(1000))
  }
}
