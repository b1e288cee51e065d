package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property coverage for the round-10 operators: Morton interleave is a
  * bijection, MMR's greedy score sequence is provably non-increasing,
  * and arbitrary member lists round-trip through the USTAR codec.
  */
class Round10PropertySpec extends AnyFunSuite {

  private def forAll[A](ga: Gen[A], minOk: Int = 100)(body: A => Unit): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(minOk),
      Prop.forAllNoShrink(ga) { a => body(a); true })
    assert(res.passed, res.status.toString)
  }

  private lazy val spark = TestSpark.spark

  test("z-order interleave is a bijection: de-interleave recovers the buckets") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gen = for {
      bits <- Gen.choose(1, 10)
      k <- Gen.choose(1, 3)
      vals <- Gen.listOfN(k, Gen.choose(0L, (1L << bits) - 1))
    } yield (bits, vals)
    forAll(gen) { case (bits, vals) =>
      val cols = vals.indices.map(i => s"c$i")
      val df = Seq(Tuple1(0)).toDF("dummy")
      val withCols = vals.zip(cols).foldLeft(df) { case (d, (v, c)) =>
        d.withColumn(c, lit(v))
      }
      val z = withCols
        .withColumn("z", graft.pipeline.ZOrder.interleave(cols.map(col), bits))
        .select($"z").head().getLong(0)
      // de-interleave: bit j of column c sits at position j*k + (k-1-c)
      val k = vals.length
      val recovered = vals.indices.map { c =>
        (0 until bits).map(j => ((z >> (j * k + (k - 1 - c))) & 1L) << j).sum
      }
      assert(recovered == vals, s"bits=$bits vals=$vals z=$z")
    }
  }

  test("mmr: selected score sequence is non-increasing for any candidate set") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // penalties only grow and the candidate set only shrinks, so the
    // greedy max is non-increasing — a structural invariant worth
    // fuzzing because a tie-break or bookkeeping bug breaks it first
    val gen = for {
      n <- Gen.choose(2, 25)
      dim <- Gen.choose(2, 6)
      seed <- Gen.choose(0L, 10000L)
      lam <- Gen.choose(1, 9).map(_ / 10.0)
    } yield (n, dim, seed, lam)
    forAll(gen, minOk = 15) { case (n, dim, seed, lam) =>
      val rnd = new scala.util.Random(seed)
      val rows = (0 until n).map(i => (0L, i.toLong,
        Array.fill(dim)(rnd.nextGaussian().toFloat), rnd.nextDouble()))
      val out = graft.operators.Search.mmrRerank(
          rows.toDF("q", "id", "vec", "sim"), "q", "id", "vec", "sim",
          k = n, lambda = lam)
        .orderBy($"rank").collect().map(_.getDouble(3))
      assert(out.length == n)
      out.sliding(2).foreach {
        case Array(a, b) => assert(a >= b - 1e-9, s"scores rose: $a -> $b")
        case _ =>
      }
    }
  }

  test("tar: arbitrary member lists round-trip") {
    val nameGen = for {
      len <- Gen.choose(1, 60)
      cs <- Gen.listOfN(len, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('-', '_', '.')))
    } yield cs.mkString
    val gen = for {
      n <- Gen.choose(0, 12)
      names <- Gen.listOfN(n, nameGen)
      sizes <- Gen.listOfN(n, Gen.choose(0, 1500))
    } yield names.zip(sizes)
    forAll(gen, minOk = 30) { members =>
      val es = members.zipWithIndex.map { case ((nm, sz), i) =>
        (s"$i-$nm", Array.tabulate[Byte](sz)(j => ((i * 17 + j) % 256).toByte))
      }
      val back = graft.formats.Tar.list(graft.formats.Tar.archive(es)).get
      assert(back.length == es.length)
      back.zip(es).foreach { case ((gn, gb), (wn, wb)) =>
        assert(gn == wn && gb.sameElements(wb))
      }
    }
  }
}
