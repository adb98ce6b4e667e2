package graft

import org.scalacheck.{Gen, Prop}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.functions.catalyst.GraftHash

/** Property-based checks of the hash/similarity kernels — the algebraic
  * invariants the LSH pipelines rely on (duplicate-invariance, bounds,
  * symmetry, interpretation==codegen), over generated inputs rather
  * than the fixed corpus.
  */
class KernelPropertySpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
  private val wordsGen: Gen[List[String]] =
    Gen.nonEmptyListOf(word).map(_.take(30))

  test("minhash signature is invariant under duplication and order") {
    import spark.implicits._
    check(Prop.forAll(wordsGen) { ws =>
      val base = Seq(Tuple1(ws)).toDF("s")
        .select(minhash_sig(col("s"), 32)).head().getSeq[Long](0)
      val shuffled = Seq(Tuple1(scala.util.Random.shuffle(ws ++ ws))).toDF("s")
        .select(minhash_sig(col("s"), 32)).head().getSeq[Long](0)
      base == shuffled
    })
  }

  test("poly hash matches the scalar reference fold for any string") {
    import spark.implicits._
    check(Prop.forAll(Gen.asciiPrintableStr.map(_.take(64))) { s =>
      val got = Seq(Tuple1(s)).toDF("t")
        .select(poly_hash(col("t"))).head().getLong(0)
      got == GraftHash.poly(s, 31, GraftHash.FP)
    })
  }

  test("cosine_sim is bounded, symmetric, and 1 on self") {
    import spark.implicits._
    val vec: Gen[Array[Float]] =
      Gen.listOfN(8, Gen.chooseNum(-5.0f, 5.0f)).map(_.toArray)
        .suchThat(v => v.exists(x => math.abs(x) > 1e-3))
    check(Prop.forAll(vec, vec) { (a, b) =>
      val r = Seq((a, b)).toDF("a", "b").select(
        cosine_sim(col("a"), col("b")),
        cosine_sim(col("b"), col("a")),
        cosine_sim(col("a"), col("a"))).head()
      val (ab, ba, aa) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9 && ab == ba &&
        math.abs(aa - 1.0) < 1e-9
    })
  }

  test("simhash is order-invariant (per-bit vote sums commute)") {
    import spark.implicits._
    check(Prop.forAll(wordsGen) { ws =>
      val r = Seq((ws, scala.util.Random.shuffle(ws)))
        .toDF("a", "b")
        .select(hamming64(simhash60(col("a")), simhash60(col("b"))).cast("long"))
        .head().getLong(0)
      r == 0L
    })
  }

  test("minhash band keys agree iff band slices agree") {
    import spark.implicits._
    check(Prop.forAll(wordsGen, wordsGen) { (x, y) =>
      val df = Seq((x, y)).toDF("a", "b").select(
        minhash_sig(col("a"), 32).as("sa"),
        minhash_sig(col("b"), 32).as("sb"))
      val r = df.select(
        minhash_bands(col("sa"), 8).as("ba"),
        minhash_bands(col("sb"), 8).as("bb"),
        col("sa"), col("sb")).head()
      val (ba, bb) = (r.getSeq[Long](0), r.getSeq[Long](1))
      val (sa, sb) = (r.getSeq[Long](2), r.getSeq[Long](3))
      (0 until 8).forall { b =>
        val sliceEq = sa.slice(b * 4, b * 4 + 4) == sb.slice(b * 4, b * 4 + 4)
        // slice equality must imply key equality (the recall direction)
        !sliceEq || ba(b) == bb(b)
      }
    })
  }

  test("sq_dist matches the HOF reference fold and the scalar loop") {
    import spark.implicits._
    val arr: Gen[List[Long]] = Gen.listOfN(16, Gen.chooseNum(0L, 2000000L))
    check(Prop.forAll(arr, arr) { (xs, ys) =>
      val df = Seq((xs, ys)).toDF("a", "b")
      val native = df.select(sq_dist(col("a"), col("b"))).head().getLong(0)
      val hof = df.select(expr(
        "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), " +
          "0L, (acc, v) -> acc + v)")).head().getLong(0)
      val scalar = xs.zip(ys).map { case (x, y) => (x - y) * (x - y) }.sum
      native == hof && native == scalar
    })
  }
}
