package graft

import graft.functions.{BandKeys64, Hamming64, Mix, MinHashSignature, SimHash64, TopKLongAgg, WordNGrams}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (ScalaCheck) for the pure kernels, mirroring the
  * reference's property-test style (spear uses ScalaCheck throughout its
  * expression suites). These evaluate the expressions over literal inputs —
  * no SparkSession — so hundreds of cases are cheap; the Catalyst wiring is
  * covered by FunctionsSpec/OperatorsSpec.
  */
class PropertiesSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  private def litArr(xs: Seq[Long]) =
    Literal.create(xs.toArray, ArrayType(LongType, containsNull = false))

  test("minhash: sig(A ∪ B) = elementwise min(sig(A), sig(B))") {
    def sig(xs: Seq[Long]): Seq[Long] =
      MinHashSignature(litArr(xs), numHashes = 32, seed = 42L)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
    check("minhash-union", Prop.forAll(
        Gen.nonEmptyListOf(Gen.long), Gen.nonEmptyListOf(Gen.long)) { (a, b) =>
      val merged = sig(a ++ b)
      val expect = sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
      merged == expect
    })
  }

  test("minhash: permutation-invariant and duplicate-insensitive") {
    def sig(xs: Seq[Long]): Seq[Long] =
      MinHashSignature(litArr(xs), numHashes = 16, seed = 7L)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
    check("minhash-perm", Prop.forAll(Gen.nonEmptyListOf(Gen.long)) { a =>
      val shuffled = new scala.util.Random(a.hashCode.toLong).shuffle(a)
      sig(a) == sig(shuffled) && sig(a) == sig(a ++ a)
    })
  }

  test("band_keys64: deterministic, band count, slice-locality") {
    val bands = 4
    def keys(xs: Seq[Long]): Seq[Long] =
      BandKeys64(litArr(xs), bands)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
    check("bandkeys", Prop.forAll(Gen.listOfN(32, Gen.long)) { sig =>
      val k1 = keys(sig)
      // flipping one element must change its own band's key (fmix chain,
      // collision odds 2^-64) and leave every other band untouched
      val flipped = sig.updated(5, sig(5) + 1L) // element 5 lives in band 0
      val k2 = keys(flipped)
      k1.length == bands && k1 == keys(sig) &&
        k2.zipWithIndex.forall { case (k, b) => if (b == 0) k != k1(b) else k == k1(b) }
    })
  }

  test("fmix64: deterministic and injective (bijective mixer)") {
    check("fmix64", Prop.forAll(Gen.long, Gen.long) { (a, b) =>
      Mix.fmix64(a) == Mix.fmix64(a) &&
        ((a == b) == (Mix.fmix64(a) == Mix.fmix64(b)))
    })
  }

  test("TopKLongAgg: fold equals sorted take-k; split-merge equals direct fold") {
    val agg = new TopKLongAgg(5)
    check("topk", Prop.forAll(Gen.listOf(Gen.long)) { xs =>
      val folded = agg.finish(xs.foldLeft(agg.zero)(agg.reduce)).toSeq
      val expect = xs.sorted.reverse.take(5)
      val (l, r) = xs.splitAt(xs.length / 2)
      val viaMerge = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))).toSeq
      folded == expect && viaMerge == expect
    })
  }

  test("word_ngrams: sliding-window reconstruction over random tokens/whitespace") {
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val token = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val sep = Gen.oneOf(" ", "  ", "\t", " \n ")
    def grams(text: String, n: Int): Seq[String] =
      WordNGrams(Literal.create(text), n).eval(null).asInstanceOf[ArrayData]
        .toArray[UTF8String](StringType).map(_.toString).toSeq
    check("wordngrams", Prop.forAll(
        Gen.listOf(token), Gen.listOf(sep), Gen.choose(1, 4)) { (toks, seps, n) =>
      // random whitespace between tokens must not affect tokenization
      val text = toks.zipAll(seps.take(math.max(toks.length - 1, 0)), "", " ")
        .map { case (t, s) => t + s }.mkString
      val lower = toks.map(_.toLowerCase(java.util.Locale.ROOT))
      val expect =
        if (lower.length < n) Seq.empty
        else lower.sliding(n).map(_.mkString(" ")).toSeq
      grams(text, n) == expect
    })
  }

  test("simhash64 is permutation-invariant; hamming64 is a metric") {
    def sh(xs: Seq[Long]): Long =
      SimHash64(litArr(xs)).eval(null).asInstanceOf[Long]
    check("simhash-perm", Prop.forAll(Gen.nonEmptyListOf(Gen.long)) { a =>
      val shuffled = new scala.util.Random(a.hashCode.toLong).shuffle(a)
      sh(a) == sh(shuffled)
    })
    def ham(a: Long, b: Long): Int =
      Hamming64(Literal(a), Literal(b)).eval(null).asInstanceOf[Int]
    check("hamming-metric", Prop.forAll(Gen.long, Gen.long, Gen.long) { (a, b, c) =>
      ham(a, b) == ham(b, a) && ham(a, a) == 0 &&
        (a == b) == (ham(a, b) == 0) &&
        ham(a, c) <= ham(a, b) + ham(b, c)
    })
  }

  test("dot_i64: equals the BigInt reference fold; commutative; ragged raises") {
    import graft.functions.DotProductI64
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      DotProductI64(litArr(a), litArr(b)).eval(null).asInstanceOf[Long]
    val smallLong = Gen.chooseNum(-1000000L, 1000000L)
    val samePair = for {
      a <- Gen.nonEmptyListOf(smallLong)
      b <- Gen.listOfN(a.size, smallLong)
    } yield (a, b)
    check("dot-i64-ref", Prop.forAll(samePair) { case (a, b) =>
      val ref = a.indices.map(i => BigInt(a(i)) * BigInt(b(i))).sum
      BigInt(dot(a, b)) == ref && dot(a, b) == dot(b, a)
    })
    // a length mismatch raises (the r16 ragged-input contract), never
    // min-truncates to a plausible value
    check("dot-i64-ragged", Prop.forAll(
        Gen.nonEmptyListOf(smallLong), Gen.nonEmptyListOf(smallLong)) { (a, b) =>
      if (a.size == b.size) true
      else scala.util.Try(dot(a, b)).failed.toOption.exists(
        _.getMessage.contains("ragged vector inputs"))
    })
  }

  test("widestTypeOf: commutative, idempotent, absorbs NullType") {
    import graft.api.{types => T}
    val anyType = Gen.oneOf(
      T.NullType, T.BooleanType, T.StringType, T.ByteType, T.ShortType,
      T.IntType, T.LongType, T.FloatType, T.DoubleType)
    check("widest", Prop.forAll(anyType, anyType) { (a, b) =>
      T.widestTypeOf(a, b) == T.widestTypeOf(b, a) &&
        T.widestTypeOf(a, a).contains(a) &&
        T.widestTypeOf(a, T.NullType).contains(a)
    })
  }
}
