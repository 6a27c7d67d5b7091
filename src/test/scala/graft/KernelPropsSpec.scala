package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ArrayAgreeCount, RollingHashWinnow, SimHash64}

/** Property-based checks over the custom Catalyst kernels, evaluated
  * directly (catalyst `eval`, no Spark session) so hundreds of random
  * cases run in milliseconds. Complements the example-based specs:
  * the winnowing guarantee, hash determinism, and agreement-count
  * semantics are claims over ALL inputs, so they get random-input
  * coverage here.
  */
class KernelPropsSpec extends AnyFunSuite {

  private def check(prop: Prop, name: String): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private def winnow(s: String, k: Int = 8, w: Int = 16): Set[Long] =
    RollingHashWinnow(Literal(UTF8String.fromString(s), StringType), k, w)
      .eval(null).asInstanceOf[ArrayData].toLongArray().toSet

  private def simhash(tokens: Seq[String]): Long =
    SimHash64(Literal.create(tokens, ArrayType(StringType)))
      .eval(null).asInstanceOf[Long]

  private def agree(a: Seq[Long], b: Seq[Long]): Int =
    ArrayAgreeCount(
      Literal.create(a, ArrayType(LongType)),
      Literal.create(b, ArrayType(LongType)))
      .eval(null).asInstanceOf[Int]

  private val word: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  private val text: Gen[String] = for {
    n <- Gen.choose(0, 40)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString(" ")

  test("winnowing guarantee: any shared run >= w+k-1 chars forces a shared fingerprint") {
    // k=8, w=16 -> threshold 23 chars; the shared run is padded past it
    val gen = for {
      pre1 <- text; post1 <- text
      pre2 <- text; post2 <- text
      core <- Gen.listOfN(30, Gen.alphaLowerChar).map(_.mkString)
    } yield (s"$pre1 $core $post1", s"$pre2 $core $post2", core)
    check(Prop.forAll(gen) { case (a, b, _) =>
      winnow(a).intersect(winnow(b)).nonEmpty
    }, "winnowing guarantee")
  }

  test("winnowing is deterministic and subset-stable under pure prefixing") {
    check(Prop.forAll(text) { s =>
      winnow(s) == winnow(s)
    }, "winnow determinism")
  }

  test("simhash64 is token-order invariant (bit votes commute) and deterministic") {
    val gen = for {
      toks <- Gen.nonEmptyListOf(word)
      shuffled <- Gen.const(scala.util.Random.shuffle(toks))
    } yield (toks, shuffled)
    check(Prop.forAll(gen) { case (toks, shuffled) =>
      simhash(toks) == simhash(shuffled) && simhash(toks) == simhash(toks)
    }, "simhash order invariance")
  }

  test("minhash_signature matches an independent reference implementation") {
    // reference: the explode-form construction (shingle join, Spark's
    // XxHash64Function, affine permutations over the shared family)
    // written directly in Scala — two independent paths to the same math
    val p = graft.functions.minHashPrime
    val params = graft.functions.minHashParams(16, seed = 7L)
    def reference(toks: List[String], n: Int): Seq[Long] = {
      val sh = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      if (sh.isEmpty) Seq.empty
      else {
        val hs = sh.map(s => java.lang.Math.floorMod(
          org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
            UTF8String.fromString(s), StringType, 42L), p))
        params.map { case (a, b) => hs.map(h => (h * a + b) % p).min }
      }
    }
    def kernel(toks: List[String], n: Int): Seq[Long] =
      graft.functions.MinHashSignature(
          Literal.create(toks, ArrayType(StringType)), 16, n, 7L)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
    val gen = for {
      n <- Gen.choose(1, 4)
      toks <- Gen.listOf(word)
    } yield (toks, n)
    check(Prop.forAll(gen) { case (toks, n) =>
      kernel(toks, n) == reference(toks, n)
    }, "minhash signature reference equality")
  }

  test("minhash_signature: duplicate shingles cannot change the signature") {
    check(Prop.forAll(Gen.nonEmptyListOf(word)) { toks =>
      val once = graft.functions.MinHashSignature(
          Literal.create(toks, ArrayType(StringType)), 8, 1, 7L)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      val twice = graft.functions.MinHashSignature(
          Literal.create(toks ++ toks, ArrayType(StringType)), 8, 1, 7L)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      once == twice
    }, "minhash duplicate invariance")
  }

  test("array_agree_count matches the reference count and is symmetric") {
    val arr = Gen.listOf(Gen.choose(0L, 8L)) // small domain -> frequent agreements
    check(Prop.forAll(arr, arr) { (a, b) =>
      val ref = a.zip(b).count { case (x, y) => x == y }
      agree(a, b) == ref && agree(b, a) == ref
    }, "agreement count")
  }

  // unicode fuzz alphabet: ASCII, Latin-1, CJK, and ASTRAL code points
  // (astral chars are 2 UTF-16 units but ONE code point — the unit the
  // gram kernels and both engines' substring/length count)
  private val fuzzCp: Gen[Int] = Gen.frequency(
    6 -> Gen.choose('a'.toInt, 'e'.toInt),
    2 -> Gen.oneOf(0xE9, 0x4F60, 0x597D), // é 你 好
    2 -> Gen.oneOf(0x1F600, 0x10400, 0x1D11E)) // emoji, Deseret, clef
  private val fuzzStr: Gen[String] = for {
    n <- Gen.choose(0, 24)
    cps <- Gen.listOfN(n, fuzzCp)
  } yield cps.flatMap(Character.toChars(_)).mkString

  private def naiveGrams[T](xs: Seq[T], n: Int): Map[Seq[T], Int] =
    if (xs.length < n) Map.empty
    else xs.sliding(n).toSeq.groupBy(identity).view.mapValues(_.size).toMap

  private def naiveStats[T](a: Seq[T], b: Seq[T], maxN: Int): Seq[Long] =
    (1 to maxN).flatMap { n =>
      val (ga, gb) = (naiveGrams(a, n), naiveGrams(b, n))
      val m = ga.keySet.intersect(gb.keySet).toSeq
        .map(g => math.min(ga(g), gb(g))).sum.toLong
      Seq(m, math.max(a.length - n + 1, 0).toLong,
        math.max(b.length - n + 1, 0).toLong)
    }

  test("chrf_stats matches a naive code-point reference on unicode incl. astral chars") {
    val gen = for { a <- fuzzStr; b <- fuzzStr; n <- Gen.choose(1, 6) } yield (a, b, n)
    check(Prop.forAll(gen) { case (a, b, n) =>
      val got = graft.functions.ChrFStats(
          Literal(UTF8String.fromString(a), StringType),
          Literal(UTF8String.fromString(b), StringType), n)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      got == naiveStats(a.codePoints().toArray.toSeq,
        b.codePoints().toArray.toSeq, n)
    }, "chrf_stats reference equality")
  }

  test("token_gram_stats matches a naive sliding-window reference incl. unicode tokens") {
    val tok = Gen.frequency(5 -> word, 1 -> fuzzStr.suchThat(_.nonEmpty))
    val toks = Gen.choose(0, 15).flatMap(n => Gen.listOfN(n, tok))
    val gen = for { a <- toks; b <- toks; n <- Gen.choose(1, 4) } yield (a, b, n)
    check(Prop.forAll(gen) { case (a, b, n) =>
      val got = graft.functions.TokenGramStats(
          Literal.create(a, ArrayType(StringType)),
          Literal.create(b, ArrayType(StringType)), n)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      got == naiveStats(a, b, n)
    }, "token_gram_stats reference equality")
  }
}
