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

  test("array_agree_count matches the reference count and is symmetric") {
    val arr = Gen.listOf(Gen.choose(0L, 8L)) // small domain -> frequent agreements
    check(Prop.forAll(arr, arr) { (a, b) =>
      val ref = a.zip(b).count { case (x, y) => x == y }
      agree(a, b) == ref && agree(b, a) == ref
    }, "agreement count")
  }
}
