package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.unsafe.Platform
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Whole MinHash signature of a token array in ONE pass per row
  * (custom codegen'd Catalyst Expression).
  *
  * Semantics are EXACTLY the explode-form construction in
  * `Dedup.minHashSignatures` (and are pinned against it by
  * KernelPropsSpec): shingle i = tokens[i..i+shingleSize-1] joined by
  * a single space (null tokens skipped, as `concat_ws` does), base
  * hash = `pmod(xxhash64(shingle), p)` with Spark's default xxhash64
  * seed, permutation j = `(a_j·h + b_j) mod p` over the shared
  * [[minHashParams]] family, signature = per-permutation minimum.
  * Duplicate shingles cannot change a minimum, so the explode path's
  * `array_distinct` needs no equivalent here. Fewer than `shingleSize`
  * tokens → EMPTY array (the explode form emits no row; callers filter
  * `size(sig) > 0` to match).
  *
  * Why an Expression: the explode form multiplies each document into
  * O(tokens) shingle rows and funnels them through a 64-min hash
  * aggregate — row materialization, partial-agg hash probes, and an
  * exchange, all to compute a per-row value. This kernel computes the
  * signature where the row already is: no generate, no aggregate, no
  * shuffle; the signing stage of MinHash dedup becomes a pure
  * map — embarrassingly parallel at any corpus size. The shingle
  * bytes are assembled into one reusable buffer and hashed with the
  * same XXH64 primitive Spark's `xxhash64` uses, so signatures are
  * bit-identical to the explode form.
  *
  * The permutation update loop (shingles × numHashes multiplies) is
  * imperative; codegen emits a single call into [[compute]] so the
  * surrounding whole-stage span stays intact.
  */
case class MinHashSignature(
    child: Expression,
    numHashes: Int = 64,
    shingleSize: Int = 5,
    seed: Long = 42L)
    extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")
  require(shingleSize > 0, "shingleSize must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private val prime: Long = minHashPrime
  @transient private lazy val (paramA: Array[Long], paramB: Array[Long]) = {
    val ps = minHashParams(numHashes, seed)
    (ps.map(_._1).toArray, ps.map(_._2).toArray)
  }

  /** One pass: assemble each shingle's bytes, hash once, fold into the
    * per-permutation minima. Public so generated code can call it.
    */
  def compute(toks: ArrayData): ArrayData = {
    val nTok = toks.numElements()
    val nShingles = nTok - shingleSize + 1
    if (nShingles <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val a = paramA
    val b = paramB
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var buf = new Array[Byte](256)
    var i = 0
    while (i < nShingles) {
      var len = 0
      var wrote = false
      var j = 0
      while (j < shingleSize) {
        if (!toks.isNullAt(i + j)) { // concat_ws skips nulls, separator included
          val s = toks.getUTF8String(i + j)
          val nb = s.numBytes()
          if (len + nb + 1 > buf.length) {
            buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + nb + 1))
          }
          if (wrote) { buf(len) = ' '; len += 1 }
          s.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + len)
          len += nb
          wrote = true
        }
        j += 1
      }
      val h = java.lang.Math.floorMod(
        XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L), prime)
      var k = 0
      while (k < numHashes) {
        val v = (h * a(k) + b(k)) % prime // h,a < p=2^31-1 → product < 2^62, no overflow
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.compute($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column wrapper: one-pass MinHash signature of an array<string>
    * token column.
    */
  def minhashSignature(
      tokens: Column,
      numHashes: Int = 64,
      shingleSize: Int = 5,
      seed: Long = 42L): Column =
    Shims.toColumn(MinHashSignature(
      Shims.toExpression(tokens.cast("array<string>")), numHashes, shingleSize, seed))
}
