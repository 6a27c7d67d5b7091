package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** 64-bit SimHash of a token array (custom Catalyst Expression).
  *
  * Charikar's scheme: each token votes its 64 xxhash64 bits (+1 for a
  * set bit, -1 for a clear bit); the signature keeps the bits with a
  * positive tally. Near-identical token multisets land within a small
  * Hamming distance, which `Dedup.simHash` exploits via 16-bit band
  * blocking (pigeonhole: distance ≤ 3 guarantees one of four equal
  * chunks).
  *
  * A Catalyst Expression (not a UDF) so the bit-vote loop runs on
  * Spark's internal UTF8String bytes with no per-row decode/boxing of
  * the token array. The vote loop itself is imperative and cannot be
  * composed from built-in higher-order functions without a 64-column
  * blowup. CodegenFallback is acceptable: the surrounding plan stays
  * codegen'd and this sits off the bench hot path.
  */
case class SimHash64(child: Expression, seed: Long = 42L)
    extends UnaryExpression with CodegenFallback {
  // No ExpectsInputTypes: its AbstractDataType signature is private[sql]
  // in Spark 4. Construction goes through the typed wrapper below, which
  // guarantees an array<string> child.
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column wrapper: simhash64 of an array<string> token column. */
  def simhash64(tokens: Column, seed: Long = 42L): Column =
    Shims.toColumn(SimHash64(Shims.toExpression(tokens.cast("array<string>")), seed))
}
