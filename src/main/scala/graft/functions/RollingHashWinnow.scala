package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (custom Catalyst Expression).
  *
  * Schleimer/Wilkerson/Aiken winnowing (SIGMOD'03): hash every k-gram
  * of the string with a polynomial rolling hash, slide a window of `w`
  * consecutive k-gram hashes, and record the minimum of each window
  * (rightmost minimum on ties). Guarantees any shared substring of
  * length ≥ w + k - 1 between two documents contributes at least one
  * shared fingerprint — the standard near-copy detection primitive.
  *
  * Output: array<long> of selected k-gram hashes in document order
  * (one entry per selected position). A Catalyst Expression because
  * the rolling window minimum is inherently sequential over the char
  * stream; per-row work is O(n).
  */
case class RollingHashWinnow(child: Expression, k: Int = 8, w: Int = 16)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2 && w >= 1, s"invalid winnowing params k=$k w=$w")

  // No ExpectsInputTypes (private[sql] signature in Spark 4); the typed
  // wrapper below guarantees a string child.
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  private val Base = 1000003L

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // rolling k-gram hashes over 64-bit wraparound arithmetic
    val m = n - k + 1
    val hs = new Array[Long](m)
    var pow = 1L
    var i = 1
    while (i < k) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + s.charAt(i); i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + k - 1)
      hs(i) = h
      i += 1
    }
    // winnow: record rightmost minimum of each w-window of hashes,
    // emitting only when the selected position advances
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastPos = -1
    var start = 0
    val lastStart = math.max(0, m - w)
    while (start <= lastStart) {
      val end = math.min(start + w, m)
      var minPos = start
      var j = start + 1
      while (j < end) { if (hs(j) <= hs(minPos)) minPos = j; j += 1 }
      if (minPos != lastPos) { out += hs(minPos); lastPos = minPos }
      start += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashWinnow =
    copy(child = newChild)
}

object RollingHashWinnow {
  /** Column wrapper: winnowing fingerprint of a string column. */
  def winnowFingerprint(text: Column, k: Int = 8, w: Int = 16): Column =
    Shims.toColumn(RollingHashWinnow(Shims.toExpression(text.cast("string")), k, w))
}
