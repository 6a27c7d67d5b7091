package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row word n-gram overlap statistics (custom Catalyst
  * Expression) — [[ChrFStats]]' twin over TOKEN arrays: for two token
  * arrays, emits `[m_1, dc_1, dr_1, …, m_maxN, dc_maxN, dr_maxN]`
  * (clipped match count + the two gram totals per order), the exact
  * integers behind BLEU modified precisions and ROUGE recalls.
  *
  * Same rationale as ChrFStats: candidate and reference live on the
  * SAME ROW, so the explode → hash-agg → full-outer-join pipeline
  * shuffles ~2·maxN rows per token for a computation that needs no
  * shuffle. Each row sorts its own gram index arrays (comparing
  * UTF8String tokens in place, no per-gram concatenation or
  * allocation) and merge-counts run lengths. Distinct token SEQUENCES
  * compare exactly (element count then element-wise bytes) — no
  * separator-collision risk, unlike joining tokens with a delimiter.
  *
  * NULL contract: a NULL array counts as EMPTY; NULL elements sort as
  * the empty token (the tokenizer never emits them). The output array
  * is never NULL.
  */
case class TokenGramStats(left: Expression, right: Expression, maxN: Int)
    extends BinaryExpression with CodegenFallback {
  require(maxN >= 1 && maxN <= 10, "maxN in [1, 10]")

  private val EmptyTok = UTF8String.fromString("")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "token_gram_stats"

  override def eval(input: InternalRow): Any = {
    def toks(e: Expression): Array[UTF8String] = e.eval(input) match {
      case null => Array.empty[UTF8String]
      case a: ArrayData =>
        val out = new Array[UTF8String](a.numElements())
        var i = 0
        while (i < out.length) {
          out(i) = if (a.isNullAt(i)) EmptyTok else a.getUTF8String(i)
          i += 1
        }
        out
    }
    val a = toks(left)
    val b = toks(right)
    val out = new Array[Long](3 * maxN)
    var n = 1
    while (n <= maxN) {
      val dc = math.max(a.length - n + 1, 0)
      val dr = math.max(b.length - n + 1, 0)
      val m = if (dc > 0 && dr > 0) clipped(a, sortedGrams(a, n), b, sortedGrams(b, n), n)
              else 0L
      out(3 * (n - 1)) = m
      out(3 * (n - 1) + 1) = dc.toLong
      out(3 * (n - 1) + 2) = dr.toLong
      n += 1
    }
    ArrayData.toArrayData(out)
  }

  private def sortedGrams(tk: Array[UTF8String], n: Int): Array[Integer] = {
    val k = tk.length - n + 1
    val idx = new Array[Integer](k)
    var i = 0
    while (i < k) { idx(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(idx, (x: Integer, y: Integer) => cmp(tk, x, tk, y, n))
    idx
  }

  private def cmp(ta: Array[UTF8String], ia: Int,
      tb: Array[UTF8String], ib: Int, n: Int): Int = {
    var t = 0
    while (t < n) {
      val d = ta(ia + t).compareTo(tb(ib + t))
      if (d != 0) return d
      t += 1
    }
    0
  }

  private def clipped(ta: Array[UTF8String], ia: Array[Integer],
      tb: Array[UTF8String], ib: Array[Integer], n: Int): Long = {
    var i = 0
    var j = 0
    var m = 0L
    while (i < ia.length && j < ib.length) {
      val d = cmp(ta, ia(i), tb, ib(j), n)
      if (d < 0) i += 1
      else if (d > 0) j += 1
      else {
        var ri = i + 1
        while (ri < ia.length && cmp(ta, ia(ri), ta, ia(i), n) == 0) ri += 1
        var rj = j + 1
        while (rj < ib.length && cmp(tb, ib(rj), tb, ib(j), n) == 0) rj += 1
        m += math.min(ri - i, rj - j).toLong
        i = ri
        j = rj
      }
    }
    m
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenGramStats =
    copy(left = newLeft, right = newRight)
}

object TokenGramStats {
  /** Column wrapper: word n-gram stats of two array<string> columns. */
  def tokenGramStats(cand: Column, ref: Column, maxN: Int): Column =
    Shims.toColumn(TokenGramStats(
      Shims.toExpression(cand.cast("array<string>")),
      Shims.toExpression(ref.cast("array<string>")), maxN))
}
