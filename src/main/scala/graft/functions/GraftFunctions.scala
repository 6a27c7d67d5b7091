package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}

/** SQL-name registration for graft's custom Catalyst expressions, so
  * `spark.sql("SELECT simhash64(tokens), ...")` works exactly like the
  * Column API — a user of the reference switching to this library can
  * stay in pure SQL.
  *
  * Two registration paths:
  *  - `GraftFunctions.registerAll(spark)` — live session (Engine does
  *    this automatically);
  *  - `--conf spark.sql.extensions=graft.GraftExtensions` — builder
  *    time, for sessions the library doesn't construct.
  */
object GraftFunctions {

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def stringArg(e: Expression, what: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def intArg(e: Expression, what: String): Int = longArg(e, what).toInt

  // The kernels read raw ArrayData/UTF8String, so the SQL builders must
  // coerce exactly like the Column wrappers do (.cast("array<double>")
  // etc.) — otherwise dot_product(array(1,2), array(3,4)) over int
  // arrays would call getDouble on int-backed data: silently wrong
  // values instead of an analysis-time cast.
  private def asStringArray(e: Expression): Expression = Cast(e, ArrayType(StringType))
  private def asDoubleArray(e: Expression): Expression = Cast(e, ArrayType(DoubleType))
  private def asLongArray(e: Expression): Expression = Cast(e, ArrayType(LongType))
  private def asString(e: Expression): Expression = Cast(e, StringType)

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens) => SimHash64(asStringArray(tokens))
        case Seq(tokens, seed) => SimHash64(asStringArray(tokens), longArg(seed, "seed"))
        case _ => throw new IllegalArgumentException("simhash64(tokens[, seed])")
      }),
    ("winnow_fingerprint",
      new ExpressionInfo(classOf[RollingHashWinnow].getName, "winnow_fingerprint"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => RollingHashWinnow(asString(text))
        case Seq(text, k, w) =>
          RollingHashWinnow(asString(text), intArg(k, "k"), intArg(w, "w"))
        case _ => throw new IllegalArgumentException("winnow_fingerprint(text[, k, w])")
      }),
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(asDoubleArray(a), asDoubleArray(b))
        case _ => throw new IllegalArgumentException("dot_product(a, b)")
      }),
    ("array_agree_count",
      new ExpressionInfo(classOf[ArrayAgreeCount].getName, "array_agree_count"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => ArrayAgreeCount(asLongArray(a), asLongArray(b))
        case _ => throw new IllegalArgumentException("array_agree_count(a, b)")
      }),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens) => MinHashSignature(asStringArray(tokens))
        case Seq(tokens, numHashes, shingleSize) =>
          MinHashSignature(asStringArray(tokens),
            intArg(numHashes, "numHashes"), intArg(shingleSize, "shingleSize"))
        case Seq(tokens, numHashes, shingleSize, seed) =>
          MinHashSignature(asStringArray(tokens),
            intArg(numHashes, "numHashes"), intArg(shingleSize, "shingleSize"),
            longArg(seed, "seed"))
        case _ => throw new IllegalArgumentException(
          "minhash_signature(tokens[, numHashes, shingleSize[, seed]])")
      }),
    ("unicode_normalize",
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => UnicodeNormalize(asString(text), "NFC")
        case Seq(text, form) =>
          val f = stringArg(form, "form").toUpperCase
          if (!UnicodeNormalize.forms(f)) throw new IllegalArgumentException(
            s"unicode_normalize form must be one of ${UnicodeNormalize.forms}, got $f")
          UnicodeNormalize(asString(text), f)
        case _ => throw new IllegalArgumentException("unicode_normalize(text[, form])")
      }),
    ("deflate_len",
      new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => DeflateLen(asString(text))
        case _ => throw new IllegalArgumentException("deflate_len(text)")
      }))

  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      Shims.registerFunction(spark, name, info, builder)
    }
}
