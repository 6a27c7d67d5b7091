package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftshim.Shims

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

  private def intArg(e: Expression, what: String): Int = longArg(e, what).toInt

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens) => SimHash64(tokens)
        case Seq(tokens, seed) => SimHash64(tokens, longArg(seed, "seed"))
        case _ => throw new IllegalArgumentException("simhash64(tokens[, seed])")
      }),
    ("winnow_fingerprint",
      new ExpressionInfo(classOf[RollingHashWinnow].getName, "winnow_fingerprint"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => RollingHashWinnow(text)
        case Seq(text, k, w) =>
          RollingHashWinnow(text, intArg(k, "k"), intArg(w, "w"))
        case _ => throw new IllegalArgumentException("winnow_fingerprint(text[, k, w])")
      }),
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException("dot_product(a, b)")
      }))

  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      Shims.registerFunction(spark, name, info, builder)
    }
}
