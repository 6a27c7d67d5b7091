package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — SURVEY §2.C9.
  *
  * For every left row, attach the latest right row whose time is
  * at-or-before the left time, per key. This is the temporal primitive
  * behind "state of X when Y happened" queries (the reference's
  * fill-down, tratamento_epe.R:100,140, is the single-table special
  * case).
  *
  * Implementation is the union + ordered-window formulation, chosen for
  * scale: both sides shuffle ONCE on the key, the per-key window does a
  * single ordered pass, and no range/cartesian join ever forms. A
  * sort-merge band join (`l.ts BETWEEN r.ts AND r.ts + tol`) would
  * re-shuffle per band and explode on dense right sides; the union form
  * is O((|L|+|R|) log) within each key partition and AQE handles skewed
  * keys. At 100 TB this is the difference between one exchange of each
  * input and an unbounded intermediate.
  */
object AsOf {

  /** Backward as-of join.
    *
    * @param left         probe side; all its columns survive
    * @param right        reference side
    * @param keys         equi-join key columns (same names both sides)
    * @param leftTs       left event-time column (numeric or timestamp)
    * @param rightTs      right event-time column (same type/units)
    * @param rightPayload right columns to attach (emitted as-is; must
    *                     not collide with left column names)
    * @param rightOrder   deterministic tiebreak among right rows with
    *                     equal (key, ts) — e.g. an id column
    * @param tolerance    optional max allowed leftTs - rightTs (same
    *                     units as the ts columns); matches older than
    *                     this are nulled out
    */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightOrder: Seq[String] = Nil,
      tolerance: Option[Column] = None): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val payload = struct((rightTs +: rightPayload).distinct.map(col): _*)
    // SQL join semantics: a NULL key matches nothing. The window
    // partitioning below would group null-key rows of BOTH sides into
    // one partition and attach null-key right payloads to null-key
    // left rows — drop null-key right rows instead (null-key left rows
    // then sit in a partition with no right rows → null payload, which
    // is what an equi-join oracle produces). A NULL right ts likewise
    // matches nothing (`NULL <= lt` is unknown) — without the filter
    // the ascending sort would put null-ts rows FIRST and the window
    // would attach them as minus-infinity matches, diverging from both
    // the SQL answer and joinBackwardExec.
    val rightKeyed = (rightTs +: keys).foldLeft(right)((d, k) => d.filter(col(k).isNotNull))
    val r = rightKeyed.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        payload.as("__rp")) ++
        rightOrder.map(c => col(c).as(s"__ro_$c")): _*)
    val l = left.select(
      left.columns.toIndexedSeq.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Right rows (__side=0) sort before left rows at equal ts, so
    // "at-or-before" is inclusive; rightOrder breaks ties among right
    // rows (nulls-first keeps left rows inert in that suffix).
    val ord = col("__ts").asc +: col("__side").asc +: rightOrder.map(c => col(s"__ro_$c").asc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__match", last(col("__rp"), ignoreNulls = true).over(w))
    val bounded = tolerance match {
      case Some(tol) => filled.withColumn("__match",
        when(col("__ts") - col("__match")(rightTs) <= tol, col("__match")))
      case None => filled
    }
    val out = bounded.filter(col("__side") === 1)
    val rpCols = rightPayload.map(c => col("__match")(c).as(c))
    out.select(left.columns.toIndexedSeq.map(col) ++ rpCols: _*)
  }

  /** Backward as-of join through the custom PHYSICAL operator
    * ([[graft.plans.AsOfJoinExec]]) — tier (c) of the extension
    * ladder: both sides hash-co-partitioned on the keys and sorted,
    * then one streaming merge per partition holding a single
    * candidate row, instead of the union+window form's combined sort.
    * Output and semantics are identical to [[joinBackward]] (the spec
    * proves it row-for-row; the oracle proves it against DuckDB's
    * native ASOF LEFT JOIN).
    *
    * Requirements beyond [[joinBackward]]: the ts columns must be
    * LongType (integer event time), and the strategy must be
    * registered ([[graft.Engine.session]] does; or
    * `spark.sql.extensions=graft.GraftExtensions`).
    */
  def joinBackwardExec(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightOrder: Seq[String] = Nil,
      toleranceUs: Option[Long] = None): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    import org.apache.spark.sql.graftshim.Shims
    import org.apache.spark.sql.types.LongType
    // SQL equi-join semantics: null-key (and null-ts) right rows match
    // nothing — drop them before the merge, like joinBackward
    val rCols = (keys ++ Seq(rightTs) ++ rightOrder ++ rightPayload).distinct
    val r0 = (rightTs +: keys).foldLeft(right)((d, c) => d.filter(col(c).isNotNull))
      .select(rCols.map(col): _*)
    // fresh exprIds + collision-free names on the whole right side, so
    // self-joins (left and right reading the same table) resolve
    val r1 = r0.select(rCols.map(c => col(c).as(s"${c}__r")): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r1.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    val lTs = attr(lPlan, leftTs)
    val rTs = attr(rPlan, s"${rightTs}__r")
    require(lTs.dataType == LongType && rTs.dataType == LongType,
      s"as-of exec requires LongType event times, got ${lTs.dataType}/${rTs.dataType}")
    // the hand-built node bypasses analyzer type coercion: mismatched
    // key types would hash-partition each side differently (murmur3 of
    // Int 5 != Long 5 — co-location silently lost) and mis-read the
    // right key bytes in the merge — fail loudly instead
    keys.foreach { k =>
      val (lk, rk) = (attr(lPlan, k), attr(rPlan, s"${k}__r"))
      require(lk.dataType == rk.dataType,
        s"as-of exec key '$k' types differ: ${lk.dataType} vs ${rk.dataType} — cast upstream")
    }
    val node = graft.plans.AsOfJoin(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, s"${k}__r")),
      lTs, rTs,
      rightPayload.map(c => attr(rPlan, s"${c}__r")),
      rightOrder.map(c => attr(rPlan, s"${c}__r")),
      toleranceUs)
    Shims.ofRows(left.sparkSession, node)
      .select(left.columns.toIndexedSeq.map(col) ++
        rightPayload.map(c => col(s"${c}__r").as(c)): _*)
  }

  /** Forward as-of join: the EARLIEST right row at-or-after each left
    * row's time. Implemented by time negation over the backward form,
    * so it inherits the same single-shuffle union plan. `tolerance`
    * bounds rightTs - leftTs. The ts columns must be numeric (negation).
    */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightOrder: Seq[String] = Nil,
      tolerance: Option[Column] = None): DataFrame = {
    val l = left.withColumn("__neg_l", -col(leftTs))
    val r = right.withColumn("__neg_r", -col(rightTs))
    joinBackward(l, r, keys, "__neg_l", "__neg_r",
        rightPayload.filterNot(_ == rightTs) :+ rightTs,
        rightOrder, tolerance)
      .drop("__neg_l")
      .select((left.columns.toIndexedSeq ++ rightPayload).distinct.map(col): _*)
  }
}
