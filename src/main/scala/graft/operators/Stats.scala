package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment statistics — the A/B readout endpoint: compare a metric
  * between two groups with an unpooled two-sample z statistic, over
  * the same exact-decimal moment machinery as [[Profile.standardize]].
  */
object Stats {

  /** Welch-style two-sample z: `(meanA − meanB) / sqrt(vA/nA + vB/nB)`
    * with sample variances from exact decimal sums. Returns ONE row:
    * (n_a, mean_a, n_b, mean_b, z, significant) where `significant`
    * is |z| > 1.96 (the two-sided 5% gate). Means are truncated at
    * 4 dp for reporting; z is derived from the RAW moments and
    * truncated at 4 dp TOWARD ZERO (sign·floor(|x|·1e4)/1e4, not a
    * bare floor: floor truncates negatives AWAY from zero, so the
    * same experiment could flip `significant` when the group labels —
    * and hence z's sign — are swapped; toward-zero truncation keeps
    * |z| > 1.96 symmetric and stays repr-independent across engines).
    * Degenerate inputs (a group missing or empty input, n < 2, or
    * both variances 0) yield z = 0 and significant = false rather
    * than an ANSI error or a NULL row.
    *
    * Shape at scale: one partial-aggregated conditional-moments pass
    * over one scan (both groups in the same aggregate), one
    * driver-trivial projection.
    */
  def twoSampleZ(
      df: DataFrame,
      group: Column,
      value: Column,
      groupA: String,
      groupB: String): DataFrame = {
    def t4(c: Column): Column = Num.t4zero(c)
    def dec(c: Column): Column = Num.dec(c)
    // coalesce: an EMPTY input aggregates every sum to NULL — the n's
    // must come back 0 so the degenerate branch (not a NULL cascade)
    // decides the output
    def side(label: String, tag: String) = Seq(
      coalesce(sum(when(group === label, 1L).otherwise(0L)), lit(0L)).as(s"__n_$tag"),
      sum(when(group === label, dec(value)).otherwise(lit(null))).as(s"__s_$tag"),
      sum(when(group === label, dec(value) * dec(value)).otherwise(lit(null)))
        .as(s"__ss_$tag"))
    val aggs = side(groupA, "a") ++ side(groupB, "b")
    val m = df.filter(value.isNotNull).agg(aggs.head, aggs.tail: _*)
    def mean(t: String) = col(s"__s_$t").cast("double") / col(s"__n_$t")
    def variance(t: String) = greatest(lit(0.0),
      (col(s"__ss_$t").cast("double") -
        col(s"__s_$t").cast("double") * col(s"__s_$t").cast("double") /
          col(s"__n_$t")) /
        (col(s"__n_$t") - 1))
    val se = sqrt(variance("a") / col("__n_a") + variance("b") / col("__n_b"))
    val degenerate =
      col("__n_a") < 2 || col("__n_b") < 2
    val z = when(degenerate || se === 0.0, lit(0.0))
      .otherwise(t4((mean("a") - mean("b")) / se))
    m.select(
      col("__n_a").as("n_a"),
      when(col("__n_a") > 0, t4(mean("a"))).otherwise(lit(0.0)).as("mean_a"),
      col("__n_b").as("n_b"),
      when(col("__n_b") > 0, t4(mean("b"))).otherwise(lit(0.0)).as("mean_b"),
      z.as("z"),
      (abs(z) > 1.96).as("significant"))
  }

  /** Rolling z-score anomaly flags — the metric-monitoring shape
    * ("did this hour's event volume jump?"): each (key, bucket) value
    * is scored against the TRAILING `lookback` buckets' mean and
    * sample stddev; |z| > `zThresh` flags an anomaly. The baseline
    * window excludes the current row (an anomaly must not dilute its
    * own baseline), and rows with fewer than `minPeriods` trailing
    * buckets are unflagged with z = 0 — no baseline, no verdict.
    *
    * Shape at scale: ONE key-partitioned ordered window carrying the
    * trailing count/sum/sum-of-squares (exact decimals, so any
    * engine/partitioning derives identical moments); z derives in
    * double, truncated 4 dp TOWARD ZERO (twoSampleZ's symmetric-gate
    * contract); degenerate baselines (std = 0) yield z = 0. Input
    * buckets must be one row per (key, bucket).
    */
  def rollingZ(
      df: DataFrame,
      key: Column,
      bucket: Column,
      value: Column,
      lookback: Int,
      zThresh: Double = 3.0,
      minPeriods: Int = 3): DataFrame = {
    require(lookback >= minPeriods && minPeriods >= 2,
      "need lookback >= minPeriods >= 2 trailing buckets for a stddev baseline")
    def t4(c: Column): Column = Num.t4zero(c)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(bucket)
      .rowsBetween(-lookback, -1)
    val d = df.withColumn("__v", value.cast("double"))
      .withColumn("__n", count(col("__v")).over(w))
      .withColumn("__s", sum(Num.dec(col("__v"))).over(w))
      .withColumn("__ss", sum(Num.dec(col("__v")) * Num.dec(col("__v"))).over(w))
    val n = col("__n").cast("double")
    val mean = col("__s").cast("double") / n
    val variance = greatest(lit(0.0),
      (col("__ss").cast("double") - col("__s").cast("double") * col("__s").cast("double") / n)
        / (n - 1))
    val std = sqrt(variance)
    // null values score 0 like every sibling scaler (standardize /
    // robustStandardize): a null z would poison `anomaly` into
    // three-valued logic and NPE primitive collectors
    val z = when(col("__v").isNull || col("__n") < minPeriods || std === 0.0, lit(0.0))
      .otherwise(t4((col("__v") - mean) / std))
    d.withColumn("baseline_n", col("__n"))
      .withColumn("z", z)
      .withColumn("anomaly", abs(z) > zThresh && col("__n") >= minPeriods)
      .drop("__v", "__n", "__s", "__ss")
  }

  /** Classifier threshold sweep — the calibration report behind "where
    * do we set the quality-gate cut?": for each candidate threshold t,
    * the confusion counts of the rule `score >= t` against a boolean
    * label, plus precision/recall/F1. Run it on a labeled holdout
    * before committing a gate threshold to a 100 TB curation pass
    * (the decision [[graft.operators.Classify.trainLogistic]] +
    * `linearTextScore` feed into).
    *
    * ONE partial-aggregated scan evaluates every threshold
    * (`Quality.attrition`'s shape: 4·k conditional sums in a single
    * aggregate row, per-threshold rows exploded from it) — sweeping 50
    * thresholds costs the same scan as sweeping 3. Rows with a null
    * score or label are excluded (a gate can't act on them either
    * way); counts are exact longs, the ratios round at 4 dp with the
    * 0/0 → 0.0 convention shared with `Dedup.auditPairs`.
    */
  def prCurve(
      df: DataFrame,
      score: Column,
      label: Column,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "at least one threshold required")
    val y = label.cast("boolean")
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      val pos = score >= t
      Seq(
        sum(when(pos && y, 1L).otherwise(0L)).as(s"__tp$i"),
        sum(when(pos && !y, 1L).otherwise(0L)).as(s"__fp$i"),
        sum(when(!pos && y, 1L).otherwise(0L)).as(s"__fn$i"),
        sum(when(!pos && !y, 1L).otherwise(0L)).as(s"__tn$i"))
    }
    val wide = df.filter(score.isNotNull && label.isNotNull)
      .agg(aggs.head, aggs.tail: _*)
    def t4(c: Column): Column = round(c, 4)
    val rows = thresholds.zipWithIndex.map { case (t, i) =>
      val tp = coalesce(col(s"__tp$i"), lit(0L))
      val fp = coalesce(col(s"__fp$i"), lit(0L))
      val fn = coalesce(col(s"__fn$i"), lit(0L))
      val tn = coalesce(col(s"__tn$i"), lit(0L))
      val p = when(tp + fp === 0, 0.0).otherwise(t4(tp * lit(1.0) / (tp + fp)))
      val r = when(tp + fn === 0, 0.0).otherwise(t4(tp * lit(1.0) / (tp + fn)))
      struct(
        lit(t).as("threshold"),
        tp.as("tp"), fp.as("fp"), fn.as("fn"), tn.as("tn"),
        p.as("precision"), r.as("recall"),
        when(p + r === 0, 0.0).otherwise(t4(lit(2.0) * p * r / (p + r))).as("f1"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
