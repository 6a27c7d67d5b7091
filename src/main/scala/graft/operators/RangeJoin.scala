package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: `left.point BETWEEN right.lo AND right.hi`.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoopJoin (or a
  * cartesian product) — O(|L|·|R|) and a non-starter at scale. The
  * standard fix bins the number line: each left point lands in one
  * bin, each right interval replicates into the ceil(span/binWidth)+1
  * bins it overlaps, and the join becomes an EQUI-join on the bin id
  * followed by the exact BETWEEN as a post-filter. Work drops to
  * O(|L| + |R|·spans + matches) with an ordinary shuffled hash join —
  * partial-aggregation-friendly, AQE-skew-splittable, never a product.
  *
  * `binWidth` trades replication (wide intervals → more bins) against
  * bin selectivity; pick ≈ the median interval span.
  */
object RangeJoin {

  /** Supported join types: inner and left. The exact BETWEEN is part
    * of the JOIN CONDITION (not a post-filter), so left-outer null
    * extension survives: a point overlapping no interval comes back
    * once, null-extended. Right/full are rejected — an unmatched
    * interval is replicated once per bin it spans, so its null row
    * would appear with the wrong multiplicity.
    */
  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      point: Column,
      lo: Column,
      hi: Column,
      binWidth: Double,
      joinType: String = "inner"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter").contains(jt),
      s"pointInInterval supports inner/left only, got '$joinType' " +
        "(interval-side bin replication breaks right/full multiplicity)")
    val l = left.withColumn("__binl", floor(point / binWidth).cast("long"))
    val r = right
      .withColumn("__lo_bin", floor(lo / binWidth).cast("long"))
      .withColumn("__hi_bin", floor(hi / binWidth).cast("long"))
      .withColumn("__binr", explode(sequence(col("__lo_bin"), col("__hi_bin"))))
      .drop("__lo_bin", "__hi_bin")
    l.join(r, col("__binl") === col("__binr") && point >= lo && point <= hi, joinType)
      .drop("__binl", "__binr")
  }

  /** Interval-overlap join: pairs where `[llo, lhi]` and `[rlo, rhi]`
    * overlap (closed intervals: `llo <= rhi AND rlo <= lhi`).
    *
    * Same binning idea as [[pointInInterval]], with BOTH sides
    * replicated into the bins they span. A pair overlapping across k
    * shared bins would match k times, so the join keeps only the
    * CANONICAL bin — the bin containing the overlap's start
    * `greatest(llo, rlo)`: exactly one bin per overlapping pair, hence
    * exactly one output row, no post-dedup pass. Work is
    * O(|L|·spansL + |R|·spansR + matches) through an ordinary shuffled
    * equi-join — never a product. Inner only: bin replication breaks
    * outer-join multiplicity on both sides.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      llo: Column,
      lhi: Column,
      rlo: Column,
      rhi: Column,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, lo: Column, hi: Column, out: String): DataFrame =
      df.withColumn("__b0", floor(lo / binWidth).cast("long"))
        .withColumn("__b1", floor(hi / binWidth).cast("long"))
        .withColumn(out, explode(sequence(col("__b0"), col("__b1"))))
        .drop("__b0", "__b1")
    val l = binned(left, llo, lhi, "__binl")
    val r = binned(right, rlo, rhi, "__binr")
    l.join(r,
        col("__binl") === col("__binr") &&
          llo <= rhi && rlo <= lhi &&
          col("__binl") === floor(greatest(llo, rlo) / binWidth).cast("long"))
      .drop("__binl", "__binr")
  }
}
