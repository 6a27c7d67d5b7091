package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-function library: the string/regex/date kernels the reference
  * uses (tratamento_epe.R:98-189), plus vector and text-shingle kernels
  * for the LLM-data operators. Everything here composes built-in
  * `org.apache.spark.sql.functions` so it stays inside whole-stage
  * codegen — no UDFs.
  */
package object functions {

  // ---- wrangling kernels (reference surface) ----

  /** Fill-down / last-observation-carried-forward, the Spark analogue of
    * zoo::na.locf0 (tratamento_epe.R:100,140). Requires an explicit
    * ordering column (Spark has no implicit row order) AND a non-empty
    * partition spec: an empty spec would be a global single-partition
    * window — all rows through one task, a silent 100 TB scale-killer —
    * so it is rejected rather than defaulted.
    */
  def fillDown(c: Column, orderBy: Seq[Column], partitionBy: Seq[Column]): Column = {
    require(partitionBy.nonEmpty,
      "fillDown: partitionBy must be non-empty — an empty spec is a global " +
        "single-partition window. Pass the group/sheet key.")
    last(c, ignoreNulls = true)
      .over(Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
  }

  /** str_to_title analogue (tratamento_epe.R:154). */
  def titleCase(c: Column): Column = initcap(lower(c))

  /** Whitespace tokenization after lowercase + punctuation strip.
    *
    * No HOF: `\\s+` splitting can only produce empty tokens at the
    * boundaries (interior whitespace runs are consumed whole), and
    * `array_remove(…, "")` — a codegen'd built-in — drops exactly
    * those. The previous `filter(..., len > 0)` form was semantically
    * identical but ran INTERPRETED per token (Spark never
    * code-generates HOF lambdas), an every-text-query tax; a
    * trim-before-split form was tried and rejected because the
    * `when(length…)` guard it needs re-evaluates the regex chain
    * (subexpression elimination does not cross conditional branches).
    * Pinned equivalent to the filter form in TextMetricsSpec.
    */
  def tokens(text: Column): Column =
    array_remove(
      split(regexp_replace(lower(text), "[^\\p{L}\\p{Nd}\\s]", " "), "\\s+"), "")

  /** Sliding word n-grams ("shingles") over the token array; empty when
    * the document has fewer than n tokens.
    *
    * `toks` is bound through a single-element-array transform so the
    * inner lambda sees it as a LAMBDA VARIABLE. Spark's interpreted HOF
    * eval re-evaluates any non-lambda-var subtree in the lambda body
    * once per element — referencing `toks` (often a whole
    * `tokens(text)` tree) directly in the position lambda re-tokenized
    * the document once per shingle position, O(len²) per doc. Bound as
    * a lambda var it is evaluated exactly once per row.
    */
  def shingles(toks: Column, n: Int): Column =
    flatten(transform(array(toks), tk => {
      val upper = size(tk) - n
      when(upper < 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), upper), i => concat_ws(" ", slice(tk, i + 1, lit(n)))))
    }))

  /** Normalized-content fingerprint: lower, strip punct, collapse ws, md5. */
  def normFingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^\\p{L}\\p{Nd}\\s]", " "), "\\s+", " ")))

  // ---- Z-order (Morton) interleaving ----

  /** Clamp a numeric column onto the integer grid [0, 2^bits) for
    * [[zOrderValue]]: floor-scale from [lo, hi), out-of-range values
    * clamp to the edge cells (a point outside the declared range
    * still sorts to the nearest corner rather than corrupting the
    * interleave). Fixed caller-declared ranges, NOT data-dependent
    * min/max — layout must be stable across corpus snapshots or every
    * incremental write reshuffles.
    */
  def zGridCoord(x: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, "hi must exceed lo")
    require(bits >= 1 && bits <= 31, "bits in [1, 31]")
    val cells = (1L << bits).toDouble
    least(greatest(floor((x - lo) / (hi - lo) * cells), lit(0.0)),
      lit(cells - 1)).cast("long")
  }

  /** Z-order (Morton) value of k grid coordinates, each in
    * [0, 2^bits): bit j of column i lands at position j·k + i — the
    * bit-interleave that makes points close in EVERY dimension close
    * in the one-dimensional sort order. Range-partition + sort by
    * this value before a columnar write and the per-file min/max
    * stats are tight on ALL k columns at once, so a predicate on any
    * of them prunes files (the OPTIMIZE ZORDER story, as one
    * codegen'd integer expression — the bit lanes are disjoint, so
    * the combining `+` is bitwise OR and every term is exact).
    */
  def zOrderValue(coords: Seq[Column], bits: Int): Column = {
    require(coords.nonEmpty, "at least one coordinate")
    val k = coords.size
    require(k * bits <= 62, s"k*bits = ${k * bits} exceeds a signed long")
    val lanes = for {
      (c, i) <- coords.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * k + i)
    lanes.reduce(_ + _)
  }

  // ---- vector kernels ----

  /** Dot product of two array<double>/array<float> columns — a
    * codegen'd Catalyst Expression (see [[DotProduct]]); identical
    * left-to-right summation to the HOF fold it replaced.
    */
  def dot(a: Column, b: Column): Column = DotProduct.dotProduct(a, b)

  def l2Norm(a: Column): Column = sqrt(DotProduct.dotProduct(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  // ---- MinHash (pure functions, codegen'd; no UDF) ----

  /** MinHash family parameters: `numHashes` seeded affine permutations
    * h_i(x) = (a_i·x + b_i) mod p over a 31-bit Mersenne prime. Shared
    * by signature construction and any oracle that replays it.
    */
  val minHashPrime: Long = 2147483647L // 2^31-1, Mersenne

  def minHashParams(numHashes: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)((
      math.abs(rnd.nextLong()) % (minHashPrime - 1) + 1,
      math.abs(rnd.nextLong()) % minHashPrime))
  }

  /** 64-bit MinHash signature of a string-array column: for each seeded
    * permutation, the minimum over xxhash64 of the elements. Returns
    * array<long> of length numHashes (empty input → array of p).
    *
    * NOTE: this per-row form evaluates the element-hash tree once per
    * permutation in interpreted (non-codegen) HOF eval — fine for small
    * arrays / tests. The scale path is `operators.Dedup.minHashLSH`,
    * which computes the same signature via explode + codegen'd min
    * aggregates (one partial-aggregated shuffle, no HOFs on the hot
    * path).
    */
  def minHashSignature(elems: Column, numHashes: Int, seed: Long = 42L): Column = {
    val prime = minHashPrime
    val params = minHashParams(numHashes, seed)
    val hashed = transform(elems, e => pmod(xxhash64(e), lit(prime)))
    array(params.map { case (a, b) =>
      coalesce(array_min(transform(hashed, h => pmod(h * a + b, lit(prime)))), lit(prime))
    }: _*)
  }
}
