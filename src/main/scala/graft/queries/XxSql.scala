package graft.queries

import org.apache.spark.sql.catalyst.expressions.XXH64

/** DuckDB-side replay of Spark's `xxhash64` — the key that turns the
  * seeded-hash dedup family (MinHash/LSH, SimHash, winnowing) from
  * rows-only into EXACTLY oracle-checked queries.
  *
  * Spark's hash (`org.apache.spark.sql.catalyst.expressions.XXH64`)
  * uses the five CANONICAL xxHash64 primes (PRIME64_2 =
  * `0xC2B2AE3D27D4EB4F` IS the reference-spec value); where Spark
  * deviates from a stock xxHash64-of-bytes is in the framing — how
  * each SQL type is serialized before hashing (longs hash as a single
  * fixed 8-byte lane, strings as raw UTF-8 bytes) and the per-column
  * seed-chaining `hash(c1, hash(c2, seed))` convention. All constants
  * below match both the reference spec and the shipped class, and the
  * whole machinery is pinned end-to-end in XxSqlSpec: the generated
  * SQL's hashes equal the engine's on every corpus shingle plus
  * length-class / multi-byte edge cases.
  *
  * DuckDB 1.x has no wrapping 64-bit arithmetic (UBIGINT ops RAISE on
  * overflow), so everything rides HUGEINT with explicit `% 2^64`
  * masking; 64×64-bit products split into 32-bit halves so no
  * intermediate exceeds 2^97. XOR casts through UBIGINT (bit ops
  * don't overflow). Strings become byte lists via `hex(encode(s))` —
  * UTF-8 bytes, matching the engine's UTF8String hashing.
  *
  * Everything here is ORACLE plumbing (driver-side DuckDB): the Spark
  * side is untouched and never pays any of this.
  */
object XxSql {
  private val Two32 = BigInt(1) << 32
  private val Two64 = BigInt(1) << 64
  private val M64 = Two64.toString

  // xxHash64 primes (canonical reference-spec values; see scaladoc)
  val P1 = BigInt("11400714785074694791")
  val P2 = BigInt("14029467366897019727")
  val P3 = BigInt("1609587929392839161")
  val P4 = BigInt("9650029242287828579")
  val P5 = BigInt("2870177450012600261")

  /** Unsigned view of a signed Long. */
  def unsigned(l: Long): BigInt = (BigInt(l) + Two64) % Two64

  // ---- wrapping-arithmetic SQL fragments (HUGEINT domain) ----

  /** (a + b) mod 2^64. */
  def add64(a: String, b: String): String = s"((($a) + ($b)) % $M64)"

  /** (a * c) mod 2^64 for a 64-bit constant c, halves precomputed so no
    * intermediate exceeds HUGEINT range.
    */
  def mulc(a: String, c: BigInt): String = {
    val hi = c / Two32
    val lo = c % Two32
    s"((((($a)//4294967296)*$lo + (($a)%4294967296)*$hi)*4294967296 + (($a)%4294967296)*$lo) % $M64)"
  }

  /** XOR via UBIGINT (values always in [0, 2^64)). */
  def xor64(a: String, b: String): String =
    s"xor(($a)::UBIGINT, ($b)::UBIGINT)::HUGEINT"

  /** Rotate-left by r. */
  def rotl64(x: String, r: Int): String = {
    val hi = BigInt(1) << (64 - r)
    val lo = BigInt(1) << r
    s"((($x) % $hi) * $lo + ($x) // $hi)"
  }

  /** Logical shift right by r. */
  def shr(x: String, r: Int): String = s"(($x) // ${BigInt(1) << r})"

  /** Little-endian 8-byte word of 1-indexed byte-list `bs` at 0-based
    * byte offset `off`.
    */
  def w8(bs: String, off: String): String =
    (0 until 8).map(i => s"($bs)[($off)+${i + 1}]::HUGEINT*${BigInt(1) << (8 * i)}")
      .mkString("(", " + ", ")")

  /** Little-endian 4-byte word. */
  def w4(bs: String, off: String): String =
    (0 until 4).map(i => s"($bs)[($off)+${i + 1}]::HUGEINT*${BigInt(1) << (8 * i)}")
      .mkString("(", " + ", ")")

  /** xxh64 "round" with zero accumulator: rotl(w*P2, 31)*P1. */
  def round0(w: String): String = mulc(rotl64(mulc(w, P2), 31), P1)

  /** Lane round: rotl(v + w*P2, 31)*P1. */
  def roundv(v: String, w: String): String =
    mulc(rotl64(add64(v, mulc(w, P2)), 31), P1)

  /** fmix staged over three columns is cheap enough inline: callers use
    * [[fmixCtes]] when h is a column name.
    */
  def fmixCtes(pre: String, src: String, keep: Seq[String], out: String): String = {
    val k = keep.mkString(", ")
    val sep = if (keep.isEmpty) "" else ", "
    s"""${pre}f1 AS (SELECT $k$sep${mulc(xor64("h", shr("h", 33)), P2)} AS h FROM $src),
       |${pre}f2 AS (SELECT $k$sep${mulc(xor64("h", shr("h", 29)), P3)} AS h FROM ${pre}f1),
       |$out AS (SELECT $k$sep${xor64("h", shr("h", 32))} AS h FROM ${pre}f2)""".stripMargin
  }

  /** Spark `XXH64.hashInt(i, seed)` computed ENGINE-side at
    * oracle-build time (the values are inlined as literals — the
    * engine's own primitive is the ground truth, not a transcription).
    */
  def hashIntConst(i: Int, seed: Long = 42L): BigInt = unsigned(XXH64.hashInt(i, seed))

  /** Staged hashLong(v, h) chain: emits CTEs `{pre}a..{pre}d` and the
    * final `{out}`; `vexpr` is a signed BIGINT expression, `h` the
    * incoming unsigned HUGEINT column, `keep` columns carried through.
    */
  def hashLongCtes(pre: String, src: String, vexpr: String, keep: Seq[String], out: String): String = {
    val k = keep.mkString(", ")
    val sep = if (keep.isEmpty) "" else ", "
    val uv = s"(CASE WHEN ($vexpr) < 0 THEN ($vexpr)::HUGEINT + $M64 ELSE ($vexpr)::HUGEINT END)"
    val t0 = add64("h", ((P5 + 8) % Two64).toString)
    s"""${pre}a AS (SELECT $k$sep${xor64(t0, round0(uv))} AS h FROM $src),
       |${pre}b AS (SELECT $k$sep${add64(mulc(rotl64("h", 27), P1), P4.toString)} AS h FROM ${pre}a),
       |${fmixCtes(pre, s"${pre}b", keep, out)}""".stripMargin
  }

  /** Staged hashInt(i, h) chain with a VARIABLE incoming state —
    * Spark's multi-arg `xxhash64(str, intCol)` hashes the string from
    * seed 42 then chains the int through this step. Emits
    * `{pre}a..{pre}b` + fmix CTEs ending `{out}`; `iexpr` a
    * NON-NEGATIVE INT expression (the & 0xFFFFFFFF reinterpretation
    * is the identity there), `h` the incoming unsigned HUGEINT
    * column, `keep` columns carried through.
    */
  def hashIntVarCtes(pre: String, src: String, iexpr: String, keep: Seq[String], out: String): String = {
    val k = keep.mkString(", ")
    val sep = if (keep.isEmpty) "" else ", "
    val uv = s"(($iexpr)::HUGEINT)"
    val t0 = add64("h", ((P5 + 4) % Two64).toString)
    s"""${pre}a AS (SELECT $k$sep${xor64(t0, mulc(uv, P1))} AS h FROM $src),
       |${pre}b AS (SELECT $k$sep${add64(mulc(rotl64("h", 23), P2), P3.toString)} AS h FROM ${pre}a),
       |${fmixCtes(pre, s"${pre}b", keep, out)}""".stripMargin
  }

  // lane seeds for Spark's fixed default seed 42
  private val V10 = (42 + P1 + P2) % Two64
  private val V20 = (42 + P2) % Two64
  private val V30 = BigInt(42)
  private val V40 = (BigInt(42) - P1 + Two64) % Two64
  private val HEmpty = (42 + P5) % Two64 // seed+P5, the <32-byte start

  /** CTE chain computing Spark `xxhash64(s)` (seed 42) for every row of
    * CTE `inp`(s). Appends CTEs prefixed `pre`; the final CTE
    * `{pre}hsx`(s, h) carries the SIGNED 64-bit hash. Handles every
    * length class: 4-lane 32-byte stripes via recursion (arbitrary
    * length), then ≤3 8-byte words, one optional 4-byte word, ≤3 tail
    * bytes — the exact loop structure of `XXH64.hashUnsafeBytes`.
    */
  def xxh64Ctes(inp: String, pre: String = ""): String = {
    // tail 8-byte word steps, each staged through a w column
    val steps8 = (1 to 3).map { j =>
      val srcCte = if (j == 1) s"${pre}h1" else s"${pre}e8${j - 1}"
      s"""${pre}e8${j}w AS (SELECT s, n, bs, o8s, w8cnt, h,
         |  CASE WHEN w8cnt >= $j THEN ${w8("bs", s"o8s+${8 * (j - 1)}")} ELSE 0 END AS w FROM $srcCte),
         |${pre}e8$j AS (SELECT s, n, bs, o8s, w8cnt, CASE WHEN w8cnt >= $j THEN
         |  ${add64(mulc(rotl64(xor64("h", round0("w")), 27), P1), P4.toString)}
         |  ELSE h END AS h FROM ${pre}e8${j}w)""".stripMargin
    }
    val stepsB = (1 to 3).map { j =>
      val srcCte = if (j == 1) s"${pre}e4" else s"${pre}b${j - 1}"
      s"""${pre}b$j AS (SELECT s, n, bs, CASE WHEN n%4 >= $j THEN
         |  ${mulc(rotl64(xor64("h", mulc(s"bs[(n - n%4 + $j)]::HUGEINT", P5)), 11), P1)}
         |  ELSE h END AS h FROM $srcCte)""".stripMargin
    }
    val minit = add64(add64(rotl64("v1", 1), rotl64("v2", 7)),
      add64(rotl64("v3", 12), rotl64("v4", 18)))
    s"""${pre}shb AS (SELECT s, octet_length(encode(s)) AS n, hex(encode(s)) AS hx FROM $inp),
       |${pre}shl AS (SELECT s, n, list_transform(range(1, n+1), i ->
       |    (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1))-1)*16 +
       |     strpos('0123456789ABCDEF', substr(hx, 2*i, 1))-1) AS bs FROM ${pre}shb),
       |${pre}lanes(s, off, v1, v2, v3, v4) AS (
       |  SELECT s, 0, $V10::HUGEINT, $V20::HUGEINT, $V30::HUGEINT, $V40::HUGEINT
       |  FROM ${pre}shl WHERE n >= 32
       |  UNION ALL
       |  SELECT s, off+32,
       |    ${roundv("v1", "w1")}, ${roundv("v2", "w2")},
       |    ${roundv("v3", "w3")}, ${roundv("v4", "w4")}
       |  FROM (SELECT l.s, l.off, l.v1, l.v2, l.v3, l.v4,
       |          ${w8("t.bs", "l.off")} AS w1, ${w8("t.bs", "l.off+8")} AS w2,
       |          ${w8("t.bs", "l.off+16")} AS w3, ${w8("t.bs", "l.off+24")} AS w4
       |        FROM ${pre}lanes l JOIN ${pre}shl t ON l.s = t.s WHERE l.off <= t.n - 32)
       |),
       |${pre}lfin AS (SELECT s, arg_max(v1, off) AS v1, arg_max(v2, off) AS v2,
       |       arg_max(v3, off) AS v3, arg_max(v4, off) AS v4 FROM ${pre}lanes GROUP BY s),
       |${pre}lm0 AS (SELECT s, $minit AS h, v1, v2, v3, v4 FROM ${pre}lfin),
       |${pre}lm1 AS (SELECT s, ${add64(mulc(xor64("h", round0("v1")), P1), P4.toString)} AS h, v2, v3, v4 FROM ${pre}lm0),
       |${pre}lm2 AS (SELECT s, ${add64(mulc(xor64("h", round0("v2")), P1), P4.toString)} AS h, v3, v4 FROM ${pre}lm1),
       |${pre}lm3 AS (SELECT s, ${add64(mulc(xor64("h", round0("v3")), P1), P4.toString)} AS h, v4 FROM ${pre}lm2),
       |${pre}lm4 AS (SELECT s, ${add64(mulc(xor64("h", round0("v4")), P1), P4.toString)} AS h FROM ${pre}lm3),
       |${pre}h1 AS (SELECT t.s, t.n, t.bs, (t.n//32)*32 AS o8s, t.n//8 - 4*(t.n//32) AS w8cnt,
       |      ${add64(s"COALESCE(m.h, $HEmpty::HUGEINT)", "t.n")} AS h
       |    FROM ${pre}shl t LEFT JOIN ${pre}lm4 m ON t.s = m.s),
       |${steps8.mkString(",\n")},
       |${pre}e4 AS (SELECT s, n, bs, CASE WHEN n%8 >= 4 THEN
       |    ${add64(mulc(rotl64(xor64("h", mulc(w4("bs", "8*(n//8)"), P1)), 23), P2), P3.toString)}
       |  ELSE h END AS h FROM ${pre}e83),
       |${stepsB.mkString(",\n")},
       |${fmixCtes(pre, s"${pre}b3", Seq("s"), s"${pre}uh")},
       |${pre}hsx AS (SELECT s, (CASE WHEN h >= 9223372036854775808 THEN h - $M64 ELSE h END)::BIGINT AS h
       |     FROM ${pre}uh)""".stripMargin
  }

  /** The MinHash permutation family as a VALUES list `(j, a, b)` —
    * generated by the ENGINE's own [[graft.functions.minHashParams]],
    * not a reimplementation.
    */
  def minHashParamsValues(numHashes: Int = 64, seed: Long = 42L): String =
    graft.functions.minHashParams(numHashes, seed).zipWithIndex
      .map { case ((a, b), j) => s"($j,${a}::BIGINT,${b}::BIGINT)" }
      .mkString(",")

  /** `hashInt(b, 42)` start values for the band hash chain, one per
    * band, as a VALUES list `(b, h0)`.
    */
  def bandSeedValues(bands: Int = 16): String =
    (0 until bands).map(b => s"($b,${hashIntConst(b)}::HUGEINT)").mkString(",")

  /** Winnowing fingerprint replay (`functions.RollingHashWinnow`): the
    * polynomial k-gram hash is position-local (h(p) = Σ c[p+j]·B^(k-1-j)
    * mod 2^64 — the kernel's rolling form is just the O(n) evaluation of
    * the same polynomial), so no recursion is needed; window selection
    * is rightmost-minimum per w-window on SIGNED comparisons, deduped
    * by position (the kernel's "emit when the position advances" —
    * selected positions are provably non-decreasing, so distinct
    * positions in position order IS the emitted sequence). The kernel
    * hashes UTF-16 code units (Java chars), so code points ≥ 0x10000
    * split into surrogate pairs before hashing. `inp`(id, s) →
    * `{pre}wfp`(id, p, h).
    */
  def winnowFpCtes(inp: String, pre: String = "", k: Int = 8, w: Int = 16): String = {
    val base = BigInt(1000003)
    val terms = (0 until k).map { j =>
      mulc(s"cs[p+${j + 1}]::HUGEINT", base.modPow(BigInt(k - 1 - j), Two64))
    }.mkString("(", " + ", s") % $M64")
    s"""${pre}wchr AS (SELECT id, flatten(list_transform(
       |    list_transform(range(1, len(s)+1), i -> unicode(substr(s, i, 1))),
       |    cp -> CASE WHEN cp < 65536 THEN [cp]
       |          ELSE [55296 + (cp-65536)//1024, 56320 + (cp-65536)%1024] END)) AS cs FROM $inp),
       |${pre}wkg AS (SELECT id, p,
       |    (CASE WHEN u >= 9223372036854775808 THEN u - $M64 ELSE u END)::BIGINT AS h
       |  FROM (SELECT id, p, $terms AS u
       |        FROM (SELECT id, cs, unnest(range(0, greatest(len(cs)-${k - 1}, 0))) AS p FROM ${pre}wchr))),
       |${pre}wgrid AS (SELECT id, unnest(range(0, greatest(mm - $w, 0) + 1)) AS start
       |  FROM (SELECT id, greatest(len(cs)-${k - 1}, 0) AS mm FROM ${pre}wchr) WHERE mm > 0),
       |${pre}wmin AS (SELECT g.id, g.start, min(t.h) AS mn
       |  FROM ${pre}wgrid g JOIN ${pre}wkg t ON t.id = g.id AND t.p >= g.start AND t.p < g.start + $w
       |  GROUP BY g.id, g.start),
       |${pre}wpos AS (SELECT t.id, m.start, max(t.p) AS p
       |  FROM ${pre}wmin m JOIN ${pre}wkg t ON t.id = m.id AND t.p >= m.start AND t.p < m.start + $w AND t.h = m.mn
       |  GROUP BY t.id, m.start),
       |${pre}wsel AS (SELECT DISTINCT id, p FROM ${pre}wpos),
       |${pre}wfp AS (SELECT s.id, s.p, t.h FROM ${pre}wsel s JOIN ${pre}wkg t ON t.id = s.id AND t.p = s.p)""".stripMargin
  }

  /** Band-bucket chain over a signature list column: emits CTEs turning
    * `{src}`(id, sig, b, h) — h pre-seeded with hashInt(b, 42) — into
    * `{out}`(id, b, sig, bucket) by hashing the band's `rowsPerBand`
    * signature positions through the hashLong chain (the exact
    * semantics of `xxhash64(lit(b), slice(sig, b*rows+1, rows))`).
    */
  def bandBucketCtes(src: String, out: String, rowsPerBand: Int, pre: String = "bk"): String = {
    val chains = (1 to rowsPerBand).map { k =>
      val in = if (k == 1) src else s"$pre${k - 1}"
      hashLongCtes(s"${pre}h$k", in, s"sig[$rowsPerBand*b+$k]", Seq("id", "b", "sig"), s"$pre$k")
    }
    s"""${chains.mkString(",\n")},
       |$out AS (SELECT id, b, sig, (CASE WHEN h >= 9223372036854775808 THEN h - $M64 ELSE h END)::BIGINT AS bucket FROM $pre$rowsPerBand)""".stripMargin
  }
}
