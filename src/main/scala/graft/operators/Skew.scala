package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation — the salting helper SURVEY §5 commits to.
  *
  * AQE's skew-join splitting handles most runtime skew; salting is the
  * planned-ahead form for joins where one key dominates (the web-scale
  * classic: one host, one boilerplate fingerprint, one null-ish key
  * carrying 30% of rows). The hot key's rows scatter across
  * `saltBuckets` partitions; the other side replicates `saltBuckets`×
  * per key — bounded, explicit, and shuffle-balanced.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `keys`, salted into `saltBuckets`.
    *
    * @param bigSaltBy deterministic per-row expression on the big side
    *                  that spreads rows (an id column; never a constant)
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      bigSaltBy: Column,
      saltBuckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0)
    // the small side is replicated saltBuckets× — under right/full its
    // UNMATCHED rows would surface once per replica, breaking outer
    // multiplicity; only big-side-preserving types are sound here
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti, got '$joinType'")
    val b = big.withColumn("__salt", pmod(xxhash64(bigSaltBy), lit(saltBuckets)).cast("int"))
    val s = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
