package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches the plain join result on a skewed key") {
    // skew: every lineitem of one returnflag lands on one join key
    val big = sources.Tables.load(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_returnflag".as("k"), $"l_extendedprice")
    val small = Seq(("A", 1.0), ("N", 2.0), ("R", 3.0)).toDF("k", "w")
    val plain = big.join(small, Seq("k"))
      .agg(sum($"l_extendedprice" * $"w").cast("decimal(18,2)")).head().getDecimal(0)
    val salted = Skew.saltedJoin(big, small, Seq("k"), bigSaltBy = $"l_orderkey",
        saltBuckets = 8)
      .agg(sum($"l_extendedprice" * $"w").cast("decimal(18,2)")).head().getDecimal(0)
    assert(plain == salted)
  }

  test("saltedJoin preserves row multiplicity") {
    val big = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "v")
    val small = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "w")
    val plain = big.join(small, Seq("k")).count()
    val salted = Skew.saltedJoin(big, small, Seq("k"),
      bigSaltBy = $"v", saltBuckets = 4).count()
    assert(plain == salted && salted == 5)
  }
}
