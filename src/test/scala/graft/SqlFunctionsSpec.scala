package graft

import org.apache.spark.sql.functions._

import graft.functions.{DotProduct, RollingHashWinnow, SimHash64}

/** The SQL names registered by GraftFunctions must agree exactly with
  * the Column API for every custom expression.
  */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("simhash64 SQL name matches the Column API") {
    val df = Seq((1L, Seq("a", "b", "c")), (2L, Seq("x", "y"))).toDF("id", "toks")
    df.createOrReplaceTempView("t_sim")
    val viaSql = spark.sql("SELECT id, simhash64(toks) AS s FROM t_sim ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    val viaCol = df.select($"id", SimHash64.simhash64($"toks").as("s")).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("winnow_fingerprint SQL name matches the Column API incl. params") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    df.createOrReplaceTempView("t_win")
    val viaSql = spark.sql("SELECT winnow_fingerprint(text, 4, 8) AS f FROM t_win")
      .as[Seq[Long]].head()
    val viaCol = df.select(RollingHashWinnow.winnowFingerprint($"text", 4, 8).as("f"))
      .as[Seq[Long]].head()
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }

  test("dot_product SQL name matches the Column API") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    df.createOrReplaceTempView("t_dot")
    val viaSql = spark.sql("SELECT dot_product(a, b) AS d FROM t_dot").as[Double].head()
    val viaCol = df.select(DotProduct.dotProduct($"a", $"b").as("d")).as[Double].head()
    assert(viaSql == 32.0 && viaCol == 32.0)
  }

  test("SQL builders coerce argument types like the Column wrappers") {
    // int arrays: without the builder-side cast this read int-backed
    // ArrayData through getDouble — silently wrong values
    val d = spark.sql("SELECT dot_product(array(1, 2), array(3, 4)) AS d").as[Double].head()
    assert(d == 11.0, s"int-array dot_product returned $d")
    // int tokens / int text coerce instead of failing or misreading
    val viaSqlSim = spark.sql("SELECT simhash64(array(12, 34)) AS s").as[Long].head()
    val viaColSim = spark.range(1)
      .select(SimHash64.simhash64(array(lit("12"), lit("34"))).as("s")).as[Long].head()
    assert(viaSqlSim == viaColSim)
    val viaSqlWin = spark.sql("SELECT winnow_fingerprint(1234567890, 4, 8) AS f")
      .as[Seq[Long]].head()
    val viaColWin = spark.range(1)
      .select(RollingHashWinnow.winnowFingerprint(lit("1234567890"), 4, 8).as("f"))
      .as[Seq[Long]].head()
    assert(viaSqlWin == viaColWin)
  }

  test("unicode_normalize SQL name matches the Column API and rejects bad forms") {
    // decomposed e + U+0301 must compose to é under NFC on both paths
    val df = Seq((1L, "cafe\u0301"), (2L, "plain")).toDF("id", "text")
    df.createOrReplaceTempView("t_nfc")
    val viaSql = spark.sql(
      "SELECT id, unicode_normalize(text) AS s, unicode_normalize(text, 'NFKC') AS k " +
        "FROM t_nfc ORDER BY id").as[(Long, String, String)].collect().toSeq
    val viaCol = df.select($"id",
        graft.functions.UnicodeNormalize.nfc($"text").as("s"),
        graft.functions.UnicodeNormalize.nfkc($"text").as("k"))
      .orderBy("id").as[(Long, String, String)].collect().toSeq
    assert(viaSql == viaCol)
    assert(viaSql.head._2 == "caf\u00e9" && viaSql.head._2.length == 4)
    val err = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', 'NFX')").collect()
    }
    assert(err.getMessage.contains("NFX") || err.getMessage.contains("form"))
  }
}
