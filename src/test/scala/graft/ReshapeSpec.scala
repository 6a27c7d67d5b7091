package graft

import org.apache.spark.sql.functions._

import graft.operators.Reshape

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  test("sliceRows drops leading rows per partition (slice(-1:-3) analogue)") {
    val df = Seq(
      ("a", 1, "hdr1"), ("a", 2, "hdr2"), ("a", 3, "hdr3"), ("a", 4, "data1"), ("a", 5, "data2"),
      ("b", 1, "hdr1"), ("b", 2, "hdr2"), ("b", 3, "hdr3"), ("b", 4, "data3")
    ).toDF("sheet", "pos", "v")
    val out = Reshape.sliceRows(df, orderBy = Seq(col("pos")), from = 4,
      until = -1, partitionBy = Seq(col("sheet")))
    assert(out.select("v").as[String].collect().sorted ===
      Array("data1", "data2", "data3"))
  }

  test("sliceRows with bounded range keeps [from, until] per partition") {
    val df = (1 to 10).map(i => (if (i <= 5) "a" else "b", i)).toDF("g", "i")
    val out = Reshape.sliceRows(df, Seq(col("i")), from = 3, until = 4,
      partitionBy = Seq(col("g")))
    assert(out.select("i").as[Int].collect().sorted === Array(3, 4, 8, 9))
  }

  test("sliceRows and fillDown reject an empty partition spec (global-window guard)") {
    val df = (1 to 3).toDF("i")
    intercept[IllegalArgumentException] {
      Reshape.sliceRows(df, Seq(col("i")), from = 1, until = 2, partitionBy = Nil)
    }
    intercept[IllegalArgumentException] {
      graft.functions.fillDown(col("i"), Seq(col("i")), Nil)
    }
  }

  test("selectMatching / dropMatching filter columns by regex") {
    val df = Seq((1, 2, 3, "x")).toDF("m1", "m2", "other", "id")
    assert(Reshape.selectMatching(df, "^m[0-9]+$", keep = Seq("id")).columns.toSet
      === Set("m1", "m2", "id"))
    assert(Reshape.dropMatching(df, "^m[0-9]+$").columns.toSet === Set("other", "id"))
  }

  test("castMatching bulk-casts regex-matched columns") {
    val df = Seq(("1", "2", "x")).toDF("m1", "m2", "id")
    val out = Reshape.castMatching(df, "^m[0-9]+$", "int")
    assert(out.schema("m1").dataType.typeName === "integer")
    assert(out.schema("id").dataType.typeName === "string")
  }

  test("castMatchingSafe coerces malformed cells to null (as.numeric NA semantics)") {
    val df = Seq(("1", "2.5"), ("-", "oops"), ("3", "")).toDF("m1", "m2")
    val out = Reshape.castMatchingSafe(df, "^m[0-9]+$", "double")
      .orderBy("m1").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(out.toSet === Set(
      (Some(1.0), Some(2.5)), (None, None), (Some(3.0), None)))
    // strict variant fails on the same data (ANSI contract)
    intercept[Exception] {
      Reshape.castMatching(df, "^m[0-9]+$", "double").collect()
    }
  }

  test("fillDownCols carries last non-null forward within partition") {
    val df = Seq(
      ("a", 1, Some(10)), ("a", 2, None), ("a", 3, None), ("a", 4, Some(40)), ("a", 5, None),
      ("b", 1, None), ("b", 2, Some(7))
    ).toDF("k", "pos", "v")
    val out = Reshape.fillDownCols(df, Seq("v"), Seq(col("pos")), Seq(col("k")))
      .orderBy("k", "pos").select("v").as[Option[Int]].collect()
    assert(out === Array(Some(10), Some(10), Some(10), Some(40), Some(40), None, Some(7)))
  }

  test("separate splits with right-fill nulls") {
    val df = Seq("2024_5", "2023_11", "plain").toDF("ym")
    val out = Reshape.separate(df, "ym", "_", Seq("ano", "mes"))
      .orderBy("ano").collect()
    assert(out.map(r => (r.getString(0), Option(r.getString(1)))).toSet ===
      Set(("2023", Some("11")), ("2024", Some("5")), ("plain", None)))
  }

  test("promoteFirstRowToHeader lifts the ordered first row into column names") {
    import spark.implicits._
    val df = Seq(
      (0, "2024_1", "2024_2"),
      (1, "10", "20"),
      (2, "30", "40")).toDF("rn", "a", "b")
    val out = graft.operators.Reshape.promoteFirstRowToHeader(
      df, orderBy = Seq(org.apache.spark.sql.functions.col("rn")))
    // header row consumed; its values became the column names
    assert(out.columns.toSeq == Seq("0", "2024_1", "2024_2"))
    assert(out.count() == 2)
    assert(out.select("2024_1").as[String].collect().sorted.toSeq == Seq("10", "30"))
    // sort-direction wrappers are rejected loudly (min_by can't honor
    // them — silently promoting the wrong row would be worse); the
    // documented max-row alternative is an inverted key
    val err = intercept[IllegalArgumentException] {
      graft.operators.Reshape.promoteFirstRowToHeader(
        df, orderBy = Seq(org.apache.spark.sql.functions.col("rn").desc))
    }
    assert(err.getMessage.contains("value columns"))
    val maxPromoted = graft.operators.Reshape.promoteFirstRowToHeader(
      df, orderBy = Seq(-org.apache.spark.sql.functions.col("rn")))
    assert(maxPromoted.columns.toSeq == Seq("2", "30", "40"))
  }

  test("bindRows aligns schemas with nulls") {
    val a = Seq((1, "x")).toDF("id", "only_a")
    val b = Seq((2, 3.0)).toDF("id", "only_b")
    val u = Reshape.bindRows(a, b)
    assert(u.columns.toSet === Set("id", "only_a", "only_b"))
    assert(u.count() === 2)
    assert(u.filter(col("only_a").isNull).count() === 1)
  }

  test("epe pipeline output is long, keyed, and complete") {
    val out = pipeline.EpeWideToLong.run(
      spark.read.parquet(s"$sf/orders.parquet"))
    val cols = out.columns.toSeq
    assert(cols === Seq("selector", "ano", "mes", "data", "valor"))
    assert(out.count() > 0)
    // every selector carries the constant suffix from the key concat
    assert(out.filter(!col("selector").endsWith("- MERCADO")).count() === 0)
  }
}
