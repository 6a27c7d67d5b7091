package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Sources & sinks (SURVEY §2.A): loader coverage and partitioned
  * batch export (A3).
  */
class TablesSpec extends SparkSpec {

  test("loadAll exposes every table") {
    val all = sources.Tables.loadAll(spark, sf)
    assert(all.keySet == sources.Tables.names.toSet)
    assert(all("region").count() > 0)
  }

  test("writeParquet partitions by the requested columns and round-trips") {
    val out = Files.createTempDirectory("graft_write").toString
    val orders = sources.Tables.load(spark, sf, "orders")
      .withColumn("status", col("o_orderstatus"))
    sources.Tables.writeParquet(orders, out, partitionBy = Seq("status"))
    // hive-style partition dirs exist → partition pruning works downstream
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("status=")), s"no partition dirs in ${dirs.toSeq}")
    val back = spark.read.parquet(out)
    assert(back.count() == orders.count())
    // pruned read touches only one partition directory
    val pruned = back.filter(col("status") === "F")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(back.filter(col("status") === "F").count() ==
      orders.filter(col("o_orderstatus") === "F").count())
    assert(scan.contains("PartitionFilters") || scan.contains("status"), scan)
  }

  test("loadTextCorpus reads line and whole-file records with provenance") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_corpus")
    Files.write(dir.resolve("a.txt"), "first line\nsecond line\n".getBytes)
    Files.write(dir.resolve("b.txt"), "only line of b\n".getBytes)
    val lines = sources.Tables.loadTextCorpus(spark, dir.toString)
      .as[(String, String)].collect()
    assert(lines.length == 3)
    assert(lines.filter(_._1.endsWith("a.txt")).map(_._2).toSet ==
      Set("first line", "second line"))
    val docs = sources.Tables.loadTextCorpus(spark, dir.toString, wholeFile = true)
      .as[(String, String)].collect()
    assert(docs.length == 2)
    assert(docs.find(_._1.endsWith("a.txt")).get._2 == "first line\nsecond line\n")
  }

  test("ORC write/read round-trips with partition dirs") {
    val out = Files.createTempDirectory("graft_orc").toString
    val docs = sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    sources.Tables.writeOrc(docs, out, partitionBy = Seq("lang"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("lang=")), s"no partition dirs in ${dirs.toSeq}")
    val back = sources.Tables.loadOrc(spark, out)
    assert(back.count() == docs.count())
    assert(back.columns.toSet == docs.columns.toSet)
  }

  test("loadSheets reads a sheet-per-file workbook and round-trips through bindRows") {
    import spark.implicits._
    val wb = Files.createTempDirectory("graft_workbook").toString
    // 3 sheets, mixed formats, overlapping-but-not-identical schemas —
    // the reference's excel_sheets |> map(read_xls) |> bind_rows shape
    Seq(("2024", "10.5"), ("2025", "11.0")).toDF("ano", "valor")
      .write.option("header", "true").csv(s"$wb/residencial.csv")
    Seq(("2024", "3.2", "N")).toDF("ano", "valor", "flag")
      .write.option("header", "true").csv(s"$wb/industrial.csv")
    Seq(("2024", "7.7")).toDF("ano", "valor")
      .write.parquet(s"$wb/comercial.parquet")
    val sheets = sources.Tables.loadSheets(spark, wb)
    assert(sheets.keySet == Set("residencial", "industrial", "comercial"))
    // csv sheets arrive all-string (read_xls semantics)
    assert(sheets("residencial").schema.fields.forall(_.dataType.typeName == "string"))
    val bound = operators.Reshape.bindRows(
      sheets.toSeq.sortBy(_._1).map { case (n, df) => df.withColumn("sheet", lit(n)) }: _*)
    assert(bound.count() == 4)
    assert(bound.columns.toSet == Set("ano", "valor", "flag", "sheet"))
    assert(bound.filter(col("flag").isNull).count() == 3)
  }

  test("fetch lands a remote artifact once, idempotently, and feeds loadSheets") {
    // the reference pipeline from byte zero: download.file(url) -> read
    // sheets (tratamento_epe.R:39-47,57-66). file:// plays the remote.
    import XlsTestWriter._
    val wbBytes = cfb(workbook(
      sst(Seq(("ano", false), ("2024", false))),
      Seq(("dados", false, cat(labelSst(0, 0, 0), labelSst(1, 0, 1))))))
    val srcDir = Files.createTempDirectory("graft_remote")
    Files.write(srcDir.resolve("epe.xls"), wbBytes)
    val url = srcDir.resolve("epe.xls").toUri.toString
    val landing = Files.createTempDirectory("graft_landing").toString

    val p1 = sources.Tables.fetch(url, landing)
    assert(p1.endsWith("epe.xls"))
    assert(Files.readAllBytes(java.nio.file.Paths.get(p1)).toSeq == wbBytes.toSeq)
    val mtime1 = Files.getLastModifiedTime(java.nio.file.Paths.get(p1))
    // second fetch of identical content must not republish the payload
    Thread.sleep(20)
    val p2 = sources.Tables.fetch(url, landing)
    assert(p2 == p1)
    assert(Files.getLastModifiedTime(java.nio.file.Paths.get(p1)) == mtime1,
      "idempotent re-fetch republished the artifact")
    // content change at the source -> re-publish
    Files.write(srcDir.resolve("epe.xls"), wbBytes ++ Array[Byte](0))
    sources.Tables.fetch(url, landing)
    assert(Files.readAllBytes(java.nio.file.Paths.get(p1)).length == wbBytes.length + 1)

    // and the landed workbook reads end-to-end
    Files.write(srcDir.resolve("epe.xls"), wbBytes)
    val again = sources.Tables.fetch(url, landing)
    val sheets = sources.Tables.loadSheets(spark, again)
    assert(sheets("dados").head().getString(1) == "2024")
  }

  test("writeCsv/loadCsv round-trips with an explicit schema") {
    val out = Files.createTempDirectory("graft_csv").toString
    val nation = sources.Tables.load(spark, sf, "nation")
    sources.Tables.writeCsv(nation, out)
    val back = sources.Tables.loadCsv(spark, out, Some(nation.schema))
    assert(back.count() == nation.count())
    assert(back.schema == nation.schema)
  }

  test("writeJson/loadJson round-trips with an explicit schema") {
    val out = Files.createTempDirectory("graft_json").toString
    val region = sources.Tables.load(spark, sf, "region")
    sources.Tables.writeJson(region, out)
    val back = sources.Tables.loadJson(spark, out, Some(region.schema))
    assert(back.count() == region.count())
    assert(back.select(region.columns.map(org.apache.spark.sql.functions.col): _*)
      .collect().toSet == region.collect().toSet)
  }

  test("loadJsonLenient parses good rows and quarantines corrupt ones whole") {
    val dir = Files.createTempDirectory("graft_lenient")
    Files.write(dir.resolve("part.json"), java.util.Arrays.asList(
      """{"id": 1, "name": "ok one"}""",
      """{"id": 2 "name": "missing comma"}""",
      """{"id": 3, "name": "ok two"}""",
      """not json at all"""))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType)))
    val df = sources.Tables.loadJsonLenient(spark, dir.toString, schema).cache()
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // corrupt lines are captured verbatim for quarantine, fields null
    val captured = bad.select("_corrupt_record").collect().map(_.getString(0)).toSet
    assert(captured == Set("""{"id": 2 "name": "missing comma"}""", "not json at all"))
    assert(bad.filter(col("id").isNotNull).count() == 0)
  }

  test("loadCsvLenient quarantines wrong-arity and uncastable lines") {
    val dir = Files.createTempDirectory("graft_csv_lenient")
    Files.write(dir.resolve("part.csv"), java.util.Arrays.asList(
      "id,name,score",
      "1,alice,2.5",
      "2,bob,not_a_number",
      "3,carol,9.0"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType)))
    val df = sources.Tables.loadCsvLenient(spark, dir.toString, schema).cache()
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(bad.count() == 1)
    assert(bad.select("_corrupt_record").head().getString(0).contains("not_a_number"))
  }

  test("loadEvolved merges additively-drifted parquet shards; old shards null new columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString
    // release 1 shard: (id, x); release 2 shard adds column y
    Seq((1L, "a"), (2L, "b")).toDF("id", "x")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "x", "y")
      .write.mode("append").parquet(dir)
    val merged = sources.Tables.loadEvolved(spark, dir)
    assert(merged.columns.toSet == Set("id", "x", "y"))
    val rows = merged.select("id", "x", "y").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(rows == Set((1L, "a", -1L), (2L, "b", -1L), (3L, "c", 30L), (4L, "d", 40L)))
    // a plain read of the same dir may surface only one footer's schema
    // — the reason the merge is explicit
  }

  test("compact merges many small parquet files into size-targeted ones without losing rows") {
    val in = Files.createTempDirectory("graft_compact_in").toString
    val out = Files.createTempDirectory("graft_compact_out").toString
    val li = sources.Tables.load(spark, sf, "lineitem")
    li.repartition(64).write.mode("overwrite").parquet(in)
    val smallFiles = new java.io.File(in).listFiles().count(_.getName.endsWith(".parquet"))
    assert(smallFiles == 64, s"setup: expected 64 small files, got $smallFiles")
    sources.Tables.compact(spark, in, out, targetMB = 512)
    val compacted = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    // sf0.001 lineitem is far below one 512 MB target → exactly one file
    assert(compacted == 1, s"expected 1 compacted file, got $compacted")
    assert(spark.read.parquet(out).count() == li.count())
  }

  test("writeSorted lays out disjoint key ranges per file (zone-map skipping)") {
    val out = Files.createTempDirectory("graft_sorted").toString
    val orders = sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    sources.Tables.writeSorted(orders, out, Seq(col("o_orderkey")), numFiles = 4)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length == 4, s"expected 4 files, got ${files.length}")
    // each file owns a contiguous range; ranges must not overlap — the
    // property parquet min/max stats need for file/row-group skipping
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(org.apache.spark.sql.functions.min("o_orderkey"),
          org.apache.spark.sql.functions.max("o_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap: $hi >= $lo2")
      case _ =>
    }
    // nothing lost in the layout pass
    assert(spark.read.parquet(out).count() == orders.count())
  }

  test("ingestNewFiles: only unseen files read; rerun is a no-op; new file picked up") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("inc").toString
    val man = s"$dir/manifest"
    val data = s"$dir/data"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$data/f1")
    // flatten: ingest reads top-level files, so move part files up
    val hfs = new org.apache.hadoop.fs.Path(data)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def promote(sub: String, name: String): Unit = {
      val part = hfs.globStatus(new org.apache.hadoop.fs.Path(s"$data/$sub/part-*")).head
      hfs.rename(part.getPath, new org.apache.hadoop.fs.Path(s"$data/$name"))
      hfs.delete(new org.apache.hadoop.fs.Path(s"$data/$sub"), true)
    }
    promote("f1", "f1.parquet")
    val first = sources.Tables.ingestNewFiles(spark, data, man)
    assert(first.map(_.count()) == Some(2L))
    // rerun with nothing new
    assert(sources.Tables.ingestNewFiles(spark, data, man).isEmpty)
    // a new file arrives: only IT is read
    Seq((3L, "c")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$data/f2")
    promote("f2", "f2.parquet")
    val second = sources.Tables.ingestNewFiles(spark, data, man)
    assert(second.map(_.select("id").collect().map(_.getLong(0)).toSeq) == Some(Seq(3L)))
    assert(sources.Tables.ingestNewFiles(spark, data, man).isEmpty)
  }

  test("events yields identical ts/ts_ns for int64-ns, TIMESTAMP, and TIMESTAMP_NTZ parquet") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    // epoch micros spanning pre/post-2000 and a non-zero sub-second part
    val micros = Seq(946684800000001L, 1700000000000000L, 1700000123456789L)

    val longDir = Files.createTempDirectory("graft_ev_long").toString
    micros.map(u => (u * 1000L, "click")).toDF("ts", "kind")
      .write.parquet(s"$longDir/events.parquet")

    val tsDir = Files.createTempDirectory("graft_ev_ts").toString
    micros.toDF("us")
      .select(timestamp_micros(col("us")).as("ts"), lit("click").as("kind"))
      .write.parquet(s"$tsDir/events.parquet")

    val ntzDir = Files.createTempDirectory("graft_ev_ntz").toString
    micros.toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        lit("click").as("kind"))
      .write.parquet(s"$ntzDir/events.parquet")

    // the NTZ fixture really is NTZ on disk (isAdjustedToUTC=false) —
    // otherwise this test silently stops covering the arm that broke r7
    assert(spark.read.parquet(s"$ntzDir/events.parquet")
      .schema("ts").dataType.typeName == "timestamp_ntz")

    val expected = micros.map(_ * 1000L).toSet
    for (dir <- Seq(longDir, tsDir, ntzDir)) {
      val ev = sources.Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType, s"$dir: ts type")
      assert(ev.schema("ts_ns").dataType == LongType, s"$dir: ts_ns type")
      assert(ev.select("ts_ns").collect().map(_.getLong(0)).toSet == expected,
        s"$dir: ts_ns values")
      // µs-precision ts agrees with ts_ns exactly in every encoding
      assert(ev.filter(unix_micros(col("ts")) * 1000L =!= expr("ts_ns div 1000") * 1000L)
        .count() == 0, s"$dir: ts vs ts_ns drift")
    }
  }

  test("loadTextCorpus reads gzip-compressed files transparently (A5)") {
    val dir = java.nio.file.Files.createTempDirectory("gzcorpus")
    val plain = Seq("alpha one", "beta two", "gamma three")
    val gz = dir.resolve("part-0.txt.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gz))
    try out.write(plain.mkString("\n").getBytes("UTF-8")) finally out.close()
    // plus one uncompressed sibling — mixed directories read fine
    java.nio.file.Files.writeString(dir.resolve("part-1.txt"), "delta four")
    val got = sources.Tables.loadTextCorpus(spark, dir.toString)
      .select("text").collect().map(_.getString(0)).toSet
    assert(got == (plain :+ "delta four").toSet)
  }

  test("compactionPlan packs small files per dir under the target and quarantines oversize (A13)") {
    import spark.implicits._
    val manifest = Seq(
      // dir a: 6+5+4+3 under target 10 → FFD: [6,4] and [5,3]
      ("a/f6", 6L, "a"), ("a/f5", 5L, "a"), ("a/f4", 4L, "a"), ("a/f3", 3L, "a"),
      // dir b: one oversize file + one small one
      ("b/f12", 12L, "b"), ("b/f2", 2L, "b")
    ).toDF("path", "bytes", "dir")
    val plan = sources.Tables.compactionPlan(manifest, col("path"),
      col("bytes"), col("dir"), targetBytes = 10L).collect()
    val byPath = plan.map(r => r.getAs[String]("path") -> r).toMap
    // dir a bins: f6 with f4, f5 with f3
    assert(byPath("a/f6").getAs[Long]("bin_id") == byPath("a/f4").getAs[Long]("bin_id"))
    assert(byPath("a/f5").getAs[Long]("bin_id") == byPath("a/f3").getAs[Long]("bin_id"))
    assert(byPath("a/f6").getAs[Long]("bin_id") != byPath("a/f5").getAs[Long]("bin_id"))
    assert(byPath("a/f6").getAs[Long]("n_files_in_bin") == 2L)
    // oversize quarantined alone, flagged; the small file packs separately
    assert(byPath("b/f12").getAs[Boolean]("oversize"))
    assert(byPath("b/f12").getAs[Long]("n_files_in_bin") == 1L)
    assert(!byPath("b/f2").getAs[Boolean]("oversize"))
    assert(byPath("b/f12").getAs[Long]("bin_id") != byPath("b/f2").getAs[Long]("bin_id"))
  }

  test("zOrderValue interleaves bits exactly and zGridCoord clamps to edge cells (A14)") {
    import graft.functions.{zGridCoord, zOrderValue}
    import spark.implicits._
    val r = Seq((3L, 2L)).toDF("a", "b")
      .select(zOrderValue(Seq(col("a"), col("b")), 2).as("z"))
      .collect()(0).getLong(0)
    // a=0b11 at even positions (0,2), b=0b10 at odd (1,3): 1+4+8 = 13
    assert(r == 13L)
    val g = Seq((-5.0, 0.5, 99.0)).toDF("lo", "mid", "hi")
      .select(
        zGridCoord(col("lo"), 0.0, 1.0, 4).as("l"),
        zGridCoord(col("mid"), 0.0, 1.0, 4).as("m"),
        zGridCoord(col("hi"), 0.0, 1.0, 4).as("h"))
      .collect()(0)
    assert(g.getLong(0) == 0L && g.getLong(1) == 8L && g.getLong(2) == 15L)
  }

  test("writeZOrdered clusters BOTH dimensions into tight per-file ranges (A14)") {
    import spark.implicits._
    val n = 4096
    val df = (0 until n).map { i =>
      (i.toLong, (i % 64).toDouble, (i / 64).toDouble) // full 64x64 grid
    }.toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    sources.Tables.writeZOrdered(df, dir,
      Seq((col("x"), 0.0, 64.0), (col("y"), 0.0, 64.0)), bits = 6,
      numFiles = 16)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max(col("x")) - min(col("x"))).as("rx"),
        (max(col("y")) - min(col("y"))).as("ry"),
        count(lit(1)).as("cnt"))
      .collect()
    assert(perFile.length > 4)
    // a row-id sort would leave y spanning the FULL 0-63 range in every
    // file; z-order bounds both dimensions well below it
    val avgRx = perFile.map(_.getAs[Double]("rx")).sum / perFile.length
    val avgRy = perFile.map(_.getAs[Double]("ry")).sum / perFile.length
    assert(avgRx < 40.0, s"x ranges not clustered: $avgRx")
    assert(avgRy < 40.0, s"y ranges not clustered: $avgRy")
  }

  test("writeBloomFiltered advertises bloom filters in the footer and keeps the pushdown (A16)") {
    val out = Files.createTempDirectory("graft_bloom").toString + "/t"
    val docs = sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    sources.Tables.writeBloomFiltered(docs, out,
      bloomCols = Seq(("doc_id", 100000L)), sortCol = Some("doc_id"))
    // footer check: every row group's doc_id column must carry a bloom
    // filter offset (the writer option actually landed)
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val rd = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        val groups = rd.getFooter.getBlocks
        assert(!groups.isEmpty)
        groups.forEach { g =>
          val cc = g.getColumns.asScala
            .find(_.getPath.toDotString == "doc_id").get
          assert(cc.getBloomFilterOffset > 0,
            s"${f.getName}: doc_id row group carries no bloom filter")
          val other = g.getColumns.asScala
            .find(_.getPath.toDotString == "source").get
          assert(other.getBloomFilterOffset <= 0,
            "bloom filters must be per-requested-column, not global")
        }
      } finally rd.close()
    }
    // read side: the equality probe still pushes down to the scan and
    // the round-trip answers correctly
    val probe = spark.read.parquet(out).filter(col("doc_id") === 42L)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"), plan)
    assert(probe.count() == docs.filter(col("doc_id") === 42L).count())
  }

  test("bloom filters actually SKIP row groups on an equality probe (A16 end-to-end)") {
    // The footer test above proves the filters EXIST; this proves they
    // PRUNE. Layout is adversarial-for-stats by construction: rows
    // land in hash order, so every row group's doc_id min/max spans
    // the probe value and stats pruning is powerless — any skipped
    // group is the bloom filter's doing. Small writer block size
    // forces many row groups in one file.
    val out = Files.createTempDirectory("graft_bloom_skip").toString + "/t"
    // 200k-key layout fixture (pure layout proof — the sf0.001 tables
    // are a single row group at any block size, which can't skip)
    val docs = spark.range(0, 200000)
      .select(col("id").as("doc_id"),
        (col("id") % 1000).as("n_chars"))
      .repartition(1)
      .sortWithinPartitions(org.apache.spark.sql.functions.hash(col("doc_id")))
    sources.Tables.writeBloomFiltered(docs, out,
      bloomCols = Seq(("doc_id", 100000L)), sortCol = None,
      options = Map("parquet.block.size" -> "65536",
        "parquet.page.size" -> "16384"))
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.filter2.predicate.FilterApi
    import org.apache.parquet.filter2.compat.FilterCompat
    import org.apache.parquet.HadoopReadOptions
    val conf = spark.sparkContext.hadoopConfiguration
    val file = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val probeId = 42L
    val pred = FilterApi.eq(FilterApi.longColumn("doc_id"),
      java.lang.Long.valueOf(probeId))
    // survivors under (stats + bloom) vs (stats only) — dictionary
    // filtering off on BOTH sides so the delta is attributable to the
    // bloom filter alone
    def survivors(useBloom: Boolean): (Int, Long) = {
      val opts = HadoopReadOptions.builder(conf)
        .withRecordFilter(FilterCompat.get(pred))
        .useStatsFilter(true)
        .useDictionaryFilter(false)
        .useBloomFilter(useBloom)
        .build()
      val rd = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(file.getAbsolutePath), conf), opts)
      try {
        val gs = rd.getRowGroups.asScala
        (gs.size, gs.map(_.getRowCount).sum)
      } finally rd.close()
    }
    val (withBloom, rowsWithBloom) = survivors(useBloom = true)
    val (withoutBloom, rowsWithout) = survivors(useBloom = false)
    assert(withoutBloom >= 4,
      s"fixture too small to prove skipping: only $withoutBloom row groups")
    assert(withBloom < withoutBloom,
      s"bloom filter skipped NOTHING: $withBloom of $withoutBloom row groups survive")
    assert(rowsWithBloom < rowsWithout,
      s"bloom pruning dropped no rows: $rowsWithBloom vs $rowsWithout")
    // end-to-end through the Spark scan: with bloom read filtering on
    // (default) the scan emits only surviving groups' rows; with it
    // off, every group's rows reach the post-scan filter. Dictionary
    // filtering off on both reads, same attribution logic as above.
    def scanRows(bloomEnabled: Boolean): Long = {
      val df = spark.read
        .option("parquet.filter.dictionary.enabled", "false")
        .option("parquet.filter.bloom.enabled", bloomEnabled.toString)
        .parquet(out)
        .filter(col("doc_id") === probeId)
      // metrics must come from THIS execution (count() would plan a
      // separate query whose scan never runs here)
      assert(df.collect().length == 1, "probe row must exist exactly once")
      def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a +: nodes(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          s +: nodes(s.plan)
        case other => other +: other.children.flatMap(nodes)
      }
      val scan = nodes(df.queryExecution.executedPlan)
        .collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }.get
      scan.metrics("numOutputRows").value
    }
    val scanOn = scanRows(bloomEnabled = true)
    val scanOff = scanRows(bloomEnabled = false)
    assert(scanOn <= rowsWithBloom && scanOn < scanOff,
      s"Spark scan did not skip row groups via bloom: on=$scanOn off=$scanOff")
  }

  test("fileManifest lists real data files with sizes and parent dirs") {
    val mf = sources.Tables.fileManifest(spark, sf).collect()
    assert(mf.length >= 10) // one parquet per table
    assert(mf.forall(_.getAs[Long]("bytes") > 0))
    assert(mf.exists(_.getAs[String]("path").endsWith("documents.parquet")))
  }

  test("fileManifest excludes files under hidden dirs at ANY depth (in-flight _temporary)") {
    val dir = java.nio.file.Files.createTempDirectory("mfhidden")
    java.nio.file.Files.writeString(dir.resolve("good.parquet"), "x")
    val tmp = dir.resolve("_temporary").resolve("0")
    java.nio.file.Files.createDirectories(tmp)
    // leaf name looks perfectly committed — only the ancestor is hidden
    java.nio.file.Files.writeString(tmp.resolve("part-00000.parquet"), "y")
    val hid = dir.resolve(".stage")
    java.nio.file.Files.createDirectories(hid)
    java.nio.file.Files.writeString(hid.resolve("part-00001.parquet"), "z")
    val got = sources.Tables.fileManifest(spark, dir.toString)
      .collect().map(_.getAs[String]("path"))
    assert(got.length == 1 && got(0).endsWith("good.parquet"),
      got.mkString(","))
  }
}
