package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loader / writer over a scale-factor directory of parquet files.
  *
  * Mirrors the reference's multi-source ingest (tratamento_epe.R:55-72
  * reads every workbook sheet into a named list); here each table is a
  * parquet directory and the "list" is name → DataFrame.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** CSV with an explicit schema (schema inference would double-scan —
    * never at 100 TB) or header-only when the caller accepts strings.
    */
  def loadCsv(
      spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r)(s => r.schema(s)).csv(path)
  }

  def loadJson(
      spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** JSON ingest that QUARANTINES malformed records instead of failing
    * the job (FAILFAST) or silently nulling them (default PERMISSIVE
    * without a capture column). At 100 TB a handful of corrupt lines
    * per shard is the norm, not the exception: good rows parse against
    * the explicit schema, bad rows land whole in `corruptCol` with
    * every schema field null — so the pipeline splits them with one
    * `filter(col(corruptCol).isNull / isNotNull)` into the clean path
    * and a quarantine sink for later inspection. The schema is explicit
    * (inference would double-scan the corpus).
    *
    * Spark restriction: a query referencing ONLY the corrupt column
    * over the raw scan is disallowed (`...queries from raw JSON/CSV
    * files are disallowed when the referenced columns only include the
    * internal corrupt record column`). `.cache()` the returned frame
    * (or persist it to parquet) before splitting it into clean and
    * quarantine branches — both branch queries then read the
    * materialized rows instead of the raw scan.
    */
  def loadJsonLenient(
      spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** CSV twin of [[loadJsonLenient]]: malformed lines (wrong arity,
    * uncastable fields) land whole in `corruptCol` instead of failing
    * the job. Header + explicit schema (no inference double-scan).
    * Same caveat: `.cache()` before splitting on the corrupt column
    * (see [[loadJsonLenient]]).
    */
  def loadCsvLenient(
      spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .option("header", "true")
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)

  /** Small-file compaction: rewrite a directory of many small parquet
    * files into files of ≈ `targetMB` each. Streaming ingest and
    * per-shard jobs leave thousands of KB-sized files behind; every
    * later scan then pays one task + one open per file, and the
    * NameNode/manifest pays the metadata. One coalesce-rewrite pass
    * fixes the layout; file count comes from the actual on-disk bytes
    * (never a plan-time guess). Writes to `outPath` — renaming over
    * the input atomically is the object store's mv, kept outside the
    * library.
    */
  def compact(
      spark: SparkSession, inPath: String, outPath: String,
      targetMB: Int = 512): Unit = {
    require(targetMB > 0, "targetMB must be positive")
    val df = spark.read.parquet(inPath)
    // sizes via the Hadoop FileSystem API so every scheme the scan can
    // read (hdfs://, s3a://, file://) reports real lengths — a
    // java.io.File probe would silently return 0 off the local disk
    // and collapse the whole dataset into one file
    // ONE recursive listing RPC for the whole tree, not one
    // getFileStatus round-trip per file: on the many-small-files
    // input this function exists for, per-file stats would be
    // thousands of serial driver→object-store calls before any work
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(inPath)
    val bytes = root.getFileSystem(conf)
      .getContentSummary(root).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / (targetMB * 1024L * 1024L)).toInt)
    // coalesce, not repartition: compaction must not shuffle — it only
    // merges existing splits into fewer write tasks
    df.coalesce(nFiles).write.mode("overwrite").parquet(outPath)
  }

  /** Range-sorted parquet layout: range-partition rows across
    * `numFiles` files by `sortCols` and sort within each file. Each
    * file then owns a disjoint key range, so parquet's per-file /
    * per-row-group min-max statistics (zone maps) let readers skip
    * everything outside a key predicate — on a 100 TB time- or
    * id-keyed table that turns point/range lookups from full scans
    * into a handful of file reads. The range exchange samples key
    * quantiles, so skewed keys still split evenly across files.
    */
  def writeSorted(
      df: DataFrame, path: String,
      sortCols: Seq[org.apache.spark.sql.Column], numFiles: Int): Unit = {
    require(sortCols.nonEmpty, "at least one sort column required")
    df.repartitionByRange(numFiles, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** All tables of a scale-factor dir, name → DataFrame. */
  def loadAll(spark: SparkSession, dir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, dir, n)).toMap

  /** Workbook ingest: every "sheet" of `path` as name → DataFrame —
    * the Spark analogue of the reference's only real source, a
    * multi-sheet Excel workbook read sheet-by-sheet
    * (tratamento_epe.R:57-72, `excel_sheets(...) |> map(read_xls)`).
    *
    * Two layouts:
    *  - a real workbook FILE: `.xls` parses through [[XlsReader]]
    *    (MS-CFB + BIFF8), `.xlsx` through [[XlsxReader]] (ZIP +
    *    SpreadsheetML) — no external deps either way. Header-first
    *    all-string columns, exactly what `read_xls` hands R —
    *    downstream wrangling owns the casts (Reshape.castMatching,
    *    promoteFirstRowToHeader). A workbook is a driver-side landing
    *    artifact (as in the reference: one small file fetched
    *    monthly); anything at scale lands as parquet/csv.
    *  - a DIRECTORY with one file per sheet: `dir/<sheet>.parquet`,
    *    `dir/<sheet>.csv`, or `dir/<sheet>.json`; the sheet name is
    *    the file stem. CSV sheets read header-first all-string like
    *    the `.xls` path.
    */
  def loadSheets(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    // Hadoop FileSystem listing, not java.io.File: a workbook landed
    // on hdfs:// or s3a:// exists even though the local-disk probe
    // says it doesn't (same reasoning as compact's size scan)
    val root = new org.apache.hadoop.fs.Path(dir)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(hfs.exists(root), s"workbook not found: $dir")
    if (hfs.getFileStatus(root).isFile) {
      val lower = dir.toLowerCase
      require(lower.endsWith(".xls") || lower.endsWith(".xlsx"),
        s"workbook file must be .xls or .xlsx (ods not supported): $dir")
      val bytes = new Array[Byte](hfs.getFileStatus(root).getLen.toInt)
      val in = hfs.open(root)
      try in.readFully(0, bytes) finally in.close()
      val parsed =
        if (lower.endsWith(".xlsx")) XlsxReader.sheets(bytes)
        else XlsReader.sheets(bytes)
      return parsed.map { case (name, grid) =>
        name -> gridToDf(spark, grid)
      }.toMap
    }
    require(hfs.getFileStatus(root).isDirectory,
      s"workbook dir not found: $dir")
    val sheets = hfs.listStatus(root).toSeq.map(_.getPath)
      .sortBy(_.getName).flatMap { p =>
      val name = p.getName
      val stem = name.replaceAll("\\.(parquet|csv|json)$", "")
      name match {
        case n if n.endsWith(".parquet") => Some(stem -> load(spark, dir, stem))
        case n if n.endsWith(".csv") =>
          // all-string like read_xls: no inference double-scan, no
          // premature typing before header promotion
          Some(stem -> spark.read.option("header", "true")
            .option("inferSchema", "false").csv(p.toString))
        case n if n.endsWith(".json") => Some(stem -> spark.read.json(p.toString))
        case _ => None
      }
    }
    // two files with one stem (sheet.csv AND sheet.parquet) would
    // silently shadow each other in the map — refuse instead
    val dup = sheets.groupBy(_._1).filter(_._2.size > 1).keys
    require(dup.isEmpty,
      s"ambiguous workbook: multiple files for sheet(s) ${dup.mkString(", ")}")
    sheets.toMap
  }

  /** A parsed sheet grid → header-first all-string DataFrame (the
    * `read_xls` contract the csv sheet path also follows), plus a
    * leading `_sheet_row` INT column carrying the 1-based DATA-row
    * position within the sheet. Spark frames are unordered, but the
    * reference's Shape-A wrangling (slice(-1:-3), fill-down) is
    * defined BY sheet row order — the explicit column is the only
    * scale-correct way to keep that contract (it feeds
    * `Reshape.sliceRows`/`fillDownCols` ordering specs directly).
    * Blank header cells become `_c<i>`; duplicate header names get a
    * positional suffix so column lookup stays unambiguous.
    */
  private def gridToDf(spark: SparkSession, grid: Vector[Vector[String]]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructType, StructField, StringType, IntegerType}
    val width = if (grid.isEmpty) 0 else grid.head.length
    val rawNames = if (grid.isEmpty) Vector.empty[String] else grid.head
    val named = rawNames.zipWithIndex.map {
      case (n, i) if n == null || n.trim.isEmpty => s"_c$i"
      case (n, _) => n
    }
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val cols = named.map { n =>
      val k = seen.getOrElse(n, 0)
      seen(n) = k + 1
      if (k == 0) n else s"${n}_$k"
    }
    val schema = StructType(
      StructField("_sheet_row", IntegerType, nullable = false) +:
        cols.map(c => StructField(c, StringType, nullable = true)))
    val rows = grid.drop(1).zipWithIndex.map { case (r, i) =>
      Row.fromSeq((i + 1) +: r.padTo(width, null))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, math.min(4, rows.size))), schema)
  }

  /** Workbook EXPORT — the inverse of [[loadSheets]], closing the
    * reference's one remaining surface (tratamento_epe.rmd:359
    * discusses `write.xlsx` next to the csv export): each frame lands
    * as one sheet, header row first, every value rendered through
    * `CAST(AS STRING)` (the same all-string contract the reader
    * hands back, so `writeXlsx → loadSheets` round-trips cell for
    * cell modulo the reader's `_sheet_row` bookkeeping column).
    *
    * Scale contract ([[fetch]]'s): a workbook is a DRIVER-SIDE
    * artifact for humans — rows collect to the driver, guarded by
    * `maxRows` via `limit(maxRows + 1)` so an accidentally-huge frame
    * fails LOUDLY before it can OOM the driver (corpus-scale exports
    * belong in parquet/csv sinks). Row order inside a sheet is the
    * frame's order — callers wanting a stable sheet `orderBy` first,
    * exactly as with any collect-to-artifact. Publish is temp-file +
    * rename on the TARGET filesystem (hdfs:// works), so a crashed
    * export never leaves a half-written workbook at the path.
    */
  def writeXlsx(
      spark: SparkSession,
      path: String,
      sheets: Seq[(String, DataFrame)],
      maxRows: Int = 65536): String = {
    val grids: Seq[(String, Seq[Seq[String]])] = sheets.map { case (name, df) =>
      val cols = df.columns.toSeq
      val rows = df.select(cols.map(c => col(c).cast("string")): _*)
        .limit(maxRows + 1).collect()
      require(rows.length <= maxRows,
        s"sheet '$name' exceeds maxRows=$maxRows — a workbook is a " +
          "driver-side artifact; land frames that size as parquet/csv")
      name -> (cols +: rows.toSeq.map(r => cols.indices.map(r.getString)))
    }
    val bytes = XlsxWriter.write(grids)
    val target = new org.apache.hadoop.fs.Path(path)
    val hfs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parent = Option(target.getParent).getOrElse(new org.apache.hadoop.fs.Path("."))
    hfs.mkdirs(parent)
    val tmp = new org.apache.hadoop.fs.Path(parent, s".${target.getName}.part")
    val out = hfs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (hfs.exists(target)) hfs.delete(target, false)
    require(hfs.rename(tmp, target), s"publish rename failed: $tmp -> $target")
    path
  }

  /** Fetch a remote artifact into a local landing directory — the
    * reference pipeline's first step (tratamento_epe.R:39-47,
    * `download.file(url, destfile)` of the monthly EPE workbook),
    * feeding [[loadSheets]]/[[load]]. Plain `java.net` over the JDK
    * HttpClient — no new dependencies; `file://` URLs work for tests
    * and for lake-local copies.
    *
    * Idempotent by content: the download lands in a temp file first,
    * its SHA-256 is computed, and the temp file is atomically renamed
    * into place only if the target is absent or its recorded checksum
    * (`<name>.sha256` sidecar) differs — a crashed or repeated fetch
    * can never leave a half-written workbook where the pipeline will
    * read it (the same write-audit-publish shape the streaming sinks
    * use). Returns the landed path.
    *
    * Scale note: landing artifacts are driver-sized (a workbook, a
    * blocklist, a vocab). Corpus-scale data belongs on distributed
    * storage read by `spark.read` directly, never through this.
    */
  def fetch(url: String, landingDir: String, fileName: String = null): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val name = Option(fileName).getOrElse(
      url.substring(url.lastIndexOf('/') + 1) match {
        case "" => "download"
        case n => n
      })
    val dir = Paths.get(landingDir)
    Files.createDirectories(dir)
    val target = dir.resolve(name)
    val sidecar = dir.resolve(name + ".sha256")
    val tmp = Files.createTempFile(dir, s".$name.", ".part")
    try {
      val in = java.net.URI.create(url).toURL.openStream()
      try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      val sha = digest.digest(Files.readAllBytes(tmp))
        .map(b => f"$b%02x").mkString
      val already = Files.exists(target) && Files.exists(sidecar) &&
        new String(Files.readAllBytes(sidecar)).trim == sha
      if (!already) {
        // checksum sidecar FIRST, then the atomic payload publish: a
        // crash between the two re-downloads next run (sidecar/payload
        // mismatch) instead of trusting a stale pair
        Files.write(sidecar, sha.getBytes)
        Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
      }
      target.toString
    } finally Files.deleteIfExists(tmp)
  }

  /** Raw-text corpus ingest — the shape LLM training corpora actually
    * arrive in: directories of plain-text files. `wholeFile=false`
    * (default) reads one record per line; `wholeFile=true` reads one
    * record per FILE (the one-document-per-file layout). Each record
    * carries its provenance as `source_file` — the lineage column every
    * curation pipeline keys filtering/mixing decisions on. Splittable
    * line mode scales to any file size; wholeFile is for corpora of
    * many small documents (a file must fit in one task).
    */
  def loadTextCorpus(
      spark: SparkSession, path: String, wholeFile: Boolean = false): DataFrame = {
    val r = spark.read.option("wholetext", wholeFile.toString).text(path)
    r.select(input_file_name().as("source_file"), col("value").as("text"))
  }

  /** A12: manifest-driven INCREMENTAL file ingest — the batch
    * equivalent of a streaming file source: each call lists the data
    * directory, diffs against the persisted manifest of
    * already-processed file paths, reads ONLY the new files, and
    * publishes the updated manifest through
    * [[graft.streaming.SnapshotStore]] (write-audit-publish — a crash
    * between read and manifest update re-processes the batch rather
    * than losing it; downstream writes should be idempotent per path,
    * the E7 contract). Returns None when nothing is new.
    *
    * The manifest holds file PATHS (+ sizes) — driver-metadata-sized
    * at any corpus scale (one row per file, not per record), and the
    * listing is one FileSystem RPC per call.
    */
  def ingestNewFiles(
      spark: SparkSession,
      dataDir: String,
      manifestDir: String,
      format: String = "parquet"): Option[DataFrame] = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(root)) return None
    val present = hfs.listStatus(root).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath.toString, s.getLen))
    val seen: Set[String] =
      graft.streaming.SnapshotStore.read(spark, manifestDir) match {
        case Some(m) => m.select("path").collect().map(_.getString(0)).toSet
        case None => Set.empty
      }
    val fresh = present.filterNot { case (p, _) => seen(p) }
    if (fresh.isEmpty) return None
    val df = spark.read.format(format).load(fresh.map(_._1): _*)
    val manifest = present.toDF("path", "bytes")
    graft.streaming.SnapshotStore.publish(
      manifest.coalesce(1), manifestDir, System.currentTimeMillis())
    Some(df)
  }

  /** A13: small-file COMPACTION planning — the lake-maintenance twin
    * of [[ingestNewFiles]]'s manifest: streaming/incremental ingest
    * leaves thousands of KB-sized files per partition dir, and every
    * later scan pays a task per file. Given a (path, bytes, dir)
    * manifest (file-level metadata — driver/manifest-sized at any
    * corpus scale), plan which files merge into which output file
    * under `targetBytes`: first-fit-decreasing per directory via
    * [[graft.operators.Packing.binPackFFD]] (compaction IS bin
    * packing; dirs pack independently exactly like shards), files
    * larger than the target get a bin of their own flagged
    * `oversize` (left in place, the quarantine-by-flag contract).
    * Output: (dir, path, bytes, bin_id, oversize, n_files_in_bin) —
    * an executor per bin then streams its files into one writer; the
    * plan itself never touches data.
    */
  def compactionPlan(
      manifest: DataFrame,
      path: Column,
      bytes: Column,
      dir: Column,
      targetBytes: Long): DataFrame = {
    // collision-FREE file id: row_number over path WITHIN the pack dir
    // (a 64-bit path hash would silently cross-assign two colliding
    // files between bins). Keyed by dir on purpose: packing and the
    // join-back are both dir-local, so per-dir ids are all the
    // uniqueness needed and the window stays keyed (registry-audit
    // contract) — within a dir, per-dir rank order on path equals
    // global rank order, so FFD ties place identically.
    val m = manifest.select(path.as("path"), bytes.cast("long").as("bytes"),
        dir.cast("string").as("dir"))
      .withColumn("__fid", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("dir")).orderBy(col("path"))).cast("long"))
    val planned = graft.operators.Packing.binPackFFD(
      m, col("dir"), col("__fid"), col("bytes"), targetBytes)
      .select(col("shard").as("dir"), col("id").as("__fid"),
        col("bin_id"), col("oversize"))
    val perBin = planned.groupBy("dir", "bin_id")
      .agg(count(lit(1)).as("n_files_in_bin"))
    m.join(planned.select("dir", "__fid", "bin_id", "oversize"),
        Seq("dir", "__fid"))
      .join(perBin, Seq("dir", "bin_id"))
      .select(col("dir"), col("path"), col("bytes"), col("bin_id"),
        col("oversize"), col("n_files_in_bin"))
  }

  /** List a directory's data files as a (path, bytes, dir) manifest
    * frame — one FileSystem RPC, driver-metadata-sized ([[ingestNewFiles]]
    * contract). Hidden/metadata entries are excluded at EVERY path
    * component below the root, not just the leaf name — a recursive
    * listing otherwise surfaces `_temporary/.../part-*.parquet` from
    * an in-flight or crashed write, and a compaction plan built on it
    * would merge uncommitted data into live files (caught in review).
    */
  def fileManifest(spark: SparkSession, dataDir: String): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify the root BEFORE comparing: listFiles returns fully-
    // qualified paths, so an unqualified (e.g. relative) root string
    // would never match and the hidden-ancestor walk would inspect
    // ancestors ABOVE the root — data living under a dotted dir
    // (~/.cache/data) would silently empty the manifest
    val qroot = hfs.makeQualified(root)
    def visible(p: org.apache.hadoop.fs.Path): Boolean = {
      var cur = p
      var ok = true
      while (ok && cur != null && cur != qroot) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) ok = false
        cur = cur.getParent
      }
      ok
    }
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String)]
    val it = hfs.listFiles(root, true)
    while (it.hasNext) {
      val s = it.next()
      if (visible(s.getPath))
        files += ((s.getPath.toString, s.getLen, s.getPath.getParent.toString))
    }
    files.toSeq.toDF("path", "bytes", "dir")
  }

  /** A14: Z-ORDERED write — multi-dimensional data clustering for
    * scan pruning ([[graft.functions.zOrderValue]] has the math):
    * range-partition the frame by the interleaved value (balanced
    * output files via Spark's range sampler), sort within partitions,
    * drop the scratch column, write parquet. Every output file then
    * carries tight min/max footer stats on ALL z-dimensions, so a
    * filter on ANY of them prunes files at planning time — the
    * layout-side complement to the C1 pushdown story, and the reason
    * a 100 TB fact table can serve point-ish queries on two keys
    * without two copies of the data.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      dims: Seq[(Column, Double, Double)],
      bits: Int = 16,
      numFiles: Int = 0): Unit = {
    val z = graft.functions.zOrderValue(
      dims.map { case (c, lo, hi) => graft.functions.zGridCoord(c, lo, hi, bits) },
      bits)
    val withZ = df.withColumn("__z", z)
    val parts = if (numFiles > 0) numFiles
      else df.sparkSession.sparkContext.defaultParallelism
    withZ.repartitionByRange(parts, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** A16: parquet BLOOM-FILTER layout — the point-lookup complement to
    * [[writeZOrdered]]'s range story: min/max footer stats prune range
    * predicates, but an equality probe on a HIGH-CARDINALITY key
    * (doc_id, user_id, url hash) hits every file whose range happens
    * to span the value — at 100 TB that's most of them. Writing with
    * per-column split-block bloom filters
    * (`parquet.bloom.filter.enabled#col`) lets the reader skip row
    * groups whose filter excludes the probe value: false positives
    * re-read a group, false negatives are impossible, so skipping is
    * always safe. `ndv` sizes each filter (bits ~ ndv·ln(1/fpp));
    * oversizing wastes footer bytes, undersizing degrades to
    * read-everything — never to wrong answers.
    *
    * Spark's reader consumes the filters automatically when a
    * pushed-down equality predicate reaches the scan (the C1 pushdown
    * story; SourcesSpec pins both the footer advertisement and the
    * pushed filter).
    */
  def writeBloomFiltered(
      df: DataFrame,
      path: String,
      bloomCols: Seq[(String, Long)],
      sortCol: Option[String] = None,
      options: Map[String, String] = Map.empty): Unit = {
    require(bloomCols.nonEmpty, "at least one (column, ndv) pair")
    val base = sortCol.map(c => df.sortWithinPartitions(col(c))).getOrElse(df)
    val w = bloomCols.foldLeft(base.write.mode("overwrite").options(options)) {
      case (wr, (c, ndv)) =>
        wr.option(s"parquet.bloom.filter.enabled#$c", "true")
          .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    w.parquet(path)
  }

  /** Schema-evolution read: parquet shards written over a schema's
    * lifetime (columns added release by release) union into ONE frame
    * — `mergeSchema` reconciles per-file footers, old shards surface
    * the new columns as nulls. OFF by default in Spark because footer
    * merging costs a pass over file metadata at planning time; turning
    * it on per-read (here) instead of globally is the right scale
    * habit. Incompatible type changes still fail loudly — evolution
    * means ADDITIVE drift, not rewrites (that's [[graft.operators.Profile.schemaDrift]]'s
    * department to detect).
    */
  def loadEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** ORC read/write — the other columnar format large lakes standardize
    * on; built into Spark, same pushdown/pruning story as parquet.
    */
  def loadOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** events with the timestamp normalized to a µs TimestampType column
    * `ts` plus exact `ts_ns` (epoch nanos, long), whatever legal parquet
    * encoding the file arrived in:
    *
    *   - int64 nanos (TIMESTAMP(NANOS) read as long under
    *     `spark.sql.legacy.parquet.nanosAsLong`),
    *   - TIMESTAMP (isAdjustedToUTC=true → TimestampType),
    *   - TIMESTAMP_NTZ (isAdjustedToUTC=false → TimestampNTZType).
    *
    * The NTZ arm reinterprets wall-clock micros as UTC instants — exact
    * because [[graft.Engine]] pins the session timezone to UTC, so the
    * cast adds a zero offset. Downstream window()/watermark code always
    * sees one type (plain TIMESTAMP). Any other encoding fails loudly
    * rather than corrupting timestamps silently.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // `div` (integer division), NOT `/`: epoch-nanos exceed a
        // double's 53-bit mantissa, so `/ 1000` would round the
        // microsecond off by ±1 for most rows.
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case TimestampNTZType =>
        val asUtc = raw.withColumn("ts", col("ts").cast(TimestampType))
        asUtc.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case TimestampType =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case other =>
        throw new IllegalArgumentException(
          s"events.ts: unsupported timestamp encoding $other " +
            "(expected int64 nanos, TIMESTAMP, or TIMESTAMP_NTZ)")
    }
  }

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Bucketed catalog table: co-locates rows by `bucketCols` so equi-
    * joins and aggregations on those keys read both sides pre-shuffled
    * — at 100 TB the difference between a full-corpus exchange per join
    * and none. Both join sides must use the same bucket count.
    */
  def writeBucketed(
      df: DataFrame, tableName: String,
      bucketCols: Seq[String], numBuckets: Int): Unit = {
    require(bucketCols.nonEmpty, "at least one bucket column required")
    require(numBuckets > 0, "numBuckets must be positive")
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
  }
}
