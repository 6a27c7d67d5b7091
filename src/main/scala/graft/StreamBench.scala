package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.EventStreams

/** Streaming throughput probe for the stateful E-family — the one
  * family whose 100 TB story was argued (stream == batch equality
  * specs) but never measured. Feeds each flatMapGroupsWithState /
  * foreachBatch path a deterministic synthetic load through
  * MemoryStream in B micro-batches, and records:
  *
  *   - rows_in, batches, wall_s, rows_per_s  (ingest throughput)
  *   - state_rows / state_bytes: state-store totals after the final
  *     batch (from StreamingQueryProgress.stateOperators) — the
  *     numbers that decide whether state is bounded by KEYS (safe:
  *     grows with cardinality, not volume) or by ROWS (a leak)
  *   - out_rows: emissions summed from per-batch sink progress
  *
  * r13 probed 100k rows / 10 batches and measured 6.8k-18.5k rows/s —
  * micro-batch-overhead-dominated, useless as a capacity number. The
  * r14 shape feeds 1M-row micro-batches (10M rows default), generates
  * each batch lazily (the driver never holds the whole feed), sinks to
  * noop (a memory sink would hold every output row on the driver), and
  * takes a state-store provider arg so the HDFS-backed default and
  * RocksDB can be compared on the same load.
  *
  * The load is deterministic (pure integer arithmetic, no RNG) so
  * round-over-round numbers are comparable. Writes one JSON file and
  * prints the same line.
  *
  * Usage: runMain graft.StreamBench [outPath] [nKeys] [nBuckets] [provider]
  *   provider: "hdfs" (default) | "rocksdb"
  */
object StreamBench {

  case class ProbeResult(name: String, rowsIn: Long, batches: Int,
      wallS: Double, outRows: Long, stateRows: Long, stateBytes: Long)

  /** (state rows, state bytes) across the query's stateful operators
    * at the last completed progress (0 for foreachBatch paths — their
    * "state" is the persisted snapshot table, reported separately).
    */
  private def stateOf(q: StreamingQuery): (Long, Long) = {
    val p = q.lastProgress
    if (p == null) (0L, 0L)
    else (p.stateOperators.map(_.numRowsTotal).sum,
      p.stateOperators.map(_.memoryUsedBytes).sum)
  }

  private def outRowsOf(q: StreamingQuery): Long =
    q.recentProgress.iterator.map(_.sink.numOutputRows).filter(_ > 0).sum

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** (key, bucket, value) rows for buckets [lo, hi): nKeys keys per
    * bucket, values a deterministic mix of periodic + per-key
    * components with a level shift at the 60% mark — every chart
    * operator sees level, trend and alarm regimes, not a constant.
    * Generated PER BATCH so the driver never materializes the feed.
    */
  private def chartRows(nKeys: Int, nBuckets: Int, lo: Int, hi: Int)
      : IndexedSeq[(String, Long, Double)] =
    for {
      b <- lo until hi
      k <- 0 until nKeys
    } yield {
      val base = 10.0 + (k % 5) + ((b * 7 + k * 31) % 13) / 10.0
      val shift = if (b >= (nBuckets * 6) / 10) 4.0 else 0.0
      (f"k$k%04d", b.toLong, base + shift)
    }

  private def feedChart(
      spark: SparkSession,
      name: String,
      nKeys: Int, nBuckets: Int, nBatches: Int)(
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[_])
      : ProbeResult = {
    implicit val enc = org.apache.spark.sql.Encoders.product[(String, Long, Double)]
    val input = MemoryStream[(String, Long, Double)](spark)
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft_probe_$name")
    val q = build(input.toDF().toDF("key", "b", "v"))
      .writeStream.format("noop")
      .option("checkpointLocation", s"$ckpt/ckpt")
      .outputMode("append").start()
    val per = nBuckets / nBatches
    val (_, wall) = timed {
      (0 until nBatches).foreach { i =>
        val lo = i * per
        val hi = if (i == nBatches - 1) nBuckets else (i + 1) * per
        input.addData(chartRows(nKeys, nBuckets, lo, hi))
        q.processAllAvailable()
      }
    }
    val out = outRowsOf(q)
    val (st, sb) = stateOf(q)
    q.stop()
    ProbeResult(name, nKeys.toLong * nBuckets, nBatches, wall, out, st, sb)
  }

  def main(args: Array[String]): Unit = {
    val outPath = args.lift(0).getOrElse("STREAM_PROBE_r14.json")
    val nKeys = args.lift(1).map(_.toInt).getOrElse(10000)
    val nBuckets = args.lift(2).map(_.toInt).getOrElse(1000)
    val provider = args.lift(3).getOrElse("hdfs")
    // optional comma-separated leg filter (single-leg profiling runs)
    val legs = args.lift(4).map(_.split(",").map(_.trim).toSet)
    def want(n: String): Boolean = legs.forall(_.contains(n))
    val nBatches = 10
    val spark = Engine.session("graft-stream-bench")
    if (provider == "rocksdb")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    val results = Seq.newBuilder[ProbeResult]

    // E34 cusum / E39 ewma / E40 holt / E43 holt-winters: per-key
    // chart state is O(1) per key by design — state_rows must equal
    // nKeys, independent of rows_in.
    if (want("cusum"))
      results += feedChart(spark, "cusum", nKeys, nBuckets, nBatches)(
        df => EventStreams.cusumStream(df, target = 12.0, slack = 0.5))
    if (want("ewma"))
      results += feedChart(spark, "ewma", nKeys, nBuckets, nBatches)(
        df => EventStreams.ewmaStream(df))
    if (want("holt"))
      results += feedChart(spark, "holt", nKeys, nBuckets, nBatches)(
        df => EventStreams.holtStream(df))
    if (want("holt_winters"))
      results += feedChart(spark, "holt_winters", nKeys, nBuckets, nBatches)(
        df => EventStreams.holtWintersStream(df, period = 7))

    // E30-family cell counting: state bounded by the SKETCH geometry
    // (width × depth cells), not by distinct terms — the property that
    // makes it safe under unbounded vocabulary.
    if (want("cms_cells")) {
      implicit val enc = org.apache.spark.sql.Encoders.product[Tuple1[String]]
      val input = MemoryStream[Tuple1[String]](spark)
      val n = nKeys * nBuckets
      def terms(lo: Int, hi: Int): IndexedSeq[Tuple1[String]] =
        (lo until hi).map(i => Tuple1(s"t${(i * 2654435761L) % (n / 3)}"))
      val ckpt = java.nio.file.Files.createTempDirectory("graft_probe_cms")
      val q = EventStreams.cmsCellStream(input.toDF().toDF("term"))
        .writeStream.format("noop")
        .option("checkpointLocation", s"$ckpt/ckpt")
        .outputMode("append").start()
      val per = n / nBatches
      val (_, wall) = timed {
        (0 until nBatches).foreach { i =>
          input.addData(terms(i * per,
            if (i == nBatches - 1) n else (i + 1) * per))
          q.processAllAvailable()
        }
      }
      val out = outRowsOf(q)
      val (st, sb) = stateOf(q)
      q.stop()
      results += ProbeResult("cms_cells", n.toLong, nBatches, wall, out, st, sb)
    }

    // E2 sessionize: event-time timeout state — one row per OPEN
    // session; closed sessions leave the store. Every 50th event gaps
    // 13 h so sessions actually close mid-stream.
    if (want("sessionize")) {
      implicit val enc = org.apache.spark.sql.Encoders.product[
        (Timestamp, Long, Long, String, Double)]
      val input = MemoryStream[(Timestamp, Long, Long, String, Double)](spark)
      val perUser = nBuckets
      def sessRows(lo: Int, hi: Int): IndexedSeq[(Timestamp, Long, Long, String, Double)] =
        for {
          i <- lo until hi
          u <- 0 until nKeys
        } yield {
          // base cadence 60 s; a 13 h cliff every 50 events splits sessions
          val tsUs = (i.toLong * 60L + (i / 50).toLong * 46800L) * 1000000L
          (new Timestamp(tsUs / 1000L), u.toLong,
            (i.toLong * nKeys + u), "view", (i % 7).toDouble)
        }
      val ckpt = java.nio.file.Files.createTempDirectory("graft_probe_sess")
      val q = EventStreams.sessionize(
          input.toDF().toDF("ts", "user_id", "event_id", "event_type", "value"))
        .writeStream.format("noop")
        .option("checkpointLocation", s"$ckpt/ckpt")
        .outputMode("append").start()
      val per = perUser / nBatches
      val (_, wall) = timed {
        (0 until nBatches).foreach { b =>
          val lo = b * per
          val hi = if (b == nBatches - 1) perUser else (b + 1) * per
          input.addData(sessRows(lo, hi))
          q.processAllAvailable()
        }
      }
      val out = outRowsOf(q)
      val (st, sb) = stateOf(q)
      q.stop()
      results += ProbeResult("sessionize", nKeys.toLong * perUser, nBatches,
        wall, out, st, sb)
    }

    // E3 dedup gate (r16, the heavy-state probe the RocksDB question
    // is about): dropDuplicatesWithinWatermark state = one row per
    // DISTINCT fingerprint still inside the watermark — the state
    // population scales with corpus arrival rate, exactly where the
    // HDFS provider's in-memory map stops fitting an executor and
    // RocksDB's off-heap/on-disk store is the 100 TB answer. Feed:
    // 50% planted duplicates so the gate actually drops rows.
    if (want("dedup_gate")) {
      implicit val enc = org.apache.spark.sql.Encoders.product[(Timestamp, String)]
      val input = MemoryStream[(Timestamp, String)](spark)
      val n = nKeys * nBuckets
      def rows(lo: Int, hi: Int): IndexedSeq[(Timestamp, String)] =
        (lo until hi).map { i =>
          val fp = (i * 2654435761L) % (n / 2) // ~half the id space: 50% dups
          (new Timestamp(i.toLong / 1000L + 1000000L), f"fp$fp%012d")
        }
      val ckpt = java.nio.file.Files.createTempDirectory("graft_probe_dedupgate")
      val q = EventStreams.dedupStream(
          input.toDF().toDF("ts", "fp"), Seq("fp"))
        .writeStream.format("noop")
        .option("checkpointLocation", s"$ckpt/ckpt")
        .outputMode("append").start()
      val per = n / nBatches
      val (_, wall) = timed {
        (0 until nBatches).foreach { i =>
          input.addData(rows(i * per, if (i == nBatches - 1) n else (i + 1) * per))
          q.processAllAvailable()
        }
      }
      val out = outRowsOf(q)
      val (st, sb) = stateOf(q)
      q.stop()
      results += ProbeResult("dedup_gate", n.toLong, nBatches, wall, out, st, sb)
    }

    // E44 vocab first-seen (the n-gram coverage gate's state-store
    // form): one boolean state row per DISTINCT TERM, bounded by
    // vocabulary not corpus — but a real vocabulary is millions of
    // n-grams, the second place provider choice matters.
    if (want("vocab_first_seen")) {
      implicit val enc = org.apache.spark.sql.Encoders.product[(String, Long)]
      val input = MemoryStream[(String, Long)](spark)
      val n = nKeys * nBuckets
      def rows(lo: Int, hi: Int): IndexedSeq[(String, Long)] =
        (lo until hi).map { i =>
          (s"t${(i * 2654435761L) % (n / 3)}", (i / (n / nBuckets)).toLong)
        }
      val ckpt = java.nio.file.Files.createTempDirectory("graft_probe_vocab")
      val q = EventStreams.vocabFirstSeenStream(
          input.toDF().toDF("term", "bucket"))
        .writeStream.format("noop")
        .option("checkpointLocation", s"$ckpt/ckpt")
        .outputMode("append").start()
      val per = n / nBatches
      val (_, wall) = timed {
        (0 until nBatches).foreach { i =>
          input.addData(rows(i * per, if (i == nBatches - 1) n else (i + 1) * per))
          q.processAllAvailable()
        }
      }
      val out = outRowsOf(q)
      val (st, sb) = stateOf(q)
      q.stop()
      results += ProbeResult("vocab_first_seen", n.toLong, nBatches, wall, out, st, sb)
    }

    // E32 retention state (the RFM-class per-USER growing state in
    // its state-store form — rfmMaintained itself keeps state in
    // parquet snapshots by design, so the provider is a no-op there):
    // one period-set row per user, sets growing batch over batch.
    if (want("retention_state")) {
      implicit val enc = org.apache.spark.sql.Encoders.product[(Long, Long)]
      val input = MemoryStream[(Long, Long)](spark)
      val nUsers = nKeys * 10
      val perUser = math.max(1, nBuckets / 100)
      val n = nUsers * perUser
      def rows(lo: Int, hi: Int): IndexedSeq[(Long, Long)] =
        for (w <- lo until hi; u <- 0 until nUsers)
          yield (u.toLong, ((u * 7 + w * 3) % 52).toLong)
      val ckpt = java.nio.file.Files.createTempDirectory("graft_probe_ret")
      val q = EventStreams.retentionStateStream(
          input.toDF().toDF("u", "w"))
        .writeStream.format("noop")
        .option("checkpointLocation", s"$ckpt/ckpt")
        .outputMode("append").start()
      val per = math.max(1, perUser / nBatches)
      val (_, wall) = timed {
        var lo = 0
        var b = 0
        while (lo < perUser) {
          val hi = math.min(perUser, lo + per)
          input.addData(rows(lo, hi))
          q.processAllAvailable()
          lo = hi; b += 1
        }
      }
      val out = outRowsOf(q)
      val (st, sb) = stateOf(q)
      q.stop()
      results += ProbeResult("retention_state", n.toLong, nBatches, wall, out, st, sb)
    }

    // E41 thetaMaintained: foreachBatch snapshot maintenance — state is
    // the persisted sketch table (rows = groups), not the state store.
    if (want("theta_maintained")) {
      implicit val enc = org.apache.spark.sql.Encoders.product[(String, String)]
      val input = MemoryStream[(String, String)](spark)
      val n = nKeys * nBuckets
      def items(lo: Int, hi: Int): IndexedSeq[(String, String)] =
        (lo until hi).map(i => (s"g${i % 8}", s"item${(i * 2654435761L) % (n / 2)}"))
      val dir = java.nio.file.Files.createTempDirectory("graft_theta_probe")
      val q = EventStreams.thetaMaintained(
        input.toDF().toDF("grp", "item"), "grp", "item",
        s"$dir/snap", s"$dir/ckpt")
      val per = n / nBatches
      val (_, wall) = timed {
        (0 until nBatches).foreach { i =>
          input.addData(items(i * per,
            if (i == nBatches - 1) n else (i + 1) * per))
          q.processAllAvailable()
        }
      }
      val snapRows = graft.streaming.SnapshotStore.read(spark, s"$dir/snap")
        .map(_.count()).getOrElse(0L)
      q.stop()
      results += ProbeResult("theta_maintained", n.toLong, nBatches, wall,
        0L, snapRows, 0L)
    }

    val rs = results.result()
    val json = rs.map { r =>
      val rps = if (r.wallS > 0) r.rowsIn / r.wallS else 0.0
      s""""${r.name}":{"rows_in":${r.rowsIn},"batches":${r.batches},""" +
        s""""wall_s":${BigDecimal(r.wallS).setScale(3, BigDecimal.RoundingMode.HALF_UP)},""" +
        s""""rows_per_s":${math.round(rps)},"out_rows":${r.outRows},""" +
        s""""state_rows":${r.stateRows},"state_bytes":${r.stateBytes}}"""
    }.mkString(
      s"""{"n_keys":$nKeys,"n_buckets":$nBuckets,"provider":"$provider","probes":{""",
      ",", "}}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println(json)
    spark.stop()
  }
}
