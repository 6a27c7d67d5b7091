package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Merge, Profile}

/** Lakehouse-maintenance queries (SURVEY §2.C27-C30): CDC upsert
  * apply, SCD2 history, key-skew diagnosis, null-safe join.
  */
object MergeQueries {

  val all: Seq[Q] = Seq(

    // C27: CDC apply (latest-wins upsert/delete). The change feed is
    // derived deterministically from customer: keys %10==0 deleted,
    // %10==1 updated twice (v2 must win), brand-new keys inserted.
    Q(
      "q_upsert_merge",
      """WITH changes AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |         'D' AS op, 1 AS v
        |  FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0, c_mktsegment,
        |         'U', 1
        |  FROM customer WHERE c_custkey % 10 = 1
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 200.0, c_mktsegment,
        |         'U', 2
        |  FROM customer WHERE c_custkey % 10 = 1
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'new_' || c_custkey, c_nationkey, 50.0,
        |         c_mktsegment, 'I', 1
        |  FROM customer WHERE c_custkey % 10 = 2),
        |latest AS (
        |  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY v DESC, op) AS rn
        |  FROM changes),
        |l1 AS (SELECT * FROM latest WHERE rn = 1)
        |SELECT c_custkey, c_name, c_nationkey,
        |       round(c_acctbal, 4) AS c_acctbal, c_mktsegment
        |FROM (
        |  SELECT b.c_custkey, b.c_name, b.c_nationkey, b.c_acctbal, b.c_mktsegment
        |  FROM customer b ANTI JOIN l1 USING (c_custkey)
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |  FROM l1 WHERE op <> 'D')
        |ORDER BY c_custkey""".stripMargin
    ) { (s, dir) =>
      val base = table(s, dir, "customer")
      def payload = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      val del = base.filter(col("c_custkey") % 10 === 0)
        .withColumn("op", lit("D")).withColumn("v", lit(1))
      val u1 = base.filter(col("c_custkey") % 10 === 1)
        .withColumn("c_acctbal", col("c_acctbal") + 100.0)
        .withColumn("op", lit("U")).withColumn("v", lit(1))
      val u2 = base.filter(col("c_custkey") % 10 === 1)
        .withColumn("c_acctbal", col("c_acctbal") + 200.0)
        .withColumn("op", lit("U")).withColumn("v", lit(2))
      val ins = base.filter(col("c_custkey") % 10 === 2)
        .select((col("c_custkey") + 1000000).as("c_custkey"),
          concat(lit("new_"), col("c_custkey")).as("c_name"),
          col("c_nationkey"), lit(50.0).as("c_acctbal"), col("c_mktsegment"))
        .withColumn("op", lit("I")).withColumn("v", lit(1))
      val changes = del.unionByName(u1).unionByName(u2).unionByName(ins)
      Merge.applyChanges(base, changes, Seq("c_custkey"), col("v"), col("op"))
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          round(col("c_acctbal"), 4).as("c_acctbal"), col("c_mktsegment"))
        .orderBy("c_custkey")
    },

    // C28: SCD2 validity ranges over each customer's order history —
    // half-open [from, to), open-ended current row.
    Q(
      "q_scd2",
      """SELECT o_custkey, o_orderkey,
        |  round(o_totalprice, 4) AS price,
        |  o_orderkey AS effective_from,
        |  lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
        |    AS effective_to,
        |  lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
        |    IS NULL AS is_current
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin
    ) { (s, dir) =>
      Merge.scd2(table(s, dir, "orders"), Seq("o_custkey"), col("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 4).as("price"),
          col("effective_from"), col("effective_to"), col("is_current"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // C29: key-skew diagnosis — heaviest join/groupBy keys with share
    // and ratio-to-mean (the salt-or-not number), as a distributed
    // top-k.
    Q(
      "q_key_skew",
      """WITH c AS (SELECT event_type AS key, count(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT sum(n) AS n_rows, count(*) AS n_keys FROM c)
        |SELECT key, n,
        |  round(n / n_rows, 6) AS share,
        |  round(n / n_rows * n_keys, 4) AS ratio_to_mean
        |FROM c CROSS JOIN t
        |ORDER BY n DESC, key LIMIT 10""".stripMargin
    ) { (s, dir) =>
      Profile.keySkew(graft.sources.Tables.events(s, dir), col("event_type"), topK = 10)
    },

    // C30: null-safe equi-join (Spark `<=>` vs DuckDB IS NOT DISTINCT
    // FROM) — BUILDING is nulled out on both sides, so its customers
    // must match the dim's null row, not vanish.
    Q(
      "q_nullsafe_join",
      """WITH b AS (
        |  SELECT nullif(c_mktsegment, 'BUILDING') AS k, c_acctbal FROM customer),
        |d AS (
        |  SELECT DISTINCT nullif(c_mktsegment, 'BUILDING') AS k,
        |    coalesce(nullif(c_mktsegment, 'BUILDING'), 'UNKNOWN') AS label
        |  FROM customer)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM b JOIN d ON b.k IS NOT DISTINCT FROM d.k
        |GROUP BY label ORDER BY label""".stripMargin
    ) { (s, dir) =>
      val cust = table(s, dir, "customer")
      val b = cust.select(
        nullif(col("c_mktsegment"), lit("BUILDING")).as("k"), col("c_acctbal"))
      val d = cust.select(nullif(col("c_mktsegment"), lit("BUILDING")).as("k"))
        .distinct()
        .withColumn("label", coalesce(col("k"), lit("UNKNOWN")))
      b.join(d, b("k") <=> d("k"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy("label")
    }
  )

  /** E42 contract query: two RACING committers publish disjoint halves
    * of `documents` to one fresh SnapshotStore root from real threads;
    * the output proves BOTH landed (the no-lost-update contract the
    * single-writer pointer flip cannot give). The store round-trip is
    * collapsed to per-tag counts (2 rows — driver-metadata class) so
    * the scratch root can be deleted before returning; the oracle
    * recomputes the same halves straight from the table — if either
    * commit lost the race, its tag's row count (or the row itself)
    * hash-fails.
    */
  private def snapshotConcurrent(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val docs = table(s, dir, "documents").select(col("doc_id"), col("source"))
    val root = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_snap_q").toFile,
      "snap").getAbsolutePath
    val halves = Seq("even" -> 0, "odd" -> 1).map { case (tag, par) =>
      docs.filter(col("doc_id") % 2 === par).withColumn("tag", lit(tag))
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = halves.map { d =>
      new Thread(() => {
        try graft.streaming.SnapshotStore.commit(d, root, keepLast = 4)
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
    val versions = graft.streaming.SnapshotStore.committedVersions(s, root)
    val counts = versions
      .flatMap(v => graft.streaming.SnapshotStore.readVersion(s, root, v))
      .map(f => f.groupBy("tag").agg(count(lit(1)).as("n_rows")))
      .reduce(_ unionByName _)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    // everything needed is in `counts` now — the scratch store can go
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(root).getParentFile)
    counts.toSeq.toDF("tag", "n_rows")
      .withColumn("committed", lit(true))
      .orderBy("tag")
  }

  val snapshotQueries: Seq[Q] = Seq(
    Q(
      "q_snapshot_concurrent",
      """SELECT 'even' AS tag,
        |  CAST((SELECT count(*) FROM documents WHERE doc_id % 2 = 0) AS BIGINT) AS n_rows,
        |  TRUE AS committed
        |UNION ALL
        |SELECT 'odd',
        |  CAST((SELECT count(*) FROM documents WHERE doc_id % 2 = 1) AS BIGINT),
        |  TRUE
        |ORDER BY tag""".stripMargin
    )(snapshotConcurrent)
  )
}
