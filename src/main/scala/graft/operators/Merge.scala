package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data application — the lakehouse maintenance surface: apply a
  * CDC change feed to a snapshot (upsert/delete, latest-wins) and build
  * slowly-changing-dimension history from a change log.
  *
  * These are PLAN-level operators (they return the merged DataFrame);
  * committing the result atomically is the storage layer's job (a
  * table-format transaction in a real lake — same seam as
  * EventStreams.ingestDedupMaintained).
  */
object Merge {

  /** Apply a CDC change feed to a base snapshot. `changes` carries an
    * op column ('I' insert, 'U' update, 'D' delete) and a version
    * column; for each key only the HIGHEST-version change applies
    * (latest-wins), earlier changes for the same key are superseded.
    * Rows of `base` with no change survive unchanged; 'I'/'U' rows
    * replace-or-insert; 'D' rows vanish.
    *
    * `base` and `changes` must share the non-op/version schema (the
    * payload columns); the result has exactly that schema.
    *
    * Shape at scale: latest-change-per-key is one window on (key,
    * version desc) — key-partitioned, no global ordering; the apply is
    * one anti-join (base minus changed keys) plus a union with the
    * surviving changes. Two key-partitioned shuffles total; with a
    * small change feed the anti-join broadcasts (the common case:
    * shard-sized feeds against snapshot-sized bases).
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      version: Column,
      op: Column): DataFrame = {
    require(keys.nonEmpty, "applyChanges needs at least one key column")
    val payload = base.columns.toSeq
    // deterministic tie-break on equal versions: delete beats insert
    // beats update ('D' < 'I' < 'U' — delete-biased, matching the
    // at-least-once-producer case where a same-version D/U pair must
    // resolve the same way on every run and replay (E8 relies on the
    // merge being a fixpoint). Feeds with unique versions per key are
    // unaffected.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(version.desc, upper(op).asc)
    val latest = changes
      .withColumn("__op", upper(op))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val untouched = base.join(
      latest.select(keys.map(col): _*), keys, "left_anti")
    val applied = latest.filter(col("__op") =!= "D")
      .select(payload.map(col): _*)
    untouched.unionByName(applied)
  }

  /** Build SCD-type-2 validity ranges from a change log: one row per
    * (key, version) with `effective_from` = its version value and
    * `effective_to` = the NEXT version for that key minus nothing —
    * half-open [from, to): `to` is null for the current row. Pure
    * key-partitioned `lead` window, no self-join, no shuffle beyond
    * the one keyed exchange.
    */
  def scd2(
      df: DataFrame,
      keys: Seq[String],
      version: Column): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(version.asc)
    df.withColumn("effective_from", version)
      .withColumn("effective_to", lead(version, 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }
}
