package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the validation gate between
  * ingest and everything downstream: assert shape invariants (no null
  * keys, values in range, codes from a dictionary, keys unique,
  * references resolvable) and get a violations REPORT, not a job
  * failure, so one bad shard is triaged instead of killing a 100 TB
  * run.
  *
  * Execution shape: all ROW-PREDICATE checks (notNull / inRange /
  * acceptedValues / custom predicate) compile into ONE aggregation
  * over ONE scan — adding a tenth check costs nothing extra.
  * STRUCTURAL checks need their own shape and run separately:
  * uniqueness is a partial-aggregated groupBy on the key, referential
  * integrity an anti-join (broadcast when the parent is dim-sized).
  * Report rows: (check, n_violations, passed).
  */
object Quality {

  sealed trait Check { def name: String }

  /** Column must never be null. */
  final case class NotNull(col: String) extends Check {
    def name: String = s"not_null($col)"
  }

  /** Non-null values must fall in [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name: String = s"in_range($col, $lo, $hi)"
  }

  /** Non-null values must come from the dictionary. */
  final case class AcceptedValues(col: String, values: Seq[String]) extends Check {
    def name: String = s"accepted_values($col)"
  }

  /** Rows matching the predicate are violations. */
  final case class Violates(label: String, predicate: Column) extends Check {
    def name: String = s"violates($label)"
  }

  /** The key columns must identify rows uniquely. Violations = rows
    * beyond the first per duplicated key.
    */
  final case class Unique(cols: Seq[String]) extends Check {
    def name: String = s"unique(${cols.mkString(",")})"
  }

  /** Every child key must exist in the parent (nulls are not
    * violations — combine with [[NotNull]] to forbid them).
    * `broadcastParent` (default true) fits the usual dim-sized parent;
    * set it false for a fact-sized parent so the anti-join shuffles
    * instead of forcing a driver-side collect of billions of keys.
    */
  final case class ForeignKey(
      col: String, parent: DataFrame, parentCol: String,
      broadcastParent: Boolean = true) extends Check {
    def name: String = s"foreign_key($col)"
  }

  private def violationExpr(c: Check): Option[Column] = c match {
    case NotNull(col0) => Some(when(col(col0).isNull, 1L).otherwise(0L))
    case InRange(col0, lo, hi) =>
      Some(when(col(col0).isNotNull &&
        (col(col0) < lo || col(col0) > hi), 1L).otherwise(0L))
    case AcceptedValues(col0, vs) =>
      Some(when(col(col0).isNotNull &&
        !col(col0).isin(vs: _*), 1L).otherwise(0L))
    case Violates(_, p) => Some(when(p, 1L).otherwise(0L))
    case _ => None
  }

  /** Run every check, return one report row per check:
    * (check, n_violations, passed), in the order given.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    val rowChecks = checks.flatMap(c => violationExpr(c).map(c.name -> _))
    val rowReport: Option[DataFrame] =
      if (rowChecks.isEmpty) None
      else {
        val aggs = rowChecks.zipWithIndex.map { case ((_, e), i) =>
          sum(e).as(s"__v$i")
        }
        val wide = df.agg(aggs.head, aggs.tail: _*)
        val rows = rowChecks.zipWithIndex.map { case ((n, _), i) =>
          struct(lit(n).as("check"),
            coalesce(col(s"__v$i"), lit(0L)).as("n_violations"))
        }
        Some(wide.select(explode(array(rows: _*)).as("r")).select("r.*"))
      }
    val structural: Seq[DataFrame] = checks.collect {
      case u @ Unique(cols0) =>
        df.groupBy(cols0.map(col): _*).agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("n_violations"))
          .select(lit(u.name).as("check"), col("n_violations"))
      case f @ ForeignKey(c, parent, pc, bcast) =>
        val keys = parent.select(col(pc).as(c)).distinct()
        df.filter(col(c).isNotNull)
          .join(if (bcast) broadcast(keys) else keys, Seq(c), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(f.name).as("check"), col("n_violations"))
    }
    val all = (rowReport.toSeq ++ structural).reduce(_ unionByName _)
    // preserve caller order for a stable, readable report
    val order = checks.map(_.name).zipWithIndex.toMap
    val orderCol = checks.map(c => (c.name, order(c.name))).foldRight(lit(-1)) {
      case ((n, i), rest) => when(col("check") === n, lit(i)).otherwise(rest)
    }
    all.withColumn("__o", orderCol)
      .orderBy("__o")
      .select(col("check"), col("n_violations"),
        (col("n_violations") === 0).as("passed"))
  }

  /** C4 heuristic filter suite (Raffel et al. '20 §2.2) — the
    * published web-corpus cleaning baseline, reported flag-not-drop:
    *
    * Line rules (applied per line, survivors rejoined into
    * `clean_text` in original order):
    *   - ends in a terminal punctuation mark (`.` `!` `?` `"`),
    *   - has at least `minWordsPerLine` whitespace words,
    *   - does not contain the word "javascript" (case-insensitive).
    * Page rules (flags on the whole document):
    *   - `has_lorem`: "lorem ipsum" anywhere,
    *   - `has_brace`: a curly bracket anywhere (code page proxy),
    *   - `has_bad_word`: any `badWords` entry as a whole word,
    *   - sentence floor: `n_sentences` (terminal `.!?` marks in the
    *     RETAINED text — the deterministic stand-in for a sentence
    *     splitter, counted identically in both engines) must reach
    *     `minSentences`.
    * `kept` = the conjunction of the page rules. The caller filters;
    * dropping here would hide WHICH rule fired from the attrition
    * report ([[attrition]] composes directly on the flags).
    *
    * Execution shape: pure per-row projections — lines live and die
    * inside the row's own split array (HOF filter, no explode, no
    * shuffle, no window), the bad-word list is config-sized and
    * compiled into one word-boundary regex ([[graft.operators.TextMetrics]]
    * blocklist discipline). At 100 TB this is a map-only pass.
    */
  def c4Filter(df: DataFrame, id: Column, text: Column,
      badWords: Seq[String] = Nil,
      minWordsPerLine: Int = 3, minSentences: Int = 5): DataFrame = {
    val keepLine = (l: Column) =>
      rtrim(l).rlike("[.!?\"]$") &&
        size(filter(split(trim(l), "\\s+"), w => length(w) > 0)) >= minWordsPerLine &&
        !lower(l).contains("javascript")
    // whole-word = non-letter/digit (or edge) on BOTH sides, as
    // consuming context — \b fails on symbol-edged blocklist entries
    // ('$'→' ' is non-word→non-word, no boundary), and RE2-class
    // engines have no lookbehind to fake it with; entries lowercase
    // to match the lowercased text
    val badRe = badWords.map(_.toLowerCase)
      .map(java.util.regex.Pattern.quote).mkString("|")
    df.select(id.as("doc_id"), text.as("__text"))
      .withColumn("__lines", split(col("__text"), "\n"))
      .withColumn("__kept", filter(col("__lines"), keepLine))
      .withColumn("clean_text", array_join(col("__kept"), "\n"))
      .select(col("doc_id"), col("clean_text"),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept_lines"),
        length(regexp_replace(col("clean_text"), "[^.!?]", ""))
          .cast("long").as("n_sentences"),
        lower(col("__text")).contains("lorem ipsum").as("has_lorem"),
        col("__text").contains("{").as("has_brace"),
        (if (badWords.isEmpty) lit(false)
         else lower(col("__text")).rlike(
           s"(^|[^\\p{L}\\p{Nd}])($badRe)([^\\p{L}\\p{Nd}]|$$)"))
          .as("has_bad_word"))
      .withColumn("kept",
        col("n_sentences") >= minSentences && !col("has_lorem") &&
          !col("has_brace") && !col("has_bad_word"))
  }

  /** Curation attrition report — the observability twin of a filter
    * cascade (reference pipeline's implicit drop steps,
    * `tratamento_epe.R:70-104`, made explicit and countable): given
    * ordered stages of keep-PREDICATES, report per stage how many docs
    * entered, survived, and were dropped, plus the cumulative survival
    * rate. Before committing a 100 TB corpus run, this is the report
    * that catches "the language gate just silently ate 40% of the
    * corpus".
    *
    * Execution shape: ALL stages evaluate in ONE partial-aggregated
    * scan — each row contributes one cumulative-AND survival flag per
    * stage (a row is in stage i's input iff it passed stages 1..i-1),
    * the aggregate is k+1 sums, and the per-stage rows explode from
    * that single aggregate row. Adding a tenth stage costs nothing
    * extra; no second scan, no join. A null predicate value counts as
    * a drop (a gate that cannot evaluate must not pass the doc).
    *
    * Stage predicates that need non-row-local context (e.g. "is the
    * exact-dedup winner") are the caller's job to materialize as a
    * column first (window/join), then reference here — see
    * `q_curation_attrition`.
    */
  def attrition(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "at least one stage required")
    val cum = stages
      .scanLeft(lit(true)) { case (in, (_, keep)) =>
        in && coalesce(keep, lit(false))
      }
      .tail // cum(i) = survived stages 0..i
    val aggs = count(lit(1)).as("__in0") +:
      cum.zipWithIndex.map { case (c, i) =>
        sum(c.cast("long")).as(s"__s$i")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = stages.zipWithIndex.map { case ((name, _), i) =>
      val docsIn =
        if (i == 0) col("__in0") else coalesce(col(s"__s${i - 1}"), lit(0L))
      val docsOut = coalesce(col(s"__s$i"), lit(0L))
      struct(
        lit(i + 1).as("stage_idx"),
        lit(name).as("stage"),
        docsIn.as("docs_in"),
        docsOut.as("docs_out"),
        (docsIn - docsOut).as("dropped"),
        when(docsIn === 0, 0.0)
          .otherwise(round((docsIn - docsOut) * lit(1.0) / docsIn, 4))
          .as("drop_rate"),
        when(col("__in0") === 0, 0.0)
          .otherwise(round(docsOut * lit(1.0) / col("__in0"), 4))
          .as("survival_rate"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
