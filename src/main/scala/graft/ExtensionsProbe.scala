package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cluster-deployment-path probe: proves that
  * `--conf spark.sql.extensions=graft.GraftExtensions` ALONE wires the
  * full custom surface — SQL function registration, the
  * CollapseUnicodeNormalize optimizer rule, and the AsOfJoinStrategy
  * planner strategy — with NO call to `Engine.session` /
  * `GraftFunctions.registerAll` (the live-session twins).
  *
  * `spark.sql.extensions` is a STATIC conf read at SparkContext/
  * session instantiation, so this must run in a fresh JVM (the test
  * JVM's shared session was built without it); `ExtensionsSpec` forks
  * this main exactly as spark-submit would launch a driver and asserts
  * the `EXTENSIONS OK` marker + exit 0.
  */
object ExtensionsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-probe")
      // the one line a cluster submit would carry — everything below
      // must light up from it
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    import spark.implicits._

    var failures = List.empty[String]
    def check(name: String)(cond: => Boolean): Unit = {
      val ok = try cond catch {
        case e: Throwable => failures ::= s"$name threw: ${e.getMessage}"; return
      }
      if (!ok) failures ::= name
    }

    // 1. every injected function resolves through the session catalog
    check("all injected functions resolve") {
      val missing = functions.GraftFunctions.all.map(_._1)
        .filterNot(n => spark.catalog.functionExists(n))
      if (missing.nonEmpty) System.err.println(s"missing: $missing")
      missing.isEmpty
    }

    // 2. scalar expressions evaluate in pure SQL (no Column-API assist)
    check("scalar SQL functions evaluate") {
      val r = spark.sql(
        """SELECT lcs_len(array('a','b','c','d','e'), array('a','c','e')) AS l,
          |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
          |  unicode_normalize('café') AS nfc""".stripMargin).first()
      r.getLong(0) == 3L && math.abs(r.getDouble(1) - 11.0) < 1e-9 &&
        r.getString(2) == "café"
    }

    // 3. an injected AGGREGATE (theta sketch) runs end to end in SQL
    check("sketch aggregate evaluates") {
      spark.range(1000).createOrReplaceTempView("t_probe")
      val est = spark.sql(
        "SELECT theta_estimate(theta_sketch(id)) AS e FROM t_probe")
        .first().getDouble(0)
      est > 900.0 && est < 1100.0
    }

    // 4. injectOptimizerRule: nested idempotent NFC collapses to ONE
    // node in the optimized plan
    check("CollapseUnicodeNormalize rule is active") {
      import graft.functions.UnicodeNormalize.nfc
      val plan = spark.range(1)
        .select(nfc(nfc(concat(lit("café "), $"id".cast("string"))))
          .as("x"))
        .queryExecution.optimizedPlan.toString
      "unicode_normalize".r.findAllIn(plan).length == 1
    }

    // 5. injectPlannerStrategy: the as-of logical node plans to the
    // custom physical operator and produces the window-form answer
    check("AsOfJoinStrategy plans AsOfJoinExec") {
      val left = Seq((1L, 100L), (1L, 205L), (2L, 150L)).toDF("k", "lt")
      val right = Seq((1L, 90L, "a"), (1L, 200L, "b"), (2L, 160L, "c"))
        .toDF("k", "rt", "v")
      val exec = operators.AsOf.joinBackwardExec(left, right, Seq("k"),
        "lt", "rt", rightPayload = Seq("v"), rightOrder = Seq("rt"))
      val planned = exec.queryExecution.executedPlan.toString.contains("AsOfJoin ")
      val rows = exec.orderBy("k", "lt").select("v").as[String].collect().toSeq
      planned && rows == Seq("a", "b", null)
    }

    if (failures.nonEmpty) {
      System.err.println("EXTENSIONS FAIL: " + failures.reverse.mkString("; "))
      spark.stop()
      sys.exit(1)
    }
    println("EXTENSIONS OK")
    spark.stop()
  }
}
