package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cluster deployment path (`spark.sql.extensions=
  * graft.GraftExtensions`) gets exercised with the EXACT conf a
  * spark-submit would use. `spark.sql.extensions` is read at session
  * instantiation, so the shared test session (built by
  * `Engine.session` via the experimental API) can't test it — the
  * probe runs in a forked JVM with a fresh SparkContext, like a real
  * driver launch. Assertion surface lives in [[ExtensionsProbe]]:
  * function resolution through the catalog, SQL-only evaluation, the
  * optimizer rule, and the planner strategy.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions wires functions, rule, strategy") {
    import scala.jdk.CollectionConverters._
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    // replay this (sbt-forked) JVM's add-opens/-Xmx set — the same
    // flags spark-submit injects for a JDK17 driver
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
    val log = java.io.File.createTempFile("extensions_probe", ".log")
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", System.getProperty("java.class.path"), "graft.ExtensionsProbe")
    val pb = new ProcessBuilder(cmd.asJava)
    pb.redirectOutput(log)
    pb.redirectErrorStream(true)
    val rc = pb.start().waitFor()
    val out = java.nio.file.Files.readString(log.toPath)
    assert(rc == 0 && out.contains("EXTENSIONS OK"),
      s"probe exit $rc; tail:\n${out.linesIterator.toSeq.takeRight(25).mkString("\n")}")
    log.delete()
  }
}
