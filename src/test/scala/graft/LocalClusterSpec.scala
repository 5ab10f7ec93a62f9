package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5's promised serialization smoke: task closures containing the
  * custom exec node / expressions / aggregates serialize to REAL executor
  * JVMs. `local-cluster[2,1,1024]` needs its own SparkContext (one per
  * JVM, and the suites share a local[4] one), so the scenario lives in
  * [[LocalClusterSmoke]] and this spec shells out to a fresh JVM — which
  * is also the honest form of the claim being tested.
  */
class LocalClusterSpec extends AnyFunSuite {

  test("local-cluster[2,1,1024]: sample exec node, codegen expressions, " +
       "and TypedImperativeAggregate partials cross the executor-JVM " +
       "boundary (LocalClusterSmoke)") {
    val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    assume(new java.io.File(s"$sparkHome/jars").isDirectory,
      s"needs a Spark distribution at $sparkHome")
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val opens = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val cp = s"target/scala-2.13/classes:$sparkHome/jars/*"
    val cmd = (Seq(javaBin) ++ opens ++
      Seq("-cp", cp, "graft.LocalClusterSmoke")).toArray
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    // the executor-launcher needs these to build the child JVM's command
    pb.environment().put("SPARK_HOME", sparkHome)
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    val proc = pb.start()
    val outF = scala.concurrent.Future {
      scala.io.Source.fromInputStream(proc.getInputStream).mkString
    }(scala.concurrent.ExecutionContext.global)
    val finished = proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly()
    val out = scala.concurrent.Await
      .result(outF, scala.concurrent.duration.Duration(30, "s"))
    assert(finished, s"local-cluster smoke timed out:\n${out.takeRight(3000)}")
    val rc = proc.exitValue()
    if (rc != 0 && out.contains("Error running executor")) {
      // the sandbox refused to spawn worker/executor processes — record
      // why instead of failing the build on infrastructure
      cancel(s"executor processes could not spawn here:\n${out.takeRight(1500)}")
    }
    assert(rc == 0 && out.contains("LOCAL_CLUSTER_OK"),
      s"rc=$rc\n${out.takeRight(3000)}")
    // the marker line proves tasks ran on executor ids, never in-driver
    val marker = out.linesIterator.find(_.startsWith("LOCAL_CLUSTER_OK")).get
    assert(marker.contains("executors=0,1"), marker)
  }
}
