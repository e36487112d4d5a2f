package graft

import java.lang.management.ManagementFactory
import java.util.concurrent.TimeUnit
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Launches [[ClusterSmoke]] in its OWN JVM (one SparkContext per JVM —
  * a `local-cluster` master can't coexist with the suite-shared `local`
  * session) and requires the multi-JVM run to exit clean with its OK
  * marker. See ClusterSmoke.scala for what the smoke proves; this spec
  * makes it part of every `sbt test`.
  */
class ClusterSmokeSpec extends AnyFunSuite {

  test("dedup_cluster is bit-identical under separate executor JVMs (local-cluster)") {
    assume(sys.env.contains("SPARK_HOME"),
      "local-cluster mode needs a Spark dist (SPARK_HOME)")
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    // inherit this forked test JVM's --add-opens etc. (build.sbt sets
    // them; Spark on Java 17 needs the module opens on every JVM)
    val jvmFlags = ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
      .filter(f => f.startsWith("--add-opens") || f.startsWith("--add-exports")
        || f.startsWith("-XX") || f.startsWith("--enable-native-access"))
    val cmd = Seq(javaBin) ++ jvmFlags ++ Seq("-Xmx2g", "-cp",
      System.getProperty("java.class.path"), "graft.ClusterSmoke")
    val pb = new ProcessBuilder(cmd.asJava)
    // the in-JVM Worker builds executor commands without going through
    // bin/load-spark-env.sh, which is what normally sets this — without
    // it the launcher dies with "Cannot find any build directories"
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    // drain on a daemon thread so a hung smoke can't wedge the suite —
    // the timed waitFor below stays in control
    val buf = new java.io.ByteArrayOutputStream()
    val drain = new Thread(() => proc.getInputStream.transferTo(buf): Unit)
    drain.setDaemon(true)
    drain.start()
    // generous by default: this host shows co-tenant steal spikes that
    // slow wall-clock ~10x (BASELINE.md "r6 measurement caveat"), and a
    // timeout flake in a correctness gate costs more than a slow test
    val timeoutSec = sys.props.getOrElse("graft.smoke.timeoutSec", "1200").toLong
    val finished = proc.waitFor(timeoutSec, TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly()
    drain.join(5000)
    val out = buf.toString("UTF-8")
    assert(finished, s"ClusterSmoke timed out; output tail:\n${out.takeRight(3000)}")
    assert(proc.exitValue() == 0 && out.contains("CLUSTER_SMOKE_OK"),
      s"ClusterSmoke failed (exit ${proc.exitValue()}); output tail:\n${out.takeRight(3000)}")
  }
}
