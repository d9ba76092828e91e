package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.operators.ArtifactStore

/** The r12 concurrent-session store laws, FOR REAL across two JVMs (r12
  * verdict ask #5: the in-JVM simulations in ArtifactStoreSpec share one
  * process; a deployment's concurrent sessions do not). A forked child
  * process ([[StoreWorker]]) with its own SparkSession drives the same
  * store root this suite's session holds a memoized scan against:
  *
  *   - cross-JVM warm hit, both directions: the parent's publish serves
  *     the child without a rebuild (same content-hashed code identity —
  *     the classpath is the same classes tree), and the child's publish
  *     serves the parent;
  *   - a held scan survives the OTHER PROCESS's aged vacuum: live
  *     artifacts are kept by classification, not by intra-JVM locks, so
  *     the parent's scan reads intact rows after the child swept;
  *   - the child's vacuum sweeps the parent's crash debris (a planted
  *     `.tmp-` dir) without touching either live artifact.
  */
class ArtifactStoreCrossJvmSpec extends SparkSpec {

  private def uniq(n: String) = s"$n-${java.util.UUID.randomUUID().toString.take(8)}"

  test("two JVMs, one store root: warm hits both ways, held scan survives the child's vacuum") {
    val root = tmpDir("xjvm-artifacts")
    val in = tmpDir("xjvm-in") + "/t.parquet"
    spark.range(20).selectExpr("id", "id * 3 as v")
      .coalesce(1).write.mode("overwrite").parquet(in)
    val expectedSum = spark.read.parquet(in)
      .agg(sum(col("v"))).collect()(0).getLong(0)
    val name1 = uniq("xj-parent")
    val name2 = uniq("xj-child")
    spark.conf.set(ArtifactStore.ConfKey, root)
    try {
      // parent publishes name1 and HOLDS the scan across the child's run
      val held = ArtifactStore.table(spark, name1, Seq(in)) {
        spark.read.parquet(in).groupBy((col("id") % 4).as("k"))
          .agg(sum(col("v")).as("s"))
      }
      val before = held.collect().map(_.toSeq.toList).toSet
      assert(ArtifactStore.buildCount(name1) == 1)
      // crash debris the child's aged vacuum must sweep
      val grp = new java.io.File(root).listFiles().filter(_.isDirectory).head
      val tmpDebris = new java.io.File(grp, s"$name1.tmp-777-crash")
      assert(tmpDebris.mkdirs())
      java.nio.file.Files.writeString(
        tmpDebris.toPath.resolve("part-00000.parquet"), "junk")

      // fork the second JVM: same classpath (same code identity), own
      // session, same root
      val jdkOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar",
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val javaBin = s"${System.getProperty("java.home")}/bin/java"
      val cmd = (Seq(javaBin, "-Xmx2g", "-cp",
        System.getProperty("java.class.path")) ++ jdkOpens ++
        Seq("-Dspark.ui.enabled=false", "graft.StoreWorker",
          root, in, name1, name2)).asJava
      val pb = new ProcessBuilder(cmd)
      pb.redirectErrorStream(false)
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      val proc = pb.start()
      // wait first, read after: the markers are a few hundred bytes (far
      // under the pipe buffer), so the child can never block on stdout,
      // and a hung child is destroyed instead of hanging the suite
      val finished = proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) proc.destroyForcibly()
      val out = scala.io.Source.fromInputStream(proc.getInputStream, "UTF-8")
        .getLines().filter(_.startsWith("WORKER_")).toVector
      assert(finished, s"worker JVM did not finish in 180s; markers: $out")
      assert(proc.exitValue() == 0, s"worker failed; markers: $out")
      def marker(k: String): String = out.find(_.startsWith(s"$k="))
        .map(_.split("=", 2)(1))
        .getOrElse(fail(s"missing $k in worker output: $out"))

      // law 1: parent's publish is a warm hit in the child (0 builds)
      assert(marker("WORKER_BUILDS_1") == "0",
        "the child must serve the parent's artifact without a rebuild")
      assert(marker("WORKER_SUM_1") == expectedSum.toString)
      // law 2 setup: the child built name2 exactly once
      assert(marker("WORKER_BUILDS_2") == "1")
      // law 3: the child's aged vacuum kept both live artifacts and swept
      // the planted debris
      val vac = marker("WORKER_VACUUM")
      assert(vac.contains("live:kept"), s"live artifacts must survive: $vac")
      assert(vac.contains("tmp:deleted"), s"planted tmp debris must sweep: $vac")
      assert(!tmpDebris.exists(), "debris must be gone from disk")
      // held scan reads intact rows AFTER the other process's sweep
      assert(held.collect().map(_.toSeq.toList).toSet == before,
        "the held scan must survive the other JVM's vacuum")
      // law 2: the child's publish serves THIS session warm (no build)
      val fromChild = ArtifactStore.table(spark, name2, Seq(in)) {
        fail("parent must serve the child's artifact, not rebuild")
      }
      assert(ArtifactStore.buildCount(name2) == 0)
      assert(fromChild.agg(sum(col("s"))).collect()(0).getLong(0) == expectedSum)
    } finally spark.conf.unset(ArtifactStore.ConfKey)
  }
}
