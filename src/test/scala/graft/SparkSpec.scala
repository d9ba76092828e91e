package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session keeps the
  * suite fast; tests use isolated temp dirs for any writes).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString
}

object SparkSpec {
  // built through the shared engine-conf factory (r16) so specs assert
  // against the same session configuration Bench and Verify run
  lazy val session: SparkSession = graft.EngineSession.builder("local[4]", "4")
    .appName("graft-test")
    .getOrCreate()
}
