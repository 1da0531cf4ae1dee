package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM. */
object SparkTestSession {
  lazy val spark: SparkSession = graft.core.Sessions.build(
    "graft-test", master = Some("local[4]"), shufflePartitions = Some(4))
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
}
