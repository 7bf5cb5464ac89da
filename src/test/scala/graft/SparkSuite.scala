package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for Spark-level suites. */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  @transient lazy val spark: SparkSession =
    graft.pipeline.GraftSession.build(4, "graft-test")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sparkContext.setLogLevel("WARN")
  }
}
