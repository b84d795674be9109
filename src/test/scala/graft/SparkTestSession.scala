package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole ScalaTest run (cheap suites). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = graft.engine.Sessions.local("4", "graft-test")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
