package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole ScalaTest run (cheap suites). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = graft.engine.Sessions.local("4", "graft-test")
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Run `body` with the given SQL confs set, restoring prior values
    * after — plan-shape audits that need e.g. AQE off without touching
    * the shared session's steady state. */
  def withConf[A](spark: SparkSession, confs: (String, String)*)(body: => A): A = {
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
