package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (spark_guide.md: one session
  * per suite via lazy val; sharing across suites avoids repeated JVM-wide
  * context startup under sbt's single forked test JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def resource(path: String): String =
    getClass.getResource(path).getPath
}
