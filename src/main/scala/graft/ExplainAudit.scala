package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the physical plan of registered queries so plan shape
  * (join strategies, pushed filters, exchange placement) can be audited
  * against the 100 TB design intent. Usage:
  *
  *   sbt "runMain graft.ExplainAudit [queryName ...]"
  *
  * No args → all registered queries. Plans print against sf0.01.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      println(s"\n========== $name ==========")
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val plan = fn(spark, dir).queryExecution.executedPlan.treeString
          println(plan.linesIterator.map(_.take(220)).mkString("\n"))
        case None => println(s"(unknown query: $name)")
      }
    }
    spark.stop()
  }
}
