package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SkewScratch extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("scratch: skew stats") {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec, QueryStageExec}
    import org.apache.spark.sql.execution.SparkPlan
    spark.sparkContext.setLogLevel("DEBUG")
    val df = graft.queries.RefParityQueries.queries("join_aqe_skew")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    def stages(p: SparkPlan): Seq[ShuffleQueryStageExec] = p match {
      case a: AdaptiveSparkPlanExec => stages(a.executedPlan)
      case s: ShuffleQueryStageExec => s +: stages(s.plan)
      case qs: QueryStageExec => stages(qs.plan)
      case other => other.children.flatMap(stages)
    }
    stages(df.queryExecution.executedPlan).foreach { s =>
      val ms = s.mapStats
      println(s"STAGE ${s.id}: mappers=${ms.map(_.bytesByPartitionId.length)}" +
        s" sizes=${ms.map(_.bytesByPartitionId.mkString(",")).getOrElse("none")}")
    }
    println("CONF skewJoin.enabled=" +
      spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "unset"))
  }
}
