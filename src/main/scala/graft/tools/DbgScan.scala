package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Dev tool: list the distinct FileSourceScanExec nodes in a query's
  * executed (AQE-final) plan. Usage: runMain graft.tools.DbgScan <query> <sfDir> [table]
  */
object DbgScan {
  private def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
    case qs: QueryStageExec => qs +: collectAll(qs.plan)
    case r: ReusedExchangeExec => r +: collectAll(r.child)
    case other =>
      other +: (other.children.flatMap(collectAll) ++
        other.subqueries.flatMap(collectAll))
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.collect()
    val tbl = if (args.length > 2) args(2) else ""
    val scans = collectAll(df.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec if s.toString.contains(tbl) => s
    }
    scans.groupBy(System.identityHashCode).foreach { case (id, ss) =>
      println(s"=== scan@$id x${ss.size}\n${ss.head.toString.take(600)}")
    }
    spark.stop()
  }
}
