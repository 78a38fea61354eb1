package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}

/** Quantitative plan audit: how many bytes did a query actually move
  * through shuffles? Plan-shape tests (PlanSpec) pin WHERE exchanges
  * sit; this pins HOW MUCH crosses them — the number that decides
  * whether a 100-TB run saturates the network. Reads the SQL metrics
  * off the executed plan (walking through AQE stages and reused
  * exchanges), no listener machinery.
  */
object ShuffleAudit {

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val expanded = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case _                        => p.children
    }
    p +: expanded.flatMap(allNodes)
  }

  /** Executes the frame and returns total shuffle-write bytes across
    * every exchange in its (AQE-final) plan. Runs `collect()` on THIS
    * QueryExecution — a derived action like `count()` would execute a
    * different plan and leave these metrics at zero — so audit at test
    * scale, not on a 100-TB frame. */
  def shuffleWriteBytes(df: DataFrame): Long = {
    df.collect()
    allNodes(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeExec =>
        s.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)
      }.sum
  }
}
