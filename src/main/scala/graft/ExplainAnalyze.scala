package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** EXPLAIN ANALYZE — the reference executes the query and attaches
  * per-operator runtime statistics to the plan text
  * (presto-main/.../operator/ExplainAnalyzeOperator.java — the operator
  * buffers the whole query's output, then renders plan + stats). Spark
  * already accumulates the same statistics as SQLMetrics on every physical
  * operator; this surface executes the plan to a noop sink and returns the
  * metrics as a TABLE-VALUED result (operator, metric, value) instead of
  * prose — a table is joinable/filterable, which is what a user actually
  * does with runtime stats.
  *
  * Post-AQE: metrics are read off the FINAL adaptive plan, so re-planned
  * stages (broadcast conversions, coalesced partitions) report what really
  * executed, not the initial estimate — the analog of the reference
  * rendering stats only after TaskFinish.
  */
object ExplainAnalyze {

  /** One operator metric from the executed plan, in pre-order position
    * `ord` (0 = the root operator).
    */
  final case class OpStat(ord: Int, op: String, metric: String, value: Long)

  /** Execute `df` (discarding sink — full pipeline, nothing materialized
    * on the driver) and return every operator's runtime metrics.
    */
  def run(df: DataFrame): Seq[OpStat] = {
    // Execute THIS QueryExecution's plan instance: a DataFrameWriter
    // action plans a fresh copy, whose metrics would accumulate on the
    // copy while this df's plan stays all-zero.
    val qe = df.queryExecution
    qe.toRdd.foreach(_ => ())
    val nodes = scala.collection.mutable.ArrayBuffer.empty[SparkPlan]
    def walk(p: SparkPlan): Unit = p match {
      // adaptive wrappers: the real subtree hangs off a field, not
      // .children — an AQE plan walked naively ends at the first stage
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => nodes += q; walk(q.plan)
      case other =>
        nodes += other
        other.children.foreach(walk)
        // scalar/IN subqueries live outside .children
        other.subqueries.foreach(walk)
    }
    walk(qe.executedPlan)
    nodes.toSeq.zipWithIndex.flatMap { case (p, i) =>
      p.metrics.toSeq.sortBy(_._1).map { case (k, m) => OpStat(i, p.nodeName, k, m.value) }
    }
  }

  /** First pre-order (= topmost) value of `metric` on an operator whose
    * nodeName equals `op` — e.g. the FINAL aggregate's numOutputRows when
    * partial and final stages share the "HashAggregate" name.
    */
  def first(stats: Seq[OpStat], op: String, metric: String): Option[Long] =
    stats.collectFirst { case OpStat(_, `op`, `metric`, v) => v }
}
