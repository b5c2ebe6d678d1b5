package graft.engine

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Structured per-action metrics (≈ the reference's zap logging of row
  * counts and durations on every pipeline step, bigquack.go:129-138):
  * a QueryExecutionListener capturing (action, output rows, wall nanos)
  * for each completed execution on the session.
  */
final class MetricsListener extends QueryExecutionListener {

  final case class ActionMetrics(action: String, outputRows: Option[Long], durationNs: Long)

  private val events = new ConcurrentLinkedQueue[ActionMetrics]()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val rows = qe.executedPlan.collectFirst {
      case p if p.metrics.contains("numOutputRows") => p.metrics("numOutputRows").value
    }
    events.add(ActionMetrics(funcName, rows, durationNs))
  }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    events.add(ActionMetrics(s"$funcName!failed", None, 0L))

  def snapshot: Seq[ActionMetrics] = events.iterator().asScala.toSeq

  def clear(): Unit = events.clear()
}
