package graft.operators
import graft.Op
object MetricQuery {
  def ops: Seq[Op] = Seq()
}
