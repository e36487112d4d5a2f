package graft.operators
import graft.Op
object Analytics {
  def ops: Seq[Op] = Seq()
}
