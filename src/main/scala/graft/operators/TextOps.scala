package graft.operators
import graft.Op
object TextOps {
  def ops: Seq[Op] = Seq()
}
