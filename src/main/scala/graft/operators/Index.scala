package graft.operators
import graft.Op
object Index {
  def ops: Seq[Op] = Seq()
}
