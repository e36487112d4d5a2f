package graft.operators
import graft.Op
object Carbon {
  def ops: Seq[Op] = Seq()
}
