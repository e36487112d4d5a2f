package graft.operators
import graft.Op
object Similarity {
  def ops: Seq[Op] = Seq()
}
