package graft.operators
import graft.Op
object Multimodal {
  def ops: Seq[Op] = Seq()
}
