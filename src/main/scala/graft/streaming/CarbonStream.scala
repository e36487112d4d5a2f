package graft.streaming
import graft.Op
object CarbonStream {
  def ops: Seq[Op] = Seq()
}
