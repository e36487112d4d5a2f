package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

import graft.functions.Pearson

/** cassabon's peer placement contract as a Spark partitioning: the daemon
  * routes each path to peer `Hash8(path) % N` over the wire
  * (listener/peerlist.go:112-119); here the same key placement is a
  * `repartition` on the Pearson peer id, so all points of a path land in
  * one partition (co-located rollup aggregation, no further shuffle for
  * per-path operators downstream).
  */
object Partitioning {

  /** Repartition a metric stream by Pearson peer ownership. Requires a
    * `path` column; `spark` session functions must include pearson_hash8
    * (call [[Pearson.register]] or install [[graft.functions.GraftExtensions]]).
    */
  def byPeer(metrics: DataFrame, peers: Int): DataFrame = {
    Pearson.register(metrics.sparkSession)
    metrics.repartition(peers, expr(s"pearson_hash8(path) % $peers"))
  }
}
