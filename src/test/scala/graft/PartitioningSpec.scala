package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables
import graft.operators.Partitioning

class PartitioningSpec extends AnyFunSuite with TestSpark {

  test("byPeer co-locates every path's points in a single partition") {
    val n = 5
    val parted = Partitioning.byPeer(Tables.metrics(spark, Sf), n)
    assert(parted.rdd.getNumPartitions === n)
    val spread = parted
      .select(col("path"), spark_partition_id().as("pid"))
      .groupBy("path").agg(countDistinct("pid").as("npids"))
      .agg(max("npids")).collect().head.getLong(0)
    assert(spread === 1L, "a path must never straddle partitions")
  }
}
