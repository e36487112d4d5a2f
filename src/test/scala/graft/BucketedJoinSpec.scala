package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables

/** The co-located join path for repeated fact-fact joins (SURVEY §5):
  * bucketing both sides by the join key removes the shuffle entirely —
  * at 100 TB this converts every orders⋈lineitem into a local zip of
  * pre-sorted buckets.
  */
class BucketedJoinSpec extends AnyFunSuite with TestSpark {

  test("bucketed orders ⋈ lineitem plans without a shuffle exchange") {
    // warehouse.dir is a static conf; the default ($PWD/spark-warehouse,
    // gitignored) is fine for a throwaway bucketed table pair
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_buckets")
    try {
      Tables.lineitem(spark, Sf)
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_buckets.lineitem_b")
      Tables.orders(spark, Sf)
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_buckets.orders_b")

      val joined = spark.table("graft_buckets.lineitem_b")
        .join(spark.table("graft_buckets.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("qty"))

      // disable broadcast so the join strategy itself is under test
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"))
        val joinPart = plan.substring(0, plan.indexOf("HashAggregate") max plan.length - 1)
        // the join inputs must come straight from bucketed scans — no
        // Exchange between scan and join
        val beforeAgg = plan.split("\n").takeWhile(!_.contains("== Initial Plan =="))
        val exchanges = beforeAgg.count(_.contains("Exchange hashpartitioning"))
        assert(exchanges <= 1,
          s"expected only the post-join aggregation exchange, got $exchanges:\n$plan")
        assert(joined.collect().nonEmpty)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_buckets.lineitem_b")
      spark.sql("DROP TABLE IF EXISTS graft_buckets.orders_b")
    }
  }
}
