package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §2 for the operator inventory.
  * Everything is assembled from [[Registry]]; each operator lives next to
  * its DuckDB oracle SQL in `graft.operators.*`.
  */
object SparkEntry {
  /** Flagship query on sf=0.001: the full rollup write set (the core of
    * the cassabon surface). Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.Rollups.rollups(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.ops.map(o => o.name -> o.run).toMap

  /** DuckDB-runnable oracle per query (omitted => rows-only check). */
  def oracleSql: Map[String, String] =
    Registry.ops.flatMap(o => o.oracle.map(o.name -> _)).toMap
}
