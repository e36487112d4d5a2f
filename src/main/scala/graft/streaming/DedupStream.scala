package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Op
import graft.model.Portable.md5Hex

/** Streaming exact dedup — the continuous-ingest twin of
  * `operators/Dedup.exact`, for pipelines that dedup documents AS they
  * arrive rather than in a nightly batch.
  *
  * The streaming aggregation keys on `md5(text)` (16 bytes of state per
  * distinct document, never the body) and maintains (min doc_id, copy
  * count) per key; on a finite stream the complete-mode result must equal
  * the batch dedup exactly, which is what the DuckDB oracle checks. The
  * same planted duplicates as the batch operator (every 10th doc re-sent
  * as doc_id+1000000) make keep/drop observable on the dup-free fixture.
  *
  * Scale posture: keyed state grows with the distinct-document count, so
  * an unbounded 100 TB ingest pairs this with either a RocksDB state
  * store or `dropDuplicatesWithinWatermark` (state bounded by the
  * ingest-time horizon instead) — the spec exercises the watermarked
  * variant's first-wins/state-eviction semantics via MemoryStream.
  */
object DedupStream {

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** doc stream -> (text_hash, keep_id, n_copies) streaming aggregation. */
  def dedupAgg(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    val planted = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    base.union(planted)
      .groupBy(md5Hex(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** Run the streaming dedup over the documents fixture (file source,
    * memory sink, complete mode), block until drained, return the table.
    */
  def dedupQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.readStream
      .schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val sink = "stream_dedup_" + UUID.randomUUID().toString.replace("-", "")
    val q = dedupAgg(docs)
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    spark.table(sink)
  }

  /** Oracle: identical to the batch exact dedup — finite stream in
    * complete mode must equal the batch aggregation (Dedup.exactSql).
    */
  private val dedupSql: String =
    """WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
      |)
      |SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
      |       CAST(count(*) AS BIGINT) AS n_copies
      |FROM all_docs GROUP BY 1""".stripMargin

  def ops: Seq[Op] = Seq(
    Op("stream_dedup_exact", dedupQuery, Some(dedupSql))
  )
}
