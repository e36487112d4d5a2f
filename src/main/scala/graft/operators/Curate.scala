package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op

/** The end-to-end curation verdict: ONE query that composes the pipeline's
  * per-document filters into the keep/drop decision a training run
  * consumes, with the per-filter booleans kept as the audit trail —
  * [[TextOps.textQuality]]'s score gate, [[TextOps.textRepetition]]'s
  * duplicate-2-gram gate, [[TextOps.perplexityFilter]]'s median-relative
  * band, [[TextOps.qualitySelect]]'s per-language top-half selection
  * (the RELATIVE half of quality curation beside the absolute gate),
  * [[Dedup.decontaminate]]'s benchmark-overlap gate (eval-holdout docs
  * themselves fail it by definition — they are never trained on), and
  * [[Dedup.cluster]]'s transitive near-dup representative election.
  *
  * Scale shape: every constituent keeps its own audited plan (map-only
  * quality/repetition, broadcast decontamination and selection cut pairs,
  * checkpointed cluster loop), and the composition is doc_id-keyed
  * equi-joins — co-partitioned exchanges over one row per document,
  * nothing wider. The DuckDB oracle nests the constituents' oracle SQL
  * verbatim, so the composed verdict is hash-gated end to end, not
  * re-derived.
  */
object Curate {

  /** rep2 above this duplicate-2-gram fraction fails the repetition gate
    * (the Demo's observed corpus tail; production tunes per corpus).
    */
  val MaxRep2 = 0.10

  def curate(spark: SparkSession, dir: String): DataFrame =
    verdictFrom(
      TextOps.textQuality(spark, dir)
        .select(col("doc_id"), col("keep").as("quality_ok")),
      TextOps.textRepetition(spark, dir)
        .select(col("doc_id"), (col("rep2") <= MaxRep2).as("repetition_ok")),
      TextOps.perplexityFilter(spark, dir)
        .select(col("doc_id"), col("perplexity_ok")),
      TextOps.qualitySelect(spark, dir)
        .select(col("doc_id"), col("keep").as("select_ok")),
      Dedup.decontaminate(spark, dir)
        .select(col("doc_id"), (!col("contaminated")).as("decontaminated")),
      Dedup.cluster(spark, dir)
        .select(col("doc_id"), col("keep").as("dedup_keep")))

  /** The composition itself, constituent-agnostic so the absence
    * semantics are directly testable (Round7Spec).
    */
  private[graft] def verdictFrom(quality: DataFrame, repetition: DataFrame,
                                 perplexity: DataFrame,
                                 selection: DataFrame,
                                 decontaminated: DataFrame,
                                 representative: DataFrame): DataFrame =
    quality
      .join(repetition, "doc_id")
      .join(perplexity, "doc_id")
      .join(selection, "doc_id")
      .join(representative, "doc_id")
      .join(decontaminated, Seq("doc_id"), "left")
      // Eval holdout is decided by the PREDICATE, never by row absence:
      // decontaminate's output also omits docs with <3 tokens (zero
      // shingles), and those are trainable — no shingles means no possible
      // benchmark overlap, so missing NON-eval rows coalesce to true while
      // eval docs hard-fail (they are never trained on).
      .withColumn("decontaminated",
        when(col("doc_id") % Dedup.EvalMod === 0, lit(false))
          .otherwise(coalesce(col("decontaminated"), lit(true))))
      .withColumn("keep",
        col("quality_ok") && col("repetition_ok") && col("perplexity_ok") &&
          col("select_ok") && col("decontaminated") && col("dedup_keep"))

  private val curateSql: String =
    s"""WITH q AS (${TextOps.textQualitySql}),
       |r AS (${TextOps.textRepetitionSql}),
       |p AS (${TextOps.perplexityFilterSql}),
       |s AS (${TextOps.qualitySelectSql}),
       |d AS (${Dedup.decontaminateSql}),
       |c AS (${Dedup.clusterSql})
       |SELECT q.doc_id,
       |       q.keep AS quality_ok,
       |       r.rep2 <= $MaxRep2 AS repetition_ok,
       |       p.perplexity_ok,
       |       s.keep AS select_ok,
       |       CASE WHEN q.doc_id % ${Dedup.EvalMod} = 0 THEN false
       |            ELSE coalesce(NOT d.contaminated, true) END AS decontaminated,
       |       c.keep AS dedup_keep,
       |       (q.keep AND r.rep2 <= $MaxRep2 AND p.perplexity_ok AND s.keep
       |        AND CASE WHEN q.doc_id % ${Dedup.EvalMod} = 0 THEN false
       |                 ELSE coalesce(NOT d.contaminated, true) END
       |        AND c.keep) AS keep
       |FROM q
       |JOIN r ON q.doc_id = r.doc_id
       |JOIN p ON q.doc_id = p.doc_id
       |JOIN s ON q.doc_id = s.doc_id
       |JOIN c ON q.doc_id = c.doc_id
       |LEFT JOIN d ON q.doc_id = d.doc_id""".stripMargin

  def ops: Seq[Op] = Seq(
    Op("curate", curate, Some(curateSql))
  )
}
