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
    curateFrom(spark, dir, TextOps.qualityScoredSpilled(spark, dir))

  /** [[curate]] over a pre-built quality-scored frame (the
    * [[TextOps.qualityScoredSpilled]] readback) — the absolute gate and
    * the relative selection BOTH derive from it, so the scored corpus
    * pass runs once per evaluation instead of once per consumer
    * (`curation_report` passes the same frame in and reads the score
    * column too). Gate semantics are unchanged: `quality_ok` is the same
    * `score >= 0.5` textQuality computes, and qualitySelectFrom ranks the
    * identical (doc_id, lang, score) rows.
    */
  private[graft] def curateFrom(spark: SparkSession, dir: String,
      scoredBuilder: => DataFrame): DataFrame = {
    // Three constituents do EAGER driver-side work when constructed
    // (dedup_cluster's propagation loop + spill, perplexity_filter's
    // median rank, quality_select's cut-pair collects); built
    // sequentially their jobs ran back to back with most executors idle
    // in each one's tail. Constructing them from a small thread pool
    // lets the scheduler back-fill (independent concurrent jobs — the
    // standard driver-thread overlap pattern); the verdict join below is
    // unchanged, so the composed rows are identical.
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val fCluster = Future(Dedup.cluster(spark, dir)
        .select(col("doc_id"), col("keep").as("dedup_keep")))
      val fPerplexity = Future(TextOps.perplexityFilter(spark, dir)
        .select(col("doc_id"), col("perplexity_ok")))
      // by-name so `curate`'s eager spill write lands INSIDE the overlap
      // window the two futures above open (report passes a ready frame)
      val scored = scoredBuilder
      val fSelect = Future(TextOps.qualitySelectFrom(
          scored.select(col("doc_id"), col("lang"), col("score")))
        .select(col("doc_id"), col("keep").as("select_ok")))
      verdictFrom(
        scored.select(col("doc_id"), (col("score") >= 0.5).as("quality_ok")),
        TextOps.textRepetition(spark, dir)
          .select(col("doc_id"), (col("rep2") <= MaxRep2).as("repetition_ok")),
        Await.result(fPerplexity, Duration.Inf),
        Await.result(fSelect, Duration.Inf),
        Dedup.decontaminate(spark, dir)
          .select(col("doc_id"), (!col("contaminated")).as("decontaminated")),
        Await.result(fCluster, Duration.Inf))
    } finally pool.shutdown()
  }

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

  // --------------------------------------------------------- curation_report

  /** The DOMAIN-level curation read (the C4/RefinedWeb/FineWeb reporting
    * granularity — web curation filters and audits per source/domain, not
    * only per document): for each source, document count, how many survive
    * the full six-gate [[curate]] verdict, the keep fraction, and the mean
    * quality score. This is the table a curation run's report page renders
    * and the input to source-level allow/deny decisions.
    *
    * Portability: the mean is computed over micro-scaled integer scores
    * (`round(score·10⁶)` is integral because score is round(·, 6), so the
    * bigint sum is exact and order-immune); the two fractions are ONE
    * closing division each, round 6. Float bound: `sum(score_micro)` ≤
    * n_docs·10⁶ (scores are ≤ ~1), so both division operands stay < 2^53
    * for n_docs up to ~9·10^9 per source — engine-exact int64→double
    * conversions, one correctly-rounded quotient each. Scale shape: the verdict and score
    * frames join on the doc key they already carry, then ONE
    * groupBy(source) whose map-side combine collapses to |sources| rows.
    */
  def report(spark: SparkSession, dir: String): DataFrame = {
    val src = graft.model.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
    // ONE scored corpus pass feeds the verdict's quality/selection gates
    // AND the report's score column (the spilled readback) — the previous
    // form ran TextOps.textQuality's full tokenize+score projection once
    // inside curate and again here. lazy + by-name so the spill write
    // (the only blocking job here) runs INSIDE curateFrom's overlap
    // window, not serially before it.
    lazy val scored = TextOps.qualityScoredSpilled(spark, dir)
    val verdict = curateFrom(spark, dir, scored).select(col("doc_id"), col("keep"))
    val score = scored
      .select(col("doc_id"),
        expr("CAST(round(score * 1000000) AS BIGINT)").as("score_micro"))
    verdict
      .join(src, "doc_id")
      .join(score, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"),
        sum("score_micro").as("sm"))
      .select(col("source"), col("n_docs"), col("kept"),
        round(col("kept") / col("n_docs").cast("double"), 6).as("keep_frac"),
        round(col("sm") / (col("n_docs") * lit(1000000.0)), 6).as("mean_score"))
  }

  private lazy val reportSql: String =
    s"""WITH crj AS (
       |  SELECT d.source, cr.keep,
       |         CAST(round(t.score * 1000000) AS BIGINT) AS score_micro
       |  FROM ($curateSql) cr
       |  JOIN documents d ON cr.doc_id = d.doc_id
       |  JOIN (${TextOps.textQualitySql}) t ON cr.doc_id = t.doc_id
       |)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept,
       |       round(sum(CASE WHEN keep THEN 1 ELSE 0 END)
       |             / CAST(count(*) AS DOUBLE), 6) AS keep_frac,
       |       round(CAST(sum(score_micro) AS BIGINT)
       |             / (count(*) * 1000000.0), 6) AS mean_score
       |FROM crj GROUP BY 1""".stripMargin

  def ops: Seq[Op] = Seq(
    Op("curate", curate, Some(curateSql)),
    Op("curation_report", report, Some(reportSql))
  )
}
