package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 hardening gates: store crash-recovery at every entry point,
  * predicate-gated decontamination in the curate verdict, and
  * time-contiguous lifecycle flush cycles.
  */
class Round7Spec extends AnyFunSuite with TestSpark {

  test("compact on a never-written store is a no-op, not an NPE") {
    val ghost = Files.createTempDirectory("round7_ghost").toString + "/nonexistent"
    graft.sources.RollupStore.compact(spark, ghost) // must not throw
    val empty = Files.createTempDirectory("round7_empty").toString
    graft.sources.RollupStore.compact(spark, empty) // exists, no partitions
  }

  /** Reproduce a crash mid-swap: a committed staged compaction (`_compact`
    * with `_SUCCESS`) whose first destination directory was deleted but
    * whose staged replacement was not yet renamed in. Returns the store
    * path and the expected finalized rows for 2× state.
    */
  private def crashMidSwap(state: org.apache.spark.sql.DataFrame): (String, Path) = {
    import graft.sources.RollupStore
    val store = Files.createTempDirectory("round7_crash").toString
    val root = new Path(store)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    RollupStore.appendStateSlice(state, store)
    RollupStore.appendStateSlice(state, store)
    val multi = fs.globStatus(new Path(root, "tbl=*/stat_date=*")).map(_.getPath)
      .filter(d => fs.listStatus(d).count(_.getPath.getName.endsWith(".parquet")) > 1)
    assert(multi.nonEmpty)
    val staged = new Path(root, "_compact")
    graft.operators.Rollups.mergeAll(spark.read.option("basePath", store)
        .parquet(multi.map(_.toString).toIndexedSeq: _*).drop("stat_date"))
      .withColumn("stat_date", to_date(timestamp_seconds(col("stat_time"))))
      .repartition(col("tbl"), col("stat_date"))
      .write.mode("overwrite").partitionBy("tbl", "stat_date")
      .parquet(staged.toString)
    assert(fs.exists(new Path(staged, "_SUCCESS")))
    fs.delete(multi.head, true) // the mid-swap victim
    (store, staged)
  }

  test("a bare read after a crash mid-swap self-heals: no partition's rows go missing") {
    import graft.operators.Rollups
    val state = Rollups.rollupsMergeable(spark, Sf)
    val (store, staged) = crashMidSwap(state)
    val fs = new Path(store).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // readFinalized (via read) must recover FIRST — a read that skipped
    // recovery would silently drop the victim directory's rows
    val got = graft.sources.RollupStore.readFinalized(spark, store)
      .collect().map(_.toString).sorted
    val want = Rollups.finalize(Rollups.mergeAll(state.unionByName(state)))
      .collect().map(_.toString).sorted
    assert(!fs.exists(staged), "read did not finish the interrupted swap")
    assert(got.sameElements(want), "read after crash lost the mid-swap directory's rows")
  }

  test("an append after a crash mid-swap recovers BEFORE landing — the fresh slice survives the next compact") {
    import graft.operators.Rollups
    import graft.sources.RollupStore
    val state = Rollups.rollupsMergeable(spark, Sf)
    val (store, _) = crashMidSwap(state)
    // Without entry-point recovery this slice lands in the half-swapped
    // partition and the NEXT compact's recover deletes it (dest dir swap)
    RollupStore.appendStateSlice(state, store)
    RollupStore.compact(spark, store)
    val got = RollupStore.readFinalized(spark, store)
      .collect().map(_.toString).sorted
    val want = Rollups.finalize(Rollups.mergeAll(
        state.unionByName(state).unionByName(state)))
      .collect().map(_.toString).sorted
    assert(got.sameElements(want),
      "slice appended after a crash was deleted by the subsequent recovery swap")
  }

  test("curate gates decontamination on the eval PREDICATE, not on row absence") {
    import spark.implicits._
    import graft.operators.{Curate, Dedup}
    // doc 5: non-eval, ABSENT from decontaminate output (a <3-token doc has
    // zero shingles) -> trainable, decontaminated = true
    // doc 97: eval holdout (97 % EvalMod == 0), absent by definition -> false
    // doc 6: present, contaminated -> false;  doc 7: present, clean -> true
    assert(Dedup.EvalMod == 97)
    val ids = Seq(5L, 97L, 6L, 7L)
    val quality = ids.toDF("doc_id").withColumn("quality_ok", lit(true))
    val repetition = ids.toDF("doc_id").withColumn("repetition_ok", lit(true))
    val perplexity = ids.toDF("doc_id").withColumn("perplexity_ok", lit(true))
    val selection = ids.toDF("doc_id").withColumn("select_ok", lit(true))
    val representative = ids.toDF("doc_id").withColumn("dedup_keep", lit(true))
    val decon = Seq((6L, false), (7L, true)).toDF("doc_id", "decontaminated")
    val got = Curate.verdictFrom(quality, repetition, perplexity, selection,
      decon, representative)
      .select("doc_id", "decontaminated", "keep")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(got(5L) == (true, true), "short non-eval doc misclassified as contaminated")
    assert(got(97L) == (false, false), "eval holdout doc must hard-fail by predicate")
    assert(got(6L) == (false, false))
    assert(got(7L) == (true, true))
  }

  test("curate on the fixture: every eval-holdout doc fails decontamination, and only eval docs fail by absence") {
    import graft.operators.{Curate, Dedup}
    val rows = Curate.curate(spark, Sf)
      .select("doc_id", "decontaminated").collect()
    val evalRows = rows.filter(_.getLong(0) % Dedup.EvalMod == 0)
    assert(evalRows.nonEmpty)
    assert(evalRows.forall(!_.getBoolean(1)))
  }

  test("storeLifecycle flush cycles are time-CONTIGUOUS terciles of the day span") {
    import graft.model.Tables
    val m = Tables.metrics(spark, Sf)
    val span = m.agg(min(expr("ts DIV 86400")), max(expr("ts DIV 86400"))).head()
    val (d0, d1) = (span.getLong(0), span.getLong(1))
    val days = d1 - d0 + 1
    assert(days >= 3, s"fixture spans $days days; need >= 3 for three cycles")
    // the tercile bounds partition [d0, d1] into three CONSECUTIVE ranges
    val bounds = (0 to 3).map(i => if (i == 3) d1 + 1 else d0 + i * days / 3)
    assert(bounds.head == d0 && bounds.last == d1 + 1)
    assert(bounds.sliding(2).forall { case Seq(a, b) => a < b })
    // and the lifecycle result still equals the single-pass write set
    val lifecycle = graft.operators.Rollups.storeLifecycle(spark, Sf)
      .collect().map(_.toString).sorted
    val single = graft.operators.Rollups.rollups(spark, Sf)
      .collect().map(_.toString).sorted
    assert(lifecycle.sameElements(single))
  }
}
