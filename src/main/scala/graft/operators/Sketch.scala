package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op

/** Measured bucket occupancy for every sketch family the engine buckets
  * on — the scale gate for the "bounded bucket" claims.
  *
  * Every near-dup/ANN candidate generator in this library confines the
  * quadratic all-pairs product to colliding buckets (minhash band
  * signatures, simhash pieces, embedding-cosine band signatures, LSH
  * table buckets, IVF inverted lists). That bound is only as good as the
  * bucket sizes, and
  * per-bucket occupancy grows ~n/2^width as the corpus grows — the
  * sketch widths must widen ~log n to keep buckets bounded. This
  * operator turns that from an asserted invariant into a WATCHED number:
  * max/mean occupancy per family, oracle-gated like any other query, and
  * benched per round. When `max_occ` drifts toward the corpus size, the
  * dial to turn is the matching width parameter
  * ([[Dedup.simhashWith]] `pieceBits`, [[Similarity.embeddingNearDupWith]]
  * `planesPerBand`, [[Similarity.PlanesPerTable]]) — Round8Spec pins that
  * widening a dial shrinks `max_occ` on the live fixture.
  *
  * Plan shape: each family is its signature projection (map-only except
  * minhash/simhash's one per-doc aggregation) plus a two-level
  * aggregation — per-bucket counts, then a 4-row stats collapse. Nothing
  * here shuffles more than the candidate generators themselves already
  * do; occupancy is strictly cheaper than the dedup op it audits, so it
  * can run as a pre-flight check before committing to a full dedup pass
  * at a new corpus scale.
  */
object Sketch {

  /** `(family, n_buckets, max_occ, mean_occ)` for one bucketed frame.
    * `mean_occ` = rows/buckets as ONE IEEE division of exact integer
    * counts, then `round(·, 6)` — the Portable convention for anything
    * float-divided.
    */
  private[graft] def occupancyOf(buckets: DataFrame, family: String,
      cols: Seq[String]): DataFrame =
    buckets.groupBy(cols.map(col): _*).agg(count(lit(1)).as("occ"))
      .agg(count(lit(1)).as("n_buckets"), max("occ").as("max_occ"),
        round(sum("occ").cast("double") / count(lit(1)), 6).as("mean_occ"))
      .select(lit(family).as("family"), col("n_buckets"),
        col("max_occ"), col("mean_occ"))

  def occupancy(spark: SparkSession, dir: String): DataFrame = {
    val mh = Dedup.minhashBandSigs(spark, dir)
    val sim = Dedup.simhashPieceFrame(
      Dedup.simhashSigs(spark, dir), Dedup.SimhashPieceBits)
    val emb = Similarity.embBandSigs(spark, dir,
      Similarity.DupBands, Similarity.DupPlanesPerBand)
    val lsh = Similarity.lshTableSigsWith(spark, dir,
      Similarity.NumTables, Similarity.PlanesPerTable)
    val ivf = Similarity.ivfAssignmentsWith(spark, dir, Similarity.CentroidMod)
    occupancyOf(mh, "minhash_band", Seq("band", "sig"))
      .unionByName(occupancyOf(sim, "simhash_piece", Seq("t", "piece")))
      .unionByName(occupancyOf(emb, "embcos_band", Seq("band", "sig")))
      .unionByName(occupancyOf(lsh, "lsh_table", Seq("t", "b")))
      // the IVF dial reads differently: hashed-bucket families want max_occ
      // BOUNDED (quadratic join work), while inverted lists want cells
      // BALANCED around n/k — a hot cell is scan-fraction skew, an empty
      // one is wasted quantizer capacity
      .unionByName(occupancyOf(ivf, "ivf_cell", Seq("c_id")))
      // PQ cells read like IVF cells, per subspace: balance around n/k.
      // A hot (sub, code) cell means that codebook entry is carrying too
      // much of the subspace — rising skew (like rising qerr) says the
      // codebook needs retraining at the new corpus scale.
      .unionByName(occupancyOf(
        Similarity.pqEncode(spark, dir), "pq_cell", Seq("sub", "code")))
      // exact-substring windows are POSITIONED (not distinct-per-doc), so
      // occupancy here is total occurrences per window hash — the quantity
      // the df cap bounds before the position join
      .unionByName(occupancyOf(
        Dedup.substrWindows(spark, dir), "substr_window", Seq("h")))
      // the CONSTANT-state sketches at their demo and PRODUCTION widths —
      // the two dials the r11 verdict flagged as demo-narrow. cms bucket
      // occupancy = catalog paths sharing a counter (each collision
      // inflates an estimate); hll register occupancy = distinct keys
      // sharing a register (the crowding the error bound is a function
      // of). Round12Spec pins the law: the _prod row's max_occ is
      // strictly below its demo twin's.
      .unionByName(occupancyOf(
        Carbon.cmsAssignments(spark, dir, Carbon.CmsBucketBits),
        "cms_bucket", Seq("j", "bucket")))
      .unionByName(occupancyOf(
        Carbon.cmsAssignments(spark, dir, Carbon.CmsBucketBitsProd),
        "cms_bucket_prod", Seq("j", "bucket")))
      .unionByName(occupancyOf(
        OpsStats.hllRegisterAssign(spark, dir, OpsStats.HllRegs),
        "hll_register", Seq("event_type", "r")))
      .unionByName(occupancyOf(
        OpsStats.hllRegisterAssign(spark, dir, OpsStats.HllRegsProd),
        "hll_register_prod", Seq("event_type", "r")))
      // the perceptual-hash band buckets (r12): the media near-dup join's
      // quadratic is confined to (kind, band, sig) collisions exactly like
      // the text banding families — same dial law, same watched number
      .unionByName(occupancyOf(
        Multimodal.phashBanded(spark, dir), "phash_band",
        Seq("media_kind", "band", "sig")))
      // the chunk-space IVF cells (r15): chunk_ann's scan-fraction dial —
      // a probe scans its nprobe routed cells, so a hot chunk cell is
      // retrieval-latency skew exactly like a hot vector cell; watched
      // here at the SHIPPED trained quantizer
      .unionByName(occupancyOf(
        TextOps.chunkAssignments(spark, dir), "chunk_cell", Seq("c_id")))
  }

  /** One WITH clause composing all four signature chains under
    * collision-free prefixes — each family's CTEs are the SAME builders
    * its dedup/ANN oracle uses, so the occupancy oracle cannot drift from
    * the candidate-generation oracles.
    */
  private val occupancySql: String = {
    def stats(family: String, from: String, by: String) =
      s"""SELECT '$family' AS family, CAST(count(*) AS BIGINT) AS n_buckets,
         |       CAST(max(occ) AS BIGINT) AS max_occ,
         |       round(CAST(sum(occ) AS DOUBLE) / count(*), 6) AS mean_occ
         |FROM (SELECT count(*) AS occ FROM $from GROUP BY $by)""".stripMargin
    s"""WITH ${Dedup.shinglesCtes},
       |${Dedup.minhashSigsCtes("mh_")},
       |${Dedup.simhashSimCtes("sh_")},
       |${Dedup.simhashPiecesCte("sh_", Dedup.SimhashPieceBits)},
       |${Similarity.fixedVecsCtes},
       |${Similarity.sigCtes("emb_",
            Similarity.dupPlanesFor(Similarity.DupBands, Similarity.DupPlanesPerBand))},
       |${Similarity.sigCtes("lsh_",
            Similarity.tablePlanesFor(Similarity.NumTables, Similarity.PlanesPerTable))},
       |${Similarity.ivfAssignCtes("ivf_", Similarity.CentroidMod)},
       |${Similarity.pqCodesCtes("pqo_")},
       |${Dedup.substrWinCtes("es_")},
       |${graft.model.Tables.metricsSql},
       |${Carbon.cmsAssignCtes("cm4_", Carbon.CmsBucketBits)},
       |${Carbon.cmsAssignCtes("cmp_", Carbon.CmsBucketBitsProd)},
       |${OpsStats.hllAssignCtes("hl6_", OpsStats.HllRegs)},
       |${OpsStats.hllAssignCtes("hlp_", OpsStats.HllRegsProd)},
       |${Multimodal.phashBandCtes("phb_")},
       |${TextOps.ckDenseCtes},
       |${TextOps.chunkKmeansIterCtes},
       |${TextOps.chunkAssignCtes}
       |${stats("minhash_band", "mh_sigs", "band, sig")}
       |UNION ALL
       |${stats("simhash_piece", "sh_pieces", "t, piece")}
       |UNION ALL
       |${stats("embcos_band", "emb_sigs", "t, b")}
       |UNION ALL
       |${stats("lsh_table", "lsh_sigs", "t, b")}
       |UNION ALL
       |${stats("ivf_cell", "ivf_assigned", "c_id")}
       |UNION ALL
       |${stats("pq_cell", "(SELECT sub, code FROM pqo_coded WHERE rn = 1)", "sub, code")}
       |UNION ALL
       |${stats("substr_window", "es_win", "h")}
       |UNION ALL
       |${stats("cms_bucket", "cm4_assign", "j, bucket")}
       |UNION ALL
       |${stats("cms_bucket_prod", "cmp_assign", "j, bucket")}
       |UNION ALL
       |${stats("hll_register", "hl6_assign", "event_type, r")}
       |UNION ALL
       |${stats("hll_register_prod", "hlp_assign", "event_type, r")}
       |UNION ALL
       |${stats("phash_band", "phb_b", "media_kind, band, sig")}
       |UNION ALL
       |${stats("chunk_cell", "ca_assigned", "c_id")}""".stripMargin
  }

  def ops: Seq[Op] = Seq(
    Op("sketch_occupancy", occupancy, Some(occupancySql)))
}
