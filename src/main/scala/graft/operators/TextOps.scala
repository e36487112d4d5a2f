package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.model.{Portable, Tables}

/** Text analysis for training-data pipelines: language ID, quality scoring,
  * token counting, document fingerprinting. Pure `functions._` column
  * algebra — every operator is whole-stage-codegen'd, no UDFs, so a 100 TB
  * corpus scan stays map-only (zero shuffles except the fingerprint top-k).
  */
object TextOps {
  import Portable._

  // ------------------------------------------------------------------ lang_id

  /** Stopword hit counting over 4 Latin-script languages; argmax with a
    * fixed priority order, `other` when nothing hits (the n-gram heuristic
    * of fasttext-style lang-id reduced to its portable core).
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "ich", "auf"),
    "es" -> Seq("el", "la", "que", "y", "en", "un", "es", "se", "no", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "est", "dans", "pour", "que"))

  private def hitsCol(words: Seq[String]): String = {
    val arr = words.map("'" + _ + "'").mkString("array(", ", ", ")")
    s"size(filter(t, x -> array_contains($arr, x)))"
  }

  private def hitsSql(words: Seq[String]): String = {
    val arr = words.map("'" + _ + "'").mkString("[", ", ", "]")
    s"len(list_filter(t, x -> list_contains($arr, x)))"
  }

  def langId(spark: SparkSession, dir: String): DataFrame = {
    val withHits = Tables.documents(spark, dir)
      .withColumn("t", split(lower(col("text")), " "))
      .withColumns(Stopwords.map { case (l, ws) => s"${l}_hits" -> expr(hitsCol(ws)) }.toMap)
    withHits.select(
      col("doc_id") +: Stopwords.map { case (l, _) => col(s"${l}_hits") } :+
        expr(
          """CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
            |     WHEN de_hits >= es_hits AND de_hits >= fr_hits AND de_hits > 0 THEN 'de'
            |     WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
            |     WHEN fr_hits > 0 THEN 'fr'
            |     ELSE 'other' END""".stripMargin).as("lang_pred"): _*)
  }

  private val langIdSql: String = {
    val hitCols = Stopwords.map { case (l, ws) => s"CAST(${hitsSql(ws)} AS INT) AS ${l}_hits" }.mkString(",\n         ")
    s"""WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
       |hits AS (
       |  SELECT doc_id,
       |         $hitCols
       |  FROM tok
       |)
       |SELECT doc_id, en_hits, de_hits, es_hits, fr_hits,
       |       CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
       |            WHEN de_hits >= es_hits AND de_hits >= fr_hits AND de_hits > 0 THEN 'de'
       |            WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
       |            WHEN fr_hits > 0 THEN 'fr'
       |            ELSE 'other' END AS lang_pred
       |FROM hits""".stripMargin
  }

  // ------------------------------------------------------------- text_quality

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean token
    * length -> weighted score + keep flag (the usual C4/Gopher-style filter
    * features, deterministic and engine-portable).
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("t", split(col("text"), " "))
      .withColumn("n_tok", size(col("t")))
      .withColumn("chars", length(col("text")))
      .withColumn("punct_ratio",
        round(length(regexp_replace(col("text"), "[A-Za-z0-9 ]", "")) / col("chars"), 6))
      .withColumn("stop_hits", expr(hitsCol(Stopwords.flatMap(_._2))))
      .withColumn("stop_ratio", round(col("stop_hits") / col("n_tok"), 6))
      .withColumn("mean_tok_len",
        round(length(regexp_replace(col("text"), " ", "")) / col("n_tok"), 6))
      .withColumn("score", round(
        least(col("n_tok") / 100.0, lit(1.0)) * 0.4 +
          (lit(1.0) - col("punct_ratio")) * 0.3 +
          least(col("stop_ratio") * 5.0, lit(1.0)) * 0.3, 6))
      .select(col("doc_id"), col("n_tok"), col("chars"), col("punct_ratio"),
        col("stop_ratio"), col("mean_tok_len"), col("score"),
        (col("score") >= 0.5).as("keep"))

  private val textQualitySql: String = {
    val allStops = hitsSql(Stopwords.flatMap(_._2))
    s"""WITH base AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
       |),
       |feat AS (
       |  SELECT doc_id,
       |         CAST(len(t) AS INT) AS n_tok,
       |         CAST(length(text) AS INT) AS chars,
       |         round(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) / length(text), 6) AS punct_ratio,
       |         round($allStops / len(t), 6) AS stop_ratio,
       |         round(length(replace(text, ' ', '')) / len(t), 6) AS mean_tok_len
       |  FROM base
       |)
       |SELECT doc_id, n_tok, chars, punct_ratio, stop_ratio, mean_tok_len,
       |       round(least(n_tok / 100.0, 1.0) * 0.4 + (1.0 - punct_ratio) * 0.3
       |             + least(stop_ratio * 5.0, 1.0) * 0.3, 6) AS score,
       |       round(least(n_tok / 100.0, 1.0) * 0.4 + (1.0 - punct_ratio) * 0.3
       |             + least(stop_ratio * 5.0, 1.0) * 0.3, 6) >= 0.5 AS keep
       |FROM feat""".stripMargin
  }

  // -------------------------------------------------------------- token_count

  /** Whitespace token count + a BPE-ish regex token count (letters runs,
    * digit runs, single punctuation — the pre-tokenizer split GPT-style
    * BPEs apply before merges).
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      expr(s"size(regexp_extract_all(text, '$BpePattern', 0))").as("bpe_tokens"),
      length(col("text")).as("n_chars_obs"))

  private val tokenCountSql: String =
    s"""SELECT doc_id,
       |       CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
       |       CAST(len(regexp_extract_all(text, '$BpePattern')) AS INT) AS bpe_tokens,
       |       CAST(length(text) AS INT) AS n_chars_obs
       |FROM documents""".stripMargin

  // ---------------------------------------------------------- doc_fingerprint

  val FingerprintK = 8

  /** Bottom-k sketch of char-5-gram hashes: the k smallest distinct 60-bit
    * hashes, dash-joined ascending — a compact containment fingerprint
    * (Broder's bottom-k minwise sketch over a rolling gram stream).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, length(text) - 4), i -> substring(text, i, 5))")).as("gram"))
      .select(col("doc_id"), hash60(col("gram")).as("h"))
      .groupBy("doc_id") // collect_set dedups in the partial agg; one shuffle,
      .agg(expr(         // no separate distinct + window sort pass
        s"concat_ws('-', transform(slice(array_sort(collect_set(h)), 1, $FingerprintK), x -> cast(x AS STRING)))")
        .as("fingerprint"))

  private val fingerprintSql: String =
    s"""WITH grams AS (
       |  SELECT DISTINCT doc_id, ${hex2bigSql("md5(substr(text, CAST(i AS INT), 5))")} AS h
       |  FROM documents, unnest(generate_series(1, length(text) - 4)) AS g(i)
       |),
       |ranked AS (
       |  SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn
       |  FROM grams
       |)
       |SELECT doc_id, string_agg(CAST(h AS VARCHAR), '-' ORDER BY h) AS fingerprint
       |FROM ranked WHERE rn <= $FingerprintK GROUP BY doc_id""".stripMargin

  def ops: Seq[Op] = Seq(
    Op("lang_id", langId, Some(langIdSql)),
    Op("text_quality", textQuality, Some(textQualitySql)),
    Op("token_count", tokenCount, Some(tokenCountSql)),
    Op("doc_fingerprint", fingerprint, Some(fingerprintSql))
  )
}
