package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.model.Tables

/** The path index: every dot-prefix of every seen path, with depth and a
  * leaf flag, answering glob queries constrained to the query's depth
  * (reference datastore/indexmanager.go:201-278 builds it, 303-355 queries it).
  *
  * Scale posture: paths are deduped FIRST — the prefix explode runs over
  * |unique paths|, not |points|. At 100 TB the distinct() is the only
  * shuffle and its key set (paths) is tiny relative to the stream.
  */
object Index {

  /** All prefix nodes: (node, depth, tenant, leaf) — the reference's index
    * document shape (indexmanager.go:219-224 IndexResponse). A node is a
    * leaf iff some full path equals it (indexmanager.go:225-236:
    * isLeaf=true for the full path, false for every shorter prefix; a node
    * seen both ways stays a leaf). `tenant` is the multi-tenancy dimension;
    * the reference populates it as "" on every PUT (indexmanager.go:241-245)
    * — single-tenant — and this engine mirrors that, keeping the column so
    * a multi-tenant deployment only swaps the literal for a real source.
    */
  /** The prefix-node construction over any `(path)` frame — the ONE
    * definition [[build]] and [[delete]] both apply (delete to the
    * survivors of its glob filter).
    */
  private def indexFrom(paths: DataFrame): DataFrame =
    paths
      .withColumn("p", split(col("path"), "\\."))
      .select(col("p"), explode(expr("sequence(1, size(p))")).as("depth"))
      .select(
        concat_ws(".", expr("slice(p, 1, depth)")).as("node"),
        col("depth"),
        (col("depth") === size(col("p"))).as("leaf"))
      .groupBy("node")
      .agg(max("depth").as("depth"), max("leaf").as("leaf"))
      .withColumn("tenant", lit(""))

  def build(spark: SparkSession, dir: String): DataFrame =
    indexFrom(Tables.metrics(spark, dir).select("path").distinct())

  /** [[indexFrom]]'s SQL mirror: the prefix-node CTE chain over whatever
    * `paths` CTE the caller supplies — shared by the build and delete
    * oracles like the Scala side shares `indexFrom`.
    */
  private def indexSqlFrom(pathsCte: String): String =
    s"""${Tables.metricsSql},
       |$pathsCte,
       |sp AS (SELECT path, string_split(path, '.') AS p FROM paths),
       |nodes AS (
       |  SELECT array_to_string(p[1:CAST(d AS INT)], '.') AS node,
       |         CAST(d AS INT) AS depth,
       |         d = len(p) AS leaf
       |  FROM sp, unnest(generate_series(1, len(p))) AS g(d)
       |),
       |index_nodes AS (
       |  SELECT node, max(depth) AS depth, max(leaf) AS leaf, '' AS tenant
       |  FROM nodes GROUP BY 1
       |)""".stripMargin

  private val buildCtes: String =
    indexSqlFrom("paths AS (SELECT DISTINCT path FROM metrics)")

  private val buildSql: String =
    s"WITH $buildCtes SELECT * FROM index_nodes"

  /** Glob → regex exactly as the reference converts for its search backend
    * (indexmanager.go:312-314): escape dots, `*` → `.*`, full-string match,
    * constrained to the glob's depth, sorted by path. FAITHFULLY minimal:
    * the reference replaces ONLY `.` and `*` and ships everything else to
    * Elasticsearch's regexp query verbatim, so other regex metacharacters
    * in a user glob pass through here too (`a{2}.b` matches `aa.b`, a
    * malformed class throws) — matching the daemon's behavior, quirk
    * included. A deployment wanting strict-literal globs quotes the glob
    * before calling.
    */
  def globToRegex(glob: String): String =
    "^" + glob.replace(".", "\\.").replace("*", ".*") + "$"

  val GlobQuery = "servers.*.u3"
  private val globDepth = GlobQuery.split("\\.").length

  def glob(spark: SparkSession, dir: String): DataFrame =
    build(spark, dir)
      .filter(col("depth") === globDepth && col("node").rlike(globToRegex(GlobQuery)))
      .orderBy("node")

  private val globSql: String =
    s"""WITH $buildCtes
       |SELECT * FROM index_nodes
       |WHERE depth = $globDepth AND regexp_matches(node, '${globToRegex(GlobQuery)}')
       |ORDER BY node""".stripMargin

  /** `DELETE /paths?query=glob` (reference api/api.go:124-147; the backend
    * delete is an open TODO in indexmanager.go — semantics defined here):
    * drop the glob-matched leaf paths, then rebuild the prefix set from the
    * survivors so orphaned prefixes disappear too. Returns the remaining
    * index.
    */
  val DeleteGlob = "servers.error.*"

  def delete(spark: SparkSession, dir: String): DataFrame =
    indexFrom(Tables.metrics(spark, dir)
      .select("path").distinct()
      .filter(!col("path").rlike(globToRegex(DeleteGlob))))

  private val deleteSql: String =
    s"""WITH ${indexSqlFrom(
        s"""paths AS (
           |  SELECT DISTINCT path FROM metrics
           |  WHERE NOT regexp_matches(path, '${globToRegex(DeleteGlob)}')
           |)""".stripMargin)}
       |SELECT * FROM index_nodes""".stripMargin

  def ops: Seq[Op] = Seq(
    Op("index_build", build, Some(buildSql)),
    Op("index_glob", glob, Some(globSql)),
    Op("index_delete", delete, Some(deleteSql))
  )
}
