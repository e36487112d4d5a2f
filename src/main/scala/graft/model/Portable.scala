package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing: wherever an operator needs a hash that Spark and
  * the DuckDB oracle must agree on bit-for-bit, it is derived from `md5()`
  * hex (identical in both engines) mapped to a bigint via the first 15 hex
  * digits (60 bits — fits a signed 64-bit integer with headroom).
  */
object Portable {
  /** md5 hex digest of a string column (Spark needs the binary cast). */
  def md5Hex(c: Column): Column = md5(c.cast("binary"))

  /** First 15 hex digits of a hex string -> non-negative bigint. */
  def hex2big(hexCol: Column): Column =
    conv(substring(hexCol, 1, 15), 16, 10).cast("long")

  /** 60-bit md5-derived hash of a string column, one shot. */
  def hash60(c: Column): Column = hex2big(md5Hex(c))

  /** DuckDB rendering of [[hex2big]] over a hex-string column/expression
    * (DuckDB has no base-conversion function; explicit digit arithmetic).
    */
  def hex2bigSql(h: String): String =
    "CAST(" + (0 until 15).map { k =>
      s"(strpos('0123456789abcdef', substr($h, ${k + 1}, 1)) - 1) * ${BigInt(16).pow(14 - k)}"
    }.mkString(" + ") + " AS BIGINT)"
}
