package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared helpers keeping Spark output and DuckDB oracle output
  * hash-identical (see QueryDef determinism contract).
  */
object Ql {

  /** Cross-engine-stable rounding. Spark's `round` rounds the double's
    * shortest decimal representation HALF_UP; DuckDB rounds the binary
    * value — they disagree on exact .xx5 ties (e.g. 71.74/4). Nudging by
    * +1e-9 moves ties off the boundary the same way in both engines.
    * The trailing `+ 0.0` normalizes IEEE signed zero: a tiny NEGATIVE
    * value rounding to zero emits +0.0 from Spark (BigDecimal has no
    * signed zero) but −0.0 from DuckDB (pure double round keeps the sign
    * bit); −0.0 + 0.0 = +0.0 in IEEE 754, and x + 0.0 = x for every
    * other x, so appending it in BOTH dialects makes them agree without
    * touching any nonzero result (r11 verdict: q_cohens_d hash fail).
    * Use `R(expr, n)` in the oracle SQL twin.
    */
  def r(c: Column, scale: Int = 2): Column = round(c + lit(1e-9), scale) + lit(0.0)

  /** Oracle-side twin of [[r]]: splice into DuckDB SQL. */
  def R(expr: String, scale: Int = 2): String = s"(round(($expr) + 1e-9, $scale) + 0.0)"

  /** Scalar (JVM-side) twin of [[r]] for code that computes outside a
    * Column expression — stateful-processor arithmetic, spec assertions.
    * Same +1e-9 nudge, same HALF_UP on the decimal value Spark's Round
    * uses for doubles, so a processor's rounded output is comparable to
    * a query's [[r]]-rounded column.
    */
  def rd(v: Double, scale: Int = 2): Double =
    java.math.BigDecimal.valueOf(v + 1e-9)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0

  /** Timestamp → second-granularity string; parquet timestamp logical types
    * (isAdjustedToUTC, unit) differ across engines, strings do not.
    * Oracle twin: strftime(ts, '%Y-%m-%d %H:%M:%S').
    */
  def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** First `digits` hex digits of md5(e) as a BIGINT — the cross-engine
    * deterministic int hash (14 digits = 56 bits for shuffle-narrow join
    * keys, 4 digits for sampling buckets). `e` is a Spark SQL STRING
    * expression; identical values come from [[Md5PrefixLong]] in DuckDB,
    * so even a hash collision cannot diverge the engines.
    */
  def md5PrefixLong(e: String, digits: Int): String =
    s"CAST(conv(substring(md5(CAST(($e) AS BINARY)), 1, $digits), 16, 10) AS BIGINT)"

  /** JVM-side twin of [[md5PrefixLong]](CAST(id AS STRING), 14) mapped
    * into (0,1): the first 56 md5 bits of the id's decimal string over
    * 2^56. The streaming processors (top-k, reservoir) compute their
    * priorities with this so stream and batch ranks cannot drift by an
    * ulp — ONE definition, or the replay-equivalence proofs silently
    * split.
    */
  def u56(id: Long): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .take(7).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) / 7.2057594037927936e16
  }

  /** DuckDB twin of [[md5PrefixLong]] (no conv(); hex digits via a
    * strpos shift-fold).
    */
  def Md5PrefixLong(e: String, digits: Int): String =
    s"""list_sum(list_transform(generate_series(0, ${digits - 1}), j ->
          CAST(strpos('0123456789abcdef', substr(md5($e), j + 1, 1)) - 1 AS BIGINT)
            << (4 * (${digits - 1} - j))))"""
}
