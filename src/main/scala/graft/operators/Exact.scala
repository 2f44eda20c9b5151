package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-exact numeric helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * same ANSI SQL, so money aggregates must be *bit-exact* across engines.
  * Doubles summed in different orders differ in the low bits; decimals
  * don't. Pattern: cast inputs to DECIMAL(18,2) (exact in both engines,
  * no representable ties at 2dp for synthetic 2dp money), aggregate
  * exactly, cast the final scalar back to DOUBLE (deterministic
  * round-to-nearest from the same exact decimal in both engines).
  */
object Exact {
  val Money: DecimalType = DecimalType(18, 2)

  /** Exact decimal sum surfaced as double: SUM(CAST(c AS DECIMAL(18,2))). */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast("double")

  /** Exact sum of a product of two money columns (scale 4 intermediate). */
  def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(Money) * b.cast(Money)).cast("double")

  /** Exact average: decimal sum / count, final IEEE double division is
    * bit-identical in both engines given identical exact operands. */
  def davg(c: Column): Column =
    (sum(c.cast(Money)).cast("double") / count(lit(1)).cast("double"))

  /** SQL fragments mirroring the above, for oracle strings. */
  def sqlSum(col: String): String = s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlSumProd(a: String, b: String): String =
    s"CAST(SUM(CAST($a AS DECIMAL(18,2)) * CAST($b AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlAvg(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
}
