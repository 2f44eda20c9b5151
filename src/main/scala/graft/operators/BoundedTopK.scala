package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded first-k-in-sort-order string aggregation.
  *
  * Semantics of `array_join(slice(array_sort(collect_list(x)), 1, k),
  * sep)` — but the aggregation buffer never holds more than k strings,
  * where `collect_list` materializes EVERY group member before the
  * slice throws all but k away. A hot group (one nation holding half
  * the customer table) turns the unbounded form into an executor-memory
  * cliff; this form is O(k) per buffer, participates in map-side
  * partial aggregation (merge of two k-bounded buffers is k-bounded),
  * and keeps identical output: insertion keeps duplicates, ordering is
  * the same lexicographic sort both Spark's `array_sort` and DuckDB's
  * `list_sort` use.
  */
class BoundedTopK(k: Int, sep: String) extends Aggregator[String, Seq[String], String] {
  import BoundedTopK.utf8Cmp

  override def zero: Seq[String] = Vector.empty

  override def reduce(buf: Seq[String], x: String): Seq[String] =
    if (x == null) buf
    else if (buf.length < k) insert(buf, x)
    else if (utf8Cmp(x, buf.last) < 0) insert(buf.init, x)
    else buf

  private def insert(buf: Seq[String], x: String): Seq[String] = {
    val i = buf.indexWhere(utf8Cmp(_, x) > 0)
    if (i < 0) buf :+ x else (buf.take(i) :+ x) ++ buf.drop(i)
  }

  override def merge(a: Seq[String], b: Seq[String]): Seq[String] = {
    // merge two sorted k-bounded runs, keep the k smallest
    val out = Vector.newBuilder[String]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && utf8Cmp(a(i), b(j)) <= 0)) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[String]): String = buf.mkString(sep)
  override def bufferEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object BoundedTopK {
  /** UTF-8 byte order — what Spark's `array_sort` (UTF8String binary
    * compare) and DuckDB's `list_sort` both use. Java's `String`
    * compareTo is UTF-16 code-unit order, which disagrees for
    * supplementary-plane characters (surrogates sort below U+E000..
    * U+FFFF), so the claimed output equivalence must not rest on it.
    *
    * Allocation-free: UTF-8 byte order equals CODE POINT order, and the
    * only place UTF-16 unit order diverges from code point order is a
    * surrogate (0xD800-0xDFFF) against a high-BMP char (>= 0xE000) —
    * the standard fixup remaps both into a code-point-ordered space
    * instead of re-encoding two byte arrays per comparison in the
    * aggregation hot path (reduce() runs per input row). */
  private def utf8Cmp(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.charAt(i)
      val cb = b.charAt(i)
      if (ca != cb) {
        if (ca >= 0xD800 && cb >= 0xD800) {
          val fa = if (ca >= 0xE000) ca - 0x800 else ca + 0x2000
          val fb = if (cb >= 0xE000) cb - 0x800 else cb + 0x2000
          return fa - fb
        }
        return ca - cb
      }
      i += 1
    }
    a.length - b.length
  }

  /** Column form: first `k` values of `col` in ascending order, joined
    * by `sep`. */
  def firstK(colName: String, k: Int, sep: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new BoundedTopK(k, sep))
      .apply(org.apache.spark.sql.functions.col(colName))
}
