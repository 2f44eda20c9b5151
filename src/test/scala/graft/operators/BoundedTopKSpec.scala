package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class BoundedTopKSpec extends AnyFunSuite {

  private def ref(xs: Seq[String], k: Int, sep: String): String =
    xs.sorted.take(k).mkString(sep)

  test("reduce/merge/finish matches sorted-slice semantics, duplicates kept") {
    val agg = new BoundedTopK(5, ",")
    val rnd = new scala.util.Random(1L)
    for (trial <- 1 to 200) {
      val n = rnd.nextInt(20)
      val xs = Seq.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(4)).mkString)
      // split arbitrarily into partitions, reduce each, merge in order
      val parts = xs.grouped(math.max(1, 1 + rnd.nextInt(4))).toSeq
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce)).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == ref(xs, 5, ","), s"trial $trial xs=$xs")
      assert(merged.length <= 5, "buffer exceeded bound")
    }
  }

  test("buffer never exceeds k under reduce") {
    val agg = new BoundedTopK(3, "|")
    val buf = (1 to 100).map(i => f"s$i%03d").foldLeft(agg.zero)(agg.reduce)
    assert(buf == Seq("s001", "s002", "s003"))
  }

  test("supplementary-plane strings order by UTF-8 bytes, like array_sort") {
    // U+1F600 (surrogate pair, UTF-16 code units d83d/de00) vs U+FFFD:
    // Java compareTo puts the emoji FIRST (d83d < fffd), UTF-8 byte
    // order puts it LAST (f0 > ef) — array_sort/list_sort use the latter
    val emoji = new String(Character.toChars(0x1F600))
    val replacement = "�"
    assert(emoji.compareTo(replacement) < 0, "precondition: UTF-16 disagrees")
    val agg = new BoundedTopK(1, ",")
    val viaReduce = agg.finish(Seq(emoji, replacement).foldLeft(agg.zero)(agg.reduce))
    assert(viaReduce == replacement)
    val viaMerge = agg.finish(agg.merge(
      agg.reduce(agg.zero, emoji), agg.reduce(agg.zero, replacement)))
    assert(viaMerge == replacement)
  }

  test("null inputs are skipped like collect_list skips them") {
    val agg = new BoundedTopK(3, ",")
    val buf = agg.reduce(agg.reduce(agg.zero, "b"), null)
    assert(agg.finish(agg.reduce(buf, "a")) == "a,b")
  }
}
