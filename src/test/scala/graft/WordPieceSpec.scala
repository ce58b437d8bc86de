package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent sequential reference for tx_wordpiece_encode: rebuild the
  * vocabulary and replay the greedy longest-match scan word-by-word in
  * plain Scala (strings and loops — no Spark, no SQL), then require the
  * distributed fold/jump-table implementation to reproduce the exact
  * top-25 piece census. The DuckDB gate proves Spark ≡ oracle SQL; this
  * proves both ≡ the textbook algorithm. */
class WordPieceSpec extends AnyFunSuite with SharedSparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("piece census matches a sequential greedy longest-match reference") {
    import scala.collection.mutable
    // corpus word dictionary with occurrence counts
    val words = mutable.Map.empty[String, Long]
    graft.engine.Tables.load(spark, d, "documents")
      .select("text").collect().foreach { r =>
        r.getString(0).split(" ").filter(_.nonEmpty).foreach { w =>
          words(w) = words.getOrElse(w, 0L) + 1L
        }
      }
    // vocabulary: all chars + top-60 2..4-char substrings (count >= 5)
    val sub = mutable.Map.empty[String, Long]
    for ((w, n) <- words; len <- 2 to 4; i <- 0 to w.length - len)
      sub(w.substring(i, i + len)) = sub.getOrElse(w.substring(i, i + len), 0L) + n
    val multi = sub.toSeq.filter(_._2 >= 5)
      .sortBy { case (p, c) => (-c, p) }.take(60).map(_._1)
    val vocab: Set[String] =
      words.keys.flatMap(_.toCharArray.map(_.toString)).toSet ++ multi
    // greedy longest-match encode of each dictionary word
    val usage = mutable.Map.empty[String, (mutable.Set[String], Long)]
    for ((w, n) <- words) {
      var i = 0
      while (i < w.length) {
        val step = (4 to 1 by -1)
          .find(L => i + L <= w.length && vocab(w.substring(i, i + L)))
          .getOrElse(1)
        val piece = w.substring(i, i + step)
        val (ws, tot) = usage.getOrElse(piece, (mutable.Set.empty[String], 0L))
        ws += w
        usage(piece) = (ws, tot + n)
        i += step
      }
    }
    val expect = usage.toSeq
      .map { case (p, (ws, tot)) => (p, p.length.toLong, ws.size.toLong, tot) }
      .sortBy { case (p, _, _, tot) => (-tot, p) }.take(25)
    val got = SparkEntry.queries("tx_wordpiece_encode")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect,
      s"distributed census diverges from the sequential reference:\n" +
        s"got    ${got.take(5)}...\nexpect ${expect.take(5)}...")
  }
}
