package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.UnigramLM

/** Pins the unigram-LM tokenizer (engine/UnigramLM + tx_unigram_tokenizer)
  * against two independent references: (1) the Viterbi DP against
  * brute-force enumeration of EVERY segmentation including the
  * (cost, pieces, longest-final-piece) tie-break, exhaustively over a
  * small alphabet; (2) the whole distributed EM pipeline against a
  * sequential single-threaded reimplementation at sf0.001 — piece
  * probabilities must agree row-for-row (VERDICT r9 #4's ask). */
class UnigramSpec extends AnyFunSuite with SharedSparkSpec {

  /** Brute-force reference: enumerate all segmentations, pick the minimum
    * by (total cost, piece count, reversed-boundary list) — the global
    * characterization of the DP's per-position (cost, np, i) argmin. */
  private def brute(word: String, cost: String => Option[Long],
                    maxLen: Int): Option[List[String]] = {
    val L = word.length
    def enum(from: Int): List[List[Int]] =
      if (from == L) List(Nil)
      else (from + 1 to math.min(L, from + maxLen)).toList
        .filter(j => cost(word.substring(from, j)).isDefined)
        .flatMap(j => enum(j).map(j :: _))
    val cands = enum(0).map(bs => 0 :: bs)
    if (cands.isEmpty) None
    else {
      import scala.math.Ordering.Implicits._
      val best = cands.minBy { bs =>
        val pieces = bs.zip(bs.tail).map { case (a, b) => word.substring(a, b) }
        (pieces.map(p => cost(p).get).sum, pieces.length, bs.dropRight(1).reverse)
      }
      Some(best.zip(best.tail).map { case (a, b) => word.substring(a, b) })
    }
  }

  test("Viterbi ≡ brute force (cost, np, tie-break) exhaustively over {a,b}^≤6") {
    // deterministic pseudo-random integer costs; every 5th multi-char piece
    // is EXCLUDED from the vocabulary so unreachable transitions are hit
    def mkCost(seed: Long)(p: String): Option[Long] = {
      val h = p.foldLeft(seed)((a, c) => (a * 131 + c) % 1000003)
      if (p.length > 1 && h % 5 == 0) None else Some(100 + h % 900)
    }
    val words = (1 to 6).flatMap(n =>
      (0 until (1 << n)).map(m => (0 until n).map(i => if (((m >> i) & 1) == 0) 'a' else 'b').mkString))
    for (seed <- Seq(7L, 42L, 1234L); w <- words) {
      val c = mkCost(seed) _
      assert(UnigramLM.segment(w, c, 3) == brute(w, c, 3),
        s"word=$w seed=$seed: DP and brute force disagree")
    }
  }

  test("tie-break: equal cost and piece count resolves to the longest FINAL piece") {
    // "aaa": a|aa and aa|a both cost 25 with 2 pieces; the DP's argmin on
    // the previous boundary picks the longer final piece → a|aa
    val cost = Map("a" -> 10L, "aa" -> 15L, "aaa" -> 30L)
    assert(UnigramLM.segment("aaa", cost.get, 4).contains(Seq("a", "aa")))
  }

  test("a pruned alphabet makes a word unsegmentable — None, never a partial result") {
    val cost = Map("a" -> 5L, "b" -> 5L)
    assert(UnigramLM.segment("abc", cost.get, 4).isEmpty)
    assert(UnigramLM.segment("", cost.get, 4).contains(Seq.empty))
  }

  test("distributed EM ≡ sequential reference trainer at sf0.001 (piece probabilities row-for-row)") {
    val d = "/root/testdata/sf0.001"
    val maxPiece = 4; val minFreq = 20L; val capV = 2000
    // the word histogram is the only corpus-derived input — collect it
    // once and drive the ENTIRE sequential reference from plain Scala
    val wc: Map[String, Long] = graft.engine.Tables.load(spark, d, "documents")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .filter(length(col("w")).between(1, 10))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    def substrFreqs: Map[String, Long] = {
      val m = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, c) <- wc; i <- 0 until w.length; l <- 1 to math.min(maxPiece, w.length - i))
        m(w.substring(i, i + l)) += c
      m.toMap
    }
    def capVocab(freqs: Map[String, Long], singles: Map[String, Long]): Map[String, Long] = {
      val multi = freqs.filter { case (p, f) => p.length > 1 && f >= minFreq }
        .toSeq.sortBy { case (p, f) => (-f, p) }.take(capV)
      (multi ++ singles.toSeq).toMap
    }
    def costs(vocab: Map[String, Long]): Map[String, Long] = {
      val tot = vocab.values.sum.toDouble
      vocab.map { case (p, f) => p -> math.round(-math.log(f / tot) * 1e6) }
    }
    def estep(cm: Map[String, Long]): Map[String, Long] = {
      val u = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, c) <- wc; p <- UnigramLM.segment(w, cm.get(_), maxPiece).getOrElse(Seq.empty))
        u(p) += c
      u.toMap
    }
    val pf = substrFreqs
    val singles1 = pf.filter(_._1.length == 1)
    val usage1 = estep(costs(capVocab(pf, singles1)))
    val singles2 = singles1.map { case (p, _) => p -> usage1.getOrElse(p, 1L) }
    val usage2 = estep(costs(capVocab(usage1, singles2)))
    def report(r: Long, usage: Map[String, Long]): Seq[(Long, Long, String, Long, Long)] = {
      val tot = usage.values.sum
      usage.filter(_._1.length > 1).toSeq.sortBy { case (p, n) => (-n, p) }.take(15)
        .zipWithIndex.map { case ((p, n), i) =>
          (r, i + 1L, p, n, math.floor(n * 1000000.0 / tot + 0.5).toLong)
        }
    }
    val sequential = report(1, usage1) ++ report(2, usage2)
    val face = SparkEntry.queries("tx_unigram_tokenizer")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(face == sequential,
      s"distributed EM diverged from the sequential reference:\n$face\nvs\n$sequential")
  }
}
