package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{TextFunctions => T, Vectors => V}

/** Unit semantics for the text-hash and vector primitives. */
class TextVectorSpec extends AnyFunSuite with SharedSparkSpec {

  test("tx_budget_trim: shard-local prune equals the single-pass global prefix") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val kept = SparkEntry.queries("tx_budget_trim")(spark, d).collect()
    assert(kept.nonEmpty)
    // per source, cum_tokens is a positive strictly-increasing prefix ≤ 800
    for ((_, rows) <- kept.groupBy(_.getString(0))) {
      val cums = rows.map(_.getLong(4)).sorted
      assert(cums.last <= 800L)
      assert(cums.distinct.length == cums.length, "cumsum ties impossible with n_tokens >= 1")
    }
    // the two-level plan must select EXACTLY the one-level global prefix
    // (the superset argument makes stage 1 lossless; this pins it)
    val staged = graft.engine.Tables.load(spark, d, "documents")
      .withColumn("__toks", graft.engine.TextFunctions.tokens(col("text")))
      .select(col("doc_id"), col("source"),
        size(col("__toks")).cast("bigint").as("n_tokens"),
        size(array_distinct(col("__toks"))).cast("bigint").as("n_uniq"))
    val srcW = Window.partitionBy("source")
      .orderBy(col("n_uniq").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val oneLevel = staged.withColumn("cum_tokens", sum("n_tokens").over(srcW))
      .filter(col("cum_tokens") <= 800)
      .select("source", "doc_id", "n_tokens", "n_uniq", "cum_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept.map(r => (r.getString(0), r.getLong(1))).toSet == oneLevel)
  }

  test("tx_chunk_sliding: window geometry invariants at sf0.001") {
    val rows = SparkEntry.queries("tx_chunk_sliding")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0)).values
    byDoc.foreach { cs =>
      val sorted = cs.sortBy(_.getLong(1))
      // chunk ids are dense from 0
      assert(sorted.map(_.getLong(1)).toSeq == sorted.indices.map(_.toLong))
      val ns = sorted.map(_.getLong(2))
      // every chunk is a full window except possibly the last, which is
      // still longer than the stride remainder (else it would have been
      // absorbed by the previous window)
      assert(ns.init.forall(_ == 40L), s"interior chunk not full: $ns")
      // a multi-chunk doc's tail carries the stride remainder, which the
      // ceil geometry keeps in (W−S, W] — a shorter tail would have been
      // absorbed by the previous window
      if (ns.length > 1) assert(ns.last > 20L && ns.last <= 40L, s"tail: $ns")
      else assert(ns.last >= 1L && ns.last <= 40L)
    }
  }

  test("tokenizer drops empties; hashes are order-sensitive and deterministic") {
    import spark.implicits._
    val df = Seq("the quick brown fox", "quick the brown fox", "the quick brown fox")
      .toDF("text")
      .withColumn("th", T.tokenHashes(col("text")))
      .withColumn("fp", T.fingerprint(col("text")))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](rows(0).fieldIndex("th")).length == 4)
    assert(rows(0).getAs[Long]("fp") == rows(2).getAs[Long]("fp"))  // deterministic
    assert(rows(0).getAs[Long]("fp") != rows(1).getAs[Long]("fp"))  // order-sensitive

    val tok = Seq("a  b ").toDF("text").select(T.tokens(col("text"))).head.getSeq[String](0)
    assert(tok == Seq("a", "b"))
  }

  test("shingles/minhash: identical docs share signatures; short docs → null components") {
    import spark.implicits._
    val df = Seq("w1 w2 w3 w4 w5", "w1 w2 w3 w4 w5", "w9 w8 w7 w6 w5", "w1 w2")
      .toDF("text")
      .withColumn("__th", T.tokenHashes(col("text")))
      .withColumn("__sh", T.shinglesFromHashes(col("__th")))
      .select(T.minhashSigFromShingles(col("__sh")).as("sig"))
    val sigs = df.collect().map(_.getSeq[Any](0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    assert(sigs(3).forall(_ == null))  // < 3 tokens → no shingles → null sig
    assert(sigs(0).length == 16 && sigs(0).forall(_ != null))
  }

  test("simhash: near-identical docs are close in Hamming distance") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val near = base + " extra token"
    val far = (1 to 60).map(i => s"other$i").mkString(" ")
    val sh = Seq(base, near, far).toDF("text")
      .withColumn("__th", T.tokenHashes(col("text")))
      .withColumn("__votes", T.simhashVotes(col("__th")))
      .select(T.simhashFromVotes(col("__votes")).as("sh"))
      .collect().map(_.getLong(0))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0), sh(1)) <= 4, s"near doc hamming ${hamming(sh(0), sh(1))}")
    assert(hamming(sh(0), sh(2)) > 4, s"far doc hamming ${hamming(sh(0), sh(2))}")
    assert(sh.forall(v => v >= 0 && v < (1L << 24)))
  }

  test("vector ops: dot/norm/cosine against hand-computed values") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 1.0f, 2.0f))).toDF("a", "b")
      .select(V.dot(V.vd(col("a")), V.vd(col("b"))).as("dot"),
        V.norm(V.vd(col("a"))).as("na"),
        V.cosine(V.vd(col("a")), V.vd(col("b"))).as("cos"))
    val r = df.head
    assert(r.getDouble(0) == 8.0)      // 2+2+4
    assert(r.getDouble(1) == 3.0)      // sqrt(9)
    assert(math.abs(r.getDouble(2) - 8.0 / 9.0) < 1e-12)
  }

  test("lsh bucket: deterministic, in range, similar vectors collide") {
    import spark.implicits._
    val v1 = (1 to 64).map(i => math.sin(i.toDouble).toFloat)
    val v2 = v1.updated(0, v1(0) + 0.001f)  // tiny perturbation
    val df = Seq(v1, v2, v1.map(x => -x)).toDF("e")
      .select(V.lshBucket(V.vd(col("e"))).as("b")).collect().map(_.getLong(0))
    assert(df(0) == df(1), "near-identical vectors share the bucket")
    assert(df(0) >= 0 && df(0) < 256)
    assert(df(2) == 255 - df(0), "negated vector flips every hyperplane sign")
  }

  test("tx_split_assign bucket hash never wraps for any 64-bit doc_id") {
    import spark.implicits._
    // the pre-reduced form: (id mod P) * KNUTH fits in a Long for every id,
    // so Spark's wrap-around Long multiply and DuckDB's overflow-checked
    // BIGINT multiply agree — verified against BigInt arithmetic at the
    // extremes the catalog data never reaches (ADVICE r2 nit: the unreduced
    // form silently wrapped past doc_id ≈ 3.5e9)
    val P = 1000000007L
    val ids = Seq(0L, 1L, 3499999999L, 3500000001L, (1L << 62) - 1L, (1L << 62),
      Long.MaxValue)
    val got = ids.toDF("doc_id")
      .select((pmod(col("doc_id"), lit(P)) * 2654435761L % P % 100).as("b"))
      .collect().map(_.getLong(0)).toSeq
    val exp = ids.map(id => ((BigInt(id) mod P) * 2654435761L mod P mod 100).toLong)
    assert(got == exp, s"bucket hash diverged from BigInt reference: $got vs $exp")
    assert(got.forall(b => b >= 0 && b < 100))
  }

  /** Independent reference for graft.plans.CdcChunks: 1-based boundary
    * positions, explicit segment folds — a different formulation than the
    * expression's single-pass accumulator. */
  private def cdcRef(text: String): Seq[Long] = {
    val P = 1000000007L
    val cs = text.map(_.toLong)
    val n = cs.length
    if (n == 0) return Seq.empty
    val bs = (4 to n).filter { p =>
      (((cs(p - 4) * 131 + cs(p - 3)) * 131 + cs(p - 2)) * 131 + cs(p - 1)) % 64 == 0
    }
    val ends = if (bs.nonEmpty && bs.last == n) bs else bs :+ n
    (0L +: ends.map(_.toLong)).sliding(2).map { case Seq(a, b) =>
      cs.slice(a.toInt, b.toInt).foldLeft(0L)((acc, c) => (acc * 131 + c) % P)
    }.toSeq
  }

  test("cdc_chunks matches the segment-fold reference on pseudo-random corpora") {
    import spark.implicits._
    // deterministic pseudo-random ASCII strings of varied lengths (incl. the
    // <4-char and exact-boundary-at-end edges by construction of the sweep)
    val rnd = new scala.util.Random(42)
    val texts = (0 until 200).map(i => {
      val len = i * 3 % 97
      (0 until len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }) ++ Seq("", "x", "abc", "abcd")
    val got = texts.toDF("text")
      .select(graft.plans.GraftExtensions.cdcChunks(col("text")).as("ch"))
      .collect().map(_.getSeq[Long](0).toSeq)
    texts.zip(got).foreach { case (t, g) =>
      assert(g == cdcRef(t), s"chunk mismatch for ${t.take(40)}... len=${t.length}")
    }
    // sanity: every char lands in some chunk (lengths sum via re-derivation)
    assert(got.map(_.length).sum > 200, "sweep should produce many chunks")
  }

  test("cdc_chunks: content-defined realignment — a prefix edit re-syncs the suffix") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0 until 4000).map(_ => (97 + rnd.nextInt(26)).toChar).mkString
    val edited = "Z" + base // insert one char at the front
    val Seq(a, b) = Seq(base, edited).toDF("text")
      .select(graft.plans.GraftExtensions.cdcChunks(col("text")).as("ch"))
      .collect().toSeq.map(_.getSeq[Long](0).toSeq)
    // all chunks after the first boundary downstream of the edit are shared —
    // the property fixed-width blocking does NOT have
    val shared = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.length
    assert(shared >= a.length - 3,
      s"expected chunk realignment after a 1-char prefix edit: ${a.length} vs shared=$shared")
    assert(a != b, "the edited prefix chunk must differ")
  }

  test("cdc_chunks is registered SQL-side and null-propagates") {
    graft.plans.GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT cdc_chunks('hello world, a modest chunking sample') AS c, cdc_chunks(CAST(NULL AS STRING)) AS n")
      .collect()(0)
    assert(r.getSeq[Long](0).nonEmpty)
    assert(r.isNullAt(1))
  }
}
