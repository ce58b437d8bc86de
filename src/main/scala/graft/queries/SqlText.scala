package graft.queries

/** DuckDB-dialect SQL builders that mirror graft.engine.TextFunctions /
  * Vectors exactly (same fold order, same modulus, same dispatch) so oracle
  * results are bit-identical to the Spark expressions. */
private[queries] object SqlText {
  val P = 1000000007L

  /** list of non-empty whitespace tokens */
  def tokens(t: String) = s"list_filter(string_split($t, ' '), w -> w != '')"

  /** polynomial char hash of lambda var `w` */
  def wordHash(w: String) =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($w, ''), c -> CAST(ascii(c) AS BIGINT))), (a, x) -> (a*131 + x) % $P)"

  def tokenHashes(t: String) = s"list_transform(${tokens(t)}, w -> ${wordHash("w")})"

  /** rolling fingerprint over a token-hash list column `th` */
  def fingerprint(th: String) =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $th), (a, h) -> (a*131 + h) % $P)"

  /** 3-gram shingle hashes over a token-hash list column `th` */
  def shingles(th: String) =
    s"(CASE WHEN len($th) < 3 THEN CAST([] AS BIGINT[]) ELSE " +
    s"list_transform(range(1, len($th) - 1), i -> ((($th)[i]*131 + ($th)[i+1])*131 + ($th)[i+2]) % $P) END)"

  /** one minhash component over a shingle-list column `sh` */
  def minhash(sh: String, j: Int): String = {
    val a = ((j + 1) * 2654435761L) % P
    val b = (j * 40503L + 17L) % P
    s"(CASE WHEN len($sh) = 0 THEN NULL ELSE list_min(list_transform($sh, s -> ($a*s + $b) % $P)) END)"
  }

  /** full 16-component signature literal over a shingle-list column `sh` */
  def minhashSig(sh: String, n: Int = 16): String =
    (0 until n).map(j => minhash(sh, j)).mkString("[", ", ", "]")

  /** 24-bit simhash over a token-hash list column `th` */
  def simhash(th: String, bits: Int = 24): String = {
    val votes = s"list_transform(range(0, $bits), j -> " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($th, h -> " +
      s"CASE WHEN CAST(floor(h / pow(2.0, j)) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END)), (a, x) -> a + x))"
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, $bits), j -> " +
    s"CASE WHEN ($votes)[j+1] > 0 THEN CAST(floor(pow(2.0, j)) AS BIGINT) ELSE 0 END)), (a, x) -> a + x)"
  }

  def stopHits(t: String, words: Seq[String]) =
    s"CAST(len(list_filter(${tokens(t)}, w -> w IN (${words.map("'" + _ + "'").mkString(", ")}))) AS BIGINT)"

  /** cast float list to double list */
  def vd(v: String) = s"list_transform($v, x -> CAST(x AS DOUBLE))"

  /** left-fold dot product of two double-list columns */
  def dot(a: String, b: String) =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip($a, $b), p -> p[1] * p[2])), (acc, x) -> acc + x)"

  def norm(a: String) = s"sqrt(${dot(a, a)})"

  def cosine(a: String, b: String) = s"(${dot(a, b)} / (${norm(a)} * ${norm(b)}))"

  /** LSH sign bit for hyperplane j over double-list column `v` (dim 64) */
  def lshBit(v: String, j: Int, dim: Int = 64): String = {
    val base = j.toLong * dim
    s"(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(0, $dim), i -> " +
    s"(CAST((1103515245 * ($base + i) + 12345) % 65536 AS DOUBLE)/65536.0 - 0.5) * ($v)[i+1])), (acc, x) -> acc + x) > 0 THEN 1 ELSE 0 END)"
  }

  def lshBucket(v: String, planes: Int = 8): String =
    (0 until planes).map(j => s"${lshBit(v, j)} * ${1L << j}").mkString("(", " + ", ")")

  /** DuckDB twins of [[graft.engine.FixedPoint]].qsum/qmean — the identical
    * quantize→BIGINT-sum→divide chain (every step exact integer math or one
    * correctly-rounded IEEE op on bit-identical inputs), so the folded
    * double is the same on both engines regardless of partial-aggregate
    * merge order. */
  def qsum(x: String, bits: Int = 30): String = {
    val p = (1L << bits).toDouble
    s"(CAST(sum(CAST(floor(($x) * $p + 0.5) AS BIGINT)) AS DOUBLE) / $p)"
  }

  def qmean(x: String, bits: Int = 30): String = {
    val p = (1L << bits).toDouble
    s"(CAST(sum(CAST(floor(($x) * $p + 0.5) AS BIGINT)) AS DOUBLE) / (count($x) * $p))"
  }

  /** Signed-zero-canonicalized round — the oracle twin of
    * [[graft.engine.FixedPoint.qround]]. DuckDB's `round()` preserves the
    * IEEE sign of zero (`round(-0.00001, 4)` → `-0.0`) while Spark's (Java
    * `BigDecimal`) returns `+0.0`; the driver hashes raw float BITS, so the
    * two zeros mismatch even though `-0.0 == 0.0`. The `+ 0.0` maps `-0.0`
    * to `+0.0` (IEEE: `-0.0 + 0.0 = +0.0`; all other values, NaN included,
    * unchanged), so both engines emit the same bits. REQUIRED on every
    * rounded oracle column whose value can be negative — pair it with
    * qround on the Spark side. */
  def qround(x: String, k: Int): String = s"(round($x, $k) + 0.0)"

  /** shared corpus-with-planted-duplicates CTE body (exact + near dups) */
  val docsWithVariants: String =
    """SELECT doc_id, text, lang, source FROM documents
      |UNION ALL SELECT doc_id + 1000000, text || ' zz duplicate', lang, source FROM documents WHERE doc_id % 25 = 0
      |UNION ALL SELECT doc_id + 2000000, text, lang, source FROM documents WHERE doc_id % 40 = 0""".stripMargin
}
