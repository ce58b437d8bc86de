package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives for similarity search over `Array[Float]`
  * columns — dot/norm/cosine as left-fold higher-order expressions, plus a
  * deterministic random-hyperplane LSH for the approximate/scale path.
  *
  * Precision contract: elements are cast float→double (exact) and folded
  * strictly left-to-right, so Spark and the DuckDB oracle (list_reduce over
  * the same zip) produce bit-identical doubles. Group-level averages are the
  * only order-sensitive sums and get round(·, 4) on both sides.
  *
  * Scale path: brute-force cosine is O(N·d) per query — fine for one query
  * vector over 100 TB when fused into the scan, wrong for all-pairs. The LSH
  * bucket (8 deterministic hyperplanes → 256 buckets) turns all-pairs
  * near-dup search into a bucket-equi-join: shuffle keyed on (label, bucket),
  * candidates only within buckets.
  */
object Vectors {
  /** Cast float elements to double (exact). */
  def vd(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-fold dot product (order-deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — dispatches to the native fused one-pass expression
    * (graft.plans.CosineSim, codegen'd); the composed three-fold form is
    * kept below as the executable specification, property-checked equal in
    * PlansSpec. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.GraftExtensions.cosineSim(a, b)

  /** The composed form cosine dispatches to natively: three interpreted
    * higher-order folds per pair. */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Deterministic LCG pseudo-random hyperplane component r(j,i) ∈ [-0.5, 0.5):
    * ((1103515245*(j*dim+i) + 12345) mod 65536)/65536 - 0.5. */
  private def rji(j: Int, i: Column, dim: Int): Column =
    ((lit(1103515245L) * (lit(j.toLong * dim) + i) + lit(12345L)) % 65536L).cast("double") / 65536.0 - 0.5

  /** Sign bit of ⟨r_j, v⟩ for hyperplane j. */
  def lshBit(v: Column, j: Int, dim: Int = 64): Column = {
    val d = aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
      (acc, i) => acc + rji(j, i.cast("long"), dim) * element_at(v, i + 1))
    when(d > 0, 1L).otherwise(0L)
  }

  /** 8-bit LSH bucket id (0..255) from 8 hyperplane sign bits. */
  def lshBucket(v: Column, planes: Int = 8, dim: Int = 64): Column =
    (0 until planes).map(j => lshBit(v, j, dim) * (1L << j)).reduce(_ + _)
}
