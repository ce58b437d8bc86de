package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Triangles

/** Planted-graph contracts for the degree-ordered triangle counter — the
  * orientation logic is the subtle part (a wrong rank comparison double- or
  * zero-counts), so pin it on graphs whose answers are known in closed
  * form before trusting the catalog face's oracle agreement. */
class TriangleSpec extends AnyFunSuite with SharedSparkSpec {

  private def edges(es: (Long, Long)*) = {
    import spark.implicits._
    es.toDF("u", "v")
  }

  private def counts(es: (Long, Long)*): (Long, Long, Long, Long) = {
    val r = Triangles.census(edges(es: _*)).collect()(0)
    (r.getLong(r.fieldIndex("n_nodes")), r.getLong(r.fieldIndex("n_edges")),
      r.getLong(r.fieldIndex("n_wedges")), r.getLong(r.fieldIndex("n_triangles")))
  }

  test("K4: C(4,3)=4 triangles, 12 wedges") {
    assert(counts((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)) ==
      ((4L, 6L, 12L, 4L)))
  }

  test("K4 minus one edge: exactly the 2 triangles that avoid the gap") {
    assert(counts((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)) ==
      ((4L, 5L, 8L, 2L)))
  }

  test("path and star: wedges but zero triangles") {
    assert(counts((1L, 2L), (2L, 3L), (3L, 4L)) == ((4L, 3L, 2L, 0L)))
    // star: the hub's C(4,2)=6 wedges, no closures — the degree-ordered
    // orientation points every edge AWAY from the leaves INTO the hub, so
    // the hub generates zero wedge candidates (the whole point at scale)
    assert(counts((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L)) == ((5L, 4L, 6L, 0L)))
  }

  test("two triangles sharing an edge (bowtie-ish): both counted once") {
    // {1,2,3} and {2,3,4} share edge (2,3)
    assert(counts((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)) ==
      ((4L, 5L, 8L, 2L)))
  }
}
