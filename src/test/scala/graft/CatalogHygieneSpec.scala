package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-map hygiene (no Spark session needed).
  *
  * Scala `Map(...)` literals silently collapse duplicate keys (LAST wins),
  * so a face accidentally reusing an existing name SHADOWS the original in
  * both the queries and oracles maps with zero compiler noise — a live
  * query disappears from the catalog and its spec is the only thing that
  * notices (caught in the wild r13: a new miner briefly shadowed
  * `sim_hard_negatives`; verify stayed green because BOTH maps resolved to
  * the new definitions). This spec reads the SOURCE and fails on any
  * duplicated face key, plus pins the queries/oracles key sets against
  * each other so an orphan oracle (or an oracle-less face silently falling
  * to the rows-only check) is loud.
  */
class CatalogHygieneSpec extends AnyFunSuite {

  private val queryFiles = {
    val dir = new java.io.File("src/main/scala/graft/queries")
    dir.listFiles().filter(_.getName.endsWith(".scala")).toSeq.sortBy(_.getName)
  }

  private def read(f: java.io.File): String =
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")

  // a face definition: `"name" -> ((s, d)` — the query-map entry shape
  private val faceRe = """"([A-Za-z0-9_]+)"\s*->\s*\(\(s,\s*d\)""".r

  test("no face name is defined twice across the catalog sources (duplicate Map keys shadow silently)") {
    val defs = queryFiles.flatMap { f =>
      faceRe.findAllMatchIn(read(f)).map(m => m.group(1) -> f.getName)
    }
    val dups = defs.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"duplicated face definitions (later silently shadows earlier): " +
        dups.map { case (n, fs) => s"$n in ${fs.map(_._2).mkString("+")}" }.mkString("; "))
  }

  // the other half of the r13 shadowing class (ADVICE r13): duplicate keys
  // in the ORACLE map also collapse silently (last wins) and pass the
  // key-set cross-check, since sets carry no multiplicity. Count every
  // `"name" ->` arrow entry in the catalog sources per face key: a face
  // with an oracle must appear exactly twice (one query def, one oracle
  // def), an oracle-less face exactly once — any extra occurrence is a
  // shadowing definition in one of the two maps.
  private val arrowRe = """"([A-Za-z0-9_]+)"\s*->""".r

  test("no face key is arrow-defined more times than (query + oracle) — duplicate oracle keys shadow silently too") {
    val counts = queryFiles.flatMap(f => arrowRe.findAllMatchIn(read(f)).map(_.group(1)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val over = (q ++ o).toSeq.sorted.flatMap { name =>
      val expected = (if (q(name)) 1 else 0) + (if (o(name)) 1 else 0)
      val got = counts.getOrElse(name, 0)
      if (got > expected) Some(s"$name: $got arrow defs, expected $expected") else None
    }
    assert(over.isEmpty,
      s"face keys with surplus map entries (a duplicate silently shadows): ${over.mkString("; ")}")
  }

  test("every oracle key names a live query; oracle-less faces are the known rows-only set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val orphanOracles = o -- q
    assert(orphanOracles.isEmpty,
      s"oracles without a query (shadowed or renamed face?): $orphanOracles")
    // faces without an oracle fall to the driver's weaker rows-only check —
    // keep that set EMPTY so nothing quietly opts out of the hash gate
    val unchecked = q -- o
    assert(unchecked.isEmpty,
      s"queries without a DuckDB oracle (rows-only check): $unchecked")
  }
}
