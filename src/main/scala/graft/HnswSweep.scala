package graft

import org.apache.spark.sql.functions._

/** Probe main (not part of the API): sweep sim_hnsw_levels schedules at a
  * given sf and print each schedule's final (recall, cum_scored) beside
  * sim_hnsw_search's — the measurement that EARNS the committed schedule
  * (VERDICT r12 #4's done-bar: final recall ≥ the 2-layer face at
  * ≤ its scored-candidate budget, at every test sf).
  *
  * Usage: runMain graft.HnswSweep /root/testdata/sf0.01
  */
object HnswSweep {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.engine.Tables.localSession("hnsw-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.queries.Similarity.queries("sim_hnsw_search")(spark, d)
      .orderBy(desc("round")).select("recall", "cum_scored").head
    println(f"[sweep] 2-layer baseline: recall=${base.getDouble(0)}%.4f cum=${base.getLong(1)}")
    val schedules = Seq(
      // (l2b, l1b, l1r, l0b, l0r, l0e, ent, l0r2, l0e2)
      (5, 7, 1, 9, 1, 6, 4, 4, 8), (5, 7, 1, 9, 1, 7, 4, 4, 8),
      (5, 7, 1, 9, 1, 6, 3, 4, 8), (5, 7, 1, 9, 1, 7, 3, 4, 8),
      (5, 7, 1, 9, 1, 7, 4, 5, 8), (5, 7, 1, 9, 1, 6, 3, 5, 8))
    for ((l2b, l1b, l1r, l0b, l0r, l0e, ent, l0r2, l0e2) <- schedules) {
      val r = graft.queries.Similarity
        .hnswLevelsAt(spark, d, l2b, l1b, l1r, l0b, l0r, l0e, ent, l0r2, l0e2)
        .orderBy(desc("round")).select("recall", "cum_scored").head
      val ok = r.getDouble(0) >= base.getDouble(0) && r.getLong(1) <= base.getLong(1)
      println(f"[sweep] l2b=$l2b l1b=$l1b l1r=$l1r l0b=$l0b l0r=$l0r l0e=$l0e ent=$ent l0r2=$l0r2 l0e2=$l0e2" +
        f" -> recall=${r.getDouble(0)}%.4f cum=${r.getLong(1)}" +
        (if (ok) "  DOMINATES" else ""))
    }
    spark.stop()
  }
}
