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
      // the committed r13 schedule (8 rounds), then l1-fold candidates
      // (l1r=0: l2's winners seed l0 directly — 7 rounds) at varied l2
      // width / entries / l0 width (VERDICT r14 #7). MEASURED AND
      // DECLINED: every fold candidate loses 4-6 recall points vs the
      // committed schedule at all three sfs (e.g. sf0.01: 0.4375-0.4500
      // vs 0.5000; sf0.1: 0.2063-0.2250 vs 0.2656) — the stride-16 l1
      // round genuinely bridges the 1/64 entry layer to the base graph,
      // so the 8-round schedule stands.
      (5, 7, 1, 9, 5, 8, 3, 0, 0),
      (5, 7, 0, 9, 5, 8, 3, 0, 0), (6, 7, 0, 9, 5, 8, 3, 0, 0),
      (7, 7, 0, 9, 5, 8, 3, 0, 0), (5, 7, 0, 9, 5, 8, 4, 0, 0),
      (6, 7, 0, 10, 5, 8, 3, 0, 0), (6, 7, 0, 9, 5, 7, 4, 0, 0))
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
