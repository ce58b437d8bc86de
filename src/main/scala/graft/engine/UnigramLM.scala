package graft.engine

/** Unigram-LM (SentencePiece-style) tokenizer primitives (VERDICT r9 #4).
  *
  * The production tokenizer family beside BPE (engine/Bpe.scala): a
  * vocabulary of candidate pieces with log-probabilities, a Viterbi
  * segmentation per word, and EM rounds that re-estimate piece
  * probabilities from Viterbi usage counts (hard EM — the standard
  * deterministic simplification of Kudo '18's full forward–backward,
  * chosen here because every step must be replayable as integer
  * arithmetic in the DuckDB oracle).
  *
  * Scale split (the tx_unigram_tokenizer face): the corpus is touched by
  * exactly ONE hash-aggregate pass (word histogram); everything after —
  * candidate substrings, vocabulary, costs, Viterbi, usage re-estimates —
  * is VOCABULARY-sized, which is how SentencePiece trainers actually run
  * at corpus scale (they train on a word histogram, not raw text). The
  * per-word Viterbi below is the mapPartitions boundary (the BPE
  * trie-encode discipline): a pure function over a broadcast cost table.
  */
object UnigramLM {

  /** Viterbi segmentation of `word` under additive integer piece costs
    * (micro-nats): minimizes total cost, then piece count, then prefers
    * the smallest previous boundary at every suffix position (argmin on
    * i — i.e. the LONGEST final piece among ties), the exact tie-break
    * the SQL oracle's `ORDER BY cost, np, i` unrolled DP replays.
    * Returns None iff some prefix is unreachable under `cost` (a pruned
    * alphabet). Pure function — UnigramSpec checks it against brute-force
    * enumeration including the tie-break.
    */
  def segment(word: String, cost: String => Option[Long],
              maxPieceLen: Int = 4): Option[Seq[String]] = {
    val L = word.length
    val INF = Long.MaxValue
    val bc = Array.fill(L + 1)(INF)
    val bn = Array.fill(L + 1)(Int.MaxValue)
    val bp = Array.fill(L + 1)(-1)
    bc(0) = 0L
    bn(0) = 0
    var j = 1
    while (j <= L) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (bc(i) != INF) cost(word.substring(i, j)) match {
          case Some(c) =>
            val nc = bc(i) + c
            val nn = bn(i) + 1
            // strict lexicographic improvement on (cost, np, i); i ascends,
            // so an equal (cost, np) never displaces an earlier i
            if (nc < bc(j) || (nc == bc(j) && nn < bn(j))) {
              bc(j) = nc; bn(j) = nn; bp(j) = i
            }
          case None =>
        }
        i += 1
      }
      j += 1
    }
    if (bc(L) == INF) None
    else {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var p = L
      while (p > 0) {
        val i = bp(p)
        out.prepend(word.substring(i, p))
        p = i
      }
      Some(out.toList)
    }
  }
}
