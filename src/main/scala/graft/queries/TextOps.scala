package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.{FixedPoint => FP, Tables, TextFunctions => T}

/** Text-analysis catalog over the `documents` table (builder-prompt
  * first-class components): token counting, quality scoring, language ID,
  * fingerprinting, n-gram stats. All single-pass projections — at 100 TB each
  * is scan + codegen'd expressions, no shuffle at all (the only shuffled ones
  * are the aggregates, which reduce to tiny outputs).
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Training-vocabulary frequency floor for the driver-side BPE trainers
    * (tx_bpe_encode_trie, tx_bpe_encode_k500): words seen fewer times never
    * reach the collected word-frequency table, bounding the driver
    * footprint at any corpus scale (VERDICT r8 #2). The DuckDB oracles
    * apply the identical HAVING floor in their training CTEs. */
  val BpeMinCount = 2

  /** Per-source clipped-match census shared by tx_bleu_eval (precision
    * view) and tx_rouge_eval (recall view) — ONE definition of the
    * candidate corruption, gram hashing, and clipping so the two eval
    * faces provably score the same matches. The gram stream is the one
    * data-sized shuffle: no source string rides it (doc_id → source is a
    * broadcast map joined back after the clip agg collapses the stream to
    * distinct (doc, n, gram) rows), and the cand/ref indicator pair packs
    * into ONE long (cand += 1, ref += 2^20 — per-doc gram counts are
    * ≪ 2^20, so the two sums never carry). */
  /** The eval pair's shared per-doc framing (ONE definition of the
    * candidate corruption and token hashing, so every ROUGE/BLEU face
    * provably scores the same sequences): per document, the reference
    * token-hash array, the corrupted candidate's (drop every 7th token,
    * reverse every 5th), their lengths, and both bigram-hash arrays.
    * Cached: consumers read it at least twice. */
  private def evalStaged(s: SparkSession, d: String): DataFrame = {
    val P = 1000000007L
    def bigramHashes(uh: Column): Column =
      when(size(uh) < 2, array().cast("array<bigint>")).otherwise(
        zip_with(slice(uh, lit(1), size(uh) - 1), slice(uh, lit(2), size(uh) - 1),
          (a, b) => (a * 131L + b) % P))
    t(s, d, "documents")
      .withColumn("__ref", T.tokens(col("text")))
      .withColumn("__cand",
        filter(
          transform(col("__ref"), (w, i) =>
            when((i + 1) % 7 === 0, lit(null).cast("string"))
              .when((i + 1) % 5 === 0, reverse(w))
              .otherwise(w)),
          w => w.isNotNull))
      .withColumn("__refh", transform(col("__ref"), w => T.wordHash(w)))
      .withColumn("__candh", transform(col("__cand"), w => T.wordHash(w)))
      .select(col("doc_id"), col("source"),
        size(col("__ref")).as("__nref"), size(col("__cand")).as("__ncand"),
        col("__refh"), col("__candh"),
        bigramHashes(col("__refh")).as("__refbg"),
        bigramHashes(col("__candh")).as("__candbg"))
      .cache()
  }

  private def evalClipCensus(s: SparkSession, d: String): DataFrame = {
    val staged = evalStaged(s, d) // read twice: gram stream + per-source lengths
    def tagged(c: String, n: Int, enc: Long) =
      transform(col(c), g => struct(lit(n).as("n"), lit(enc).as("e"), g.as("g")))
    // `source` RIDES the gram rows into the clip aggregation instead of
    // re-joining a (doc_id, source) frame afterwards: that frame is
    // corpus-row-sized, and its former broadcast hint was the r12/r13
    // ungated-hint class (an explicit hint overrides AQE's fallback at
    // 100 TB). doc_id → source is functional, so the wider group key
    // changes no group — it just makes the join disappear; the shuffle
    // row grows by one short string.
    val grams = staged.select(col("doc_id"), col("source"),
      explode(concat(
        tagged("__candh", 1, 1L), tagged("__refh", 1, 1L << 20),
        tagged("__candbg", 2, 1L), tagged("__refbg", 2, 1L << 20))).as("t"))
    val clipped = grams
      .groupBy(col("doc_id"), col("source"), col("t.n").as("n"), col("t.g").as("g"))
      .agg(sum(col("t.e")).as("e"))
      .withColumn("cc", expr("e % 1048576"))
      .withColumn("cr", expr("e div 1048576"))
      .groupBy("source", "n").agg(sum(least(col("cc"), col("cr"))).as("clip"))
    val clipW = clipped.groupBy("source").agg(
      sum(when(col("n") === 1, col("clip")).otherwise(0L)).as("clip1"),
      sum(when(col("n") === 2, col("clip")).otherwise(0L)).as("clip2"))
    staged.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nref")).as("ref_tokens"),
        sum(col("__ncand")).as("cand_tokens"),
        sum(size(col("__refbg"))).as("ref_bigrams"),
        sum(size(col("__candbg"))).as("cand_bigrams"))
      .join(clipW, "source")
  }

  val queries: Map[String, Q] = Map(
    // token counting: raw whitespace split vs non-empty tokens + char length.
    "tx_token_count" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("n_raw_tokens", size(split(col("text"), " ")).cast("bigint"))
        .withColumn("n_tokens", size(T.tokens(col("text"))).cast("bigint"))
        .withColumn("len_chars", length(col("text")).cast("bigint"))
        .select("doc_id", "n_raw_tokens", "n_tokens", "len_chars", "n_chars")
        .orderBy("doc_id")),

    // ---- sliding token-window chunking (the RAG / context-window prep
    // op): every document becomes ⌈(len−W)/S⌉+1 overlapping chunks of
    // W=40 tokens at stride S=20, identified by (doc_id, chunk_id) with an
    // md5 content signature instead of the text itself (the downstream
    // embed step wants bounded rows, not a second copy of the corpus). At
    // 100 TB this is a pure scan-side explode — no shuffle, output rows ≈
    // 2× token count / W — and the chunker never materializes a string
    // longer than one window. Chunk geometry is integer arithmetic only,
    // so both engines agree exactly; slice clamps the final short chunk
    // identically on both sides.
    "tx_chunk_sliding" -> ((s, d) => {
      val W = 40; val S = 20
      t(s, d, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("toks"))
        .withColumn("len", size(col("toks")))
        .withColumn("n_chunks",
          when(col("len") <= W, lit(1))
            .otherwise((col("len") - W + (S - 1)).divide(S).cast("int") + 1))
        .withColumn("chunk_idx", explode(sequence(lit(0), col("n_chunks") - 1)))
        .withColumn("chunk_id", col("chunk_idx").cast("bigint"))
        .withColumn("chunk",
          slice(col("toks"), (col("chunk_id") * S + 1).cast("int"), lit(W)))
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk")).cast("bigint").as("n_tokens"),
          md5(concat_ws(" ", col("chunk"))).as("chunk_sig"))
        .orderBy("doc_id", "chunk_id")
    }),

    // quality scoring: length/uniqueness/stopword-ratio heuristics.
    "tx_quality" -> ((s, d) => {
      val toks = col("__toks")
      t(s, d, "documents")
        .withColumn("__toks", T.tokens(col("text")))
        .withColumn("n_tokens", size(toks).cast("bigint"))
        .withColumn("n_uniq", size(array_distinct(toks)).cast("bigint"))
        .withColumn("sum_len", aggregate(toks, lit(0L), (a, w) => a + length(w)))
        .withColumn("avg_token_len", round(col("sum_len").cast("double") / col("n_tokens"), 4))
        .withColumn("n_stop", T.stopwordHitsFromTokens(toks, T.langStopwords.head._2))
        .withColumn("stop_ratio", round(col("n_stop").cast("double") / col("n_tokens"), 4))
        .withColumn("uniq_ratio", round(col("n_uniq").cast("double") / col("n_tokens"), 4))
        .withColumn("is_quality",
          col("n_tokens") >= 5 && col("n_tokens") <= 10000 && col("uniq_ratio") > 0.2)
        .select("doc_id", "n_tokens", "n_uniq", "avg_token_len", "stop_ratio", "uniq_ratio", "is_quality")
        .orderBy("doc_id")
    }),

    // ---- type-token ratio (corpus lexical-diversity health): per source,
    // corpus-level TTR (distinct token types / total tokens — needs a
    // distinct over the exploded token stream, the one real shuffle here,
    // partial-agg friendly on (source, token)) plus the mean per-doc TTR
    // (scan-side arithmetic folded through fixed-point qmean). A collapsing
    // TTR per source is the classic symptom of template/boilerplate
    // flooding in a crawl — this face is the monitor a curation pipeline
    // pages on. All counts are exact integers; each ratio is one IEEE
    // divide, identical on both engines.
    "tx_ttr" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"), T.tokens(col("text")).as("toks"))
      val perDoc = docs.select(col("source"),
        size(col("toks")).cast("bigint").as("n_tok"),
        size(array_distinct(col("toks"))).cast("bigint").as("n_uniq"))
      val docAgg = perDoc.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        FP.qround(FP.qmean(col("n_uniq").cast("double") / col("n_tok")), 4)
          .as("mean_doc_ttr"))
      val types = docs.select(col("source"), explode(col("toks")).as("tok"))
        .groupBy("source").agg(countDistinct(col("tok")).as("n_types"))
      docAgg.join(types, "source")
        .select(col("source"), col("n_docs"), col("n_tokens"), col("n_types"),
          round(col("n_types").cast("double") / col("n_tokens"), 6).as("corpus_ttr"),
          col("mean_doc_ttr"))
        .orderBy("source")
    }),

    // ---- boilerplate-prefix census (template detection): documents
    // sharing an identical K-token prefix are template instances — the
    // per-site boilerplate a crawl-curation pipeline strips before
    // training. The prefix rides as an md5 signature (bounded key width
    // regardless of token length); one hash-aggregate on the signature is
    // the only shuffle, and the example pointer is a deterministic min.
    // K=2 here (the synthetic docs are short word soup — real crawl
    // boilerplate detection runs K=8..16; the plan is identical).
    // Prefixes shared by ≥3 docs surface, with their source spread (a
    // prefix spanning many sources is boilerplate; one source, a reprint).
    "tx_prefix_boilerplate" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          md5(concat_ws(" ", slice(T.tokens(col("text")), 1, 2))).as("prefix_sig"))
        .groupBy("prefix_sig")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          min(col("doc_id")).as("example_doc"))
        .filter(col("n_docs") >= 3)
        .orderBy(desc("n_docs"), col("prefix_sig"))),

    // ---- PII redaction census: email/phone detection + masking with
    // before/after evidence. The synthetic corpus carries no organic PII,
    // so each doc is deterministically enriched with one contact line
    // (same concat on both engines) — the face exercises the REAL
    // redaction plumbing (extract-count, global-replace, length delta,
    // content signature) with nonzero matches instead of a vacuous
    // zero-count pass. Patterns stay in the RE2 ∩ Java-regex common
    // dialect (char classes + bounded quantifiers — no lookaround), so
    // Spark and DuckDB match identically. Scan-side codegen only; at
    // 100 TB this is the map stage of the scrub job, no shuffle.
    "tx_pii_redact" -> ((s, d) => {
      val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phonePat = "\\+1-555-[0-9]{4}"
      t(s, d, "documents")
        .withColumn("full_text",
          concat(col("text"), lit(" contact user"), col("doc_id"), lit("@"),
            col("source"), lit(".example or +1-555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
        .withColumn("n_emails",
          size(regexp_extract_all(col("full_text"), lit(emailPat), lit(0))).cast("bigint"))
        .withColumn("n_phones",
          size(regexp_extract_all(col("full_text"), lit(phonePat), lit(0))).cast("bigint"))
        .withColumn("redacted",
          regexp_replace(regexp_replace(col("full_text"), emailPat, "[EMAIL]"),
            phonePat, "[PHONE]"))
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          length(col("full_text")).cast("bigint").as("len_before"),
          length(col("redacted")).cast("bigint").as("len_after"),
          md5(col("redacted")).as("redacted_sig"))
        .orderBy("doc_id")
    }),

    // ---- URL/domain census (crawl-source filtering): extract the domain
    // from each document's (deterministically derived) canonical URL and
    // aggregate the per-domain footprint — the blocklist/allowlist join
    // input of a web-scale curation pipeline. regexp_extract with a
    // capture group in the shared RE2 ∩ Java dialect; one tiny
    // hash-aggregate on domain.
    "tx_url_census" -> ((s, d) => {
      val domPat = "https://([A-Za-z0-9.-]+)/"
      t(s, d, "documents")
        .withColumn("url",
          concat(lit("https://"), col("source"), lit(".example/doc/"),
            col("doc_id"), lit("?lang="), col("lang")))
        .withColumn("domain", regexp_extract(col("url"), domPat, 1))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("domain")
    }),

    // ---- per-source dataset card (the "datasheet" a corpus release
    // ships): volume (docs, tokens, mean length), exact-duplicate rate,
    // and language spread (count + Shannon entropy of the lang mix) in
    // one report — the first page of any data-release documentation, and
    // the per-source triage view a curation owner reads before deciding
    // mixture weights. One scan derives all per-doc features; two
    // source-keyed aggregates (core stats, lang distribution) join on the
    // group-count-sized frames. Entropy rides tx_token_entropy's proven
    // H = ln N − (Σ c·ln c)/N fixed-point construction.
    "tx_dataset_card" -> ((s, d) => {
      val base = t(s, d, "documents")
        .select(col("source"), col("lang"),
          md5(lower(trim(col("text")))).as("h"),
          size(T.tokens(col("text"))).cast("bigint").as("n_tok"))
      val core = base.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        FP.qround(FP.qmean(col("n_tok").cast("double"), 20), 4).as("mean_tokens"),
        (count(lit(1)) - countDistinct(col("h"))).as("n_exact_dups"))
      val langs = base.groupBy("source", "lang").agg(count(lit(1)).as("c"))
        .groupBy("source").agg(
          sum("c").as("n"),
          count(lit(1)).as("n_langs"),
          FP.qsum(col("c").cast("double") * log(col("c").cast("double"))).as("clnc"))
        .select(col("source"), col("n_langs"),
          round(log(col("n")) - col("clnc") / col("n"), 4).as("lang_entropy"))
      core.join(langs, "source")
        .select(col("source"), col("n_docs"), col("n_tokens"), col("mean_tokens"),
          col("n_exact_dups"),
          round(col("n_exact_dups").cast("double") / col("n_docs"), 4).as("dup_rate"),
          col("n_langs"), col("lang_entropy"))
        .orderBy("source")
    }),

    // ---- context-window fit census: per source, how much of the corpus
    // fits a training context window whole, and the chunk count the rest
    // explodes into — the capacity-planning question every pretraining
    // run starts with (token budget ≠ document count when long docs
    // chunk). Windows 32/64/128 here because the synthetic docs run
    // 25–90 tokens; a real corpus uses 2k/8k/32k with the same plan.
    // One scan + one tiny aggregate; all outputs exact integers or
    // single-divide ratios.
    "tx_ctx_fit" -> ((s, d) => {
      val W = 64
      t(s, d, "documents")
        .select(col("source"), size(T.tokens(col("text"))).cast("bigint").as("n_tok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          sum(when(col("n_tok") <= 32, 1L).otherwise(0L)).as("fit_32"),
          sum(when(col("n_tok") <= 64, 1L).otherwise(0L)).as("fit_64"),
          sum(when(col("n_tok") <= 128, 1L).otherwise(0L)).as("fit_128"),
          sum((col("n_tok") + (W - 1)).divide(W).cast("bigint")).as("n_chunks_w64"))
        .withColumn("fit_64_frac",
          round(col("fit_64").cast("double") / col("n_docs"), 4))
        .orderBy("source")
    }),

    // ---- URL canonicalization + duplicate census: the normalize step a
    // crawl dedup runs BEFORE any content hashing — lowercase the host,
    // strip tracking query params and fragments, drop a trailing slash —
    // then count how many raw variants collapse onto each canonical URL.
    // The raw variants are derived deterministically (4 per doc: mixed
    // case, ?utm_ tracking, #fragment, trailing slash) so the collapse is
    // non-vacuous and both engines see identical input. Pure scan-side
    // regexp_replace chain in the shared RE2 ∩ Java dialect; one
    // hash-aggregate on the canonical key.
    "tx_url_canonicalize" -> ((s, d) => {
      val raw = t(s, d, "documents").select(col("doc_id"), col("source"))
        .withColumn("variant", explode(array(
          concat(lit("https://"), upper(col("source")), lit(".Example/Doc/"), col("doc_id")),
          concat(lit("https://"), col("source"), lit(".example/doc/"), col("doc_id"),
            lit("?utm_source=feed&utm_campaign=x")),
          concat(lit("https://"), col("source"), lit(".example/doc/"), col("doc_id"),
            lit("#section-2")),
          concat(lit("https://"), col("source"), lit(".example/doc/"), col("doc_id"),
            lit("/")))))
      raw
        .withColumn("no_frag", regexp_replace(col("variant"), "#.*$", ""))
        .withColumn("no_track",
          regexp_replace(col("no_frag"), "\\?utm_[^#]*$", ""))
        .withColumn("no_slash", regexp_replace(col("no_track"), "/$", ""))
        .withColumn("canonical", lower(col("no_slash")))
        .groupBy("canonical")
        .agg(count(lit(1)).as("n_variants"),
          countDistinct(col("variant")).as("n_distinct_raw"))
        .agg(count(lit(1)).as("n_canonical"),
          sum(col("n_variants")).as("n_raw"),
          sum(when(col("n_variants") === 4, 1L).otherwise(0L)).as("n_fully_collapsed"),
          max(col("n_distinct_raw")).as("max_raw_per_canonical"))
    }),

    // ---- HTML boilerplate strip: tags out, entities unescaped, whitespace
    // collapsed — the first transform of any web-crawl text pipeline. The
    // markup is derived deterministically around each doc's text (wrapper
    // tags + a <script> block that must vanish ENTIRELY, not just its
    // tags), so the face proves order matters: scripts strip BEFORE
    // generic tags, entities unescape after. Evidence = cleaned length,
    // tag/entity counts, and an md5 of the cleaned text. Scan-side
    // regex chain, no shuffle before the sort.
    "tx_html_strip" -> ((s, d) => {
      val html = concat(
        lit("<html><head><script>track(\"x&y\");</script></head><body><p class=\"main\">"),
        col("text"),
        lit("</p><br/>&amp;copy &lt;2024&gt;&nbsp;end</body></html>"))
      t(s, d, "documents")
        .withColumn("html", html)
        .withColumn("n_tags",
          size(regexp_extract_all(col("html"), lit("<[^>]+>"), lit(0))).cast("bigint"))
        .withColumn("no_script",
          regexp_replace(col("html"), "<script>[^<]*</script>", ""))
        .withColumn("no_tags", regexp_replace(col("no_script"), "<[^>]+>", ""))
        .withColumn("unescaped",
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            col("no_tags"), "&amp;", "&"), "&lt;", "<"), "&gt;", ">"), "&nbsp;", " "))
        .withColumn("clean", regexp_replace(col("unescaped"), "  +", " "))
        .select(col("doc_id"), col("n_tags"),
          length(col("html")).cast("bigint").as("len_html"),
          length(col("clean")).cast("bigint").as("len_clean"),
          md5(col("clean")).as("clean_sig"))
        .orderBy("doc_id")
    }),

    // language ID: per-language stopword hits, fixed-priority argmax.
    "tx_lang_id" -> ((s, d) => {
      var df = t(s, d, "documents").withColumn("__toks", T.tokens(col("text")))
      for ((code, words) <- T.langStopwords)
        df = df.withColumn(s"${code}_hits", T.stopwordHitsFromTokens(col("__toks"), words))
      val best = greatest(T.langStopwords.map { case (c, _) => col(s"${c}_hits") }: _*)
      val pred = T.langStopwords.foldRight(lit("und"): org.apache.spark.sql.Column) {
        case ((c, _), els) => when(col(s"${c}_hits") === best && best > 0, lit(c)).otherwise(els)
      }
      df.withColumn("pred_lang", pred)
        .select("doc_id", "lang", "en_hits", "fr_hits", "de_hits", "es_hits", "pred_lang")
        .orderBy("doc_id")
    }),

    // ---- language-ID evaluation (confusion census): the check every
    // curation pipeline runs before trusting a router — tx_lang_id's
    // stopword identifier scored against the gold lang column as a
    // (gold, predicted) confusion matrix with per-gold recall shares.
    // Same predictor expression as tx_lang_id (priority ties broken in
    // langStopwords order, zero hits → 'und'); zh has no stopword list,
    // so the router can never predict it — its gold row is 100% misroute
    // (to en at this corpus) + 'und', and the census makes that blind
    // spot measurable instead of silent. Scale shape: scan-side
    // hit counting, ONE hash-agg onto ≤ |langs|² cells, then a broadcast
    // join against the |langs|-row gold totals; share4 is an exact
    // integer ratio. Never a window over the corpus.
    "tx_langid_confusion" -> ((s, d) => {
      var df = t(s, d, "documents").withColumn("__toks", T.tokens(col("text")))
      for ((code, words) <- T.langStopwords)
        df = df.withColumn(s"${code}_hits", T.stopwordHitsFromTokens(col("__toks"), words))
      val best = greatest(T.langStopwords.map { case (c, _) => col(s"${c}_hits") }: _*)
      val pred = T.langStopwords.foldRight(lit("und"): org.apache.spark.sql.Column) {
        case ((c, _), els) => when(col(s"${c}_hits") === best && best > 0, lit(c)).otherwise(els)
      }
      val cells = df.withColumn("pred_lang", pred)
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      val totals = cells.groupBy("lang").agg(sum("n").as("gold_total"))
      cells.join(broadcast(totals), "lang")
        .withColumn("share4", expr("n * 10000 div gold_total"))
        .withColumn("is_correct", col("lang") === col("pred_lang"))
        .select("lang", "pred_lang", "n", "gold_total", "share4", "is_correct")
        .orderBy("lang", "pred_lang")
    }),

    // order-sensitive rolling-hash fingerprint + duplicate-count join back.
    // The sequential fold fp = ((0·B+h₁)·B+h₂)… mod P is rewritten as the
    // order-encoded COMMUTATIVE sum Σ hᵢ·B^(n-1-i) mod P — identical value
    // (the oracle still computes the fold), but now it's a codegen'd
    // explode + hash-aggregate instead of an interpreted per-row lambda:
    // shuffle-parallel, partial-agg friendly, ~5× faster at sf0.1.
    "tx_fingerprint" -> ((s, d) => {
      val P = T.P
      // B^e mod P via two-level lookup: e = 2048·hi + lo, B^e = HI[hi]·LO[lo]
      // (mod P). Covers e < 2048² = 4 194 304 tokens/doc from two fixed
      // 2048-entry literals (the round-1 single 4096-entry table silently
      // indexed out of bounds past 4096 tokens); a doc beyond the bound gets
      // an explicit NULL fingerprint (mirrored in the oracle), never a wrong
      // or partial one.
      val tableBits = 2048
      val maxTokens = tableBits.toLong * tableBits
      val lo: Seq[Long] = {
        val buf = new Array[Long](tableBits)
        buf(0) = 1L
        for (i <- 1 until tableBits) buf(i) = buf(i - 1) * T.B % P
        buf.toSeq
      }
      val hiStep = lo(tableBits - 1) * T.B % P // B^2048 mod P
      val hi: Seq[Long] = {
        val buf = new Array[Long](tableBits)
        buf(0) = 1L
        for (i <- 1 until tableBits) buf(i) = buf(i - 1) * hiStep % P
        buf.toSeq
      }
      val staged = t(s, d, "documents")
        .select(col("doc_id"), T.tokenHashes(col("text")).as("__th")).cache()
      val summed = staged
        .select(col("doc_id"), size(col("__th")).as("n"), posexplode(col("__th")))
        // clamp the exponent for LOOKUP safety only; a clamped (over-bound)
        // doc's fp is nulled below via n, never emitted clamped-wrong
        .withColumn("e", least((col("n") - col("pos") - 1).cast("int"), lit((maxTokens - 1).toInt)))
        .withColumn("pw", element_at(typedLit(hi), (col("e") / tableBits).cast("int") + 1) *
          element_at(typedLit(lo), pmod(col("e"), lit(tableBits)).cast("int") + 1) % P)
        .withColumn("term", col("col") * col("pw") % P)
        .groupBy("doc_id")
        .agg((sum("term") % P).as("fp"), max("n").as("n"))
      // token-less docs vanish in the explode (n null after the left join);
      // the fold defines their fp as 0. Over-bound docs (n > maxTokens) get
      // an explicit NULL fingerprint.
      val fp = staged.select(col("doc_id")).join(summed, Seq("doc_id"), "left")
        .withColumn("fp",
          when(col("n").isNull, lit(0L))
            .when(col("n") > maxTokens, lit(null))
            .otherwise(col("fp")))
        .drop("n")
      val counts = fp.groupBy("fp").agg(count(lit(1)).as("n_same_fp"))
      fp.join(counts, "fp")
        .select("doc_id", "fp", "n_same_fp")
        .orderBy("doc_id")
    }),

    // n-gram statistics: bigram count / distinct bigrams / shingle count.
    "tx_ngram_stats" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("__toks", T.tokens(col("text")))
        .withColumn("__th", T.tokenHashes(col("text")))
        .withColumn("__bg", T.bigramsFromTokens(col("__toks")))
        .withColumn("n_bigrams", size(col("__bg")).cast("bigint"))
        .withColumn("n_uniq_bigrams", size(array_distinct(col("__bg"))).cast("bigint"))
        .withColumn("n_shingles", size(T.shinglesFromHashes(col("__th"))).cast("bigint"))
        .select("doc_id", "n_bigrams", "n_uniq_bigrams", "n_shingles")
        .orderBy("doc_id")),

    // ---- sparse TF-IDF cosine similarity join, term-partitioned: each doc
    // becomes a sparse bigram→tfidf vector; pair dot products accumulate
    // per shared term (shuffle key = term, never a doc×doc cross), norms
    // are per-doc aggregates, and cosine = dot/(‖a‖·‖b‖) at the end. The
    // (df ≥ 2 AND df·40 ≤ n_docs) band is the candidate bound: dropping
    // corpus-frequent terms is what keeps per-term pair fan-out from
    // saturating (this corpus has a fixed ~30-word vocab, so the cap must
    // be relative; a Zipf-vocabulary corpus at 100 TB would use an absolute
    // df cap + prefix filtering, same discipline as the LSH band join).
    // Dots and norms fold through the fixed-point qsum, so the rounded
    // cosine is engine-identical at any shuffle-merge order.
    "tx_sparse_cosine" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val tf = docs
        .withColumn("__toks", T.tokens(col("text")))
        .select(col("doc_id"), explode(T.bigramsFromTokens(col("__toks"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val total = docs.select(count(lit(1)).as("n_docs"))
      val w = tf.join(dfreq, "term").crossJoin(broadcast(total))
        .filter(col("df") >= 2 && col("df") * 40 <= col("n_docs"))
        .select(col("doc_id"), col("term"),
          (col("tf") * log(col("n_docs").cast("double") / col("df"))).as("w"))
        .cache()
      val norms = w.groupBy("doc_id").agg(sqrt(FP.qsum(col("w") * col("w"))).as("nn"))
      val dots = w.as("x").join(w.as("y"),
          col("x.term") === col("y.term") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .agg(count(lit(1)).as("n_shared"), FP.qsum(col("x.w") * col("y.w")).as("dot"))
      dots
        .join(norms.select(col("doc_id").as("a"), col("nn").as("na")), "a")
        .join(norms.select(col("doc_id").as("b"), col("nn").as("nb")), "b")
        .withColumn("cos", round(col("dot") / (col("na") * col("nb")), 4))
        .filter(col("cos") >= 0.5)
        .select("a", "b", "n_shared", "cos")
        .orderBy("a", "b")
    }),

    // edit distance between consecutive docs (bounded pair set — at scale
    // levenshtein runs only on candidate pairs from LSH, never all-pairs).
    "tx_edit_distance" -> ((s, d) => {
      val a = t(s, d, "documents").select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 5 === 0) // bounded pair set: O(n·len²) DP is candidate-only work
      val b = t(s, d, "documents").select((col("doc_id") - 1).as("b_id"), col("text").as("b_text"))
      a.join(b, col("doc_id") === col("b_id"))
        .withColumn("dist", levenshtein(col("text"), col("b_text")).cast("bigint"))
        // |len(a) − len(b)| is a free lower bound on edit distance — the
        // pre-filter that skips the DP entirely for length-mismatched pairs
        .withColumn("len_delta",
          abs(length(col("text")) - length(col("b_text"))).cast("bigint"))
        // thresholded form: banded DP, O(len·k) not O(len²) — at scale the
        // verify stage only cares "is it within k", so this is the column
        // a 100 TB pipeline would actually compute (-1 = beyond the band)
        .withColumn("dist_within8", levenshtein(col("text"), col("b_text"), 8).cast("bigint"))
        .select("doc_id", "dist", "len_delta", "dist_within8")
        .orderBy("doc_id")
    }),

    // array-op coverage (reverse/slice/sort) with scalar output rows —
    // array-valued result columns are avoided in oracle queries because list
    // stringification differs across engines.
    "arr_ops" -> ((s, d) =>
      t(s, d, "embeddings")
        .withColumn("arr", array_sort(slice(reverse(
          org.apache.spark.sql.functions.transform(col("embedding"), x => x.cast("double"))), 1, 8)))
        .select(col("vec_id"), posexplode(col("arr")))
        .select(col("vec_id"), (col("pos") + 1).cast("bigint").as("idx"), col("col").as("val"))
        .orderBy("vec_id", "idx")),

    // regex pre-tokenizer (the BPE-style pre-split): letter runs, digit
    // runs, and punctuation runs counted separately — the token estimate a
    // data pipeline uses before a real BPE merge pass. Three codegen'd
    // regexp_extract_all calls over the scan, no shuffle.
    "tx_regex_tokens" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("n_word_runs",
          size(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0))).cast("bigint"))
        .withColumn("n_digit_runs",
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).cast("bigint"))
        .withColumn("n_other_runs",
          size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9 ]+"), lit(0))).cast("bigint"))
        .withColumn("est_tokens",
          col("n_word_runs") + col("n_digit_runs") + col("n_other_runs"))
        .select("doc_id", "n_word_runs", "n_digit_runs", "n_other_runs", "est_tokens")
        .orderBy("doc_id")),

    // deterministic train/val/test split: assignment is a pure hash of the
    // doc id (NOT rand(seed) — reproducible across engines, stable under
    // repartitioning, and any doc's split can be recomputed from its id
    // alone), stratification verified by the per-(lang, split) census.
    // doc_id is pre-reduced mod P BEFORE the multiply: (P-1)·2654435761 ≈
    // 2.65e18 < Long.MaxValue, so the product can never wrap in Spark nor
    // overflow-throw in DuckDB — the hash stays engine-identical for ANY
    // 64-bit doc_id (the unreduced form silently wrapped past doc_id≈3.5e9).
    "tx_split_assign" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("bucket", pmod(col("doc_id"), lit(1000000007L)) * 2654435761L % 1000000007L % 100)
        .withColumn("split",
          when(col("bucket") < 80, "train").when(col("bucket") < 90, "val").otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .orderBy("lang", "split")),

    // TF-IDF term weighting — the canonical corpus-statistics join: term
    // frequency per (doc, term), document frequency per term, idf = ln(N/df).
    // The token-array stage is cache-barriered before the explode (the
    // documented Generate-re-evaluation trap — at 100 TB this stage is a
    // materialized columnar intermediate); tf⋈df shuffles once on term with
    // map-side partials, and the corpus size N rides in as a broadcast
    // 1-row aggregate, never a driver-side collect. Output bounded to
    // doc_id <= 100 for the catalog face; the plan is corpus-size-agnostic.
    "tx_tfidf" -> ((s, d) => {
      val staged = t(s, d, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("__toks")).cache()
      val tf = staged
        .select(col("doc_id"), explode(col("__toks")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val total = staged.select(count(lit(1)).as("n_docs"))
      tf.join(dfreq, "term")
        .crossJoin(broadcast(total))
        .withColumn("tfidf", round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
        .filter(col("doc_id") <= 100)
        .select("doc_id", "term", "tf", "df", "tfidf")
        .orderBy("doc_id", "term")
    }),

    // deterministic stratified sampling: per-language keep rates driven by
    // the same wrap-proof id-hash family as tx_split_assign (different
    // constant = independent hash) — reproducible, repartition-stable, and
    // any doc's membership is recomputable from its id alone. The census
    // output verifies the sample; at 100 TB the filter runs scan-side.
    "tx_sample_stratified" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("bucket",
          pmod(col("doc_id"), lit(1000000007L)) * 2654435769L % 1000000007L % 100)
        .filter(col("bucket") < when(col("lang") === "en", 20).otherwise(10))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"), sum("n_chars").as("chars_sampled"))
        .orderBy("lang")),

    // PII-style redaction: mask a term denylist (word-boundary regex — the
    // entity-masking shape; swap the alternation for digit/email patterns on
    // real corpora), emit the redaction census plus a content hash of the
    // redacted text (the hash makes the oracle verify the REDACTED BYTES,
    // not just the counts). Pure scan-side codegen'd regex, no shuffle
    // before the sort.
    "tx_redact" -> ((s, d) => {
      val pat = "\\b(customer|spark|vector)\\b"
      t(s, d, "documents")
        .withColumn("n_masked",
          size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("bigint"))
        .withColumn("redacted", regexp_replace(col("text"), pat, "<ENT>"))
        .filter(col("n_masked") > 0)
        .select(col("doc_id"), col("n_masked"),
          length(col("redacted")).cast("bigint").as("redacted_len"),
          md5(col("redacted").cast("binary")).as("redacted_hash"))
        .orderBy("doc_id")
    }),

    // corpus-level aggregate: per (lang, source) quality profile.
    "tx_corpus_profile" -> ((s, d) => {
      val toks = T.tokens(col("text"))
      t(s, d, "documents")
        .withColumn("n_tokens", size(toks).cast("bigint"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
             sum("n_tokens").as("total_tokens"),
             round(avg("n_tokens"), 4).as("avg_tokens"),
             max("n_chars").as("max_chars"))
        .orderBy("lang", "source")
    }),

    // vocabulary induction: corpus-level top-k tokens by total frequency
    // (ties broken lexically) with document frequency alongside — the seed
    // step for tokenizer/vocab building. explode → ONE hash-agg keyed on
    // token (partial aggregation absorbs the explode), then a top-k that
    // compiles to TakeOrderedAndProject — per-partition heaps, no global
    // sort of the vocabulary.
    "tx_vocab_topk" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("__toks")).cache()
        .select(col("doc_id"), explode(col("__toks")).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("tf"), countDistinct("doc_id").as("df"))
        .orderBy(col("tf").desc, col("tok").asc)
        .limit(25)),

    // ---- word BURSTINESS (Church & Gale '95): cf/df — how many times a
    // word repeats within the documents it appears in at all. Function
    // words spread evenly (burst ≈ cf/df ≈ corpus-uniform), topical/
    // boilerplate words clump (high burst) — the signal quality filters
    // use to separate topic terms from template residue, and adaptive LMs
    // use for caching. One explode + ONE hash-agg (tf and df partial-
    // aggregate map-side together); the df ≥ 5 floor keeps hapax noise
    // out; burst is one divide on exact BIGINTs (reproducible to the
    // digit at any merge order). Top-20 by (burst, word) total order.
    "tx_burstiness" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("__toks")).cache()
        .select(col("doc_id"), explode(col("__toks")).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("cf"), countDistinct("doc_id").as("df"))
        .filter(col("df") >= 5)
        .withColumn("burst", round(col("cf") / col("df").cast("double"), 4))
        .orderBy(col("burst").desc, col("tok").asc)
        .limit(20)),

    // first BPE merge selection: count adjacent CHARACTER pairs inside every
    // word across the corpus and rank merge candidates — iterating exactly
    // this query (merge the winner, recount) IS byte-pair-encoding tokenizer
    // training; one round is the honest catalog face (the loop is driver
    // code like KMeans.lloyd, not a different plan shape). Shape: token and
    // char-pair arrays cache-staged before their explodes (TextFunctions
    // contract), then a single (pair → count) hash-agg — partial aggregation
    // absorbs the per-word fan-out map-side, and the top-10 is TakeOrdered
    // on (count, pair), never a vocabulary-wide sort.
    "tx_bpe_first_merge" -> ((s, d) => {
      val staged = t(s, d, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("__toks")).cache()
      val charStaged = staged.select(explode(col("__toks")).as("tok"))
        .select(T.bigramsFromTokens(split(col("tok"), "")).as("__pairs")).cache()
      charStaged.select(explode(col("__pairs")).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(10)
    }),

    // ---- BPE trained for FIVE merges, oracle-checked: the iterative
    // closure of tx_bpe_first_merge (engine.Bpe.train) against a DuckDB
    // twin that unrolls five count→argmax→leftmost-rewrite rounds over the
    // word-frequency table. The rewrite fold merges the accumulator's tail
    // symbol with the current one — exactly leftmost-greedy, because a
    // token merged THIS round can never equal the left symbol again (a+b
    // is strictly longer than a). Winner selection (count desc, pair asc)
    // and the fold are both engine-order-independent, so the merge table
    // is reproducible at any partitioning.
    "tx_bpe_merges" -> ((s, d) => {
      import s.implicits._
      val words = graft.engine.Bpe.wordTable(t(s, d, "documents"))
      val (merges, _) = graft.engine.Bpe.train(s, words, k = 5)
      merges.zipWithIndex
        .map { case ((a, b, n), i) => (i + 1L, a, b, n) }
        .toDF("merge_rank", "lhs", "rhs", "n")
        .orderBy("merge_rank")
    }),

    // ---- BPE ENCODE/APPLY — tokenize the corpus with the trained merge
    // table, the highest-frequency operator of a real training pipeline
    // (every document, every run; VERDICT r6 item 3). Encoding replays the
    // merges in training order (the classic Sennrich sequential replay);
    // each merge is applied leftmost-greedy via a declarative `aggregate`
    // fold over the word's symbol array — merging when the accumulator's
    // tail equals lhs and the incoming symbol equals rhs, which is exactly
    // Bpe.applyMerge (a freshly merged token is strictly longer than lhs,
    // so it can never re-match as lhs within the same pass). Scale shape:
    // training runs on the word-frequency table (orders of magnitude
    // smaller than the corpus); the apply pass is a single scan-side
    // projection over documents — the merge table rides into the closure
    // as literals (the driver-side analogue of broadcasting the merge
    // ranks), per-word cost O(k·|word|), NO shuffle, NO join, NO UDF. At a
    // vocab-scale k (tens of thousands) the same pass becomes a
    // mapPartitions with a shared trie per executor; the catalog face
    // keeps k small and fully declarative. ANSI note: element_at/slice on
    // the empty accumulator are guarded by And/CaseWhen short-circuit.
    "tx_bpe_encode" -> ((s, d) => {
      val words = graft.engine.Bpe.wordTable(t(s, d, "documents"))
      val (merges, _) = graft.engine.Bpe.train(s, words, k = 5)
      def encode(w: Column): Column = graft.engine.Bpe.encodeCol(w, merges)
      // MEMOIZE the encode at the VOCABULARY level: the 5-level fold is the
      // expensive expression, and running it per word OCCURRENCE measured
      // 16.8 s warm at sf0.1 — once per DISTINCT word it is ~1 s, because
      // the vocabulary is Zipf-bounded while occurrences grow with the
      // corpus (exactly how production tokenizers cache word → pieces).
      // The doc is then reassembled order-exact from (pos, enc) pairs; the
      // encoded vocab is the small side (AQE broadcasts it here; at
      // trillion-token scale it stays a co-partitioned word-key join).
      val toks = t(s, d, "documents")
        .select(col("doc_id"), posexplode(T.tokens(col("text"))))
      val vocab = toks.select(col("col").as("word")).distinct()
        .withColumn("enc", encode(col("word")))
      val perDoc = toks.join(vocab, col("col") === col("word"))
        .groupBy("doc_id")
        .agg(flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("enc")))),
          p => p.getField("enc"))).as("flat"))
      // empty documents never reach posexplode — restore them with an
      // empty token stream so the row set matches the oracle's
      t(s, d, "documents").select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(size(col("flat")), lit(0)).cast("bigint").as("n_tokens"),
          coalesce(array_join(col("flat"), " "), lit("")).as("tokens"))
        .orderBy("doc_id")
    }),

    // ---- the VOCAB-SCALE BPE encode path (VERDICT r7 #3): tx_bpe_encode's
    // declarative fold replays every merge as one expression level, so its
    // depth grows with k — fine at the catalog's k=5, impossible at a real
    // tokenizer's k=32k–100k. This face is the production shape: (1) the
    // word-frequency table (vocabulary-bounded — Zipf — so it fits one node
    // at ANY corpus scale; the one justified collect) trains driver-side
    // (Bpe.trainLocal ≡ the distributed Bpe.train, spec-pinned), (2) the
    // merge-RANK map broadcasts into a mapPartitions encode whose cost is
    // O(|word| · merges-hit) per DISTINCT word — independent of k — with a
    // per-partition word→pieces memo (the executor-local trie/cache every
    // real tokenizer ships). Tokenization itself stays the codegen'd
    // expression; only the merge recursion (inexpressible declaratively at
    // large k) is typed Scala. Trained at the same k=5 here so the SAME
    // 5-round DuckDB training+replay oracle as tx_bpe_encode gates this
    // implementation end-to-end; BpeTrieSpec runs the identical code at
    // k=500 against the sequential-replay ground truth. Measured sf0.1:
    // comparable to tx_bpe_encode at k=5 (both ~1-2 s); at k=500 the fold
    // could not even be compiled, while this path is unchanged.
    "tx_bpe_encode_trie" -> ((s, d) => {
      import s.implicits._
      // min_count FLOOR on the training vocabulary, applied BEFORE the
      // collect (VERDICT r8 #2): Zipf bounds the *useful* vocabulary, but
      // a web corpus's raw distinct-token set includes unbounded noise
      // (random ids, hashes), so every real BPE trainer prunes singletons
      // before the driver-side pass — the floor is what makes "the
      // vocabulary fits one node" an enforced bound, not an assumption.
      // The oracle's words0 CTE applies the identical HAVING floor, so the
      // floored training semantics are themselves oracle-checked.
      val wordFreqs = t(s, d, "documents")
        .select(explode(T.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= BpeMinCount)
        .as[(String, Long)].collect().toSeq
      val merges = graft.engine.Bpe.trainLocal(wordFreqs, k = 5)
      val ranks = merges.zipWithIndex.map { case ((a, b, _), i) => ((a, b), i) }.toMap
      t(s, d, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("toks"))
        .as[(Long, Seq[String])]
        .mapPartitions { it =>
          // executor-local memo: encode once per distinct word per partition
          val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
          it.map { case (id, ws) =>
            val pieces = ws.iterator.flatMap(w =>
              memo.getOrElseUpdate(w, graft.engine.Bpe.encodeWord(w, ranks))).toArray
            (id, pieces.length.toLong, pieces.mkString(" "))
          }
        }
        .toDF("doc_id", "n_tokens", "tokens")
        .orderBy("doc_id")
    }),

    // ---- PRODUCTION-k BPE encode as a catalog face (VERDICT r8 #1/#2):
    // the trie path above proves the vocab-scale implementation at the
    // oracle-replayable k=5; this face RUNS it at k=500 — a 500-round
    // DuckDB training replay is impractical (the k=5 fold already strains
    // the SQL planner), so the gate is the sketch_* bound-check pattern:
    // every oracle-computable quantity is emitted exactly — doc/word/char
    // counts, the FLOORED collected-vocabulary size, and n_tokens itself,
    // which IS oracle-exact here because k=500 provably exhausts this
    // corpus's 31-word training vocabulary (BpeSpec pins exhaustion
    // <500 rounds), after which every in-vocabulary word encodes to
    // exactly ONE piece, so n_tokens must equal the word-occurrence count
    // — any trainer early-stop bug, rank-map corruption, or encode
    // under-merge breaks that equality and hash-mismatches. The remaining
    // invariants add teeth on the per-word path: piece-concatenation
    // reconstruction (a trie/memo bug that drops or duplicates a piece
    // flips reconstruct_ok) and the words ≤ tokens ≤ chars sandwich.
    // BpeSpec separately pins k=500 byte-for-byte against the
    // sequential-replay ground truth on a 2000-word vocabulary that
    // sustains all 500 rounds; this face puts the production-k run itself
    // on the driver's scoreboard. Scale shape: training is the floored
    // vocabulary collect + trainLocal (milliseconds at any k); encode is
    // one mapPartitions scan with the broadcast rank map and the
    // executor-local word→pieces memo — cost independent of k.
    "tx_bpe_encode_k500" -> ((s, d) => {
      import s.implicits._
      val wordFreqs = t(s, d, "documents")
        .select(explode(T.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= BpeMinCount)
        .as[(String, Long)].collect().toSeq
      val merges = graft.engine.Bpe.trainLocal(wordFreqs, k = 500)
      val ranks = merges.zipWithIndex.map { case ((a, b, _), i) => ((a, b), i) }.toMap
      val perDoc = t(s, d, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("toks"))
        .as[(Long, Seq[String])]
        .mapPartitions { it =>
          val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
          it.map { case (_, ws) =>
            var nW = 0L; var nC = 0L; var nT = 0L; var ok = true
            ws.foreach { w =>
              val p = memo.getOrElseUpdate(w, graft.engine.Bpe.encodeWord(w, ranks))
              nW += 1; nC += w.length; nT += p.length
              if (ok && p.mkString != w) ok = false
            }
            (nW, nC, nT, ok)
          }
        }
        .toDF("n_words", "n_chars", "n_tokens", "ok")
      perDoc.agg(
          count(lit(1)).as("n_docs"),
          sum("n_words").as("n_words"),
          sum("n_chars").as("n_word_chars"),
          sum("n_tokens").as("nt"),
          min("ok").as("all_ok"))
        .select(col("n_docs"), col("n_words"), col("n_word_chars"),
          lit(wordFreqs.length.toLong).as("n_vocab_collected"),
          col("nt").as("n_tokens"),
          col("all_ok").as("reconstruct_ok"),
          (col("nt") >= col("n_words") && col("nt") <= col("n_word_chars"))
            .as("tokens_within_bounds"),
          (col("nt") < col("n_word_chars")).as("compresses"))
    }),

    // ---- UNIGRAM-LM (SentencePiece-style) tokenizer trainer (VERDICT r9
    // #4) — the production tokenizer family beside BPE: a substring
    // vocabulary with probabilities, per-word Viterbi segmentation, and
    // hard-EM rounds re-estimating piece probabilities from Viterbi usage
    // (Kudo '18's trainer with the deterministic Viterbi E-step, so every
    // step replays as exact arithmetic in the oracle). Scale split
    // (engine/UnigramLM): the corpus is touched by exactly ONE hash-agg
    // pass (the word histogram); candidate substrings, vocabulary, costs,
    // Viterbi, and usage re-estimates are all VOCABULARY-sized — which is
    // how SentencePiece actually trains at corpus scale (on a word
    // histogram, never raw text). The multi-char piece table is capped
    // top-2000 by frequency BEFORE the collect (the BpeMinCount
    // discipline: an enforced driver bound, not an assumption); single-
    // char pieces are never pruned (alphabet retention with a +1 floor
    // for unused singles — SentencePiece's required-character rule), so
    // every word stays segmentable in every round. Viterbi runs in
    // mapPartitions over the DISTINCT-WORD frame with broadcast integer
    // micro-nat costs (round(−ln p · 1e6), the tx_perplexity_bucket lpu
    // pattern — the DP is exact BIGINT addition on both engines);
    // tie-breaks are (cost, piece count, longest-final-piece), replayed
    // exactly by the oracle's generated positional DP — 10 unrolled
    // steps + a 10-step backwalk per round. Report: per-round top-15
    // multi-char pieces with integer micro-probabilities.
    "tx_unigram_tokenizer" -> ((s, d) => {
      import s.implicits._
      val maxPiece = 4
      val minFreq = 20L
      val capV = 2000
      val wc = t(s, d, "documents")
        .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
        .filter(length(col("word")).between(1, 10))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .cache()
      val pf = wc
        .select(col("word"), col("cnt"), explode(sequence(lit(1), lit(10))).as("i"))
        .filter(col("i") <= length(col("word")))
        .select(col("word"), col("cnt"), col("i"),
          explode(sequence(lit(1), lit(maxPiece))).as("l"))
        .filter(col("i") + col("l") <= length(col("word")) + 1)
        .select(expr("substr(word, i, l)").as("piece"), col("cnt"))
        .groupBy("piece").agg(sum("cnt").as("freq"))
      // top-capV multi-char pieces by frequency — vocab-sized global
      // window, enforced BEFORE any driver collect
      def capMulti(freqs: DataFrame, fcol: String): DataFrame =
        freqs.filter(length(col("piece")) > 1 && col(fcol) >= minFreq)
          .withColumn("rk", row_number().over(
            Window.orderBy(col(fcol).desc, col("piece").asc)))
          .filter(col("rk") <= capV)
          .select(col("piece"), col(fcol).as("freq"))
      val vocab1 = capMulti(pf, "freq")
        .union(pf.filter(length(col("piece")) === 1).select("piece", "freq"))
      // micro-nat costs; collect bounded by capV + alphabet
      def costMap(vocab: DataFrame): Map[String, Long] =
        vocab.crossJoin(broadcast(vocab.agg(sum("freq").as("tot"))))
          .select(col("piece"),
            round(-log(col("freq").cast("double") / col("tot").cast("double"))
              * lit(1e6)).cast("long").as("cost"))
          .as[(String, Long)].collect().toMap
      def estep(costs: Map[String, Long]): DataFrame = {
        val bc = s.sparkContext.broadcast(costs)
        wc.select(col("word"), col("cnt")).as[(String, Long)]
          .mapPartitions { it =>
            val cm = bc.value
            it.flatMap { case (w, c) =>
              graft.engine.UnigramLM.segment(w, cm.get(_), maxPiece)
                .getOrElse(Seq.empty)
                .groupBy(identity).iterator
                .map { case (p, occ) => (p, occ.size.toLong * c) }
            }
          }
          .toDF("piece", "uses")
          .groupBy("piece").agg(sum("uses").as("n_uses"))
      }
      val usage1 = estep(costMap(vocab1)).cache()
      val vocab2 = capMulti(usage1, "n_uses")
        .union(vocab1.filter(length(col("piece")) === 1).select("piece")
          .join(usage1, Seq("piece"), "left")
          .select(col("piece"), coalesce(col("n_uses"), lit(1L)).as("freq")))
      val usage2 = estep(costMap(vocab2))
      def report(r: Int, usage: DataFrame): DataFrame =
        usage.filter(length(col("piece")) > 1)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("n_uses").desc, col("piece").asc)).cast("bigint"))
          .filter(col("rank") <= 15)
          .crossJoin(broadcast(usage.agg(sum("n_uses").as("tot"))))
          .select(lit(r.toLong).as("round"), col("rank"), col("piece"), col("n_uses"),
            floor(col("n_uses") * lit(1000000.0) / col("tot") + lit(0.5)).as("prob_micro"))
      report(1, usage1).union(report(2, usage2)).orderBy("round", "rank")
    }),

    // ---- tokenizer SIZING sweep: corpus fertility and emergent piece
    // vocabulary at merge counts k ∈ {1, 3, 5} — the curve a tokenizer
    // owner reads to pick vocab size (fertility falls, piece vocabulary
    // grows; the knee is the budget). One training run at the max k;
    // each sweep row encodes the DISTINCT-word table with a merge-table
    // PREFIX (merges are ordered, so prefix-k equals training at k) and
    // weights by occurrence count — the whole sweep is vocabulary-sized
    // work after one corpus pass for the counts. All reported ratios are
    // exact-integer divides.
    "tx_bpe_sweep" -> ((s, d) => {
      val words = graft.engine.Bpe.wordTable(t(s, d, "documents"))
      val (merges, _) = graft.engine.Bpe.train(s, words, k = 5)
      val vocab = t(s, d, "documents")
        .select(explode(T.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("occ"))
        .cache()
      Seq(1, 3, 5).map { k =>
        val enc = vocab
          .withColumn("enc", graft.engine.Bpe.encodeCol(col("w"), merges.take(k)))
          .cache()
        val st = enc.agg(
          sum(col("occ")).as("n_words"),
          sum(col("occ") * size(col("enc"))).as("n_pieces"))
        val dv = enc.select(explode(col("enc")).as("p"))
          .agg(countDistinct("p").as("n_distinct_pieces"))
        st.crossJoin(dv).select(
          lit(k.toLong).as("n_merges"), col("n_words"), col("n_pieces"),
          col("n_distinct_pieces"),
          round(col("n_pieces").cast("double") / col("n_words"), 4).as("fertility"))
      }.reduce(_.unionByName(_)).orderBy("n_merges")
    }),

    // unigram negative-log-likelihood per doc — the cheap stand-in for the
    // LM-perplexity quality filter every corpus pipeline runs (docs whose
    // tokens are corpus-typical score low; gibberish and boilerplate-with-
    // rare-junk score high). p(tok) is the corpus unigram MLE, so the score
    // is exp-free arithmetic over exact counts: avg(-ln(uc / T)) per doc.
    // Shape: one explode→hash-agg for the vocabulary, token⋈vocab shuffle
    // join on the word key, per-doc re-aggregate; corpus total broadcasts
    // as a 1-row frame. At 100 TB the vocab side is the small one — this is
    // the classic fact⋈dimension layout, never doc×doc.
    "tx_unigram_logprob" -> ((s, d) => {
      val staged = t(s, d, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("__toks")).cache()
      val toks = staged.select(col("doc_id"), explode(col("__toks")).as("tok"))
      val uni = toks.groupBy("tok").agg(count(lit(1)).as("uc"))
      val tot = uni.agg(sum("uc").cast("double").as("t_uni"))
      toks.join(uni, "tok")
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
             round(avg(-log(col("uc") / col("t_uni"))), 4).as("avg_nll"))
        .orderBy("doc_id")
    }),

    // PMI collocations: bigrams that co-occur far more than their parts
    // predict — the phrase-mining step a tokenizer-training or
    // stop-phrase-list pipeline runs over a corpus. PMI is computed from
    // EXACT integer counts via identical double arithmetic on both engines
    // (no float-sum order sensitivity), support-filtered at count >= 5 so
    // the report is stable. Shape: two explode→hash-agg passes (unigrams,
    // bigrams; arrays cache-staged per the TextFunctions contract), the
    // bigram table joins the unigram counts on each endpoint (shuffle joins
    // on the word key — vocabulary-sized, NOT corpus-sized), and the two
    // corpus totals ride in as a broadcast 1-row frame (tx_tfidf pattern).
    // Top-25 by support with a total-order tie-break, not by PMI, so the
    // cut line is integer-deterministic.
    "tx_collocations" -> ((s, d) => {
      val staged = t(s, d, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("__toks")).cache()
      val uni = staged.select(explode(col("__toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("uc"))
      val bgStaged = staged
        .select(T.bigramsFromTokens(col("__toks")).as("__bg")).cache()
      val bgAll = bgStaged.select(explode(col("__bg")).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("bc"))
      val tots = uni.agg(sum("uc").cast("double").as("t_uni"))
        .crossJoin(bgAll.agg(sum("bc").cast("double").as("t_bg")))
      bgAll.filter(col("bc") >= 5)
        .withColumn("w1", split(col("bg"), " ").getItem(0))
        .withColumn("w2", split(col("bg"), " ").getItem(1))
        .join(uni.select(col("tok").as("w1"), col("uc").as("c1")), "w1")
        .join(uni.select(col("tok").as("w2"), col("uc").as("c2")), "w2")
        .crossJoin(broadcast(tots))
        .select(col("w1"), col("w2"), col("bc").as("pair_count"),
          round(log((col("bc") / col("t_bg")) /
            ((col("c1") / col("t_uni")) * (col("c2") / col("t_uni")))), 4).as("pmi"))
        .orderBy(col("pair_count").desc, col("w1"), col("w2"))
        .limit(25)
    }),

    // repetition quality filter (Gopher-style): fraction of the doc taken
    // by its most frequent token and bigram; docs dominated by one n-gram
    // are boilerplate/spam. Shape: explode → (doc, gram) hash-agg →
    // per-doc max/sum — partial aggregation absorbs the explode map-side,
    // the shuffle key is (doc_id, gram) so no single doc can hot-spot a
    // reducer beyond its own gram cardinality. Arrays are cache-staged
    // before each explode (Generate re-evaluates non-attribute children
    // per OUTPUT row — the TextFunctions staging contract).
    "tx_repetition" -> ((s, d) => {
      val staged = t(s, d, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("__toks")).cache()
      val tokTop = staged.select(col("doc_id"), explode(col("__toks")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("top_tok"), sum("c").as("n_tokens"))
      val bgStaged = staged
        .select(col("doc_id"), T.bigramsFromTokens(col("__toks")).as("__bg")).cache()
      val bgTop = bgStaged.select(col("doc_id"), explode(col("__bg")).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("top_bg"), sum("c").as("n_bigrams"))
      tokTop.join(bgTop, Seq("doc_id"), "left")
        .withColumn("top_token_ratio", round(col("top_tok").cast("double") / col("n_tokens"), 4))
        .withColumn("top_bigram_ratio", round(col("top_bg").cast("double") / col("n_bigrams"), 4))
        .withColumn("is_repetitive",
          coalesce(col("top_bigram_ratio") > 0.18, col("top_token_ratio") > 0.3))
        .select("doc_id", "n_tokens", "top_token_ratio", "n_bigrams",
          "top_bigram_ratio", "is_repetitive")
        .orderBy("doc_id")
    }),

    // token-budget curation: per source, keep the highest-priority prefix
    // of documents whose cumulative token count fits a fixed budget — the
    // "fill each source's token quota best-first" step of data-mixture
    // construction (tx_source_mixture computes the weights; this enforces
    // one). Priority = distinct-token count (info-content proxy) with
    // doc_id tie-break, so ordering is integer-exact. Scale shape: a
    // shard-local budget pass (window per (source, doc_id%32)) prunes
    // first — a doc kept by the global prefix is always kept by its
    // shard-local prefix (its shard cumsum sums a SUBSET of the docs
    // ahead of it), so stage 1 keeps a superset while cutting the
    // per-source global window to ~32·budget tokens of input, bounded
    // regardless of corpus size. No global (unpartitioned) window at
    // either stage.
    "tx_budget_trim" -> ((s, d) => {
      val budget = 800L
      val staged = t(s, d, "documents")
        .withColumn("__toks", T.tokens(col("text")))
        .select(col("doc_id"), col("source"),
          size(col("__toks")).cast("bigint").as("n_tokens"),
          size(array_distinct(col("__toks"))).cast("bigint").as("n_uniq"))
      val shardW = Window.partitionBy(col("source"), pmod(col("doc_id"), lit(32)))
        .orderBy(col("n_uniq").desc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val srcW = Window.partitionBy("source")
        .orderBy(col("n_uniq").desc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      staged
        .withColumn("shard_cum", sum("n_tokens").over(shardW))
        .filter(col("shard_cum") <= budget)
        .withColumn("cum_tokens", sum("n_tokens").over(srcW))
        .filter(col("cum_tokens") <= budget)
        .select("source", "doc_id", "n_tokens", "n_uniq", "cum_tokens")
        .orderBy("source", "cum_tokens", "doc_id")
    }),

    // sequence packing: assign docs to contiguous ≤256-token training
    // chunks by cumulative token offset — the "pack documents into
    // fixed-budget training examples" step. Packing is per SHARD
    // (doc_id % 32), not global: each shard's window sort is independent,
    // so at 100 TB this is 32→N-way parallel with bounded partitions
    // instead of the single-reducer global cumsum a naive formulation
    // would shuffle into (the same scale trap w3_every_kth's global
    // window had). chunk_id = floor(tokens-before-me / budget): a doc
    // may straddle its chunk boundary (offset packing, as in GPT-style
    // pretraining), so chunks can slightly exceed the budget but every
    // doc lands in exactly one chunk, deterministically.
    "tx_pack_greedy" -> ((s, d) => {
      val before = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, d, "documents")
        .select(col("doc_id"), pmod(col("doc_id"), lit(32)).as("shard"),
          size(T.tokens(col("text"))).cast("bigint").as("n_tokens"))
        .withColumn("cum_before", coalesce(sum("n_tokens").over(before), lit(0L)))
        .withColumn("chunk_id", floor(col("cum_before") / 256.0).cast("bigint"))
        .groupBy("shard", "chunk_id")
        .agg(count(lit(1)).as("n_docs"),
             sum("n_tokens").as("chunk_tokens"),
             min("doc_id").as("first_doc"),
             max("doc_id").as("last_doc"))
        .orderBy("shard", "chunk_id")
    }),

    // BM25 relevance scoring (Okapi, k1=1.2 b=0.75) for a fixed query term
    // set — tx_tfidf's retrieval-grade sibling with tf saturation and
    // doc-length normalization. Shape: the query-term filter lands ON the
    // exploded token stream before any aggregation (the scan-side kill
    // switch — at 100 TB only matching (doc, term) pairs survive into the
    // shuffle); df/N/avgdl are vocabulary- and 1-row-sized frames joined
    // back broadcast-style. Top-20 selection orders by the ROUNDED score
    // with a doc_id tie-break so the cut is engine-deterministic.
    "tx_bm25" -> ((s, d) => {
      val qterms = Seq("spark", "data", "join")
      val staged = t(s, d, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("__toks")).cache()
      val dl = staged.select(col("doc_id"), size(col("__toks")).cast("double").as("dl"))
      val tf = staged.select(col("doc_id"), explode(col("__toks")).as("tok"))
        .filter(col("tok").isin(qterms: _*))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfx = tf.groupBy("tok").agg(countDistinct("doc_id").as("df"))
      val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
      tf.join(dfx, "tok").join(dl, "doc_id").crossJoin(broadcast(stats))
        .withColumn("score",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
            col("tf") * 2.2 /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .groupBy("doc_id")
        .agg(round(sum("score"), 4).as("bm25"), count(lit(1)).as("n_terms_hit"))
        .orderBy(col("bm25").desc, col("doc_id").asc)
        .limit(20)
    }),

    // temperature-weighted source mixture (T=0.7): the domain-mixing step
    // of corpus assembly — sampling weight ∝ size^0.7 flattens the source
    // distribution so giant sources don't drown the tail. One small
    // aggregate per source, the normalizer as a broadcast 1-row frame;
    // weights are rounded, so the 1-ulp libm pow divergence between
    // engines can't surface.
    "tx_source_mixture" -> ((s, d) => {
      val per = t(s, d, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      val z = per.agg(sum(pow(col("total_chars").cast("double"), 0.7)).as("z"))
      per.crossJoin(broadcast(z))
        .withColumn("weight",
          round(pow(col("total_chars").cast("double"), 0.7) / col("z"), 4))
        .select("source", "n_docs", "total_chars", "weight")
        .orderBy("source")
    }),

    // ---- mixture RESAMPLING — tx_source_mixture computes target weights;
    // this face enforces them: per-source keep probability
    // p = min(1, target_share · N_total / n_source), applied per doc with a
    // deterministic id-hash (the tx_split_assign family, different
    // multiplier so the two hashes don't correlate) — the data-mixing step
    // every training run executes after deciding its domain weights.
    // Target shares derive from the source index (∝ idx+1) so the face
    // exercises both the fractional-keep and the capped-at-1 branches.
    // Scale shape: two tiny aggs (source cardinality) broadcast back onto
    // the scan; the keep decision is scan-side integer hashing — no
    // rand(), so the sample is reproducible at any partitioning, and the
    // same doc survives on every engine (p is IEEE-exact arithmetic on
    // exact counts, bit-identical both sides).
    "tx_mixture_resample" -> ((s, d) => {
      val P = 1000000007L
      val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
        (substring(col("source"), 4, 10).cast("long") + 1L).as("tw"))
      val per = docs.groupBy("source").agg(count(lit(1)).as("n_docs"), max("tw").as("tw"))
      val tot = per.agg(sum("n_docs").as("n_total"), sum("tw").as("z"))
      // the keep cutoff is the EXACT rational floor(min(1, tw·N/(z·n))·10^4)
      // computed entirely in Long arithmetic — no float ever touches the
      // sampling decision, so the kept set is bit-free and engine-identical
      val withP = per.crossJoin(broadcast(tot))
        .withColumn("cut", least(lit(10000L),
          expr("(tw * n_total * 10000) div (z * n_docs)")))
      // quadratic-mix id hash: a LINEAR (m·A mod P) hash steps arithmetically
      // over consecutive ids, and per-source id patterns alias it badly
      // (measured: 15/25 kept at p=0.095 on one source, 0/25 at p=0.19 on
      // another); the m² term breaks the lattice — binomial-level deviation
      // per source. m is reduced mod P FIRST so m·A and (m² mod P)·B stay
      // under 2^63 for ANY doc_id (100 TB ids exceed 2^31, m² would not).
      val m = pmod(col("doc_id"), lit(P))
      val kept = docs
        .withColumn("bucket", (m * 2654435761L + (m * m % P) * 2246822519L) % P % 10000)
        .join(broadcast(withP.select(col("source"), col("cut"))), "source")
        .filter(col("bucket") < col("cut"))
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
      val keptTot = kept.agg(sum("n_kept").as("k_total"))
      // reported ratios round in INTEGER arithmetic (the RDIV lesson —
      // see tx_quality_model): p4/rs4 are exact Longs, the /1e4 division
      // is one exact IEEE op, and no float round() exists to diverge
      withP.join(kept, Seq("source"), "left")
        .crossJoin(broadcast(keptTot))
        .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
        .withColumn("p4", least(lit(10000L), expr(
          "(tw * n_total * 20000 + z * n_docs) div (z * n_docs * 2)")))
        .withColumn("rs4", expr("(n_kept * 20000 + k_total) div (k_total * 2)"))
        .select(col("source"), col("n_docs"), col("n_kept"),
          (col("p4").cast("double") / 10000.0).as("p_keep"),
          (col("rs4").cast("double") / 10000.0).as("realized_share"))
        .orderBy("source")
    }),

    // ---- DSIR-style importance weighting (Xie et al. 2023, "Data
    // Selection via Importance Resampling"): hashed-bigram features, a
    // target distribution fit on the lang='en' slice and a raw
    // distribution fit on the whole corpus (BOTH from the same single
    // feature pass — the target count is a conditional sum, not a second
    // scan), add-1-smoothed per-bucket log likelihood-ratios, and per-doc
    // importance weight = Σ c_f·lr_f. Scale shape: the feature table is
    // capped at 4096 buckets regardless of corpus size, so the lr table
    // broadcasts everywhere and the per-doc pass is one hash-agg + one
    // broadcast join; the weight sum is FixedPoint.qsum (order-free), and
    // each lr is qround(ln(ratio of two correctly-rounded divides of
    // exact integers), 6) so both engines rank identical doubles. Top-15
    // is TakeOrdered — the selection step a 100 TB pipeline would follow
    // with a threshold or gumbel-resample over the SAME weight column.
    "tx_dsir_weights" -> ((s, d) => {
      val P = 1000000007L
      val staged = t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          T.tokenHashes(col("text")).as("__th"))
        .withColumn("__bg",
          when(size(col("__th")) < 2, array().cast("array<bigint>"))
            .otherwise(zip_with(
              slice(col("__th"), lit(1), size(col("__th")) - 1),
              slice(col("__th"), lit(2), size(col("__th")) - 1),
              (a, b) => ((a * lit(131L) + b) % lit(P)) % lit(4096L))))
        .select(col("doc_id"), col("lang"), col("source"), col("__bg"))
        .cache()
      val feats = staged.select(col("doc_id"), col("lang"), col("source"),
        explode(col("__bg")).as("b"))
      val bucket = feats.groupBy("b").agg(count(lit(1)).as("cq"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
      val tot = bucket.agg(sum("cq").as("q_tot"), sum("ct").as("t_tot"))
      val lr = bucket.crossJoin(broadcast(tot)).select(col("b"),
        FP.qround(log(
          ((col("ct") + 1).cast("double") / (col("t_tot") + 4096).cast("double")) /
          ((col("cq") + 1).cast("double") / (col("q_tot") + 4096).cast("double"))), 6)
          .as("lr"))
      feats.groupBy("doc_id", "lang", "source", "b").agg(count(lit(1)).as("c"))
        .join(broadcast(lr), "b")
        .groupBy("doc_id", "lang", "source")
        .agg(sum("c").as("n_bigrams"),
          FP.qround(FP.qsum(col("c") * col("lr"), 30), 4).as("w"))
        .orderBy(col("w").desc, col("doc_id").asc)
        .limit(15)
        .select("doc_id", "lang", "source", "n_bigrams", "w")
    }),

    // ---- model-based quality filter: tx_quality's interpretable features
    // scored by a LEARNED linear model whose weights live in a broadcast
    // one-row TABLE (the "apply classifier at scale" shape — swap the
    // literal row for a real fitted-weights table and nothing else
    // changes). Weights are CENTI-SCALED INTEGERS and the whole logit is
    // assembled as one exact Long numerator over the common denominator
    // 100000·n_tokens — so the score is a SINGLE correctly-rounded IEEE
    // divide of exact integers (MarginAudit's integer-exact class; the
    // sum-of-double-products form was FLAGged sitting exactly on a round-4
    // half boundary) and the keep decision is a pure integer compare,
    // no float anywhere. No sigmoid either: exp() is a libm call whose
    // ulp differs between engines; the linear logit orders identically.
    // Scan-side codegen, one broadcast, no shuffle beyond the final sort.
    "tx_quality_model" -> ((s, d) => {
      import s.implicits._
      // (w0, w_len, w_stop, w_uniq, w_atl) in centi-units:
      // score = -1.5 + 2.0*min(nt,1000)/1000 - 3.0*stop_ratio
      //         + 2.5*uniq_ratio + 0.15*avg_token_len
      val w = Seq((-150L, 200L, -300L, 250L, 15L))
        .toDF("w0c", "w_lenc", "w_stopc", "w_uniqc", "w_atlc")
      val toks = col("__toks")
      t(s, d, "documents")
        .withColumn("__toks", T.tokens(col("text")))
        .withColumn("n_tokens", size(toks).cast("bigint"))
        .withColumn("n_uniq", size(array_distinct(toks)).cast("bigint"))
        .withColumn("sum_len", aggregate(toks, lit(0L), (a, wd) => a + length(wd)))
        .withColumn("n_stop", T.stopwordHitsFromTokens(toks, T.langStopwords.head._2))
        .crossJoin(broadcast(w))
        .withColumn("num",
          lit(1000L) * col("n_tokens") * col("w0c")
            + col("w_lenc") * least(col("n_tokens"), lit(1000L)) * col("n_tokens")
            + lit(1000L) * (col("w_stopc") * col("n_stop")
              + col("w_uniqc") * col("n_uniq") + col("w_atlc") * col("sum_len")))
        // 4-decimal score via INTEGER half-away-from-zero rounding: s4 =
        // round(num·10^4 / den) computed entirely in Long arithmetic, then
        // one exact double division by 10^4. No float round() anywhere —
        // the r7 MarginAudit RDIV lesson: Spark rounds the shortest repr,
        // DuckDB the exact binary, and a non-dyadic half-boundary quotient
        // (0.31475 here) deterministically differs. Integer rounding is
        // identical on both engines by construction.
        .withColumn("den", col("n_tokens") * lit(100000L))
        .withColumn("s4", expr(
          """CASE WHEN num >= 0 THEN (num * 20000 + den) div (den * 2)
            |     ELSE -((-num * 20000 + den) div (den * 2)) END""".stripMargin))
        .withColumn("keep", col("num") > lit(50000L) * col("n_tokens"))
        .select(col("doc_id"),
          (col("s4").cast("double") / 10000.0).as("score"), col("keep"))
        .orderBy("doc_id")
    }),

    // ---- calibration / reliability diagram over the learned quality
    // filter (tx_quality_model's exact score chain): the MLOps gate that
    // catches a filter whose scores drift from observed outcomes BEFORE
    // it reshapes a corpus mix. Ground truth = the length label
    // (n_chars >= 300); prediction = the model's 4-decimal integer score
    // s4. Docs land in fixed-width score bins via a SHIFTED floor
    // division — (s4 + 100000) div 1000 − 100 — because Spark's div
    // truncates toward zero while DuckDB's // floors, and they disagree
    // exactly on negative operands; the +100000 shift (|s4| < 100000 by
    // the weight bounds: |num| < 10·den) makes every dividend positive so
    // both engines floor identically. Per occupied bin: count, positives,
    // mean predicted score (half-away-from-zero on the s4 sum), observed
    // positive rate, and the |gap| whose n-weighted sum is the ECE
    // numerator — all Long, no float anywhere. Scale shape: one scan
    // pass + ONE hash-agg onto ≤ ~200 bins; map-side partial aggregation
    // collapses each partition to its occupied bins before the shuffle.
    "tx_calibration_bins" -> ((s, d) => {
      import s.implicits._
      val w = Seq((-150L, 200L, -300L, 250L, 15L))
        .toDF("w0c", "w_lenc", "w_stopc", "w_uniqc", "w_atlc")
      val toks = col("__toks")
      t(s, d, "documents")
        .withColumn("__toks", T.tokens(col("text")))
        .withColumn("n_tokens", size(toks).cast("bigint"))
        .withColumn("n_uniq", size(array_distinct(toks)).cast("bigint"))
        .withColumn("sum_len", aggregate(toks, lit(0L), (a, wd) => a + length(wd)))
        .withColumn("n_stop", T.stopwordHitsFromTokens(toks, T.langStopwords.head._2))
        .crossJoin(broadcast(w))
        .withColumn("num",
          lit(1000L) * col("n_tokens") * col("w0c")
            + col("w_lenc") * least(col("n_tokens"), lit(1000L)) * col("n_tokens")
            + lit(1000L) * (col("w_stopc") * col("n_stop")
              + col("w_uniqc") * col("n_uniq") + col("w_atlc") * col("sum_len")))
        .withColumn("den", col("n_tokens") * lit(100000L))
        .withColumn("s4", expr(
          """CASE WHEN num >= 0 THEN (num * 20000 + den) div (den * 2)
            |     ELSE -((-num * 20000 + den) div (den * 2)) END""".stripMargin))
        .withColumn("bin", expr("(s4 + 100000) div 1000 - 100"))
        .withColumn("pos", (col("n_chars") >= 300).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum("pos").as("n_pos"),
             sum("s4").as("sum_s4"))
        .withColumn("pred4", expr(
          """CASE WHEN sum_s4 >= 0 THEN (sum_s4 * 2 + n_docs) div (n_docs * 2)
            |     ELSE -((-sum_s4 * 2 + n_docs) div (n_docs * 2)) END""".stripMargin))
        .withColumn("obs4", expr("(n_pos * 20000 + n_docs) div (n_docs * 2)"))
        .withColumn("gap4", abs(col("pred4") - col("obs4")))
        .select("bin", "n_docs", "n_pos", "pred4", "obs4", "gap4")
        .orderBy("bin")
    }),

    // ---- preference-pair mining (DPO/RLHF data prep): per prompt group
    // (source here), pair the highest- and lowest-reward responses with
    // the margin between them. The reward proxy is TTR in basis points —
    // an exact integer (nu·10⁴ div nt), so chosen/rejected/margin are all
    // integer-deterministic; swap the ttr4 column for a real reward-model
    // score table and nothing else changes. Scale shape: per-group
    // extremes via min/max over (score, id) STRUCTS — partial aggregation
    // collapses each group map-side before the one |groups|-sized shuffle,
    // strictly cheaper than the row_number window the oracle uses (the
    // window re-sorts every row inside the shuffle; struct-agg ships two
    // structs per group per partition). Ties break to the smallest doc_id
    // on both extremes (max carries -doc_id, min carries +doc_id).
    "tx_preference_pairs" -> ((s, d) => {
      val staged = t(s, d, "documents")
        .select(col("doc_id"), col("source"), T.tokens(col("text")).as("__toks")).cache()
      val scored = staged.select(col("doc_id"), col("source"),
          size(col("__toks")).cast("bigint").as("nt"),
          size(array_distinct(col("__toks"))).cast("bigint").as("nu"))
        .filter(col("nt") >= 1)
        .withColumn("ttr4", expr("nu * 10000 div nt"))
      scored.groupBy("source")
        .agg(
          max(struct(col("ttr4").as("t"), (-col("doc_id")).as("negid"))).as("best"),
          min(struct(col("ttr4").as("t"), col("doc_id").as("id"))).as("worst"),
          count(lit(1)).as("n_docs"))
        .select(col("source"),
          (-col("best.negid")).as("chosen_doc"), col("best.t").as("chosen_ttr4"),
          col("worst.id").as("rejected_doc"), col("worst.t").as("rejected_ttr4"),
          (col("best.t") - col("worst.t")).as("margin4"), col("n_docs"))
        .orderBy("source")
    }),

    // ---- inter-annotator agreement (Cohen's kappa): the preference-data
    // QA gate that decides whether two labeling passes agree beyond
    // chance. Two deterministic "annotators" label every document
    // keep/drop — A by raw length (n_chars >= 200), B by lexical
    // diversity (exact-integer TTR >= 0.5000) — and the per-language
    // kappa = (po − pe)/(1 − pe) separates real agreement from marginal
    // coincidence. Everything stays in Long arithmetic: with a/b/c/d the
    // confusion cells, po·n = agree and pe·n² = A⁺B⁺ + A⁻B⁻ are carried
    // as exact integer numerators, and po4/pe4/kappa4 come out of the
    // half-away-from-zero integer rounding pattern (tx_quality) — no
    // float anywhere, so the oracle matches bit-for-bit and kappa < 0
    // (systematic disagreement) rounds symmetrically. Scale shape:
    // scan-side label projections, then ONE hash-agg keyed by lang —
    // map-side partial collapse, |langs| rows out. The n² term caps
    // per-group counts at ~3·10⁹ docs/lang before Long overflow; past
    // that the pe pair upgrades to DECIMAL(38,0) on both engines and
    // nothing else changes. A degenerate group (both annotators constant
    // → pe = 1) yields NULL kappa via the NULLIF'd denominator.
    "tx_annotator_kappa" -> ((s, d) => {
      val labeled = t(s, d, "documents")
        .select(col("lang"), col("n_chars"), T.tokens(col("text")).as("__toks"))
        .select(col("lang"), col("n_chars"),
          size(col("__toks")).cast("bigint").as("nt"),
          size(array_distinct(col("__toks"))).cast("bigint").as("nu"))
        .filter(col("nt") >= 1)
        .withColumn("la", (col("n_chars") >= 200).cast("long"))
        .withColumn("lb", (expr("nu * 10000 div nt") >= 5000).cast("long"))
      labeled.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("la") * col("lb")).as("n_both"),
          sum((lit(1L) - col("la")) * (lit(1L) - col("lb"))).as("n_neither"),
          sum("la").as("a_keep"), sum("lb").as("b_keep"))
        .withColumn("agree", col("n_both") + col("n_neither"))
        .withColumn("pe_num", col("a_keep") * col("b_keep")
          + (col("n_docs") - col("a_keep")) * (col("n_docs") - col("b_keep")))
        .withColumn("po4", expr("(agree * 20000 + n_docs) div (n_docs * 2)"))
        .withColumn("pe4",
          expr("(pe_num * 20000 + n_docs * n_docs) div (n_docs * n_docs * 2)"))
        .withColumn("knum", col("n_docs") * col("agree") - col("pe_num"))
        .withColumn("kden", expr("nullif(n_docs * n_docs - pe_num, 0)"))
        .withColumn("kappa4", expr(
          """CASE WHEN knum >= 0 THEN (knum * 20000 + kden) div (kden * 2)
            |     ELSE -((-knum * 20000 + kden) div (kden * 2)) END""".stripMargin))
        .select("lang", "n_docs", "agree", "a_keep", "b_keep",
          "po4", "pe4", "kappa4")
        .orderBy("lang")
    }),

    // ---- SFT chat-template rendering with loss-mask offsets: the step
    // that turns curated (prompt, response) rows into training sequences
    // where loss applies only to assistant spans. Consecutive documents
    // within a source (by doc_id) stand in for a (user, assistant) turn
    // pair — swap the pairing window for a real conversation key and
    // nothing downstream changes. Per conversation the face emits the
    // rendered length and the [mask_start, mask_end) character span of
    // the assistant text inside "<|system|> … <|user|> {u} <|assistant|>
    // {a} <|end|>", all derived from length() of the SAME concat pieces
    // on both engines (never hand-counted constants), plus the exact-
    // integer loss fraction in basis points. Scale shape: ONE window
    // exchange keyed by source for the synthetic pairing (row_number +
    // two leads share the frame); the template arithmetic itself is pure
    // scan-side codegen — at 100 TB with real conversation ids the
    // window disappears and this is a zero-shuffle projection.
    "tx_chat_template" -> ((s, d) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
      t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .withColumn("rn", row_number().over(w))
        .withColumn("asst_doc", lead(col("doc_id"), 1).over(w))
        .withColumn("asst_text", lead(col("text"), 1).over(w))
        .filter(col("rn") % 2 === 1 && col("asst_doc").isNotNull)
        .withColumn("mask_start", length(concat(
          lit("<|system|> pipeline demo <|user|> "), col("text"),
          lit(" <|assistant|> "))).cast("bigint"))
        .withColumn("masked_chars", length(col("asst_text")).cast("bigint"))
        .withColumn("mask_end", col("mask_start") + col("masked_chars"))
        .withColumn("rendered_chars",
          col("mask_end") + length(lit(" <|end|>")).cast("bigint"))
        .withColumn("loss_frac4",
          expr("masked_chars * 10000 div rendered_chars"))
        .select(col("doc_id").as("user_doc"), col("source"), col("asst_doc"),
          col("rendered_chars"), col("mask_start"), col("mask_end"),
          col("masked_chars"), col("loss_frac4"))
        .orderBy("user_doc")
    }),

    // ---- n-gram novelty (the corpus-diversity curve): what share of a
    // doc's word 3-grams appear here FIRST (no earlier doc_id contains
    // them)? Falling novelty across an ingestion order is the earliest
    // signal a crawl has started re-reading itself — the curve dataset
    // teams plot before deciding another epoch vs more data; it's also
    // the per-doc contribution census behind train-set memorization
    // studies. Novelty is occurrence-weighted: a gram repeated inside its
    // first document counts each time (Σ n_novel ≥ |vocabulary|, equal
    // when no first doc repeats a gram) — FacesInvariantSpec pins the
    // recount. Shape: the same fact⋈dim layout as tx_dup_ngram_fraction —
    // one (gram → min doc_id) hash-agg (the first-occurrence table,
    // vocabulary-sized), one shuffle join back on the gram key, one
    // per-doc re-aggregate; novelty4 is an exact integer ratio. Never
    // doc×doc, and no window over the corpus — first-occurrence is a
    // commutative MIN, so map-side partial aggregation collapses it.
    // Grams ride as per-step-mod HORNER HASHES over the fused tokenHashes
    // (the dd_decontaminate discipline, r12): the gram shuffle — paid
    // twice, once into the first-occurrence hash-agg and once joining
    // back — carries 8-byte BIGINTs instead of ~25-byte 3-token strings,
    // and the gram build is one codegen'd array fold with no string
    // concat. Gram identity is TWO independent Horner folds (bases
    // 131/137, moduli 1e9+7 / 998244353) packed into one BIGINT
    // (ADVICE r12: a single 30-bit mod had birthday-bound collisions at
    // million-gram corpora — hundreds of silently merged grams shifting
    // min(doc_id); colliding BOTH independent folds is ~n²/2^61,
    // negligible at any corpus this pipeline meets). Honest caveat,
    // documented not hidden: the oracle MIRRORS the identical packed
    // fold — it replays the hash, it does not independently re-derive
    // string-gram semantics; the FacesInvariantSpec recount pins the
    // occurrence counts, which are representation-independent.
    "tx_ngram_novelty" -> ((s, d) => {
      val staged = t(s, d, "documents")
        .select(col("doc_id"), T.tokenHashes(col("text")).as("__th")).cache()
      val g3 = when(size(col("__th")) < 3, array().cast("array<long>"))
        .otherwise(expr(
          """transform(sequence(1, size(__th) - 2),
            |  i -> (((element_at(__th, i) * 131 + element_at(__th, i + 1))
            |         % 1000000007L * 131 + element_at(__th, i + 2))
            |        % 1000000007L) * 998244353L
            |     + ((element_at(__th, i) * 137 + element_at(__th, i + 1))
            |         % 998244353L * 137 + element_at(__th, i + 2))
            |        % 998244353L)""".stripMargin))
      val grams = staged.select(col("doc_id"), explode(g3).as("gram"))
      val firstSeen = grams.groupBy("gram").agg(min("doc_id").as("first_doc"))
      grams.join(firstSeen, "gram")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
             sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
               .as("n_novel"))
        .withColumn("novelty4", expr("n_novel * 10000 div n_grams"))
        .orderBy("doc_id")
    }),

    // cross-document duplicated-n-gram fraction — the Gopher/Dolma corpus
    // quality signal tx_repetition can't see: what share of a doc's word
    // 5-grams also appear in at least one OTHER document (boilerplate,
    // mirrored spans, template text). Shape: 5-gram arrays cache-staged
    // before the explode (TextFunctions contract), one (gram → distinct-doc
    // count) hash-agg — the "dimension" side, vocabulary-sized — then a
    // shuffle join back on the gram key and a per-doc re-aggregate. Never
    // doc×doc: the corpus-wide sharing structure rides entirely on the
    // gram-key shuffle, the same fact⋈dim layout as tx_tfidf. Docs shorter
    // than 5 tokens have no 5-grams and drop out on both sides.
    "tx_dup_ngram_fraction" -> ((s, d) => {
      val staged = t(s, d, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("__toks")).cache()
      val grams = staged
        .select(col("doc_id"), T.ngramsFromTokens(col("__toks"), 5).as("__g")).cache()
      val pairs = grams.select(col("doc_id"), explode(col("__g")).as("gram"))
      val docFreq = pairs.groupBy("gram").agg(countDistinct("doc_id").as("df"))
      pairs.join(docFreq, "gram")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
             sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup_grams"),
             round(avg(when(col("df") >= 2, 1.0).otherwise(0.0)), 4).as("dup_fraction"))
        .orderBy("doc_id")
    }),

    // deterministic weighted sample: 3 docs per language, selection
    // probability rising with n_chars — the "sample long documents for
    // manual QA" draw. The priority key is hash(doc_id)/weight (threshold
    // sampling): pure integer hash + one IEEE division, so the draw is
    // reproducible across engines, repartition-stable, and recomputable
    // per-row — no rand(), no global sort. Selection is the bounded typed
    // TopK aggregator (per-partition heap, mergeable partial state), NOT a
    // per-group window sort: at 100 TB each partition contributes at most
    // k candidate rows to the final merge. Negated key because TopK keeps
    // the largest values; ties break to the lowest doc_id inside the heap
    // and in the oracle's row_number alike.
    "tx_sample_weighted" -> ((s, d) => {
      val topk = org.apache.spark.sql.functions.udaf(new graft.engine.Aggregators.TopK(3),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaDouble))
      val scored = t(s, d, "documents")
        .withColumn("h", pmod(col("doc_id"), lit(1000000007L)) * 2654435761L % 1000000007L)
        .withColumn("skey", col("h").cast("double") / col("n_chars"))
      val picked = scored
        .groupBy("lang")
        .agg(topk(col("doc_id"), -col("skey")).as("ids"))
        .select(col("lang"), posexplode(col("ids")))
        .select(col("lang"), (col("pos") + 1).cast("bigint").as("rnk"), col("col").as("doc_id"))
      picked.join(scored.select(col("doc_id"), col("n_chars"), round(col("skey"), 4).as("skey")),
          "doc_id")
        .select("lang", "rnk", "doc_id", "n_chars", "skey")
        .orderBy("lang", "rnk")
    }),

    // per-doc token entropy: H = −Σ p·ln p over the doc's own token
    // distribution — near-zero for degenerate repetition, ≈ln(n_tokens)
    // for all-distinct text; the gibberish/boilerplate signal quality
    // filters use beside tx_repetition. One explode → (doc, tok) count →
    // per-doc fold; both aggregations partial→final, nothing wider than
    // the token instance frame shuffles.
    "tx_token_entropy" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), explode(T.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_tokens"),
             count(lit(1)).as("n_distinct"),
             // fixed-point qsum: Σ c·ln c is order-independent (r4 flake class)
             FP.qsum(col("c") * log(col("c"))).as("sum_clnc"))
        // H = ln N − (Σ c·ln c)/N — one grouped pass, no per-token division
        .withColumn("entropy",
          round(log(col("n_tokens")) - col("sum_clnc") / col("n_tokens"), 4))
        .select("doc_id", "n_tokens", "n_distinct", "entropy")
        .orderBy("doc_id")),

    // Zipf-law fit over the vocabulary HEAD: slope/r² of log-freq vs
    // log-rank for the top-1000 tokens — the corpus-statistics sanity check
    // (natural text ≈ −1; synthetic/templated corpora deviate). Scale
    // shape: the vocab aggregates partial→final, TakeOrdered bounds the
    // head, and the rank window runs over the bounded 1000-row frame — the
    // one place a single-partition window is legitimate, because the input
    // is top-k-bounded by construction (same justification as o4_topk).
    "tx_zipf_fit" -> ((s, d) => {
      val vocab = t(s, d, "documents")
        .select(explode(T.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("freq"))
      val top = vocab.orderBy(col("freq").desc, col("tok").asc).limit(1000)
      top.withColumn("rnk",
          row_number().over(Window.orderBy(col("freq").desc, col("tok").asc)))
        .agg(count(lit(1)).as("n_terms"),
             // zipf slope is negative by nature → qround (signed-zero rule)
             FP.qround(regr_slope(log(col("freq")), log(col("rnk"))), 4).as("zipf_slope"),
             round(regr_r2(log(col("freq")), log(col("rnk"))), 4).as("r2"))
    }),

    // blocked fuzzy join (record linkage): candidate pairs come from an
    // EQUALITY block (first-8-char prefix), and the quadratic edit-distance
    // work runs only inside blocks — the string-matching sibling of
    // dd_lsh_pairs' band trick. At 100 TB the block key is whatever cheap
    // canonical prefix/phonetic/sorted-token key the domain gives you; the
    // plan stays a hash equi-join however fuzzy the verify predicate is.
    "tx_fuzzy_join" -> ((s, d) => {
      val keyed = t(s, d, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 8).as("blk"),
          substring(col("text"), 1, 32).as("pfx"))
      keyed.as("x").join(keyed.as("y"),
          col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id"))
        .withColumn("pdist", levenshtein(col("x.pfx"), col("y.pfx")).cast("bigint"))
        .filter(col("pdist") <= 6)
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"), col("pdist"))
        .orderBy("a", "b")
    }),

    // bigram language-model scoring — the train-then-score two-pass: MLE
    // conditional probabilities P(b|a) = c(a,b)/c(a,·) fitted over the WHOLE
    // corpus (both count tables collapse in partial aggregation), then each
    // doc scored by its mean bigram log-likelihood — the fluency signal a
    // heuristic quality filter uses beside tx_unigram_logprob's NLL. The
    // bigram frame is built with the zip_with-over-slices shape (immune to
    // CollapseProject re-inlining — the tx_ngram_stats lesson) off a cached
    // token stage. Docs with <2 tokens have no bigrams and are absent, same
    // as the oracle's unnest semantics.
    "tx_bigram_lm" -> ((s, d) => {
      val staged = t(s, d, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("__toks")).cache()
      val ab = staged.filter(size(col("__toks")) >= 2)
        .select(col("doc_id"), explode(zip_with(
          slice(col("__toks"), lit(1), size(col("__toks")) - 1),
          slice(col("__toks"), lit(2), size(col("__toks")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
      val cab = ab.groupBy("a", "b").agg(count(lit(1)).as("cab"))
      val ca = ab.groupBy("a").agg(count(lit(1)).as("ca"))
      ab.join(cab, Seq("a", "b")).join(ca, Seq("a"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
             FP.qround(FP.qmean(log(col("cab").cast("double") / col("ca"))), 4).as("avg_logprob"))
        .orderBy("doc_id")
    }),

    // ---- greedy argmax GENERATION from the bigram LM — the decode loop
    // every n-gram LM demo runs, as a relational plan: the argmax-next
    // table (one row per vocabulary token: its most frequent successor,
    // count-desc/token-asc tie-break via the struct-min trick) is built
    // once and hinted below the docs-bytes gate; each of the 8 decode
    // steps is one join extending (cur, seq). Greedy decoding's loop
    // degeneracy (the chain enters a 2-cycle fast) shows up honestly in
    // the output. A dead-end token (never seen as a bigram head) emits
    // </s> and stays terminal. Scale shape: the corpus is touched twice
    // (bigram counts, seed counts); decoding itself is vocab-sized work —
    // 8 joins of the 5-row chain frame against the successor table,
    // never corpus-sized. The successor table is VOCAB-sized (token
    // types grow with the corpus, uncapped here), so its hint routes
    // through the same on-disk-bytes gate as every data-proportional
    // hint (the r12/r13 class): above the bound the planner's own choice
    // stands.
    "tx_lm_generate" -> ((s, d) => {
      val staged = t(s, d, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("__toks")).cache()
      val ab = staged.filter(size(col("__toks")) >= 2)
        .select(explode(zip_with(
          slice(col("__toks"), lit(1), size(col("__toks")) - 1),
          slice(col("__toks"), lit(2), size(col("__toks")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
      val cab = ab.groupBy("a", "b").agg(count(lit(1)).as("cab"))
      // struct-min on (−count, successor) = argmax count, lexicographic
      // tie-break — the emb_kmeans_step argmin pattern
      val nxt0 = cab.groupBy("a")
        .agg(min(struct((-col("cab")).as("nc"), col("b").as("nb"))).as("m"))
        .select(col("a").as("cur"), col("m.nb").as("nxt"))
      val nxt = if (Tables.bytesOnDisk(d, "documents") <= (256L << 20))
        broadcast(nxt0) else nxt0
      val seeds = staged.select(explode(col("__toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok").asc).limit(5)
        .select(col("tok").as("seed"))
      var g = seeds.select(col("seed"), col("seed").as("cur"), col("seed").as("seq"))
      for (_ <- 1 to 8) {
        g = g.join(nxt, Seq("cur"), "left")
          .select(col("seed"),
            coalesce(col("nxt"), lit("</s>")).as("cur"),
            concat(col("seq"), lit(" "), coalesce(col("nxt"), lit("</s>"))).as("seq"))
      }
      g.select(col("seed"), col("seq").as("generated"), lit(8L).as("n_steps"))
        .orderBy("seed")
    }),

    // ---- Kneser–Ney smoothed bigram LM (the standard n-gram smoothing,
    // Kneser & Ney 1995): P(w2|w1) = max(c12−D,0)/c1 + λ(w1)·Pcont(w2),
    // with absolute discount D=0.75, λ(w1) = D·N1+(w1,·)/c1 and the
    // continuation probability Pcont(w2) = N1+(·,w2)/|bigram types|.
    // Distinct from tx_bigram_lm (per-doc MLE logprob): this face builds
    // the smoothed MODEL itself. Every input is an exact integer count
    // (bigram counts, follower/predecessor type counts, type total), so
    // the probability is a per-row chain of correctly-rounded IEEE ops on
    // engine-identical operands — integer-exact deterministic. Scale
    // shape: three hash-aggregates over the bigram-type frame + one
    // broadcast 1-row total; the type frame is vocab², never corpus-sized.
    "tx_kneser_ney" -> ((s, d) => {
      val ab = t(s, d, "documents")
        .select(T.tokens(col("text")).as("__toks"))
        .filter(size(col("__toks")) >= 2)
        .select(explode(zip_with(
          slice(col("__toks"), lit(1), size(col("__toks")) - 1),
          slice(col("__toks"), lit(2), size(col("__toks")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
      val cab = ab.groupBy("a", "b").agg(count(lit(1)).as("cab")).cache()
      val ca = cab.groupBy("a")
        .agg(sum("cab").as("ca"), count(lit(1)).as("n_follow"))
      val cb = cab.groupBy("b").agg(count(lit(1)).as("n_precede"))
      val tot = cab.select(count(lit(1)).as("n_types"))
      cab.join(ca, "a").join(cb, "b").crossJoin(broadcast(tot))
        .filter(col("cab") >= 5)
        .withColumn("pkn", round(
          greatest(col("cab") - lit(0.75), lit(0.0)) / col("ca") +
            (lit(0.75) * col("n_follow") / col("ca")) *
              (col("n_precede") / col("n_types")), 6))
        .select("a", "b", "cab", "pkn")
        .orderBy("a", "b")
    }),

    // content-defined chunking + chunk-level dedup profile: cdc_chunks (the
    // native Rabin-style boundary splitter — see graft.plans.CdcChunks)
    // hashes each content-defined chunk; per source the distinct/total
    // chunk ratio is the storage win chunk dedup would buy. Scale shape:
    // the chunker is scan-side codegen (one pass per doc, no shuffle); the
    // explode keys the ONE shuffle on (source, chunk-hash) partial
    // count-distinct — at 100 TB this is exactly the dedup-store planning
    // pass, never an all-pairs comparison.
    "tx_cdc_chunks" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("source"),
          explode(graft.plans.GraftExtensions.cdcChunks(col("text"))).as("ch"))
        .groupBy("source")
        .agg(count(lit(1)).as("total_chunks"),
             countDistinct("ch").as("uniq_chunks"))
        .withColumn("dedup_ratio",
          round(col("uniq_chunks").cast("double") / col("total_chunks"), 4))
        .orderBy("source")),

    // ---- tokenizer fertility: pieces-per-word under the trained BPE
    // vocabulary, per source — THE metric tokenizer evaluations report
    // (a vocabulary that fragments a domain's words inflates its training
    // cost and shrinks its effective context). Same vocabulary-memoized
    // encode as tx_bpe_encode (fold once per DISTINCT word, join back to
    // occurrences); the per-source roll-up shuffles (source, counts)
    // only, and fertility is one divide on exact BIGINTs.
    "tx_bpe_fertility" -> ((s, d) => {
      val words = graft.engine.Bpe.wordTable(t(s, d, "documents"))
      val (merges, _) = graft.engine.Bpe.train(s, words, k = 5)
      val toks = t(s, d, "documents")
        .select(col("source"), explode(T.tokens(col("text"))).as("word"))
      val vocab = toks.select("word").distinct()
        .withColumn("np",
          size(graft.engine.Bpe.encodeCol(col("word"), merges)).cast("bigint"))
      toks.join(vocab, "word")
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"), sum("np").as("n_pieces"))
        .withColumn("fertility",
          round(col("n_pieces").cast("double") / col("n_words"), 4))
        .orderBy("source")
    }),

    // ---- reproducible per-epoch training order: every epoch permutes
    // the corpus differently, yet any worker can recompute any doc's
    // position — order = an arithmetic hash of (doc_id, epoch), the
    // shuffle-free determinism trick production data loaders use instead
    // of materializing a permutation (beats rand(): resumable mid-epoch,
    // engine-reproducible, seedable by epoch). The face emits each
    // epoch's first 10 docs via the typed mergeable TopK heap — partials
    // merge map-side, no per-epoch global sort/window. The multiplier
    // product stays under 2^63 for doc_id < 3.4e9; beyond that swap in a
    // 64-bit mix with modmul. Oracle ranks the same keys with
    // row_number.
    "tx_epoch_shuffle" -> ((s, d) => {
      val topk = udaf(new graft.engine.Aggregators.TopK(10),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble))
      t(s, d, "documents").select(col("doc_id"))
        .select(col("doc_id"),
          explode(array((0 until 3).map(e => lit(e.toLong)): _*)).as("epoch"))
        // the epoch term sits INSIDE the multiplication: an additive
        // seed only shifts every position equally (same order modulo the
        // rare wrap — measured: all three epochs' top-10 identical);
        // multiplying the mixed key genuinely permutes
        .withColumn("p",
          pmod((col("doc_id") + lit(1L) + col("epoch") * lit(1000003L)) * lit(2654435761L)
            + lit(17L), lit(1000000007L)))
        .groupBy("epoch")
        .agg(topk(col("doc_id"), -col("p").cast("double")).as("ids"))
        .select(col("epoch"), posexplode(col("ids")))
        .select(col("epoch"), (col("pos") + 1).cast("bigint").as("rnk"),
          col("col").as("doc_id"))
        .orderBy("epoch", "rnk")
    }),

    // ---- distribution drift between two corpus snapshots: Jensen–
    // Shannon divergence of the unigram distributions of the first and
    // second halves (doc_id < 250 as "yesterday's crawl") — the drift
    // monitor a production pipeline alarms on before a shifted source
    // poisons a training mix. JSD (not KL) because it is finite even for
    // tokens one side has never seen — exactly the case drift detection
    // exists for. Determinism: each token's term is a fixed IEEE chain
    // over exact counts; the vocabulary sum folds through fixed-point
    // qsum. Scale: two vocab-sized hash-aggs, one vocab-sized full-outer
    // join, a 1-row broadcast of the totals — the corpus is scanned once
    // and nothing doc-sized ever shuffles twice.
    "tx_jsd_drift" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select((col("doc_id") < 250).as("old_half"),
          explode(T.tokens(col("text"))).as("tok"))
      val ca = toks.filter(col("old_half")).groupBy("tok").agg(count(lit(1)).as("ca"))
      val cb = toks.filter(!col("old_half")).groupBy("tok").agg(count(lit(1)).as("cb"))
      val joined = ca.join(cb, Seq("tok"), "full_outer")
        .select(coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb"))
        .cache()
      val tots = joined.agg(sum("ca").as("na"), sum("cb").as("nb"),
        sum(when(col("ca") > 0, 1L).otherwise(0L)).as("vocab_old"),
        sum(when(col("cb") > 0, 1L).otherwise(0L)).as("vocab_new"),
        count(lit(1)).as("vocab_union"))
      joined.crossJoin(broadcast(tots))
        .withColumn("pa", col("ca").cast("double") / col("na"))
        .withColumn("pb", col("cb").cast("double") / col("nb"))
        .withColumn("m", (col("pa") + col("pb")) / 2)
        .withColumn("term",
          when(col("pa") > 0, lit(0.5) * col("pa") * log(col("pa") / col("m")))
            .otherwise(lit(0.0)) +
          when(col("pb") > 0, lit(0.5) * col("pb") * log(col("pb") / col("m")))
            .otherwise(lit(0.0)))
        .groupBy("na", "nb", "vocab_old", "vocab_new", "vocab_union")
        .agg(FP.qround(FP.qsum(col("term")), 6).as("jsd"))
        .select(col("na").as("n_tokens_old"), col("nb").as("n_tokens_new"),
          col("vocab_old"), col("vocab_new"), col("vocab_union"), col("jsd"))
    }),

    // ---- held-out LM evaluation — the train/test hygiene face
    // tx_perplexity_bucket deliberately lacks (it scores the corpus under
    // itself): train an interpolated bigram LM on the 80% split
    // ((doc_id/20) % 5 != 0 — the block split decorrelates from the
    // round-robin doc_id%20 source assignment), score the disjoint 20%, report per-source
    // held-out NLL and bigram OOV rate. Unseen bigrams back off to the
    // Laplace-smoothed unigram (p > 0 even for OOV words), so the score
    // is total. Determinism: every probability is a fixed IEEE chain
    // over exact train-split counts, quantized to micro-nats before the
    // order-free sum; OOV rate is one divide on BIGINTs. Scale shape:
    // two model hash-aggs on the train split, both vocab-bounded and
    // broadcast; the held-out stream never shuffles for the joins.
    "tx_lm_heldout" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"), T.tokens(col("text")).as("__toks"))
        .filter(size(col("__toks")) >= 2).cache()
      val trainBg = docs.filter(pmod(floor(col("doc_id") / lit(20)).cast("long"), lit(5)) =!= 0)
        .select(explode(T.bigramsFromTokens(col("__toks"))).as("bg"))
      val cab = trainBg.groupBy("bg").agg(count(lit(1)).as("cab"))
        .withColumn("a", split(col("bg"), " ").getItem(0)).cache()
      val ca = cab.groupBy("a").agg(sum("cab").as("ca"))
      val bgModel = cab.join(ca, "a").select(col("bg"), col("cab"), col("ca"))
      val uni = docs.filter(pmod(floor(col("doc_id") / lit(20)).cast("long"), lit(5)) =!= 0)
        .select(explode(col("__toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("uc")).cache()
      val tot = uni.agg(sum("uc").as("t_uni"), count(lit(1)).as("v"))
      val held = docs.filter(pmod(floor(col("doc_id") / lit(20)).cast("long"), lit(5)) === 0)
        .select(col("source"),
          explode(T.bigramsFromTokens(col("__toks"))).as("bg"))
        .withColumn("b", split(col("bg"), " ").getItem(1))
      held
        .join(broadcast(bgModel), Seq("bg"), "left")
        .join(broadcast(uni.select(col("tok").as("b"), col("uc"))), Seq("b"), "left")
        .crossJoin(broadcast(tot))
        .withColumn("p",
          lit(0.8) * coalesce(col("cab") / col("ca"), lit(0.0)) +
            lit(0.2) * ((coalesce(col("uc"), lit(0L)) + lit(1.0)) / (col("t_uni") + col("v"))))
        .withColumn("lpu", round(-log(col("p")) * lit(1e6)).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("cab").isNull, 1L).otherwise(0L)).as("n_oov_bigrams"),
          FP.qround(sum(col("lpu")).cast("double") /
            (count(lit(1)).cast("double") * lit(1e6)), 4).as("mean_nll"))
        .withColumn("oov_rate",
          round(col("n_oov_bigrams").cast("double") / col("n_bigrams"), 4))
        .orderBy("source")
    }),

    // ---- CCNet-style perplexity partition: score every doc under the
    // corpus-trained Kneser-Ney bigram LM (same arithmetic as
    // tx_kneser_ney, UNfiltered — the model, not the report), then split
    // each source into head/middle/tail at the 30th/70th per-source score
    // percentiles — the exact curation move CCNet (Wenzek et al. '20) uses
    // to keep the fluent third of a crawl. Determinism: each bigram's
    // -ln(pkn) is identical double arithmetic over exact integer counts on
    // both engines, quantized to integer MICRO-NATS before the per-doc sum
    // (long addition commutes — shuffle order can't flake the hash), and
    // the per-bucket mean folds through fixed-point qmean. Scale shape:
    // bigram explode → vocab²-bounded model hash-agg, doc⋈model shuffle
    // join on the bigram key (fact⋈dimension, never doc×doc), per-doc
    // re-agg, then a 20-row cutoff frame broadcast back. The exact
    // per-source `percentile` buffers one score per doc — at 100 TB swap
    // to approx_percentile (mergeable sketch; the agg_mad/sketch_quantiles
    // precedent), which shifts cut points, not semantics.
    "tx_perplexity_bucket" -> ((s, d) => {
      val staged = t(s, d, "documents")
        .select(col("doc_id"), col("source"), T.tokens(col("text")).as("__toks"))
        .filter(size(col("__toks")) >= 2).cache()
      val bg = staged.select(col("doc_id"), col("source"),
        explode(T.bigramsFromTokens(col("__toks"))).as("bg"))
      val cab = bg
        .withColumn("a", split(col("bg"), " ").getItem(0))
        .withColumn("b", split(col("bg"), " ").getItem(1))
        .groupBy("a", "b").agg(count(lit(1)).as("cab")).cache()
      val ca = cab.groupBy("a")
        .agg(sum("cab").as("ca"), count(lit(1)).as("n_follow"))
      val cb = cab.groupBy("b").agg(count(lit(1)).as("n_precede"))
      val tot = cab.select(count(lit(1)).as("n_types"))
      val model = cab.join(ca, "a").join(cb, "b").crossJoin(broadcast(tot))
        .withColumn("lpu", round(-log(
          greatest(col("cab") - lit(0.75), lit(0.0)) / col("ca") +
            (lit(0.75) * col("n_follow") / col("ca")) *
              (col("n_precede") / col("n_types"))) * lit(1e6)).cast("long"))
        .select(concat_ws(" ", col("a"), col("b")).as("bg"), col("lpu"))
      // the model is vocab²-bounded (tiny here) — broadcast it so the
      // corpus-sized bigram stream never shuffles for the join; at a real
      // web-scale vocabulary this becomes a shuffle join on the bigram
      // key, which AQE picks automatically once the build side outgrows
      // the broadcast threshold
      val scored = bg.join(broadcast(model), "bg")
        .groupBy("doc_id")
        .agg(first(col("source")).as("source"),
          FP.qround(sum(col("lpu")).cast("double") /
            (count(lit(1)).cast("double") * lit(1e6)), 4).as("score"))
        .cache()
      val cuts = scored.groupBy("source").agg(
        expr("percentile(score, 0.3)").as("c30"),
        expr("percentile(score, 0.7)").as("c70"))
      scored.join(broadcast(cuts), "source")
        .withColumn("bucket",
          when(col("score") <= col("c30"), "head")
            .when(col("score") <= col("c70"), "middle")
            .otherwise("tail"))
        .groupBy("source", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          FP.qround(FP.qmean(col("score")), 4).as("mean_nll"))
        .orderBy("source", "bucket")
    }),

    // ---- corpus BLEU-2 (Papineni et al. 2002) — the n-gram-overlap
    // evaluation metric every generation/translation eval harness computes
    // at corpus scale. Candidates are PLANTED per doc from the reference
    // tokens (the planted-duplicate discipline): every 7th token dropped,
    // every 5th reversed — so the metric exercises both the clipped-
    // precision branch (reversed tokens rarely re-match) and the brevity
    // penalty (candidates are strictly shorter). Scale shape: the
    // candidate/reference unigram AND bigram multiset intersections ride
    // ONE gram-keyed hash-agg — both sides and both orders explode into a
    // single tagged stream, so the per-doc clipped count min(c_cand,
    // c_ref) never needs a join; per-source totals are a second,
    // source-sized agg. Grams travel as 8-byte polynomial HASHES, not
    // strings (the dd_* fingerprint trade: the big shuffle's row is a
    // bigint, and a hash collision can only infinitesimally inflate a
    // clipped count — both engines hash identically, so the gate stays
    // exact; string grams measured 3.7 s median at sf0.1, hashed 3.0 s,
    // and the shuffle row shrinks ~5x for the 100 TB fabric). All counts
    // are exact BIGINTs; p1/p2 are single
    // correctly-rounded divides of exact ints (bit-identical both
    // engines); bleu2's sqrt is correctly rounded IEEE, and its one exp()
    // call follows the tx_dsir_weights ln() precedent — round(,6) on a
    // sub-ulp-divergence-risk value, boundary probability measure-zero.
    "tx_bleu_eval" -> ((s, d) =>
      evalClipCensus(s, d)
        .withColumn("p1", round(col("clip1").cast("double") / col("cand_tokens"), 6))
        .withColumn("p2", round(col("clip2").cast("double") / col("cand_bigrams"), 6))
        .withColumn("bleu2", round(
          sqrt((col("clip1").cast("double") / col("cand_tokens")) *
               (col("clip2").cast("double") / col("cand_bigrams"))) *
            exp(lit(1.0) - col("ref_tokens").cast("double") / col("cand_tokens")), 6))
        .select("source", "n_docs", "ref_tokens", "cand_tokens", "cand_bigrams",
          "clip1", "clip2", "p1", "p2", "bleu2")
        .orderBy("source")),

    // ---- ROUGE-N: the RECALL-oriented half of the eval pair (Lin '04)
    // — BLEU asks how much of the CANDIDATE the reference certifies,
    // ROUGE asks how much of the REFERENCE the candidate recovers; eval
    // pipelines report both because each is blind to the other's failure
    // (a one-word candidate has perfect BLEU-1 precision and terrible
    // ROUGE-1 recall). Same corruption, same grams, and the SAME clipped
    // match counts — both faces read the one evalClipCensus definition,
    // so the gram/clip rules provably cannot drift between them — only
    // the normalization differs: recall divides by reference mass, and
    // ROUGE-2 F1 is the harmonic mean of the two views. Float discipline:
    // each score is a fixed-parenthesization IEEE chain replayed
    // verbatim by the oracle, round(,6).
    "tx_rouge_eval" -> ((s, d) => {
      val c = evalClipCensus(s, d)
      val p2 = col("clip2").cast("double") / col("cand_bigrams")
      val r2 = col("clip2").cast("double") / col("ref_bigrams")
      c.select(col("source"), col("n_docs"), col("ref_tokens"),
          col("ref_bigrams"), col("clip1"), col("clip2"),
          round(col("clip1").cast("double") / col("ref_tokens"), 6).as("rouge1_r"),
          round(r2, 6).as("rouge2_r"),
          round(lit(2.0) * p2 * r2 / (p2 + r2), 6).as("rouge2_f"))
        .orderBy("source")
    }),

    // ---- ROUGE-L (VERDICT r12 missing #3): the LCS-based member of the
    // eval family summarization evals default to — unlike ROUGE-N's bag
    // clipping, the longest common SUBSEQUENCE rewards in-ORDER recovery
    // (a candidate with every reference token shuffled has perfect
    // ROUGE-1 and near-floor ROUGE-L). Shares evalStaged's framing —
    // same corruption, same token hashes — so ROUGE-1/2/L provably score
    // the same sequences; FacesInvariantSpec pins lcs ≤ clip1 per source
    // (an order-constrained matching can never beat the bag matching).
    // Scale shape: the LCS recurrence is inherently sequential per pair —
    // the documented mapPartitions boundary (the tx_edit_distance /
    // suffix-LCP precedent): per document one O(|cand|·|ref|) two-row DP
    // over the already-hashed token arrays (docs are length-bounded by
    // the chunking contract upstream; cost is per-row bounded, never
    // corpus-shaped), then one per-source hash-agg. The oracle replays
    // the identical DP as a per-position recursive unroll over the same
    // hash arrays. Scores are single divides of exact BIGINTs in a fixed
    // parenthesization, round(,6) — the rouge2_f discipline.
    "tx_rouge_lcs" -> ((s, d) => {
      import s.implicits._
      val perDoc = evalStaged(s, d)
        .select(col("doc_id"), col("source"), col("__refh"), col("__candh"))
        .as[(Long, String, Seq[Long], Seq[Long])]
        .mapPartitions { it =>
          it.map { case (id, src, ref, cand) =>
            // classic two-row LCS DP: O(|cand|·|ref|) time, O(|ref|) space
            val m = ref.length
            val refA = ref.toArray
            var prev = new Array[Int](m + 1)
            var cur = new Array[Int](m + 1)
            cand.foreach { ci =>
              var j = 1
              while (j <= m) {
                cur(j) =
                  if (ci == refA(j - 1)) prev(j - 1) + 1
                  else math.max(cur(j - 1), prev(j))
                j += 1
              }
              val tmp = prev; prev = cur; cur = tmp
              java.util.Arrays.fill(cur, 0)
            }
            (id, src, prev(m).toLong, m.toLong, cand.length.toLong)
          }
        }
        .toDF("doc_id", "source", "lcs", "nref", "ncand")
      val pL = col("lcs_tokens").cast("double") / col("cand_tokens")
      val rL = col("lcs_tokens").cast("double") / col("ref_tokens")
      perDoc.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum("nref").as("ref_tokens"),
          sum("ncand").as("cand_tokens"),
          sum("lcs").as("lcs_tokens"))
        .select(col("source"), col("n_docs"), col("ref_tokens"),
          col("cand_tokens"), col("lcs_tokens"),
          round(rL, 6).as("rougeL_r"),
          round(pL, 6).as("rougeL_p"),
          round(lit(2.0) * pL * rL / (pL + rL), 6).as("rougeL_f"))
        .orderBy("source")
    }),

    // ---- WordPiece-style greedy longest-match encode — the third
    // production tokenizer family beside BPE (tx_bpe_*) and the unigram LM
    // (tx_unigram_tokenizer): a fixed vocabulary (every corpus character,
    // for totality, plus the top-60 2..4-char substrings by occurrence-
    // weighted count, min-count floored) and, per word, the BERT encode
    // rule — at each position take the LONGEST vocab piece that matches,
    // emit it, advance by its length. Output is the piece-usage census the
    // greedy choices induce, which is what the oracle gate pins: a wrong
    // longest-match tie/ordering anywhere shifts usage counts.
    //
    // Scale shape is the dictionary discipline every tokenizer face here
    // shares: the token STREAM is touched once (one hash-agg to the
    // distinct-word dictionary with occurrence counts — Heaps-law bounded
    // no matter the corpus size); everything after is dictionary-sized.
    // Candidate matches explode (position × 4 prefix lengths) off the
    // dictionary and equi-join the BROADCAST vocab on piece content (a
    // truncated prefix can only ever equal a shorter piece, so the join is
    // self-guarding and the per-position argmax is max(len(piece))). The
    // greedy walk itself is ONE array fold per dictionary word — the
    // cursor advances through a per-word step array, acting only when the
    // fold index equals the cursor (positions only move forward, so one
    // forward pass replays the whole greedy scan; no iteration, no UDF).
    // The oracle replays the identical walk as a recursive CTE over the
    // same jump table.
    "tx_wordpiece_encode" -> ((s, d) => {
      val words = t(s, d, "documents")
        .select(explode(T.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n_occ"))
        .cache()
      val multi = words
        .select(col("n_occ"), explode(concat((2 to 4).map { L =>
          when(length(col("word")) < L, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(1), length(col("word")) - (L - 1)),
              p => col("word").substr(p, lit(L))))
        }: _*)).as("piece"))
        .groupBy("piece").agg(sum("n_occ").as("cnt"))
        .filter(col("cnt") >= 5)
        .orderBy(desc("cnt"), col("piece")).limit(60)
      val singles = words
        .select(explode(filter(split(col("word"), ""), c => c =!= "")).as("piece"))
        .distinct()
      val vocab = multi.select("piece").union(singles).distinct()
      val cands = words
        .select(col("word"), explode(sequence(lit(1), length(col("word")))).as("p"))
        .select(col("word"), col("p"),
          explode(array((1 to 4).map(L => col("word").substr(col("p"), lit(L))): _*))
            .as("piece"))
      val jump = cands.join(broadcast(vocab), "piece")
        .groupBy("word", "p").agg(max(length(col("piece"))).as("step"))
      val enc = jump
        .groupBy("word")
        .agg(transform(sort_array(collect_list(struct(col("p"), col("step")))),
          j => j.getField("step")).as("steps"))
        .withColumn("walk", aggregate(
          sequence(lit(1), size(col("steps"))),
          struct(lit(1).as("pos"), array().cast("array<string>").as("ps")),
          (acc, i) => when(i === acc.getField("pos"),
            struct((acc.getField("pos") + element_at(col("steps"), i)).as("pos"),
              concat(acc.getField("ps"),
                array(col("word").substr(i, element_at(col("steps"), i)))).as("ps")))
            .otherwise(acc)))
        .select(col("word"), explode(col("walk").getField("ps")).as("piece"))
      enc.join(words, "word")
        .groupBy("piece")
        .agg(countDistinct(col("word")).as("n_words"),
          sum(col("n_occ")).as("total_usage"))
        .select(col("piece"), length(col("piece")).cast("bigint").as("plen"),
          col("n_words"), col("total_usage"))
        .orderBy(desc("total_usage"), col("piece")).limit(25)
    })
  )

  private val S = SqlText

  /** The tx_bleu_eval / tx_rouge_eval shared CTE chain (candidate
    * corruption, gram hashing, clipping, per-source lengths) — the SQL
    * twin of [[evalClipCensus]], one definition for both eval oracles. */
  private lazy val evalClipCtes: String =
    s"""staged AS (SELECT doc_id, source, toks AS ref,
       |    list_filter(list_transform(range(1, len(toks) + 1), i ->
       |      CASE WHEN i % 7 = 0 THEN NULL
       |           WHEN i % 5 = 0 THEN reverse(toks[i])
       |           ELSE toks[i] END), w -> w IS NOT NULL) AS cand
       |  FROM (SELECT doc_id, source, ${S.tokens("text")} AS toks FROM documents)),
       |hashed AS (SELECT doc_id, source, len(ref) AS nref, len(cand) AS ncand,
       |    list_transform(ref, w -> ${S.wordHash("w")}) AS refh,
       |    list_transform(cand, w -> ${S.wordHash("w")}) AS candh
       |  FROM staged),
       |bg AS (SELECT doc_id, source, nref, ncand, refh, candh,
       |    CASE WHEN len(refh) < 2 THEN CAST([] AS BIGINT[]) ELSE
       |      list_transform(range(1, len(refh)), i -> (refh[i] * 131 + refh[i+1]) % 1000000007) END AS refbg,
       |    CASE WHEN len(candh) < 2 THEN CAST([] AS BIGINT[]) ELSE
       |      list_transform(range(1, len(candh)), i -> (candh[i] * 131 + candh[i+1]) % 1000000007) END AS candbg
       |  FROM hashed),
       |grams AS (
       |  SELECT source, doc_id, 1 AS n, unnest(candh) AS g, 1 AS c, 0 AS r FROM bg
       |  UNION ALL SELECT source, doc_id, 1, unnest(refh), 0, 1 FROM bg
       |  UNION ALL SELECT source, doc_id, 2, unnest(candbg), 1, 0 FROM bg
       |  UNION ALL SELECT source, doc_id, 2, unnest(refbg), 0, 1 FROM bg),
       |clip AS (SELECT source, n, sum(least(cc, cr)) AS clip FROM
       |    (SELECT source, doc_id, n, g, sum(c) AS cc, sum(r) AS cr FROM grams
       |     GROUP BY source, doc_id, n, g)
       |  GROUP BY source, n),
       |cw AS (SELECT source,
       |    CAST(sum(CASE WHEN n = 1 THEN clip ELSE 0 END) AS BIGINT) AS clip1,
       |    CAST(sum(CASE WHEN n = 2 THEN clip ELSE 0 END) AS BIGINT) AS clip2
       |  FROM clip GROUP BY source),
       |lens AS (SELECT source, count(*) AS n_docs,
       |    CAST(sum(nref) AS BIGINT) AS ref_tokens,
       |    CAST(sum(ncand) AS BIGINT) AS cand_tokens,
       |    CAST(sum(CASE WHEN nref < 2 THEN 0 ELSE nref - 1 END) AS BIGINT) AS ref_bigrams,
       |    CAST(sum(CASE WHEN ncand < 2 THEN 0 ELSE ncand - 1 END) AS BIGINT) AS cand_bigrams
       |  FROM bg GROUP BY source)""".stripMargin

  /** tx_bpe_encode / tx_bpe_fertility shared oracle machinery: the five
    * BPE training rounds as CTEs (win1..win5 joined in as scalars) and the
    * per-word sequential replay — each round's fold is the
    * list_reduce-with-prepended-init trick from tx_bpe_merges, nested so
    * round i consumes round i−1's output; lambda vars are suffixed per
    * level (a1/x1..a5/x5) so no binder is ever shadowed. */
  private def bpeRnd(i: Int) =
    s"""pairs$i AS (SELECT pair, sum(freq) AS n FROM (
       |    SELECT unnest(CASE WHEN len(syms) < 2 THEN CAST([] AS VARCHAR[]) ELSE
       |      list_transform(range(1, len(syms)), j -> syms[j] || ' ' || syms[j+1]) END) AS pair, freq
       |    FROM words${i - 1}) GROUP BY pair),
       |win$i AS (SELECT string_split(pair, ' ')[1] AS a, string_split(pair, ' ')[2] AS b, n
       |  FROM pairs$i ORDER BY n DESC, pair ASC LIMIT 1),
       |words$i AS (SELECT list_reduce(
       |    list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, s -> [s])),
       |    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = w.a AND x[1] = w.b
       |                THEN list_concat(acc[1:len(acc)-1], [w.a || w.b])
       |                ELSE list_concat(acc, x) END) AS syms, freq
       |  FROM words${i - 1} CROSS JOIN win$i w)"""
  private def bpeFold(i: Int, inner: String) =
    s"""list_reduce(list_prepend(CAST([] AS VARCHAR[]), list_transform($inner, s$i -> [s$i])),
       |      (a$i, x$i) -> CASE WHEN len(a$i) > 0 AND a$i[len(a$i)] = w$i.a AND x$i[1] = w$i.b
       |                THEN list_concat(a$i[1:len(a$i)-1], [w$i.a || w$i.b])
       |                ELSE list_concat(a$i, x$i) END)""".stripMargin
  private lazy val bpeEnc =
    (1 to 5).foldLeft("string_split(w, '')")((inner, i) => bpeFold(i, inner))
  private lazy val bpeTrainCtes =
    s"""words0 AS (SELECT string_split(word, '') AS syms, count(*) AS freq
       |  FROM (SELECT unnest(${S.tokens("text")}) AS word FROM documents) GROUP BY word),
       |${(1 to 5).map(bpeRnd).mkString(",\n")}""".stripMargin
  /** Same 5-round training replay but with the [[BpeMinCount]] vocabulary
    * floor the driver-side trainers enforce before their collect — keeps
    * the floored training semantics oracle-checked end-to-end. */
  private lazy val bpeTrainCtesFloored =
    s"""words0 AS (SELECT string_split(word, '') AS syms, count(*) AS freq
       |  FROM (SELECT unnest(${S.tokens("text")}) AS word FROM documents) GROUP BY word
       |  HAVING count(*) >= $BpeMinCount),
       |${(1 to 5).map(bpeRnd).mkString(",\n")}""".stripMargin

  val oracles: Map[String, String] = Map(
    "tx_token_count" ->
      s"""SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_raw_tokens,
         |  CAST(len(${S.tokens("text")}) AS BIGINT) AS n_tokens,
         |  CAST(length(text) AS BIGINT) AS len_chars, n_chars
         |FROM documents ORDER BY doc_id""".stripMargin,

    // same W=40/S=20 window geometry in integer arithmetic; list_slice
    // clamps the final short chunk exactly like Spark's slice
    "tx_chunk_sliding" ->
      s"""WITH tl AS (SELECT doc_id, ${S.tokens("text")} AS toks FROM documents),
         |n AS (SELECT doc_id, toks,
         |        CASE WHEN len(toks) <= 40 THEN 1
         |             ELSE (len(toks) - 40 + 19) // 20 + 1 END AS n_chunks
         |      FROM tl),
         |c AS (SELECT doc_id, toks,
         |        CAST(unnest(range(0, n_chunks)) AS BIGINT) AS chunk_id
         |      FROM n)
         |SELECT doc_id, chunk_id,
         |  CAST(len(list_slice(toks, chunk_id * 20 + 1, chunk_id * 20 + 40)) AS BIGINT) AS n_tokens,
         |  md5(array_to_string(list_slice(toks, chunk_id * 20 + 1, chunk_id * 20 + 40), ' ')) AS chunk_sig
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "tx_quality" ->
      s"""SELECT doc_id, n_tokens, n_uniq,
         |  round(CAST(sum_len AS DOUBLE) / n_tokens, 4) AS avg_token_len,
         |  round(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stop_ratio,
         |  round(CAST(n_uniq AS DOUBLE) / n_tokens, 4) AS uniq_ratio,
         |  (n_tokens >= 5 AND n_tokens <= 10000 AND round(CAST(n_uniq AS DOUBLE) / n_tokens, 4) > 0.2) AS is_quality
         |FROM (SELECT doc_id,
         |        CAST(len(${S.tokens("text")}) AS BIGINT) AS n_tokens,
         |        CAST(len(list_distinct(${S.tokens("text")})) AS BIGINT) AS n_uniq,
         |        list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(${S.tokens("text")}, w -> CAST(length(w) AS BIGINT))), (a, x) -> a + x) AS sum_len,
         |        ${S.stopHits("text", graft.engine.TextFunctions.langStopwords.head._2)} AS n_stop
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,

    // per-doc ratios fold through the same qmean twin; corpus types via
    // count(DISTINCT) over the unnested token stream
    "tx_ttr" ->
      s"""WITH tl AS (SELECT doc_id, source, ${S.tokens("text")} AS toks FROM documents),
         |pd AS (SELECT source,
         |         CAST(len(toks) AS BIGINT) AS n_tok,
         |         CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq
         |       FROM tl),
         |da AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |         ${S.qround(S.qmean("CAST(n_uniq AS DOUBLE) / n_tok"), 4)} AS mean_doc_ttr
         |       FROM pd GROUP BY source),
         |ty AS (SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_types
         |       FROM (SELECT source, unnest(toks) AS tok FROM tl) GROUP BY source)
         |SELECT source, n_docs, n_tokens, n_types,
         |  round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS corpus_ttr,
         |  mean_doc_ttr
         |FROM da JOIN ty USING (source) ORDER BY source""".stripMargin,

    "tx_prefix_boilerplate" ->
      s"""SELECT prefix_sig, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |  min(doc_id) AS example_doc
         |FROM (SELECT doc_id, source,
         |        md5(array_to_string(list_slice(${S.tokens("text")}, 1, 2), ' ')) AS prefix_sig
         |      FROM documents)
         |GROUP BY prefix_sig HAVING count(*) >= 3
         |ORDER BY n_docs DESC, prefix_sig""".stripMargin,

    // same deterministic contact-line enrichment, same RE2 ∩ Java-dialect
    // patterns; DuckDB needs the 'g' flag for global replace (Spark's
    // regexp_replace is global by default)
    "tx_pii_redact" ->
      """WITH enriched AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@' || source || '.example or +1-555-'
        |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS full_text
        |  FROM documents),
        |red AS (
        |  SELECT doc_id, full_text,
        |    regexp_replace(regexp_replace(full_text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '\+1-555-[0-9]{4}', '[PHONE]', 'g') AS redacted
        |  FROM enriched)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(full_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(full_text, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(length(full_text) AS BIGINT) AS len_before,
        |  CAST(length(redacted) AS BIGINT) AS len_after,
        |  md5(redacted) AS redacted_sig
        |FROM red ORDER BY doc_id""".stripMargin,

    "tx_url_census" ->
      """SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM (SELECT lang, n_chars,
        |        regexp_extract('https://' || source || '.example/doc/' || doc_id
        |          || '?lang=' || lang, 'https://([A-Za-z0-9.-]+)/', 1) AS domain
        |      FROM documents)
        |GROUP BY domain ORDER BY domain""".stripMargin,

    "tx_dataset_card" ->
      s"""WITH base AS (SELECT source, lang, md5(lower(trim(text))) AS h,
         |    CAST(len(${S.tokens("text")}) AS BIGINT) AS n_tok
         |  FROM documents),
         |core AS (SELECT source, count(*) AS n_docs,
         |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |    ${S.qround(S.qmean("CAST(n_tok AS DOUBLE)", 20), 4)} AS mean_tokens,
         |    CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_exact_dups
         |  FROM base GROUP BY source),
         |lc AS (SELECT source, lang, count(*) AS c FROM base GROUP BY 1, 2),
         |langs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
         |    sum(c) AS n, ${S.qsum("CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))")} AS clnc
         |  FROM lc GROUP BY source)
         |SELECT core.source AS source, n_docs, n_tokens, mean_tokens, n_exact_dups,
         |  round(CAST(n_exact_dups AS DOUBLE) / n_docs, 4) AS dup_rate,
         |  n_langs, round(ln(n) - clnc / n, 4) AS lang_entropy
         |FROM core JOIN langs ON core.source = langs.source
         |ORDER BY source""".stripMargin,

    "tx_ctx_fit" ->
      s"""SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN n_tok <= 32 THEN 1 ELSE 0 END) AS BIGINT) AS fit_32,
         |  CAST(sum(CASE WHEN n_tok <= 64 THEN 1 ELSE 0 END) AS BIGINT) AS fit_64,
         |  CAST(sum(CASE WHEN n_tok <= 128 THEN 1 ELSE 0 END) AS BIGINT) AS fit_128,
         |  CAST(sum((n_tok + 63) // 64) AS BIGINT) AS n_chunks_w64,
         |  round(CAST(sum(CASE WHEN n_tok <= 64 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS fit_64_frac
         |FROM (SELECT source, CAST(len(${S.tokens("text")}) AS BIGINT) AS n_tok FROM documents)
         |GROUP BY source ORDER BY source""".stripMargin,

    // same strip order (fragment → tracking → slash → lowercase); DuckDB
    // needs the 'g' flag Spark applies by default
    "tx_url_canonicalize" ->
      """WITH raw AS (
        |  SELECT doc_id, unnest([
        |    'https://' || upper(source) || '.Example/Doc/' || doc_id,
        |    'https://' || source || '.example/doc/' || doc_id || '?utm_source=feed&utm_campaign=x',
        |    'https://' || source || '.example/doc/' || doc_id || '#section-2',
        |    'https://' || source || '.example/doc/' || doc_id || '/']) AS variant
        |  FROM documents),
        |c AS (SELECT variant,
        |    lower(regexp_replace(regexp_replace(regexp_replace(variant,
        |      '#.*$', '', 'g'), '\?utm_[^#]*$', '', 'g'), '/$', '', 'g')) AS canonical
        |  FROM raw),
        |g AS (SELECT canonical, count(*) AS n_variants,
        |    count(DISTINCT variant) AS n_distinct_raw FROM c GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_canonical,
        |  CAST(sum(n_variants) AS BIGINT) AS n_raw,
        |  CAST(sum(CASE WHEN n_variants = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_fully_collapsed,
        |  CAST(max(n_distinct_raw) AS BIGINT) AS max_raw_per_canonical
        |FROM g""".stripMargin,

    // same strip order: script blocks first (content and all), then
    // generic tags, then entity unescapes, then whitespace collapse
    "tx_html_strip" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><script>track("x&y");</script></head><body><p class="main">'
        |      || text || '</p><br/>&amp;copy &lt;2024&gt;&nbsp;end</body></html>' AS html
        |  FROM documents),
        |st AS (SELECT doc_id, html,
        |    regexp_replace(regexp_replace(html,
        |      '<script>[^<]*</script>', '', 'g'), '<[^>]+>', '', 'g') AS no_tags
        |  FROM h),
        |un AS (SELECT doc_id, html,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(no_tags,
        |      '&amp;', '&', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&nbsp;', ' ', 'g') AS unescaped
        |  FROM st)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(html, '<[^>]+>')) AS BIGINT) AS n_tags,
        |  CAST(length(html) AS BIGINT) AS len_html,
        |  CAST(length(regexp_replace(unescaped, '  +', ' ', 'g')) AS BIGINT) AS len_clean,
        |  md5(regexp_replace(unescaped, '  +', ' ', 'g')) AS clean_sig
        |FROM un ORDER BY doc_id""".stripMargin,

    "tx_lang_id" -> {
      val hitCols = graft.engine.TextFunctions.langStopwords
        .map { case (c, ws) => s"${S.stopHits("text", ws)} AS ${c}_hits" }.mkString(",\n  ")
      val best = "greatest(en_hits, fr_hits, de_hits, es_hits)"
      s"""SELECT doc_id, lang, en_hits, fr_hits, de_hits, es_hits,
         |  (CASE WHEN en_hits = $best AND $best > 0 THEN 'en'
         |        WHEN fr_hits = $best AND $best > 0 THEN 'fr'
         |        WHEN de_hits = $best AND $best > 0 THEN 'de'
         |        WHEN es_hits = $best AND $best > 0 THEN 'es'
         |        ELSE 'und' END) AS pred_lang
         |FROM (SELECT doc_id, lang,
         |  $hitCols
         |FROM documents)
         |ORDER BY doc_id""".stripMargin
    },

    // identical predictor CASE (priority = langStopwords order); cell
    // counts then a totals join, share4 as exact integer basis points
    "tx_langid_confusion" -> {
      val hitCols = graft.engine.TextFunctions.langStopwords
        .map { case (c, ws) => s"${S.stopHits("text", ws)} AS ${c}_hits" }.mkString(",\n  ")
      val best = "greatest(en_hits, fr_hits, de_hits, es_hits)"
      s"""WITH p AS (SELECT lang,
         |  (CASE WHEN en_hits = $best AND $best > 0 THEN 'en'
         |        WHEN fr_hits = $best AND $best > 0 THEN 'fr'
         |        WHEN de_hits = $best AND $best > 0 THEN 'de'
         |        WHEN es_hits = $best AND $best > 0 THEN 'es'
         |        ELSE 'und' END) AS pred_lang
         |FROM (SELECT lang,
         |  $hitCols
         |FROM documents)),
         |cells AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
         |  FROM p GROUP BY lang, pred_lang),
         |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS gold_total
         |  FROM cells GROUP BY lang)
         |SELECT cells.lang AS lang, pred_lang, n, gold_total,
         |  (n * 10000) // gold_total AS share4,
         |  cells.lang = pred_lang AS is_correct
         |FROM cells JOIN tot ON cells.lang = tot.lang
         |ORDER BY lang, pred_lang""".stripMargin
    },

    "tx_fingerprint" ->
      s"""WITH fp AS (SELECT doc_id,
         |  (CASE WHEN len(th) > 4194304 THEN NULL ELSE ${S.fingerprint("th")} END) AS fp
         |  FROM (SELECT doc_id, ${S.tokenHashes("text")} AS th FROM documents))
         |SELECT doc_id, fp, n_same_fp FROM fp
         |JOIN (SELECT fp, count(*) AS n_same_fp FROM fp GROUP BY fp) USING (fp)
         |ORDER BY doc_id""".stripMargin,

    "tx_ngram_stats" ->
      s"""SELECT doc_id,
         |  CAST(CASE WHEN len(toks) < 2 THEN 0 ELSE len(toks) - 1 END AS BIGINT) AS n_bigrams,
         |  CAST(len(list_distinct(CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[]) ELSE
         |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) END)) AS BIGINT) AS n_uniq_bigrams,
         |  CAST(len(${S.shingles("th")}) AS BIGINT) AS n_shingles
         |FROM (SELECT doc_id, ${S.tokens("text")} AS toks, ${S.tokenHashes("text")} AS th FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "tx_sparse_cosine" ->
      s"""WITH tk AS (SELECT doc_id, ${S.tokens("text")} AS toks FROM documents),
         |bg AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[]) ELSE
         |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) END) AS term FROM tk),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM bg GROUP BY 1, 2),
         |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |tot AS (SELECT count(*) AS n_docs FROM documents),
         |w AS (SELECT doc_id, term, tf * ln(CAST(n_docs AS DOUBLE) / df) AS w
         |      FROM tf JOIN dfx USING (term) CROSS JOIN tot
         |      WHERE df >= 2 AND df * 40 <= n_docs),
         |nrm AS (SELECT doc_id, sqrt(${S.qsum("w * w")}) AS nn FROM w GROUP BY doc_id),
         |dots AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_shared, ${S.qsum("x.w * y.w")} AS dot
         |         FROM w x JOIN w y ON x.term = y.term AND x.doc_id < y.doc_id GROUP BY 1, 2)
         |SELECT a, b, n_shared, cos FROM (
         |  SELECT a, b, n_shared, round(dot / (na.nn * nb.nn), 4) AS cos
         |  FROM dots JOIN nrm na ON na.doc_id = a JOIN nrm nb ON nb.doc_id = b)
         |WHERE cos >= 0.5 ORDER BY a, b""".stripMargin,

    "tx_edit_distance" ->
      """SELECT a.doc_id, CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist,
        |  CAST(abs(length(a.text) - length(b.text)) AS BIGINT) AS len_delta,
        |  CAST(CASE WHEN levenshtein(a.text, b.text) > 8 THEN -1
        |       ELSE levenshtein(a.text, b.text) END AS BIGINT) AS dist_within8
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id % 5 = 0
        |ORDER BY a.doc_id""".stripMargin,

    "arr_ops" ->
      """SELECT vec_id, CAST(idx AS BIGINT) AS idx,
        |  (list_sort(list_slice(list_reverse(list_transform(embedding, x -> CAST(x AS DOUBLE))), 1, 8)))[CAST(idx AS INTEGER)] AS val
        |FROM embeddings, generate_series(1, 8) t(idx)
        |ORDER BY vec_id, idx""".stripMargin,

    "tx_regex_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_word_runs,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]+')) AS BIGINT) AS n_other_runs,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) + len(regexp_extract_all(text, '[0-9]+'))
        |    + len(regexp_extract_all(text, '[^A-Za-z0-9 ]+')) AS BIGINT) AS est_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "tx_split_assign" ->
      """SELECT lang, split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM (SELECT lang, n_chars,
        |        (CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END) AS split
        |      FROM (SELECT lang, n_chars, (doc_id % 1000000007) * 2654435761 % 1000000007 % 100 AS b
        |            FROM documents))
        |GROUP BY lang, split ORDER BY lang, split""".stripMargin,

    "tx_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, unnest(${S.tokens("text")}) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
         |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |tot AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT doc_id, term, tf, df, round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
         |FROM tf JOIN dfx USING (term) CROSS JOIN tot
         |WHERE doc_id <= 100
         |ORDER BY doc_id, term""".stripMargin,

    "tx_sample_stratified" ->
      """SELECT lang, count(*) AS n_sampled, CAST(sum(n_chars) AS BIGINT) AS chars_sampled
        |FROM (SELECT lang, n_chars,
        |        (doc_id % 1000000007) * 2654435769 % 1000000007 % 100 AS b
        |      FROM documents)
        |WHERE b < (CASE WHEN lang = 'en' THEN 20 ELSE 10 END)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "tx_redact" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\b(customer|spark|vector)\b')) AS BIGINT) AS n_masked,
        |  CAST(length(regexp_replace(text, '\b(customer|spark|vector)\b', '<ENT>', 'g')) AS BIGINT) AS redacted_len,
        |  md5(regexp_replace(text, '\b(customer|spark|vector)\b', '<ENT>', 'g')) AS redacted_hash
        |FROM documents
        |WHERE len(regexp_extract_all(text, '\b(customer|spark|vector)\b')) > 0
        |ORDER BY doc_id""".stripMargin,

    "tx_corpus_profile" ->
      s"""SELECT lang, source, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  round(avg(n_tokens), 4) AS avg_tokens,
         |  max(n_chars) AS max_chars
         |FROM (SELECT lang, source, n_chars, CAST(len(${S.tokens("text")}) AS BIGINT) AS n_tokens FROM documents)
         |GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "tx_vocab_topk" ->
      s"""SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
         |FROM (SELECT doc_id, unnest(${S.tokens("text")}) AS tok FROM documents)
         |GROUP BY tok ORDER BY tf DESC, tok ASC LIMIT 25""".stripMargin,

    // one divide on exact BIGINTs; same df floor, same total order
    "tx_burstiness" ->
      s"""SELECT tok, cf, df, round(CAST(cf AS DOUBLE) / df, 4) AS burst
         |FROM (SELECT tok, count(*) AS cf, count(DISTINCT doc_id) AS df
         |      FROM (SELECT doc_id, unnest(${S.tokens("text")}) AS tok FROM documents)
         |      GROUP BY tok)
         |WHERE df >= 5
         |ORDER BY burst DESC, tok ASC LIMIT 20""".stripMargin,

    "tx_bpe_first_merge" ->
      s"""WITH words AS (SELECT unnest(${S.tokens("text")}) AS tok FROM documents),
         |pairs AS (SELECT unnest(CASE WHEN len(cs) < 2 THEN CAST([] AS VARCHAR[]) ELSE
         |    list_transform(range(1, len(cs)), i -> cs[i] || ' ' || cs[i+1]) END) AS pair
         |  FROM (SELECT string_split(tok, '') AS cs FROM words))
         |SELECT pair, count(*) AS n FROM pairs
         |GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 10""".stripMargin,

    // five unrolled BPE rounds: words{i} is the word-frequency table after
    // merge i; win{i} the round's (count desc, pair asc) argmax; the
    // rewrite is the leftmost-greedy fold described at the query site
    // the unigram trainer replayed end-to-end: identical word histogram,
    // substring candidates, capped vocab, micro-nat costs, and — the
    // heart — the Viterbi DP unrolled POSITIONALLY (best prefix state per
    // (word, j) via min over the ≤4 in-vocab extensions, tie-broken
    // ORDER BY cost, np, i exactly like the engine's (cost, pieces,
    // longest-final-piece) rule) with a 10-step backwalk re-deriving the
    // chosen pieces, per EM round; all BIGINT arithmetic except the one
    // -ln per piece (the lpu precedent)
    "tx_unigram_tokenizer" -> {
      val maxPiece = 4
      val minFreq = 20
      val capV = 2000
      def dpRound(r: Int, cost: String): String = {
        val b0 = s"b${r}_0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS cost, 0 AS np, 0 AS i FROM wc)"
        val steps = (1 to 10).map { j =>
          val branches = (math.max(0, j - maxPiece) until j).map { i =>
            s"""SELECT b.word, b.cost + c.cost AS cost, b.np + 1 AS np, $i AS i
               |      FROM b${r}_$i b JOIN $cost c ON c.piece = substr(b.word, ${i + 1}, ${j - i})
               |      WHERE length(b.word) >= $j""".stripMargin
          }.mkString("\n      UNION ALL ")
          s"""b${r}_$j AS MATERIALIZED (SELECT word, cost, np, i FROM (
             |  SELECT word, cost, np, i,
             |    row_number() OVER (PARTITION BY word ORDER BY cost, np, i) AS rn
             |  FROM ($branches)) WHERE rn = 1)""".stripMargin
        }
        val bb = s"bb$r AS MATERIALIZED (" +
          (1 to 10).map(j => s"SELECT word, $j AS j, i FROM b${r}_$j")
            .mkString(" UNION ALL ") + ")"
        val walks = (1 to 10).map { w =>
          val prev =
            if (w == 1) "(SELECT word, length(word) AS j FROM wc)"
            else s"(SELECT word, j FROM wk${r}_${w - 1} WHERE j > 0)"
          s"""wk${r}_$w AS MATERIALIZED (SELECT w.word, b.i AS j,
             |  substr(w.word, b.i + 1, w.j - b.i) AS piece
             |  FROM $prev w JOIN bb$r b ON b.word = w.word AND b.j = w.j)""".stripMargin
        }
        val seg = s"seg$r AS MATERIALIZED (" +
          (1 to 10).map(w => s"SELECT word, piece FROM wk${r}_$w")
            .mkString(" UNION ALL ") + ")"
        val usage = s"""usage$r AS MATERIALIZED (SELECT piece, CAST(sum(c.cnt) AS BIGINT) AS n_uses
           |  FROM seg$r s JOIN wc c USING (word) GROUP BY 1)""".stripMargin
        (Seq(b0) ++ steps ++ Seq(bb) ++ walks ++ Seq(seg, usage)).mkString(",\n")
      }
      def rep(r: Int) =
        s"""(SELECT CAST($r AS BIGINT) AS round,
           |  CAST(row_number() OVER (ORDER BY n_uses DESC, piece) AS BIGINT) AS rank,
           |  piece, n_uses,
           |  CAST(floor(n_uses * 1000000.0 /
           |    (SELECT sum(n_uses) FROM usage$r) + 0.5) AS BIGINT) AS prob_micro
           |  FROM usage$r WHERE length(piece) > 1)""".stripMargin
      s"""WITH wc AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word FROM documents)
         |  WHERE length(word) BETWEEN 1 AND 10 GROUP BY 1),
         |sub AS MATERIALIZED (SELECT substr(word, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece, cnt
         |  FROM wc, range(1, 11) s(i), range(1, ${maxPiece + 1}) t(l)
         |  WHERE i <= length(word) AND i + l <= length(word) + 1),
         |pf AS MATERIALIZED (SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq FROM sub GROUP BY 1),
         |vocab1 AS MATERIALIZED (SELECT piece, freq FROM (
         |    SELECT piece, freq, row_number() OVER (ORDER BY freq DESC, piece) AS rk
         |    FROM pf WHERE length(piece) > 1 AND freq >= $minFreq) WHERE rk <= $capV
         |  UNION ALL SELECT piece, freq FROM pf WHERE length(piece) = 1),
         |c1 AS MATERIALIZED (SELECT piece, CAST(round(-ln(CAST(freq AS DOUBLE) /
         |    (SELECT CAST(sum(freq) AS DOUBLE) FROM vocab1)) * 1000000) AS BIGINT) AS cost
         |  FROM vocab1),
         |${dpRound(1, "c1")},
         |vocab2 AS MATERIALIZED (SELECT piece, n_uses AS freq FROM (
         |    SELECT piece, n_uses, row_number() OVER (ORDER BY n_uses DESC, piece) AS rk
         |    FROM usage1 WHERE length(piece) > 1 AND n_uses >= $minFreq) WHERE rk <= $capV
         |  UNION ALL
         |  SELECT v.piece, coalesce(u.n_uses, 1) AS freq
         |  FROM (SELECT piece FROM vocab1 WHERE length(piece) = 1) v
         |  LEFT JOIN usage1 u ON u.piece = v.piece),
         |c2 AS MATERIALIZED (SELECT piece, CAST(round(-ln(CAST(freq AS DOUBLE) /
         |    (SELECT CAST(sum(freq) AS DOUBLE) FROM vocab2)) * 1000000) AS BIGINT) AS cost
         |  FROM vocab2),
         |${dpRound(2, "c2")}
         |SELECT round, rank, piece, n_uses, prob_micro FROM (
         |  SELECT * FROM ${rep(1)} t1 WHERE rank <= 15
         |  UNION ALL SELECT * FROM ${rep(2)} t2 WHERE rank <= 15)
         |ORDER BY round, rank""".stripMargin
    },

    "tx_bpe_merges" -> {
      def rnd(i: Int) =
        s"""pairs$i AS (SELECT pair, sum(freq) AS n FROM (
           |    SELECT unnest(CASE WHEN len(syms) < 2 THEN CAST([] AS VARCHAR[]) ELSE
           |      list_transform(range(1, len(syms)), j -> syms[j] || ' ' || syms[j+1]) END) AS pair, freq
           |    FROM words${i - 1}) GROUP BY pair),
           |win$i AS (SELECT string_split(pair, ' ')[1] AS a, string_split(pair, ' ')[2] AS b, n
           |  FROM pairs$i ORDER BY n DESC, pair ASC LIMIT 1),
           |words$i AS (SELECT list_reduce(
           |    list_prepend(CAST([] AS VARCHAR[]), list_transform(syms, s -> [s])),
           |    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = w.a AND x[1] = w.b
           |                THEN list_concat(acc[1:len(acc)-1], [w.a || w.b])
           |                ELSE list_concat(acc, x) END) AS syms, freq
           |  FROM words${i - 1} CROSS JOIN win$i w)"""
      s"""WITH words0 AS (SELECT string_split(word, '') AS syms, count(*) AS freq
         |  FROM (SELECT unnest(${S.tokens("text")}) AS word FROM documents) GROUP BY word),
         |${(1 to 5).map(rnd).mkString(",\n")}
         |${(1 to 5).map(i =>
             s"SELECT CAST($i AS BIGINT) AS merge_rank, a AS lhs, b AS rhs, CAST(n AS BIGINT) AS n FROM win$i")
           .mkString("\nUNION ALL ")}
         |ORDER BY merge_rank""".stripMargin
    },

    // encode = the same five training CTEs (win1..win5 joined in as
    // scalars) + per-word sequential replay: each round's fold is the
    // list_reduce-with-prepended-init trick from tx_bpe_merges, nested so
    // round i consumes round i-1's output; lambda vars are suffixed per
    // level (a1/x1..a5/x5) so no binder is ever shadowed
    "tx_bpe_encode" ->
      s"""WITH $bpeTrainCtes,
         |tl AS (SELECT doc_id, ${S.tokens("text")} AS toks FROM documents),
         |encd AS (SELECT doc_id, flatten(list_transform(toks, w -> $bpeEnc)) AS flat
         |  FROM tl CROSS JOIN win1 w1 CROSS JOIN win2 w2 CROSS JOIN win3 w3
         |          CROSS JOIN win4 w4 CROSS JOIN win5 w5)
         |SELECT doc_id, CAST(len(flat) AS BIGINT) AS n_tokens,
         |  array_to_string(flat, ' ') AS tokens
         |FROM encd ORDER BY doc_id""".stripMargin,

    // the same training CTEs; each sweep row re-encodes the distinct-word
    // table with the first k win scalars only (prefix-k ≡ training at k)
    "tx_bpe_sweep" -> {
      def encK(k: Int) =
        (1 to k).foldLeft("string_split(w, '')")((inner, i) => bpeFold(i, inner))
      def wins(k: Int) =
        (1 to k).map(i => s"CROSS JOIN win$i w$i").mkString(" ")
      val rows = Seq(1, 3, 5).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS n_merges,
           |  (SELECT CAST(sum(occ) AS BIGINT) FROM ek$k) AS n_words,
           |  (SELECT CAST(sum(occ * len(enc)) AS BIGINT) FROM ek$k) AS n_pieces,
           |  (SELECT CAST(count(DISTINCT p) AS BIGINT)
           |     FROM (SELECT unnest(enc) AS p FROM ek$k)) AS n_distinct_pieces,
           |  round((SELECT CAST(sum(occ * len(enc)) AS DOUBLE) FROM ek$k)
           |    / (SELECT sum(occ) FROM ek$k), 4) AS fertility""".stripMargin
      }
      val eks = Seq(1, 3, 5).map { k =>
        s"ek$k AS (SELECT occ, ${encK(k)} AS enc FROM vocab ${wins(k)})"
      }
      s"""WITH $bpeTrainCtes,
         |vocab AS (SELECT w, count(*) AS occ
         |  FROM (SELECT unnest(${S.tokens("text")}) AS w FROM documents) GROUP BY w),
         |${eks.mkString(",\n")}
         |${rows.mkString("\nUNION ALL\n")}
         |ORDER BY n_merges""".stripMargin
    },

    // the IDENTICAL 5-round training+replay oracle gates the trie encode
    // (with the same min_count training floor the Spark side enforces):
    // the mapPartitions rank-priority path must agree with DuckDB's
    // sequential merge replay byte-for-byte, or training (trainLocal) or
    // encode (encodeWord) drifted from the declarative semantics
    "tx_bpe_encode_trie" ->
      s"""WITH $bpeTrainCtesFloored,
         |tl AS (SELECT doc_id, ${S.tokens("text")} AS toks FROM documents),
         |encd AS (SELECT doc_id, flatten(list_transform(toks, w -> $bpeEnc)) AS flat
         |  FROM tl CROSS JOIN win1 w1 CROSS JOIN win2 w2 CROSS JOIN win3 w3
         |          CROSS JOIN win4 w4 CROSS JOIN win5 w5)
         |SELECT doc_id, CAST(len(flat) AS BIGINT) AS n_tokens,
         |  array_to_string(flat, ' ') AS tokens
         |FROM encd ORDER BY doc_id""".stripMargin,

    // production-k face: every oracle-computable quantity exact (counts +
    // the floored vocabulary size), the k-dependent encode gated by the
    // in-query invariants asserted literally TRUE — the sketch_* pattern
    // n_tokens = the word-occurrence count: k=500 exhausts this corpus's
    // training vocabulary (full collapse — BpeSpec pins exhaustion), so
    // every in-vocabulary word must encode to exactly one piece; the
    // invariant booleans are asserted literally TRUE (sketch_* pattern)
    "tx_bpe_encode_k500" ->
      s"""WITH occ AS (SELECT unnest(${S.tokens("text")}) AS w FROM documents)
         |SELECT (SELECT count(*) FROM documents) AS n_docs,
         |  (SELECT count(*) FROM occ) AS n_words,
         |  (SELECT CAST(sum(length(w)) AS BIGINT) FROM occ) AS n_word_chars,
         |  (SELECT count(*) FROM (SELECT w FROM occ GROUP BY w
         |     HAVING count(*) >= $BpeMinCount)) AS n_vocab_collected,
         |  (SELECT count(*) FROM occ) AS n_tokens,
         |  TRUE AS reconstruct_ok,
         |  TRUE AS tokens_within_bounds,
         |  TRUE AS compresses""".stripMargin,

    // same training CTEs + per-occurrence replay, rolled up per source
    "tx_bpe_fertility" ->
      s"""WITH $bpeTrainCtes,
         |tl AS (SELECT source, unnest(${S.tokens("text")}) AS w FROM documents),
         |encd AS (SELECT source, CAST(len($bpeEnc) AS BIGINT) AS np
         |  FROM tl CROSS JOIN win1 w1 CROSS JOIN win2 w2 CROSS JOIN win3 w3
         |          CROSS JOIN win4 w4 CROSS JOIN win5 w5)
         |SELECT source, count(*) AS n_words, CAST(sum(np) AS BIGINT) AS n_pieces,
         |  round(CAST(sum(np) AS DOUBLE) / count(*), 4) AS fertility
         |FROM encd GROUP BY source ORDER BY source""".stripMargin,

    "tx_unigram_logprob" ->
      s"""WITH tl AS (SELECT doc_id, ${S.tokens("text")} AS toks FROM documents),
         |toks AS (SELECT doc_id, unnest(toks) AS tok FROM tl),
         |uni AS (SELECT tok, count(*) AS uc FROM toks GROUP BY tok),
         |tot AS (SELECT CAST(sum(uc) AS DOUBLE) AS t_uni FROM uni)
         |SELECT doc_id, count(*) AS n_tokens,
         |  round(avg(-ln(uc / t_uni)), 4) AS avg_nll
         |FROM toks JOIN uni USING (tok) CROSS JOIN tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "tx_collocations" ->
      s"""WITH tl AS (SELECT doc_id, ${S.tokens("text")} AS toks FROM documents),
         |uni AS (SELECT tok, count(*) AS uc
         |  FROM (SELECT unnest(toks) AS tok FROM tl) GROUP BY tok),
         |bga AS (SELECT bg, count(*) AS bc
         |  FROM (SELECT unnest(CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[]) ELSE
         |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) END) AS bg
         |  FROM tl) GROUP BY bg),
         |tots AS (SELECT (SELECT CAST(sum(uc) AS DOUBLE) FROM uni) AS t_uni,
         |                (SELECT CAST(sum(bc) AS DOUBLE) FROM bga) AS t_bg)
         |SELECT w1, w2, bc AS pair_count,
         |  round(ln((bc / t_bg) / ((c1.uc / t_uni) * (c2.uc / t_uni))), 4) AS pmi
         |FROM (SELECT bg, bc, string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
         |      FROM bga WHERE bc >= 5) b
         |JOIN uni c1 ON b.w1 = c1.tok
         |JOIN uni c2 ON b.w2 = c2.tok
         |CROSS JOIN tots
         |ORDER BY pair_count DESC, w1, w2 LIMIT 25""".stripMargin,

    "tx_repetition" ->
      s"""WITH tl AS (SELECT doc_id, ${S.tokens("text")} AS toks FROM documents),
         |toks AS (SELECT doc_id, unnest(toks) AS tok FROM tl),
         |tc AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_tok, CAST(sum(c) AS BIGINT) AS n_tokens
         |  FROM (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok) GROUP BY doc_id),
         |bgs AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[]) ELSE
         |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) END) AS bg FROM tl),
         |bc AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bg, CAST(sum(c) AS BIGINT) AS n_bigrams
         |  FROM (SELECT doc_id, bg, count(*) AS c FROM bgs GROUP BY doc_id, bg) GROUP BY doc_id)
         |SELECT tc.doc_id, n_tokens,
         |  round(CAST(top_tok AS DOUBLE) / n_tokens, 4) AS top_token_ratio,
         |  n_bigrams,
         |  round(CAST(top_bg AS DOUBLE) / n_bigrams, 4) AS top_bigram_ratio,
         |  coalesce(round(CAST(top_bg AS DOUBLE) / n_bigrams, 4) > 0.18,
         |           round(CAST(top_tok AS DOUBLE) / n_tokens, 4) > 0.3) AS is_repetitive
         |FROM tc LEFT JOIN bc ON tc.doc_id = bc.doc_id
         |ORDER BY tc.doc_id""".stripMargin,

    // single-pass twin of the two-level Spark plan: the shard-local prune
    // keeps a proven superset of the global budget prefix, so the oracle
    // only needs the global pass (integer cumsum, unique tie-break)
    "tx_budget_trim" ->
      s"""WITH st AS (SELECT doc_id, source,
         |    CAST(len(${S.tokens("text")}) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(${S.tokens("text")})) AS BIGINT) AS n_uniq
         |  FROM documents),
         |c AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY source
         |    ORDER BY n_uniq DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM st)
         |SELECT source, doc_id, n_tokens, n_uniq, cum_tokens FROM c
         |WHERE cum_tokens <= 800 ORDER BY source, cum_tokens, doc_id""".stripMargin,

    "tx_pack_greedy" ->
      s"""WITH tc AS (SELECT doc_id, doc_id % 32 AS shard,
         |    CAST(len(${S.tokens("text")}) AS BIGINT) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, shard, n_tokens,
         |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM tc)
         |SELECT shard, CAST(floor(cum_before / 256.0) AS BIGINT) AS chunk_id,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY shard, chunk_id ORDER BY shard, chunk_id""".stripMargin,

    "tx_bm25" ->
      s"""WITH dl AS (SELECT doc_id, CAST(len(${S.tokens("text")}) AS DOUBLE) AS dl FROM documents),
         |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, tok, count(*) AS tf
         |       FROM (SELECT doc_id, unnest(${S.tokens("text")}) AS tok FROM documents)
         |       WHERE tok IN ('spark', 'data', 'join') GROUP BY doc_id, tok),
         |dfx AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok)
         |SELECT doc_id,
         |  round(sum(ln((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)) + 1) *
         |    tf * CAST(2.2 AS DOUBLE) /
         |    (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl))), 4) AS bm25,
         |  count(*) AS n_terms_hit
         |FROM tf JOIN dfx USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
         |GROUP BY doc_id
         |ORDER BY bm25 DESC, doc_id ASC LIMIT 20""".stripMargin,

    "tx_source_mixture" ->
      """WITH per AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars
        |  FROM documents GROUP BY source),
        |z AS (SELECT sum(pow(CAST(total_chars AS DOUBLE), 0.7)) AS z FROM per)
        |SELECT source, n_docs, total_chars,
        |  round(pow(CAST(total_chars AS DOUBLE), 0.7) / z, 4) AS weight
        |FROM per CROSS JOIN z ORDER BY source""".stripMargin,

    // quadratic-mix id hash (m·A + m²·B mod P — see the query comment for
    // why linear aliases per-source id patterns); the keep cutoff and both
    // reported ratios round in INTEGER arithmetic (// on positive BIGINTs
    // == Spark's div here), so no float round() exists to diverge
    "tx_mixture_resample" ->
      """WITH docs AS (SELECT doc_id, source,
        |    CAST(substr(source, 4) AS BIGINT) + 1 AS tw FROM documents),
        |per AS (SELECT source, count(*) AS n_docs, max(tw) AS tw FROM docs GROUP BY source),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |        CAST(sum(tw) AS BIGINT) AS z FROM per),
        |wp AS (SELECT source, n_docs, tw, n_total, z,
        |    least(10000, (tw * n_total * 10000) // (z * n_docs)) AS cut
        |  FROM per CROSS JOIN tot),
        |kept AS (SELECT d.source, count(*) AS n_kept
        |  FROM docs d JOIN wp ON d.source = wp.source
        |  WHERE ((d.doc_id % 1000000007) * 2654435761
        |         + ((d.doc_id % 1000000007) * (d.doc_id % 1000000007) % 1000000007) * 2246822519)
        |        % 1000000007 % 10000 < cut
        |  GROUP BY d.source),
        |kt AS (SELECT CAST(sum(n_kept) AS BIGINT) AS k_total FROM kept)
        |SELECT wp.source AS source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(least(10000, (tw * n_total * 20000 + z * n_docs) // (z * n_docs * 2)) AS DOUBLE) / 10000.0 AS p_keep,
        |  CAST((coalesce(n_kept, 0) * 20000 + k_total) // (k_total * 2) AS DOUBLE) / 10000.0 AS realized_share
        |FROM wp LEFT JOIN kept ON kept.source = wp.source CROSS JOIN kt
        |ORDER BY source""".stripMargin,

    // the same hashed-bigram feature chain (131-fold mod P, mod 4096),
    // the same add-1-smoothed ratio of two correctly-rounded divides of
    // exact integers under ln (DuckDB ln = natural log; its `log` is
    // log10), qround-ed to 6; the weight is the qsum twin so partial
    // merge order cannot move it
    "tx_dsir_weights" ->
      s"""WITH th AS (SELECT doc_id, lang, source, ${S.tokenHashes("text")} AS th FROM documents),
         |f AS (SELECT doc_id, lang, source,
         |    unnest(list_transform(range(1, len(th)),
         |      i -> ((th[i]*131 + th[i+1]) % ${S.P}) % 4096)) AS b FROM th),
         |bucket AS (SELECT b, count(*) AS cq,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
         |  FROM f GROUP BY b),
         |tot AS (SELECT CAST(sum(cq) AS BIGINT) AS q_tot,
         |        CAST(sum(ct) AS BIGINT) AS t_tot FROM bucket),
         |lr AS (SELECT b, ${S.qround(
               "ln((CAST(ct + 1 AS DOUBLE) / CAST(t_tot + 4096 AS DOUBLE)) / " +
               "(CAST(cq + 1 AS DOUBLE) / CAST(q_tot + 4096 AS DOUBLE)))", 6)} AS lr
         |  FROM bucket CROSS JOIN tot),
         |pb AS (SELECT doc_id, lang, source, b, count(*) AS c
         |  FROM f GROUP BY doc_id, lang, source, b)
         |SELECT doc_id, lang, source, CAST(sum(c) AS BIGINT) AS n_bigrams,
         |  ${S.qround(S.qsum("c * lr", 30), 4)} AS w
         |FROM pb JOIN lr USING (b)
         |GROUP BY doc_id, lang, source
         |ORDER BY w DESC, doc_id ASC LIMIT 15""".stripMargin,

    // same exact-integer TTR; extremes via row_number windows with the
    // identical (score DESC|ASC, doc_id ASC) tie orders the struct-agg
    // encodes on the Spark side
    "tx_preference_pairs" ->
      s"""WITH f AS (SELECT doc_id, source,
         |    CAST(len(${S.tokens("text")}) AS BIGINT) AS nt,
         |    CAST(len(list_distinct(${S.tokens("text")})) AS BIGINT) AS nu
         |  FROM documents),
         |sc AS (SELECT doc_id, source, (nu * 10000) // nt AS ttr4
         |  FROM f WHERE nt >= 1),
         |b AS (SELECT source, doc_id AS chosen_doc, ttr4 AS chosen_ttr4 FROM (
         |    SELECT *, row_number() OVER
         |      (PARTITION BY source ORDER BY ttr4 DESC, doc_id ASC) AS rn FROM sc)
         |  WHERE rn = 1),
         |w AS (SELECT source, doc_id AS rejected_doc, ttr4 AS rejected_ttr4 FROM (
         |    SELECT *, row_number() OVER
         |      (PARTITION BY source ORDER BY ttr4 ASC, doc_id ASC) AS rn FROM sc)
         |  WHERE rn = 1),
         |n AS (SELECT source, count(*) AS n_docs FROM sc GROUP BY source)
         |SELECT b.source AS source, chosen_doc, chosen_ttr4,
         |  rejected_doc, rejected_ttr4,
         |  chosen_ttr4 - rejected_ttr4 AS margin4, n_docs
         |FROM b JOIN w ON b.source = w.source JOIN n ON b.source = n.source
         |ORDER BY source""".stripMargin,

    // identical integer confusion-cell arithmetic; kappa4 is the same
    // half-away-from-zero CASE on (n·agree − pe_num)/(n² − pe_num)
    "tx_annotator_kappa" ->
      s"""WITH f AS (SELECT lang, n_chars,
         |    CAST(len(${S.tokens("text")}) AS BIGINT) AS nt,
         |    CAST(len(list_distinct(${S.tokens("text")})) AS BIGINT) AS nu
         |  FROM documents),
         |l AS (SELECT lang,
         |    CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS la,
         |    CASE WHEN (nu * 10000) // nt >= 5000 THEN 1 ELSE 0 END AS lb
         |  FROM f WHERE nt >= 1),
         |g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(la * lb) AS BIGINT) AS n_both,
         |    CAST(sum((1 - la) * (1 - lb)) AS BIGINT) AS n_neither,
         |    CAST(sum(la) AS BIGINT) AS a_keep,
         |    CAST(sum(lb) AS BIGINT) AS b_keep
         |  FROM l GROUP BY lang),
         |k AS (SELECT lang, n_docs, n_both + n_neither AS agree,
         |    a_keep, b_keep,
         |    a_keep * b_keep + (n_docs - a_keep) * (n_docs - b_keep) AS pe_num
         |  FROM g)
         |SELECT lang, n_docs, agree, a_keep, b_keep,
         |  (agree * 20000 + n_docs) // (n_docs * 2) AS po4,
         |  (pe_num * 20000 + n_docs * n_docs) // (n_docs * n_docs * 2) AS pe4,
         |  CASE WHEN n_docs * n_docs - pe_num = 0 THEN NULL
         |       WHEN n_docs * agree - pe_num >= 0 THEN
         |         ((n_docs * agree - pe_num) * 20000 + (n_docs * n_docs - pe_num))
         |           // ((n_docs * n_docs - pe_num) * 2)
         |       ELSE -((-(n_docs * agree - pe_num) * 20000 + (n_docs * n_docs - pe_num))
         |           // ((n_docs * n_docs - pe_num) * 2))
         |  END AS kappa4
         |FROM k ORDER BY lang""".stripMargin,

    // same pairing windows and the same length-of-concat arithmetic —
    // the template literals appear once per engine, never as counted
    // constants
    "tx_chat_template" ->
      s"""WITH p AS (SELECT doc_id, source, text,
         |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
         |    lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS asst_doc,
         |    lead(text) OVER (PARTITION BY source ORDER BY doc_id) AS asst_text
         |  FROM documents),
         |c AS (SELECT doc_id AS user_doc, source, asst_doc,
         |    CAST(length('<|system|> pipeline demo <|user|> ' || text
         |      || ' <|assistant|> ') AS BIGINT) AS mask_start,
         |    CAST(length(asst_text) AS BIGINT) AS masked_chars
         |  FROM p WHERE rn % 2 = 1 AND asst_doc IS NOT NULL)
         |SELECT user_doc, source, asst_doc,
         |  mask_start + masked_chars + CAST(length(' <|end|>') AS BIGINT)
         |    AS rendered_chars,
         |  mask_start, mask_start + masked_chars AS mask_end, masked_chars,
         |  (masked_chars * 10000)
         |    // (mask_start + masked_chars + CAST(length(' <|end|>') AS BIGINT))
         |    AS loss_frac4
         |FROM c ORDER BY user_doc""".stripMargin,

    // identical feature subquery to tx_quality; the logit is the same exact
    // Long numerator over 100000*n_tokens — one integer-exact divide, and
    // keep is a pure integer compare (no float in the decision)
    "tx_quality_model" ->
      s"""WITH w AS (SELECT CAST(-150 AS BIGINT) AS w0c, CAST(200 AS BIGINT) AS w_lenc,
         |            CAST(-300 AS BIGINT) AS w_stopc, CAST(250 AS BIGINT) AS w_uniqc,
         |            CAST(15 AS BIGINT) AS w_atlc),
         |f AS (SELECT doc_id,
         |        CAST(len(${S.tokens("text")}) AS BIGINT) AS n_tokens,
         |        CAST(len(list_distinct(${S.tokens("text")})) AS BIGINT) AS n_uniq,
         |        list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(${S.tokens("text")}, w -> CAST(length(w) AS BIGINT))), (a, x) -> a + x) AS sum_len,
         |        ${S.stopHits("text", graft.engine.TextFunctions.langStopwords.head._2)} AS n_stop
         |      FROM documents),
         |sc AS (SELECT doc_id, n_tokens, 100000 * n_tokens AS den,
         |    1000 * n_tokens * w0c
         |      + w_lenc * least(n_tokens, 1000) * n_tokens
         |      + 1000 * (w_stopc * n_stop + w_uniqc * n_uniq + w_atlc * sum_len) AS num
         |  FROM f CROSS JOIN w)
         |SELECT doc_id,
         |  CAST(CASE WHEN num >= 0 THEN (num * 20000 + den) // (den * 2)
         |       ELSE -((-num * 20000 + den) // (den * 2)) END AS DOUBLE) / 10000.0 AS score,
         |  num > 50000 * n_tokens AS keep
         |FROM sc ORDER BY doc_id""".stripMargin,

    // identical feature/score CTE; the shifted floor division makes
    // DuckDB's // and Spark's div agree on every (possibly negative) s4
    "tx_calibration_bins" ->
      s"""WITH w AS (SELECT CAST(-150 AS BIGINT) AS w0c, CAST(200 AS BIGINT) AS w_lenc,
         |            CAST(-300 AS BIGINT) AS w_stopc, CAST(250 AS BIGINT) AS w_uniqc,
         |            CAST(15 AS BIGINT) AS w_atlc),
         |f AS (SELECT doc_id, n_chars,
         |        CAST(len(${S.tokens("text")}) AS BIGINT) AS n_tokens,
         |        CAST(len(list_distinct(${S.tokens("text")})) AS BIGINT) AS n_uniq,
         |        list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(${S.tokens("text")}, w -> CAST(length(w) AS BIGINT))), (a, x) -> a + x) AS sum_len,
         |        ${S.stopHits("text", graft.engine.TextFunctions.langStopwords.head._2)} AS n_stop
         |      FROM documents),
         |sc AS (SELECT n_chars, 100000 * n_tokens AS den,
         |    1000 * n_tokens * w0c
         |      + w_lenc * least(n_tokens, 1000) * n_tokens
         |      + 1000 * (w_stopc * n_stop + w_uniqc * n_uniq + w_atlc * sum_len) AS num
         |  FROM f CROSS JOIN w),
         |s4t AS (SELECT n_chars,
         |    CASE WHEN num >= 0 THEN (num * 20000 + den) // (den * 2)
         |         ELSE -((-num * 20000 + den) // (den * 2)) END AS s4
         |  FROM sc),
         |b AS (SELECT (s4 + 100000) // 1000 - 100 AS bin, s4,
         |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pos
         |  FROM s4t),
         |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(pos) AS BIGINT) AS n_pos,
         |    CAST(sum(s4) AS BIGINT) AS sum_s4
         |  FROM b GROUP BY bin),
         |p AS (SELECT bin, n_docs, n_pos,
         |    CASE WHEN sum_s4 >= 0 THEN (sum_s4 * 2 + n_docs) // (n_docs * 2)
         |         ELSE -((-sum_s4 * 2 + n_docs) // (n_docs * 2)) END AS pred4,
         |    (n_pos * 20000 + n_docs) // (n_docs * 2) AS obs4
         |  FROM g)
         |SELECT bin, n_docs, n_pos, pred4, obs4, abs(pred4 - obs4) AS gap4
         |FROM p ORDER BY bin""".stripMargin,

    // same DOUBLE-FOLD packed gram construction (the oracle mirrors the
    // hash, it does not independently re-derive string-gram semantics);
    // first-occurrence is min(doc_id) per gram
    "tx_ngram_novelty" ->
      s"""WITH g AS (
         |  SELECT doc_id, unnest(CASE WHEN len(th) < 3 THEN CAST([] AS BIGINT[])
         |    ELSE list_transform(range(1, len(th) - 1),
         |      i -> (((th[i] * 131 + th[i + 1]) % 1000000007 * 131 + th[i + 2]) % 1000000007) * 998244353
         |         + ((th[i] * 137 + th[i + 1]) % 998244353 * 137 + th[i + 2]) % 998244353) END) AS gram
         |  FROM (SELECT doc_id, ${S.tokenHashes("text")} AS th FROM documents)),
         |fs AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
         |SELECT doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  (CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) * 10000)
         |    // count(*) AS novelty4
         |FROM g JOIN fs USING (gram)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "tx_dup_ngram_fraction" ->
      s"""WITH g AS (
         |  SELECT doc_id, unnest(CASE WHEN len(toks) < 5 THEN CAST([] AS VARCHAR[])
         |    ELSE list_transform(range(1, len(toks) - 3), i -> array_to_string(toks[i:i+4], ' ')) END) AS gram
         |  FROM (SELECT doc_id, ${S.tokens("text")} AS toks FROM documents)),
         |dfreq AS (SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram)
         |SELECT doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
         |  round(avg(CAST(CASE WHEN df >= 2 THEN 1 ELSE 0 END AS DOUBLE)), 4) AS dup_fraction
         |FROM g JOIN dfreq USING (gram)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "tx_sample_weighted" ->
      """WITH scored AS (
        |  SELECT lang, doc_id, n_chars,
        |    CAST((doc_id % 1000000007) * 2654435761 % 1000000007 AS DOUBLE) / n_chars AS skey
        |  FROM documents),
        |r AS (SELECT lang, doc_id, n_chars, skey,
        |        row_number() OVER (PARTITION BY lang ORDER BY skey ASC, doc_id ASC) AS rnk
        |      FROM scored)
        |SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, n_chars, round(skey, 4) AS skey
        |FROM r WHERE rnk <= 3 ORDER BY lang, rnk""".stripMargin,

    "tx_token_entropy" ->
      s"""SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  n_distinct, round(ln(n_tokens) - sum_clnc / n_tokens, 4) AS entropy
         |FROM (SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct,
         |        ${S.qsum("c * ln(c)")} AS sum_clnc
         |      FROM (SELECT doc_id, tok, count(*) AS c
         |            FROM (SELECT doc_id, unnest(${S.tokens("text")}) AS tok FROM documents)
         |            GROUP BY doc_id, tok)
         |      GROUP BY doc_id)
         |ORDER BY doc_id""".stripMargin,

    "tx_zipf_fit" ->
      s"""WITH vocab AS (SELECT tok, count(*) AS freq
         |  FROM (SELECT unnest(${S.tokens("text")}) AS tok FROM documents) GROUP BY tok),
         |top AS (SELECT tok, freq FROM vocab ORDER BY freq DESC, tok ASC LIMIT 1000),
         |r AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, tok ASC) AS rnk FROM top)
         |SELECT count(*) AS n_terms,
         |  (round(regr_slope(ln(freq), ln(rnk)), 4) + 0.0) AS zipf_slope,
         |  round(regr_r2(ln(freq), ln(rnk)), 4) AS r2
         |FROM r""".stripMargin,

    "tx_fuzzy_join" ->
      """WITH k AS (SELECT doc_id, substr(text, 1, 8) AS blk,
        |    substr(text, 1, 32) AS pfx FROM documents)
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |  CAST(levenshtein(x.pfx, y.pfx) AS BIGINT) AS pdist
        |FROM k x JOIN k y ON x.blk = y.blk AND x.doc_id < y.doc_id
        |WHERE levenshtein(x.pfx, y.pfx) <= 6
        |ORDER BY a, b""".stripMargin,

    // same bigram counts; the 8 decode steps unroll as chained left joins
    // against the row_number-argmax successor table
    "tx_lm_generate" -> {
      val steps = (1 to 8).map { i =>
        s"""g$i AS (SELECT g.seed, coalesce(n.nxt, '</s>') AS cur,
           |  g.seq || ' ' || coalesce(n.nxt, '</s>') AS seq
           |  FROM g${i - 1} g LEFT JOIN nxt n ON g.cur = n.cur)""".stripMargin
      }
      s"""WITH tl AS (SELECT doc_id, ${S.tokens("text")} AS toks FROM documents),
         |bgs AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[]) ELSE
         |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) END) AS bg FROM tl),
         |ab AS (SELECT string_split(bg, ' ')[1] AS a, string_split(bg, ' ')[2] AS b FROM bgs),
         |cab AS (SELECT a, b, count(*) AS cab FROM ab GROUP BY a, b),
         |nxt AS (SELECT a AS cur, b AS nxt FROM (
         |    SELECT a, b, row_number() OVER (PARTITION BY a ORDER BY cab DESC, b ASC) AS rn
         |    FROM cab) WHERE rn = 1),
         |seeds AS (SELECT tok AS seed FROM (SELECT unnest(toks) AS tok FROM tl)
         |  GROUP BY tok ORDER BY count(*) DESC, tok ASC LIMIT 5),
         |g0 AS (SELECT seed, seed AS cur, seed AS seq FROM seeds),
         |${steps.mkString(",\n")}
         |SELECT seed, seq AS generated, CAST(8 AS BIGINT) AS n_steps
         |FROM g8 ORDER BY seed""".stripMargin
    },

    "tx_bigram_lm" ->
      s"""WITH tl AS (SELECT doc_id, ${S.tokens("text")} AS toks FROM documents),
         |bgs AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[]) ELSE
         |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) END) AS bg FROM tl),
         |ab AS (SELECT doc_id, string_split(bg, ' ')[1] AS a, string_split(bg, ' ')[2] AS b FROM bgs),
         |cab AS (SELECT a, b, count(*) AS cab FROM ab GROUP BY a, b),
         |ca AS (SELECT a, count(*) AS ca FROM ab GROUP BY a)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  ${S.qround(S.qmean("ln(CAST(cab AS DOUBLE) / ca)"), 4)} AS avg_logprob
         |FROM ab JOIN cab USING (a, b) JOIN ca USING (a)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "tx_kneser_ney" ->
      s"""WITH tl AS (SELECT ${S.tokens("text")} AS toks FROM documents),
         |bgs AS (SELECT unnest(CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[]) ELSE
         |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) END) AS bg FROM tl),
         |ab AS (SELECT string_split(bg, ' ')[1] AS a, string_split(bg, ' ')[2] AS b FROM bgs),
         |cab AS (SELECT a, b, count(*) AS cab FROM ab GROUP BY a, b),
         |ca AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca, count(*) AS n_follow FROM cab GROUP BY a),
         |cb AS (SELECT b, count(*) AS n_precede FROM cab GROUP BY b),
         |tot AS (SELECT count(*) AS n_types FROM cab)
         |SELECT a, b, cab,
         |  round(greatest(cab - 0.75, 0.0) / ca +
         |    (0.75 * n_follow / ca) * (n_precede / n_types), 6) AS pkn
         |FROM cab JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN tot
         |WHERE cab >= 5 ORDER BY a, b""".stripMargin,

    "tx_epoch_shuffle" ->
      """SELECT epoch, rnk, doc_id FROM (
        |  SELECT epoch, doc_id,
        |    row_number() OVER (PARTITION BY epoch ORDER BY p, doc_id) AS rnk
        |  FROM (SELECT doc_id, CAST(e AS BIGINT) AS epoch,
        |      ((doc_id + 1 + e * 1000003) * 2654435761 + 17) % 1000000007 AS p
        |    FROM documents CROSS JOIN (SELECT unnest([0, 1, 2]) AS e)))
        |WHERE rnk <= 10 ORDER BY epoch, rnk""".stripMargin,

    "tx_jsd_drift" ->
      s"""WITH toks AS (SELECT doc_id < 250 AS old_half, unnest(${S.tokens("text")}) AS tok
         |  FROM documents),
         |ca AS (SELECT tok, count(*) AS ca FROM toks WHERE old_half GROUP BY tok),
         |cb AS (SELECT tok, count(*) AS cb FROM toks WHERE NOT old_half GROUP BY tok),
         |j AS (SELECT coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
         |  FROM ca FULL OUTER JOIN cb USING (tok)),
         |tots AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
         |    CAST(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_old,
         |    CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_new,
         |    count(*) AS vocab_union
         |  FROM j),
         |terms AS (SELECT na, nb, vocab_old, vocab_new, vocab_union,
         |    (CASE WHEN pa > 0 THEN 0.5 * pa * ln(pa / m) ELSE 0.0 END) +
         |    (CASE WHEN pb > 0 THEN 0.5 * pb * ln(pb / m) ELSE 0.0 END) AS term
         |  FROM (SELECT na, nb, vocab_old, vocab_new, vocab_union,
         |      pa, pb, (pa + pb) / 2 AS m
         |    FROM (SELECT na, nb, vocab_old, vocab_new, vocab_union,
         |        CAST(ca AS DOUBLE) / na AS pa, CAST(cb AS DOUBLE) / nb AS pb
         |      FROM j CROSS JOIN tots)))
         |SELECT na AS n_tokens_old, nb AS n_tokens_new,
         |  vocab_old, vocab_new, vocab_union,
         |  ${S.qround(S.qsum("term"), 6)} AS jsd
         |FROM terms GROUP BY na, nb, vocab_old, vocab_new, vocab_union""".stripMargin,

    "tx_lm_heldout" ->
      s"""WITH tl AS (SELECT doc_id, source, ${S.tokens("text")} AS toks FROM documents),
         |tl2 AS (SELECT * FROM tl WHERE len(toks) >= 2),
         |trainbg AS (SELECT unnest(list_transform(range(1, len(toks)),
         |    i -> toks[i] || ' ' || toks[i+1])) AS bg
         |  FROM tl2 WHERE (doc_id // 20) % 5 != 0),
         |cab AS (SELECT bg, string_split(bg, ' ')[1] AS a, count(*) AS cab
         |  FROM trainbg GROUP BY bg),
         |ca AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca FROM cab GROUP BY a),
         |model AS (SELECT bg, cab, ca FROM cab JOIN ca USING (a)),
         |uni AS (SELECT tok, count(*) AS uc FROM (
         |    SELECT unnest(toks) AS tok FROM tl2 WHERE (doc_id // 20) % 5 != 0) GROUP BY tok),
         |tot AS (SELECT CAST(sum(uc) AS BIGINT) AS t_uni, count(*) AS v FROM uni),
         |held AS (SELECT source,
         |    unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
         |  FROM tl2 WHERE (doc_id // 20) % 5 = 0),
         |scored AS (SELECT source, cab,
         |    CAST(round(-ln(0.8 * coalesce(cab / ca, 0.0) +
         |      0.2 * ((coalesce(uc, 0) + 1.0) / (t_uni + v))) * 1e6) AS BIGINT) AS lpu
         |  FROM held LEFT JOIN model USING (bg)
         |  LEFT JOIN uni ON uni.tok = string_split(held.bg, ' ')[2]
         |  CROSS JOIN tot)
         |SELECT source, count(*) AS n_bigrams,
         |  CAST(sum(CASE WHEN cab IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov_bigrams,
         |  (round(CAST(sum(lpu) AS DOUBLE) / (count(*) * 1e6), 4) + 0.0) AS mean_nll,
         |  round(CAST(sum(CASE WHEN cab IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
         |    AS oov_rate
         |FROM scored GROUP BY source ORDER BY source""".stripMargin,

    // the KN model CTEs verbatim (unfiltered), quantized to micro-nats
    // before the per-doc sum so long addition keeps both engines exact;
    // quantile_cont is DuckDB's interpolating twin of Spark `percentile`
    "tx_perplexity_bucket" ->
      s"""WITH tl AS (SELECT doc_id, source, ${S.tokens("text")} AS toks FROM documents),
         |tl2 AS (SELECT * FROM tl WHERE len(toks) >= 2),
         |bgs AS (SELECT doc_id, source,
         |    unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
         |  FROM tl2),
         |ab AS (SELECT string_split(bg, ' ')[1] AS a, string_split(bg, ' ')[2] AS b FROM bgs),
         |cab AS (SELECT a, b, count(*) AS cab FROM ab GROUP BY a, b),
         |ca AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca, count(*) AS n_follow FROM cab GROUP BY a),
         |cb AS (SELECT b, count(*) AS n_precede FROM cab GROUP BY b),
         |tot AS (SELECT count(*) AS n_types FROM cab),
         |model AS (SELECT a || ' ' || b AS bg,
         |    CAST(round(-ln(greatest(cab - 0.75, 0.0) / ca +
         |      (0.75 * n_follow / ca) * (n_precede / n_types)) * 1e6) AS BIGINT) AS lpu
         |  FROM cab JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN tot),
         |scored AS (SELECT doc_id, any_value(source) AS source,
         |    (round(CAST(sum(lpu) AS DOUBLE) / (count(*) * 1e6), 4) + 0.0) AS score
         |  FROM bgs JOIN model USING (bg) GROUP BY doc_id),
         |cuts AS (SELECT source, quantile_cont(score, 0.3) AS c30,
         |    quantile_cont(score, 0.7) AS c70 FROM scored GROUP BY source)
         |SELECT source,
         |  CASE WHEN score <= c30 THEN 'head'
         |       WHEN score <= c70 THEN 'middle' ELSE 'tail' END AS bucket,
         |  count(*) AS n_docs,
         |  ${S.qround(S.qmean("score"), 4)} AS mean_nll
         |FROM scored JOIN cuts USING (source)
         |GROUP BY source, bucket ORDER BY source, bucket""".stripMargin,

    // mirrors graft.plans.CdcChunks exactly: boundary after 1-based position
    // i (i in [4, n]) iff the raw 4-char window hash ≡ 0 (mod 64); chunk
    // hash = SqlText.wordHash-style fold over the chunk's chars.
    "tx_cdc_chunks" ->
      """WITH chars AS (SELECT doc_id, source,
        |    CASE WHEN text = '' THEN CAST([] AS BIGINT[])
        |         ELSE list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))
        |    END AS cs
        |  FROM documents),
        |b AS (SELECT doc_id, source, cs, len(cs) AS n,
        |    list_filter(range(4, len(cs) + 1),
        |      i -> (((cs[i-3]*131 + cs[i-2])*131 + cs[i-1])*131 + cs[i]) % 64 = 0) AS bs
        |  FROM chars),
        |e AS (SELECT doc_id, source, cs, n,
        |    list_concat([0], CASE WHEN len(bs) > 0 AND bs[len(bs)] = n
        |                          THEN bs ELSE list_concat(bs, [n]) END) AS fb
        |  FROM b),
        |segs AS (SELECT doc_id, source,
        |    CASE WHEN n = 0 THEN CAST([] AS BIGINT[])
        |         ELSE list_transform(range(1, len(fb)), k ->
        |           list_reduce(list_prepend(CAST(0 AS BIGINT), cs[fb[k]+1 : fb[k+1]]),
        |             (a, x) -> (a*131 + x) % 1000000007))
        |    END AS chunks
        |  FROM e)
        |SELECT source, count(*) AS total_chunks,
        |  count(DISTINCT ch) AS uniq_chunks,
        |  round(CAST(count(DISTINCT ch) AS DOUBLE) / count(*), 4) AS dedup_ratio
        |FROM (SELECT source, unnest(chunks) AS ch FROM segs)
        |GROUP BY source ORDER BY source""".stripMargin,

    // the identical planted corruption (7th dropped, 5th reversed, applied
    // on ORIGINAL 1-based positions) and the same fused tagged-gram agg
    "tx_bleu_eval" ->
      s"""WITH $evalClipCtes
         |SELECT source, n_docs, ref_tokens, cand_tokens, cand_bigrams, clip1, clip2,
         |  round(CAST(clip1 AS DOUBLE) / cand_tokens, 6) AS p1,
         |  round(CAST(clip2 AS DOUBLE) / cand_bigrams, 6) AS p2,
         |  round(sqrt((CAST(clip1 AS DOUBLE) / cand_tokens) * (CAST(clip2 AS DOUBLE) / cand_bigrams))
         |        * exp(1.0 - CAST(ref_tokens AS DOUBLE) / cand_tokens), 6) AS bleu2
         |FROM lens JOIN cw USING (source) ORDER BY source""".stripMargin,

    // same CTE chain as tx_bleu_eval (the shared clip census), recall
    // normalization + the ROUGE-2 F harmonic replayed with the face's
    // exact parenthesization
    "tx_rouge_eval" ->
      s"""WITH $evalClipCtes
         |SELECT source, n_docs, ref_tokens, ref_bigrams, clip1, clip2,
         |  round(CAST(clip1 AS DOUBLE) / ref_tokens, 6) AS rouge1_r,
         |  round(CAST(clip2 AS DOUBLE) / ref_bigrams, 6) AS rouge2_r,
         |  round(2.0 * (CAST(clip2 AS DOUBLE) / cand_bigrams) * (CAST(clip2 AS DOUBLE) / ref_bigrams)
         |        / ((CAST(clip2 AS DOUBLE) / cand_bigrams) + (CAST(clip2 AS DOUBLE) / ref_bigrams)), 6) AS rouge2_f
         |FROM lens JOIN cw USING (source) ORDER BY source""".stripMargin,

    // same CTE chain (shared framing), then the IDENTICAL two-row LCS DP
    // replayed per document as a nested list_reduce: the outer fold walks
    // the candidate hashes carrying the DP row; the inner fold rebuilds
    // the row left-to-right (acc[len(acc)] is cur[j-1], row[x+1] is
    // prev[j]) — the bpeFold prepend-the-init trick, lambda vars
    // suffixed so no binder shadows
    "tx_rouge_lcs" ->
      s"""WITH $evalClipCtes,
         |dp AS (SELECT source, nref, ncand,
         |    list_reduce(
         |      list_prepend(list_transform(range(1, nref + 2), z0 -> CAST(0 AS BIGINT)),
         |                   list_transform(candh, c0 -> [c0])),
         |      (row0, c) -> list_reduce(
         |        list_prepend(CAST([0] AS BIGINT[]),
         |                     list_transform(range(1, nref + 1), j0 -> [j0])),
         |        (acc, x) -> list_append(acc,
         |          CASE WHEN c[1] = refh[x[1]] THEN row0[x[1]] + 1
         |               ELSE greatest(acc[len(acc)], row0[x[1] + 1]) END))
         |    )[nref + 1] AS lcs
         |  FROM bg),
         |agg AS (SELECT source, count(*) AS n_docs,
         |    CAST(sum(nref) AS BIGINT) AS ref_tokens,
         |    CAST(sum(ncand) AS BIGINT) AS cand_tokens,
         |    CAST(sum(lcs) AS BIGINT) AS lcs_tokens
         |  FROM dp GROUP BY source)
         |SELECT source, n_docs, ref_tokens, cand_tokens, lcs_tokens,
         |  round(CAST(lcs_tokens AS DOUBLE) / ref_tokens, 6) AS rougeL_r,
         |  round(CAST(lcs_tokens AS DOUBLE) / cand_tokens, 6) AS rougeL_p,
         |  round(2.0 * (CAST(lcs_tokens AS DOUBLE) / cand_tokens) * (CAST(lcs_tokens AS DOUBLE) / ref_tokens)
         |        / ((CAST(lcs_tokens AS DOUBLE) / cand_tokens) + (CAST(lcs_tokens AS DOUBLE) / ref_tokens)), 6) AS rougeL_f
         |FROM agg ORDER BY source""".stripMargin,

    // identical vocab construction, then the greedy walk replayed as a
    // recursive CTE over the same (word, pos) -> longest-match jump table
    "tx_wordpiece_encode" ->
      s"""WITH RECURSIVE words AS (SELECT word, count(*) AS n_occ
         |  FROM (SELECT unnest(${S.tokens("text")}) AS word FROM documents) GROUP BY word),
         |multi AS (SELECT piece, sum(n_occ) AS cnt FROM (
         |    SELECT unnest(list_concat(list_concat(
         |      CASE WHEN len(word) < 2 THEN CAST([] AS VARCHAR[]) ELSE
         |        list_transform(range(1, len(word)), i -> substr(word, i, 2)) END,
         |      CASE WHEN len(word) < 3 THEN CAST([] AS VARCHAR[]) ELSE
         |        list_transform(range(1, len(word) - 1), i -> substr(word, i, 3)) END),
         |      CASE WHEN len(word) < 4 THEN CAST([] AS VARCHAR[]) ELSE
         |        list_transform(range(1, len(word) - 2), i -> substr(word, i, 4)) END)) AS piece,
         |      n_occ
         |    FROM words) GROUP BY piece HAVING sum(n_occ) >= 5
         |  ORDER BY cnt DESC, piece LIMIT 60),
         |singles AS (SELECT DISTINCT unnest(string_split(word, '')) AS piece FROM words),
         |vocab AS (SELECT piece, len(piece) AS plen FROM
         |  (SELECT piece FROM multi UNION SELECT piece FROM singles)),
         |wpos AS (SELECT word, unnest(range(1, len(word) + 1)) AS p FROM words),
         |jump AS (SELECT word, p, max(v.plen) AS step
         |  FROM wpos JOIN vocab v ON substr(wpos.word, wpos.p, v.plen) = v.piece
         |  GROUP BY word, p),
         |walk(word, p) AS (
         |  SELECT word, 1 FROM words
         |  UNION ALL
         |  SELECT w.word, w.p + j.step FROM walk w JOIN jump j ON j.word = w.word AND j.p = w.p),
         |pieces AS (SELECT w.word, substr(w.word, w.p, j.step) AS piece
         |  FROM walk w JOIN jump j ON j.word = w.word AND j.p = w.p)
         |SELECT piece, CAST(len(piece) AS BIGINT) AS plen,
         |  count(DISTINCT pc.word) AS n_words,
         |  CAST(sum(n_occ) AS BIGINT) AS total_usage
         |FROM pieces pc JOIN words USING (word)
         |GROUP BY piece ORDER BY total_usage DESC, piece LIMIT 25""".stripMargin
  )
}
