package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything is built-in `Column` expressions (whole-stage codegen, no
  * UDFs), so each op is a narrow map over the documents fact table — no
  * shuffle, scales linearly, and pushes column pruning down to the scan.
  */
object TextOps {

  /** Whitespace tokenizer (the BPE-ish regex split). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Token count; empty/blank text counts 0 (split("") yields [""], which
    * both engines must guard identically).
    */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** RAG-style sliding-window chunking: overlapping `window`-token chunks
    * at `stride` (overlap = window − stride keeps context across cuts),
    * each with provenance — chunk index, start token offset, token count,
    * md5 digest — so an index row can always be traced to its span. All
    * non-text input columns pass through. ONE posexplode over a narrow
    * codegen'd map: zero shuffle, corpus-linear, and STATELESS — the same
    * definition serves the batch registry entry and the streaming ingest
    * twin (micro-batch slicing cannot show through a per-row transform).
    * Tail windows shorten (slice clamps at the array end, identically in
    * Spark and DuckDB); blank docs emit no chunks (split("") yields [""]
    * — the [[tokenCount]] guard).
    */
  def slidingChunks(df: org.apache.spark.sql.DataFrame, textCol: String,
      window: Int = 32, stride: Int = 24): org.apache.spark.sql.DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "slidingChunks: need window >= 1 and 1 <= stride <= window")
    val rest = df.columns.filterNot(_ == textCol).toSeq
    df.filter(length(trim(col(textCol))) > 0)
      .withColumn("__toks", tokens(col(textCol)))
      .select(rest.map(col) :+
        posexplode(transform(
          sequence(lit(0), ((size(col("__toks")) - 1) / stride).cast("int")),
          k => slice(col("__toks"), k * stride + 1, lit(window))))
          .as(Seq("chunk_idx", "__c")): _*)
      .select(rest.map(col) ++ Seq(
        col("chunk_idx").cast("int").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("long").as("start_tok"),
        size(col("__c")).as("n_chunk_tokens"),
        md5(concat_ws(" ", col("__c"))).as("chunk_digest")): _*)
  }

  /** Inverted index build (the retrieval-serving structure): term →
    * (df, total_tf, postings sorted by doc_id with per-doc tf). This is
    * the operator API — postings stay a real `array<struct<doc_id, tf>>`
    * column (consumers page/merge it); the oracle-facing registry entry
    * flattens it to a canonical string because array cells aren't
    * hashable by the driver's pandas compare. Two shuffles: (term, doc)
    * tf count (partial agg absorbs Zipf skew), then term-keyed posting
    * assembly. 100 TB note: ultra-high-df terms make corpus-sized posting
    * lists — production pages them (posting blocks per term) and
    * stop-lists df > ~50% of N; this is the single-page form,
    * df-thresholded to keep rows meaningful.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      minDf: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"),
        sum(col("tf")).as("total_tf"),
        sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("postings"))
      .filter(col("df") >= minDf)

  /** BPE-ish pretokenizer pattern (the GPT-2 pretokenizer family):
    * contraction suffixes, space-prefixed letter runs, digit runs, and
    * punctuation runs. Deliberately lookahead-free — the original GPT-2
    * pattern's `\s+(?!\S)` tail needs negative lookahead, which RE2-based
    * SQL engines reject — so Java regex and RE2 tokenize identically and
    * the count is oracle-checkable. Whitespace-only spans are not emitted.
    */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  /** BPE-ish pretokenization: every match of [[BpePattern]], in order
    * (" don" keeps its leading space — byte-level BPE's convention).
    * Empty text yields the empty array, so no blank-guard is needed.
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Token count under the BPE-ish pretokenizer. */
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** 64-bit signed hash = first 8 md5 bytes — the one hash both our engine
    * and common SQL engines compute bit-identically (DuckDB:
    * CAST('0x'||substr(md5(x),1,16) AS UBIGINT) reinterpreted signed).
    * Native digest-direct expression; the hex-string+conv+decimal
    * formulation cost ~10× on the MinHash hot path.
    */
  def md5Long64(c: Column): Column =
    org.apache.spark.sql.graft.natives.md5Long(c)

  /** Encoding domain for [[sourceCapState]]: `62 − idBits` bits of per-doc
    * char count and `idBits` of doc id packed into one order-preserving
    * non-negative long (bit budget: the two widths must sum to ≤ 62 so
    * (CMAX − 0)·ORD + id stays under 2⁶³). The r18 index-lifecycle probes
    * fired the original 29/33 guard on ids just past 2³³ — and a 100 TB
    * corpus at ~10 KB/doc holds ~10¹⁰ docs, so 33 id bits was the wrong
    * side of the budget for the target scale: web documents rarely pass
    * 8 M chars, corpora routinely pass 8.5 B ids. The default is therefore
    * 39 id bits (549 B docs, 8.4 M chars/doc); `idBits` is a PARAMETER
    * (r18 ADVICE) because the re-split is a contract change — a long-doc
    * corpus (books, concatenated pages over 8.4 M chars) opts back into
    * wider char bits with a smaller `idBits`, as long as state producer
    * and finisher agree. Both guards stay LOUD (raise, never clamp — a
    * clamped char count would silently re-order the cap against the
    * oracle).
    */
  val DefaultCapIdBits = 39
  private def capOrd(idBits: Int): Long = 1L << idBits
  private def capCMax(idBits: Int): Long = 1L << (62 - idBits)
  private def requireCapBits(idBits: Int): Unit =
    require(idBits >= 1 && idBits <= 61,
      s"sourceCapState: idBits=$idBits outside [1, 61]")

  /** Per-source top-K cap STATE — the C4-style per-domain cap
    * (q_x_source_cap) as a BOUNDED MERGEABLE SKETCH instead of a rank
    * window: each doc packs into one long that orders by
    * (n_chars DESC, doc_id ASC) — e = (CMAX − n_chars)·2³³ + doc_id — and
    * ONE object-hash aggregate keeps the k smallest per source
    * ([[org.apache.spark.sql.graft.natives.kmvBottomK]], union+truncate
    * map-side). State is ≤ k longs per source at ANY corpus size, so the
    * SAME definition serves the batch registry row and complete-mode
    * streaming upkeep (StreamJobs.sourceCapStream): set-union state is
    * slicing-insensitive ⇒ drained ≡ batch bit-for-bit. Scale shape vs the
    * window form: partial aggregation absorbs the corpus map-side — the
    * shuffle carries ≤ k longs per (partition, source), never the doc
    * table, and no per-source sort runs anywhere. Out-of-domain rows
    * (n_chars ≥ 2²³ or doc_id ≥ 2³⁹) raise loudly rather than mis-order.
    */
  def sourceCapState(docs: DataFrame, k: Int = 5,
      idBits: Int = DefaultCapIdBits): DataFrame = {
    requireCapBits(idBits)
    val (ord, cMax) = (capOrd(idBits), capCMax(idBits))
    val bad = col("n_chars") < 0 || col("n_chars") >= cMax ||
      col("doc_id") < 0 || col("doc_id") >= ord
    val e = when(bad,
      when(raise_error(concat(lit(
        s"sourceCapState: doc outside the ${62 - idBits}/$idBits-bit encode domain (doc_id="),
        col("doc_id").cast("string"), lit(")"))).isNull, lit(0L)))
      .otherwise((lit(cMax) - col("n_chars")) * ord + col("doc_id"))
    docs.select(col("source"), e.as("__e"))
      .groupBy(col("source"))
      .agg(org.apache.spark.sql.graft.natives.kmvBottomK(col("__e"), k).as("topk"))
  }

  /** Rank finisher over [[sourceCapState]]: the stored array is already in
    * (n_chars DESC, doc_id ASC) order, so rank = position; decode unpacks
    * the two fields exactly (integer div/mod — no doubles near 2⁶² where
    * they lose ulps). Output ≡ the q_x_source_cap registry row.
    */
  def sourceCapFromState(state: DataFrame,
      idBits: Int = DefaultCapIdBits): DataFrame = {
    requireCapBits(idBits)
    val (ord, cMax) = (capOrd(idBits), capCMax(idBits))
    state.select(col("source"), posexplode(col("topk")).as(Seq("__p", "__e")))
      .select(col("source"), (col("__p") + 1).cast("int").as("rk"),
        expr(s"__e % ${ord}L").as("doc_id"),
        (lit(cMax) - expr(s"__e div ${ord}L")).as("n_chars"))
  }

  /** Temperature-mix ADDITIVE state — per (source, doc) char totals, the
    * layer under q_x_temperature_mix that is a plain additive aggregate
    * (the CUPED user-state split): ONE complete-mode aggregate maintains
    * it in streaming (StreamJobs.temperatureMixStream) and the batch row
    * builds it identically; additive ⇒ drain ≡ batch. Budget shares, the
    * hash-order admission cumulative, and the per-source rollup are
    * functions of FINAL doc totals, so they live in the finisher
    * ([[temperatureMixFromState]]), not a second streaming aggregate.
    */
  def temperatureMixDocState(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"), col("doc_id"))
      .agg(sum(col("n_chars")).as("n_chars"))

  /** Finisher over [[temperatureMixDocState]] rows — the full
    * q_x_temperature_mix chain (α = ½ sqrt weights, source-sorted Σw fold,
    * ⌊0.5·T·share⌋ budgets, hash-order cumulative admission via
    * cumAggPerKey, per-source rollup with explicit zeros): finisher over
    * drained state ≡ the registry row bit-for-bit.
    */
  def temperatureMixFromState(state: DataFrame): DataFrame = {
    val perSource = state.groupBy(col("source")).agg(sum(col("n_chars")).as("sc"))
      .withColumn("w", sqrt(col("sc").cast("double")))
    val tot = perSource.agg(
      aggregate(sort_array(collect_list(struct(col("source"), col("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("tw"))
    val t = state.agg(sum(col("n_chars")).as("t_chars"))
    val budgets = perSource.crossJoin(broadcast(tot)).crossJoin(broadcast(t))
      .select(col("source"),
        floor(col("t_chars").cast("double") * lit(0.5) * col("w") / col("tw"))
          .cast("bigint").as("budget_chars"))
    val h = state.select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("h",
        md5Long64(concat(lit("tmix:"), col("doc_id").cast("string"))))
    val cum = graft.functions.Ops.cumAggPerKey(h, Seq("source"),
      Seq(col("h"), col("doc_id")), "n_chars", "cum_chars",
      expr("shiftright(h, 52)"), "sum")
    val admitted = cum.join(broadcast(budgets), "source")
      .filter(col("cum_chars") <= col("budget_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_admitted"), sum(col("n_chars")).as("admitted_chars"))
    budgets.join(admitted, Seq("source"), "left")
      .select(col("source"), col("budget_chars"),
        coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
        coalesce(col("admitted_chars"), lit(0L)).as("admitted_chars"))
  }

  /** Deterministic 80/10/10 train/val/test assignment by seedless md5
    * bucket of `key` — ONE definition shared by the batch split queries
    * (q_x_split_hash on doc ids, q_x_split_safe on cluster keys) and any
    * streaming stage: a narrow stateless map, so the assignment is
    * IDENTICAL in batch and streaming, across partitionings, and across
    * engines (the oracle replays the same md5 bucket arithmetic).
    */
  def splitAssign(key: Column): Column = {
    val b = pmod(md5Long64(concat(lit("split:"), key.cast("string"))), lit(10000L))
    when(b < 8000, "train").when(b < 9000, "val").otherwise("test")
  }

  /** Token count derived from an already-materialized token array; blank
    * text tokenizes to [""], which must count 0 (same guard as tokenCount).
    */
  def tokenCountFromTokens(toks: Column): Column =
    when(size(toks) === 1 && element_at(toks, 1) === "", lit(0)).otherwise(size(toks))

  /** Quality-score feature bundle over a PRE-MATERIALIZED token array:
    * token count, distinct-token ratio (repetition detector), stopword
    * ratio. Taking the array (not the text) keeps tokenization a single
    * `split` per row — inlining `tokens(text)` per feature let
    * CollapseProject duplicate the split 4×, which made quality scoring
    * ~30× the cost of token counting on the same corpus (round-1 bench).
    */
  def qualityFeaturesFromTokens(toks: Column, stopwords: Seq[String]): Seq[(String, Column)] = {
    val n = tokenCountFromTokens(toks)
    val nD = n.cast("double")
    Seq(
      "n_tokens" -> n,
      "distinct_ratio" -> (size(array_distinct(toks)).cast("double") / nullif(nD, lit(0.0))),
      "stopword_ratio" -> (size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*))).cast("double") /
        nullif(nD, lit(0.0)))
    )
  }

  /** Composite quality score in [0,1] over a pre-materialized token array:
    * favors mid-length docs with low repetition and a natural stopword rate
    * (the reference-style length/stopword-ratio heuristic). Callers should
    * project `tokens(text).as("toks")` in a separate select stage so the
    * split happens once (CollapseProject keeps non-cheap multiply-referenced
    * projections staged).
    */
  def qualityScoreFromTokens(toks: Column, stopwords: Seq[String]): Column = {
    val f = qualityFeaturesFromTokens(toks, stopwords).toMap
    val lengthScore = least(f("n_tokens").cast("double") / 50.0, lit(1.0))
    val diversity = coalesce(f("distinct_ratio"), lit(0.0))
    val stop = coalesce(f("stopword_ratio"), lit(0.0))
    round((lengthScore * 0.4 + diversity * 0.4 + least(stop * 5.0, lit(1.0)) * 0.2), 6)
  }

  /** Single-column convenience form; prefer the FromTokens variant plus a
    * staged `tokens(...)` projection on hot paths.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    qualityScoreFromTokens(tokens(text), stopwords)

  /** n-gram-lexicon language ID over a PRE-MATERIALIZED token array: score =
    * hits per language lexicon, argmax with alphabetical tiebreak, 'und'
    * when every score is zero. Stage `tokens(text)` in its own projection —
    * inlining it here would re-split once per lexicon (the quality-score
    * lesson, round-1 bench).
    */
  def langIdFromTokens(toks: Column, lexicons: Map[String, Seq[String]]): Column = {
    // One score per language packed in a single array, argmax via
    // array_position(scores, array_max(scores)) — position of the FIRST
    // maximum, so ties keep the alphabetically-first language and all-zero
    // scores yield 'und'. The tree is LINEAR in the lexicon count: the
    // round-2 when-fold nested the running best into BOTH branches of each
    // step, so CollapseProject duplicated every size(filter(...)) subtree 2^L
    // times (codegen blow-up at a realistic 20-language set).
    val langs = lexicons.toSeq.sortBy(_._1)
    val scores = array(langs.map { case (_, words) =>
      size(filter(toks, t => t.isin(words.map(lit(_)): _*)))
    }: _*)
    val names = array(langs.map { case (lang, _) => lit(lang) }: _*)
    val mx = array_max(scores)
    when(mx.isNull || mx === 0, lit("und"))
      .otherwise(element_at(names, array_position(scores, mx).cast("int")))
  }

  /** Single-column convenience form of [[langIdFromTokens]]. */
  def langId(text: Column, lexicons: Map[String, Seq[String]]): Column =
    langIdFromTokens(tokens(text), lexicons)

  /** Token bigram array ("a b", "b c", …); <2 tokens (including the blank
    * text [""] artifact) yields the empty array. Built from `slice` +
    * `zip_with`, so it stays in whole-stage codegen.
    */
  def bigramsFromTokens(toks: Column): Column =
    when(tokenCountFromTokens(toks) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))

  /** Sliding word n-grams of a token array, space-joined — the built-ins
    * reference formulation of the shingle the native `shingle_hashes`
    * kernel computes (the decontamination/dedup hot paths use the kernel;
    * this stays as the composable Column form and the parity anchor).
    * Fewer than n tokens yields the empty array — guarded because
    * `sequence(0, negative)` would DESCEND, not return empty — and the
    * blank-text [""] artifact is guarded explicitly (at n=1 it would
    * otherwise pass the size check and emit [""] as a gram). Pure
    * built-ins: stays in whole-stage codegen.
    */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n &&
        !(size(toks) === 1 && element_at(toks, 1) === ""),
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Train-test decontamination report: every corpus doc sharing at least
    * one exact word n-gram with any benchmark doc, with the per-doc count
    * of distinct matched grams and the lowest contaminating benchmark id
    * (value-deterministic — a doc can hit several benchmark docs).
    * Dropping the flagged docs is then a left-anti join on this report.
    *
    * 100 TB shape: the benchmark side is small by construction (eval sets,
    * not corpora) — its distinct-gram table broadcasts, so the corpus side
    * is a narrow explode + broadcast-hash join with NO corpus-sized
    * shuffle; the only shuffle is the groupBy over the MATCHED subset,
    * which is benchmark-bounded. Grams are deduped per doc BEFORE the
    * explode (array_distinct) so the join fan-out is bounded by distinct
    * grams, and matched_grams means "distinct benchmark grams hit".
    * The join key is the 64-bit md5 prefix of the gram, not the gram
    * string: an ~8-word string key makes the broadcast map and every
    * probe memcmp-sized, while the hash is 8 bytes — and because BOTH
    * sides apply the same hash, the semantics stay exact-by-construction
    * (a cross-engine oracle replays the identical md5 prefix), not
    * approximate. Gram hashing runs in the one-pass native
    * `shingleHashes` kernel (identical tokenization and md5 prefix;
    * sorted-distinct per doc) — the built-in
    * `array_distinct(wordNgrams(...))→md5` chain materializes every gram
    * string through slice+array_join and measured 3.8 s of the query's
    * 5.3 s at sf0.1; the kernel replaces it with a rolling
    * StringBuilder.
    */
  def contaminationReport(corpus: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      benchIdCol: String = "doc_id", n: Int = 8): DataFrame = {
    import org.apache.spark.sql.graft.natives.shingleHashes
    val bg = bench
      .select(col(benchIdCol).as("__bid"),
        explode(shingleHashes(col(textCol), n)).as("__g"))
      .groupBy(col("__g")).agg(min(col("__bid")).as("__bid"))
    val cg = corpus
      .select(col(idCol), explode(shingleHashes(col(textCol), n)).as("__g"))
    cg.join(broadcast(bg), Seq("__g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("matched_grams"), min(col("__bid")).as("bench_ref"))
  }

  /** Cross-corpus contamination MATRIX — [[contaminationReport]]
    * generalized from one benchmark to the (train shard × eval set) grid
    * a release audit actually needs: per cell the number of shard docs
    * sharing any exact word n-gram with the eval set, the (doc, distinct
    * gram) hit volume, and the contamination rate in basis points; cells
    * with zero hits still report (the universe is shards × sets, not the
    * hit set). Scale shape: eval-set grams BROADCAST (benchmarks are
    * dimension-sized next to a training corpus), corpus grams are
    * per-doc-distinct and never shuffle — the hit aggregate is the only
    * exchange, keyed on (shard, set), and the totals/universe dims are
    * shard-count-sized.
    */
  def contaminationMatrix(corpus: DataFrame, bench: DataFrame,
      shardCol: String, setCol: String, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 8): DataFrame = {
    import org.apache.spark.sql.graft.natives.shingleHashes
    val bg = bench
      .select(col(setCol).as("eval_set"),
        explode(shingleHashes(col(textCol), n)).as("__g"))
      .distinct()
    val cg = corpus
      .select(col(shardCol).as("shard"), col(idCol).as("__id"),
        explode(array_distinct(shingleHashes(col(textCol), n))).as("__g"))
    val hits = cg.join(broadcast(bg), Seq("__g"))
      .groupBy(col("shard"), col("eval_set"))
      .agg(countDistinct(col("__id")).as("n_contaminated_docs"),
        count(lit(1)).as("n_gram_hits"))
    val totals = corpus.groupBy(col(shardCol).as("shard"))
      .agg(count(lit(1)).as("n_shard_docs"))
    val universe = totals
      .crossJoin(bench.select(col(setCol).as("eval_set")).distinct())
    universe.join(hits, Seq("shard", "eval_set"), "left")
      .select(col("shard"), col("eval_set"), col("n_shard_docs"),
        coalesce(col("n_contaminated_docs"), lit(0L)).as("n_contaminated_docs"),
        coalesce(col("n_gram_hits"), lit(0L)).as("n_gram_hits"))
      .withColumn("contamination_bp",
        expr("n_contaminated_docs * 10000 div n_shard_docs"))
  }

  /** Longest equal-run in a SORTED string array — equals the max element
    * frequency, in one O(n) aggregate pass over the sort instead of the
    * O(distinct·n) transform+filter nested scan (which measured 1.35 s of
    * the gopher query's 1.48 s at sf0.1 before this rewrite; 0.3 s after).
    */
  private def maxRunLength(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit(0).as("best"), lit(0).as("cur"), lit("").as("prev")),
      (acc, x) => {
        val cur = when(x === acc.getField("prev"), acc.getField("cur") + 1).otherwise(lit(1))
        struct(greatest(acc.getField("best"), cur).as("best"), cur.as("cur"), x.as("prev"))
      },
      acc => acc.getField("best"))

  /** Gopher-style document-quality signals (Rae et al. 2021 §A1.1 rule
    * family) over PRE-MATERIALIZED token/bigram/line arrays — stage all
    * three in one projection so the splits run once per row:
    *
    *  - mean_word_len: non-whitespace chars / tokens (null for empty docs)
    *  - dup_bigram_frac: fraction of token bigrams that repeat
    *  - top_bigram_frac: fraction of tokens covered by the most frequent
    *    bigram (2·count/n, the repetition detector with the most signal on
    *    short corpora)
    *  - dup_line_frac / bullet_line_frac / ellipsis_line_frac: the
    *    line-shape rules (duplicate lines, bullet starts, ellipsis ends)
    *  - alpha_word_frac: words containing at least one ASCII letter
    *  - symbol_word_ratio: ('#' + '…'-as-"..." occurrences) per word
    *
    * All ratios are ratios of per-row ints rounded at 6dp, so Spark and a
    * SQL oracle compute bit-identical doubles (no sum-order dependence).
    * top_bigram_frac counts the max bigram frequency as the longest
    * equal-run in the sorted bigram array ([[maxRunLength]], O(n log n)
    * per row); everything stays built-in expressions, no shuffle anywhere.
    */
  def gopherFeatures(text: Column, toks: Column, bg: Column, lines: Column): Seq[(String, Column)] = {
    val n = tokenCountFromTokens(toks)
    val nD = nullif(n.cast("double"), lit(0.0))
    val nb = size(bg).cast("double")
    val nl = size(lines).cast("double")
    val hashCount = length(text) - length(translate(text, "#", ""))
    val ellipsisCount = (length(text) - length(replace(text, lit("..."), lit("")))) / 3
    Seq(
      "n_tokens" -> n.cast("long"),
      "mean_word_len" ->
        round(length(regexp_replace(trim(text), "\\s+", "")).cast("double") / nD, 6),
      "dup_bigram_frac" -> round(when(nb === 0, lit(0.0)).otherwise(
        (nb - size(array_distinct(bg)).cast("double")) / nb), 6),
      "top_bigram_frac" -> round(when(nb === 0, lit(0.0)).otherwise(
        lit(2.0) * maxRunLength(array_sort(bg)).cast("double") / n.cast("double")), 6),
      "dup_line_frac" ->
        round((nl - size(array_distinct(lines)).cast("double")) / nl, 6),
      "bullet_line_frac" -> round(size(filter(lines,
        l => ltrim(l).startsWith("- ") || ltrim(l).startsWith("* ") ||
          ltrim(l).startsWith("• "))).cast("double") / nl, 6),
      "ellipsis_line_frac" -> round(size(filter(lines,
        l => rtrim(l).endsWith("...") || rtrim(l).endsWith("…"))).cast("double") / nl, 6),
      "alpha_word_frac" -> round(when(n === 0, lit(0.0)).otherwise(
        size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / n.cast("double")), 6),
      "symbol_word_ratio" -> round(when(n === 0, lit(0.0)).otherwise(
        (hashCount + ellipsisCount).cast("double") / nD), 6)
    )
  }

  /** The Gopher keep/drop verdict over [[gopherFeatures]] output columns:
    * length in [10, 100k] tokens, mean word length in [3, 10], few
    * duplicate lines, no dominant bigram, mostly alphabetic words.
    */
  def gopherPass(f: Map[String, Column]): Column =
    (f("n_tokens").between(10, 100000) &&
      f("mean_word_len").between(3, 10) &&
      f("dup_line_frac") <= 0.3 &&
      f("top_bigram_frac") <= 0.18 &&
      f("alpha_word_frac") >= 0.8).cast("int")

  /** Corpus term statistics — the word-count shape: explode tokens, one
    * shuffle keyed on the term. Hot terms (stopwords) are the canonical
    * skewed key; partial aggregation absorbs them (each map task emits one
    * partial row per term, so the reduce side sees O(tasks) rows per hot
    * term, not O(occurrences)). doc_freq rides the same shuffle via an
    * exact two-level distinct (doc,term) pre-agg — no second scan.
    */
  def termStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tc"))
      .groupBy(col("term"))
      .agg(sum(col("tc")).as("term_count"), count(lit(1)).as("doc_freq"))

  /** Per-document top-k terms by tf-idf. Deliberately ln-free: score =
    * (tc·N) / (n_tokens·df) — tf times a LINEAR inverse document
    * frequency — so the score is a ratio of exact integers and both
    * engines produce the identical double (a log-idf's libm `ln` is not
    * bit-specified across engines; linear idf preserves the ranking on a
    * single corpus since N is constant and x ↦ a/x is monotone). Ranking
    * is total: (score desc, term asc). N arrives via the J4
    * broadcast-scalar pattern, not a driver round-trip.
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val tc = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tc"))
    val withTotals = tc.withColumn("n_tokens", sum(col("tc")).over(Window.partitionBy(col("doc_id"))))
    val df = tc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    withTotals
      .join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round((col("tc") * col("n_docs")).cast("double") /
          (col("n_tokens") * col("df")).cast("double"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term").asc)))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("score"))
  }

  /** Document fingerprint: md5 over the sorted token multiset — invariant to
    * word order, catches shuffle-duplicates that exact-text hashing misses.
    */
  def fingerprintMd5(text: Column): Column =
    md5(concat_ws(" ", array_sort(tokens(text))))

  /** Rolling-hash (Rabin-Karp + winnowing) fingerprint set: sorted distinct
    * window-minima of byte k-gram hashes. Any shared substring of length ≥
    * window+k−1 produces a shared fingerprint, so overlap (via
    * sortedIntersectCount) measures copied-passage similarity. Native
    * one-pass expression.
    */
  def fingerprintRolling(text: Column, k: Int = 8, window: Int = 16): Column =
    org.apache.spark.sql.graft.natives.winnowFingerprint(text, k, window)

  /** PII scrub patterns (the C4/Dolma-style redaction family: emails,
    * NANP-shaped phone numbers, IPv4 addresses). Deliberately restricted to
    * the Java-regex ∩ RE2 dialect — no lookaround, no backreferences, and
    * quantifier structures whose leftmost match is unambiguous — so a
    * backtracking engine and a leftmost-longest engine (RE2-based SQL
    * oracles) find byte-identical matches and the scrub is hash-checkable.
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "\\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern: String = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Per-category PII match counts (audit signal, computed pre-scrub). */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(text, lit(EmailPattern), lit(0))),
    "n_phones" -> size(regexp_extract_all(text, lit(PhonePattern), lit(0))),
    "n_ips" -> size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))))

  /** Redact PII with typed placeholders. Email runs first (its local part
    * may contain digits a later pass would half-eat); phone and IPv4 cannot
    * overlap each other (dashes vs dots), so the remaining order is free.
    * Pure regexp_replace chain — narrow, codegen'd, no shuffle.
    */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")

  /** Non-overlapping k-token chunks ("pseudo-sentences") of a token array,
    * each rendered back to a string; the tail chunk may be shorter. Blank
    * text (whose split is [""]) yields the empty chunk list, matching the
    * tokenCountFromTokens guard. Narrow per-row transform. PASS A STAGED
    * token column (an attribute, not the split expression): a transform
    * lambda re-evaluates its free subexpressions per ELEMENT, so an inlined
    * split would re-tokenize the document once per chunk — measured 3-4×
    * on the chunk-dedup path.
    */
  def tokenChunks(toks: Column, k: Int): Column = {
    val n = tokenCountFromTokens(toks)
    when(n === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), floor((n - lit(1)) / lit(k)).cast("int")),
        i => array_join(slice(toks, i * lit(k) + lit(1), lit(k)), " ")))
  }

  /** One row per non-overlapping k-token chunk: (idCol, pos, chunk) with
    * pos the 0-based chunk index. The corpus-scale form of [[tokenChunks]]
    * + posexplode — but deliberately NOT built that way: exploding a
    * higher-order-function chunk array makes the planner push a
    * `size(chunks) > 0` guard below the Generate that INLINES the whole
    * chunk-building transform (split re-run per chunk, interpreted) into a
    * Filter — measured ~10× on the boilerplate path. Here the Generate
    * explodes only a chunk-INDEX sequence derived from a staged token
    * count, and each chunk string is built after the Generate with plain
    * slice + array_join — regular codegen expressions, one split per
    * document. Blank documents produce no rows (restore them with a left
    * join on the id if the consumer needs the full document set).
    */
  def chunkRows(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val st = docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"), tokenCountFromTokens(col("toks")).as("n"))
    val idx = when(col("n") === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), floor((col("n") - lit(1)) / lit(k)).cast("int")))
    st.select(col(idCol), col("toks"), explode(idx).as("pos"))
      .select(col(idCol), col("pos"),
        array_join(slice(col("toks"), col("pos") * lit(k) + lit(1), lit(k)), " ").as("chunk"))
  }

  /** URL canonicalization (the crawl-dedup normalizer): lowercase scheme
    * and host, strip the scheme-default port (:443 for https, :80 for
    * http), drop the fragment, strip trailing slashes from the path, drop
    * `utm_*` tracking parameters, and sort the surviving query parameters
    * bytewise. Two raw URLs that differ only in these presentation details
    * canonicalize to the same string, so URL-level dedup is an exact
    * groupBy on the output — no fuzzy matching needed. Every regex is
    * ANCHORED (at most one match), so Spark's replace-all and an oracle's
    * replace-first agree; patterns live in the Java-regex ∩ RE2 dialect
    * and parameter sort order is bytewise in both engines. Pure built-in
    * expressions — narrow, codegen'd, no shuffle.
    */
  def urlNormalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val host = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val pathQuery = regexp_replace(rest, "^[^/?]*", "")
    val path = regexp_replace(regexp_extract(pathQuery, "^([^?]*)", 1), "/+$", "")
    val query = when(pathQuery.contains("?"),
      regexp_replace(pathQuery, "^[^?]*\\?", "")).otherwise(lit(""))
    val params = filter(split(query, "&"),
      p => !(p.startsWith("utm_") || p === ""))
    val qs = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** Order-preserving first-occurrence dedup of an array — the
    * intra-document repetition-removal kernel (keep chunk i iff its first
    * occurrence is at i). Quadratic in the per-document chunk count, which
    * is bounded by document length — a per-row cost, invariant to corpus
    * size, and it stays inside whole-stage codegen.
    */
  def dedupKeepFirst(arr: Column): Column =
    filter(arr, (x, i) => array_position(arr, x) === (i + lit(1)).cast("long"))

  /** One BPE merge pass over a symbol array: scan left to right, replace
    * every adjacent (a, b) with the fused symbol. A left fold replicates
    * the scan exactly — the fused a+b can never itself match `a` (it is
    * strictly longer), so a just-merged symbol never re-merges as the left
    * part within the same pass. The size guard is a separate WHEN branch
    * (CaseWhen evaluates lazily) so `element_at(acc, -1)` never touches an
    * empty accumulator under ANSI.
    */
  def bpeMergePass(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) === 0, array(x))
        .when(element_at(acc, -1) === a && x === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Apply learned BPE merges: tokenize text into words, split each word
    * into character symbols, then run every merge rule in training order
    * ([[bpeMergePass]] chained — BPE application is defined as replaying
    * the merge sequence). Returns the flat token array. Empty words are
    * filtered first (a blank doc encodes to zero tokens — and the char
    * split of "" diverges between engines, so neither side may fold it).
    * Narrow, codegen'd, no shuffle: the merges arrive as a driver-side
    * list (they are vocabulary metadata, broadcast-sized by construction).
    */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column = {
    val wordSyms = transform(filter(tokens(text), w => w =!= ""), w => split(w, ""))
    flatten(merges.foldLeft(wordSyms) { case (acc, (a, b)) =>
      transform(acc, ws => bpeMergePass(ws, a, b))
    })
  }

  /** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016): learn the
    * first k merge rules from the corpus. Classic shape — words become
    * character-symbol sequences weighted by word frequency; each round
    * counts adjacent symbol pairs (weighted, every adjacent position),
    * fuses the most frequent pair (ties broken lexicographically on
    * (left, right) so the result is deterministic), and rewrites the word
    * table with [[bpeMergePass]].
    *
    * 100 TB shape: the ONLY corpus-sized work is the initial word count
    * (one shuffle, partial agg absorbs Zipf skew). Every round after that
    * operates on the DISTINCT-WORD table — vocabulary-sized (Heaps' law:
    * ~1M rows for a web corpus), independent of corpus size — and the
    * driver receives exactly ONE row per round (the argmax pair), the
    * Lloyd-iteration precedent from IVF. k rounds = k vocab-table passes,
    * inherent to BPE's sequential-merge definition.
    *
    * Output: (step, left_sym, right_sym, merged, pair_count) for the k
    * learned merges, in order (fewer if the corpus runs out of pairs).
    */
  def bpeTrainMerges(docs: DataFrame, textCol: String = "text", k: Int = 6,
      vocabPartitions: Int = 4): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    // The word table is vocabulary-sized (Heaps' law: ~1M rows even for a
    // web-scale corpus — a few hundred MB of symbol arrays), so after the
    // corpus-sized count it coalesces to a handful of partitions: the k
    // rounds then pay per-round scheduling for 4 tasks instead of the full
    // shuffle-partition fan (measured 4.1 s → sub-2 s for k=6 at sf0.1).
    // Raise `vocabPartitions` only for an unusually unbounded symbol space.
    val words0 = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(split(col("w"), "").as("syms"), col("freq"))
      .coalesce(vocabPartitions)
      .cache()
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
      var cur = words0
      var step = 1
      var exhausted = false
      while (step <= k && !exhausted) {
        val top = cur
          .select(col("freq"), explode(when(size(col("syms")) >= 2,
            transform(sequence(lit(0), size(col("syms")) - 2),
              i => struct(element_at(col("syms"), i + 1).as("l"),
                element_at(col("syms"), i + 2).as("r"))))
            .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((step, l, r, l + r, c))
          // localCheckpoint keeps each round ONE merge pass over the vocab
          // table — a lazy chain replays all i-1 prior passes inside round
          // i's count (O(k²) passes total, and the merge fold is
          // interpreted HOF work, the expensive kind to replay)
          cur = cur.select(bpeMergePass(col("syms"), l, r).as("syms"), col("freq"))
            .localCheckpoint()
          step += 1
        }
      }
      merges.toSeq.toDF("step", "left_sym", "right_sym", "merged", "pair_count")
    } finally words0.unpersist()
  }
}
