package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private val lexicons = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de"),
    "fr" -> Seq("le", "les", "une"),
    "de" -> Seq("der", "die", "das"),
    "zh" -> Seq("de5", "shi4", "le5"))

  private def predict(texts: Seq[String], lex: Map[String, Seq[String]]): Seq[String] =
    texts.toDF("text")
      .select(TextOps.tokens($"text").as("toks"))
      .select(TextOps.langIdFromTokens($"toks", lex).as("lang"))
      .as[String].collect().toSeq

  test("langId: argmax with alphabetical tiebreak and 'und' on zero scores") {
    val got = predict(Seq(
      "the cat and the dog of a house", // en
      "el perro de la casa",            // es
      "xyz qwerty nothing matches"),    // und
      lexicons)
    assert(got == Seq("en", "es", "und"))
    // tie: one hit for 'de' and one for 'en' → alphabetically-first wins
    assert(predict(Seq("der the"), lexicons) == Seq("de"))
  }

  test("langId stays linear: a 20-language lexicon set compiles and runs") {
    // the round-2 when-fold duplicated the scoring subtree 2^L times — at
    // L=20 codegen would not survive; the staged argmax must
    val lex20 = (0 until 20).map(i => f"l$i%02d" -> Seq(s"w$i", s"x$i", s"y$i")).toMap
    val got = predict(Seq("w7 x7 w3", "nothing here"), lex20)
    assert(got == Seq("l07", "und"))
  }

  test("bpeTokens: GPT-2-style pretokenization of contractions, runs, punctuation") {
    val r = Seq("I don't like 42 apples, really!", "").toDF("text")
      .select(TextOps.bpeTokens($"text").as("t"), TextOps.bpeTokenCount($"text").as("n"))
      .collect()
    assert(r(0).getSeq[String](0) ==
      Seq("I", " don", "'t", " like", " 42", " apples", ",", " really", "!"))
    assert(r(0).getInt(1) == 9)
    assert(r(1).getInt(1) == 0)
  }

  private def gopherRows(texts: Seq[String]) = {
    val staged = texts.toDF("text")
      .select($"text", TextOps.tokens($"text").as("toks"))
      .select($"text", $"toks", TextOps.bigramsFromTokens($"toks").as("bg"),
        split($"text", "\n").as("ls"))
    val feats = TextOps.gopherFeatures($"text", $"toks", $"bg", $"ls")
    staged.select(feats.map { case (n, c) => c.as(n) }: _*).collect()
  }

  test("gopherFeatures: line-shape rules on multi-line text (hand-computed)") {
    // 5 lines: two identical, one bullet, one ellipsis-ended, one plain —
    // the line features the single-line synthetic corpus can't exercise.
    val doc = "same line\nsame line\n- bullet item\ntrailing off...\nplain end"
    val r = gopherRows(Seq(doc)).head
    assert(r.getAs[Double]("dup_line_frac") == 0.2)      // 1 dup of 5
    assert(r.getAs[Double]("bullet_line_frac") == 0.2)   // 1 of 5
    assert(r.getAs[Double]("ellipsis_line_frac") == 0.2) // 1 of 5
    // "..." also counts toward symbol ratio: 1 occurrence / 11 tokens
    // (the bullet dash is itself a token under the whitespace tokenizer)
    assert(r.getAs[Long]("n_tokens") == 11L)
    assert(r.getAs[Double]("symbol_word_ratio") == 0.090909)
  }

  test("gopherFeatures: repetition and word-shape signals (hand-computed)") {
    // "spam ham spam ham spam": bigrams = [sh, hs, sh, hs] → dup 2/4,
    // top bigram "spam ham" ×2 covers 2*2/5 tokens; mean word len
    // (4+3+4+3+4)/5; all words alphabetic.
    val r = gopherRows(Seq("spam ham spam ham spam")).head
    assert(r.getAs[Double]("dup_bigram_frac") == 0.5)
    assert(r.getAs[Double]("top_bigram_frac") == 0.8)
    assert(r.getAs[Double]("mean_word_len") == 3.6)
    assert(r.getAs[Double]("alpha_word_frac") == 1.0)
    // numeric-only words fail the alpha rule: 2 of 4
    val r2 = gopherRows(Seq("only 99 of 100")).head
    assert(r2.getAs[Double]("alpha_word_frac") == 0.5)
  }

  test("gopherFeatures: degenerate docs (empty, one word) stay null-safe") {
    val rows = gopherRows(Seq("", "word"))
    val empty = rows(0)
    assert(empty.getAs[Long]("n_tokens") == 0L)
    assert(empty.isNullAt(empty.fieldIndex("mean_word_len")))
    assert(empty.getAs[Double]("dup_bigram_frac") == 0.0)
    assert(empty.getAs[Double]("top_bigram_frac") == 0.0)
    val one = rows(1)
    assert(one.getAs[Long]("n_tokens") == 1L)
    assert(one.getAs[Double]("top_bigram_frac") == 0.0)
    assert(one.getAs[Double]("mean_word_len") == 4.0)
  }

  test("wordNgrams: sliding grams, short/blank guard") {
    import graft.operators.TextOps
    val got = Seq("a b c d", "a b", "").toDF("text")
      .select(TextOps.wordNgrams(TextOps.tokens(col("text")), 3).as("g"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("contaminationReport flags exact n-gram overlap with the lowest bench ref") {
    import graft.operators.TextOps
    // bench docs 100 & 101 share the gram "one two three" (doc 100 is the
    // lower ref); corpus doc 1 contains it twice (distinct grams count
    // once per gram), doc 2 hits two distinct bench grams, doc 3 is
    // clean, doc 4 is too short to form a trigram
    val bench = Seq(
      (100L, "one two three four"),
      (101L, "zero one two three")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "say one two three and one two three again"),
      (2L, "one two three plus two three four here"),
      (3L, "nothing shared at all in this document"),
      (4L, "one two")).toDF("doc_id", "text")
    val rows = TextOps.contaminationReport(corpus, bench, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: "one two three" (once, distinct) -> bench 100;
    // doc 2: "one two three" + "two three four" -> 2 grams, min ref 100
    assert(rows == Set((1L, 1L, 100L), (2L, 2L, 100L)), s"got $rows")
  }

  test("piiScrub redacts emails/phones/IPv4s and piiCounts counts them pre-scrub") {
    val df = Seq(
      "write bob.smith+x@mail.co or call +1-555-0199 from 10.2.3.4 ok",
      "two mails a@b.io c@d.org and bare 555-123-4567",
      "no pii here at all",
      "").toDF("text")
    val cols = TextOps.piiCounts($"text").map { case (n, c) => c.as(n) } :+
      TextOps.piiScrub($"text").as("clean")
    val r = df.select(cols: _*).collect()
    assert((r(0).getInt(0), r(0).getInt(1), r(0).getInt(2)) == ((1, 1, 1)))
    assert(r(0).getString(3) == "write <EMAIL> or call <PHONE> from <IP> ok")
    assert((r(1).getInt(0), r(1).getInt(1)) == ((2, 1)))
    assert(r(1).getString(3) == "two mails <EMAIL> <EMAIL> and bare <PHONE>")
    assert(r(2).getString(3) == "no pii here at all")
    assert(r(3).getString(3) == "")
    // version numbers must NOT trip the IPv4 rule (word-boundary + 4 octets)
    val v = Seq("release 1.2.3 and 1.2.3.4.5 here").toDF("text")
      .select(TextOps.piiScrub($"text")).head().getString(0)
    assert(v.contains("1.2.3 "), v)
  }

  test("tokenChunks: non-overlapping k-chunks with short tail; blank -> empty") {
    val got = Seq("a b c d e", "a b", "a", "").toDF("text")
      .select(TextOps.tokenChunks(TextOps.tokens($"text"), 2).as("c"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b", "c d", "e"))
    assert(got(1) == Seq("a b"))
    assert(got(2) == Seq("a"))
    assert(got(3).isEmpty)
  }

  test("chunkRows: one row per chunk with 0-based pos; blank docs emit none") {
    val docs = Seq((1L, "a b c d e"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val got = TextOps.chunkRows(docs, "doc_id", "text", 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got == Set((1L, 0, "a b"), (1L, 1, "c d"), (1L, 2, "e"), (3L, 0, "x")))
  }

  test("dedupKeepFirst keeps first occurrences in order") {
    val got = Seq(Seq("x", "y", "x", "z", "y", "x"), Seq.empty[String])
      .toDF("a").select(TextOps.dedupKeepFirst($"a").as("k"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("x", "y", "z"))
    assert(got(1).isEmpty)
  }

  test("urlNormalize folds every presentation axis and nothing else") {
    val got = Seq(
      "HTTPS://WWW.Example.COM:443/a/b/?b=2&a=1&utm_source=x#frag",
      "https://www.example.com/a/b?a=1&b=2",   // already canonical twin of ^
      "http://Host.org:80/x",                  // http default port stripped
      "http://host.org:8080/x",                // non-default port KEPT
      "https://h.io:80/y",                     // :80 is NOT https' default
      "https://h.io/p/?utm_campaign=only",     // all-tracking query drops
      "ftp://Mixed.Case/z/")                   // unknown scheme: no port rule
      .toDF("u").select(TextOps.urlNormalize($"u")).as[String].collect()
    assert(got(0) == "https://www.example.com/a/b?a=1&b=2")
    assert(got(1) == got(0))
    assert(got(2) == "http://host.org/x")
    assert(got(3) == "http://host.org:8080/x")
    assert(got(4) == "https://h.io:80/y")
    assert(got(5) == "https://h.io/p")
    assert(got(6) == "ftp://mixed.case/z")
  }

  test("bpeMergePass replicates the left-to-right merge scan") {
    val df = Seq("aaab", "abab", "ba", "a").toDF("w")
      .select(split($"w", "").as("syms"))
    val got = df.select(TextOps.bpeMergePass($"syms", "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    // "aaa b": scan merges positions 1-2 then can't reuse the fused token
    assert(got == Seq(Seq("aa", "a", "b"), Seq("a", "b", "a", "b"),
      Seq("b", "a"), Seq("a")))
    val ab = df.select(TextOps.bpeMergePass($"syms", "a", "b").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(ab == Seq(Seq("a", "a", "ab"), Seq("ab", "ab"), Seq("b", "a"), Seq("a")))
  }

  test("bpeEncode replays merges in order; later merges consume earlier fusions") {
    val df = Seq("abc ab dd", "", "c").toDF("t")
    // merges (a,b) then (ab,c): "abc" -> [ab, c] -> [abc]; "ab" -> [ab];
    // "dd" untouched; blank doc encodes to zero tokens
    val got = df.select(TextOps.bpeEncode($"t", Seq(("a", "b"), ("ab", "c"))).as("e"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("abc", "ab", "d", "d"), Seq(), Seq("c")))
  }

  test("bpeTrainMerges learns hand-checkable merges in frequency-then-lex order") {
    // "ab" appears in: abc x3, ab x2 -> pair (a,b) weight 5; (b,c) weight 3;
    // after merge 1, (ab,c) weight 3 beats (d,d) weight 2
    val docs = Seq((1L, "abc abc ab dd"), (2L, "abc ab dd")).toDF("doc_id", "text")
    val got = TextOps.bpeTrainMerges(docs, k = 3)
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1, "a", "b", "ab", 5L),
      (2, "ab", "c", "abc", 3L),
      (3, "d", "d", "dd", 2L)))
  }

  test("t-digest quantile tier lands inside the exact ±5%-rank band per language") {
    // the q_x_length_quantiles_approx error contract: percentile_approx at
    // accuracy 100 guarantees rank error ≤ 1%; the spec allows ±5% rank,
    // checked against the EXACT quantiles at q∓0.05 (the A4/HLL pattern —
    // the sketch tier is bounded by its oracled exact twin, not hashed)
    val approx = SparkEntry.queries("q_x_length_quantiles_approx")(spark, sfDir)
      .select(col("lang"), col("p25").cast("double"), col("p50").cast("double"),
        col("p75").cast("double"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val bands = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), graft.operators.TextOps.tokenCount(col("text")).as("n"))
      .groupBy(col("lang"))
      .agg(expr("percentile(n, array(0.20, 0.30, 0.45, 0.55, 0.70, 0.80))").as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(approx.nonEmpty && approx.keySet == bands.keySet)
    approx.foreach { case (lang, (p25, p50, p75)) =>
      val b = bands(lang)
      assert(b(0) <= p25 && p25 <= b(1), s"$lang p25=$p25 outside [${b(0)}, ${b(1)}]")
      assert(b(2) <= p50 && p50 <= b(3), s"$lang p50=$p50 outside [${b(2)}, ${b(3)}]")
      assert(b(4) <= p75 && p75 <= b(5), s"$lang p75=$p75 outside [${b(4)}, ${b(5)}]")
    }
  }

  test("rag chunking: stride-24 windows of 32, clamped tail, blank docs skipped") {
    // stand-in corpus dir: run the registry entry against a temp parquet
    // with known token counts (40 → starts 0 and 24; 10 → one short
    // window; blank → none)
    val dir = java.nio.file.Files.createTempDirectory("ragchunks").toString
    val docs = Seq(
      (1L, (0 until 40).map(i => s"t$i").mkString(" "), "en", "s", 40L),
      (2L, (0 until 10).map(i => s"u$i").mkString(" "), "en", "s", 10L),
      (3L, "   ", "en", "s", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_x_rag_chunks")(spark, dir)
      .select("doc_id", "chunk_idx", "start_tok", "n_chunk_tokens")
      .as[(Long, Int, Long, Int)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 0, 0L, 32),  // full window
      (1L, 1, 24L, 16), // overlaps 8 with window 0, clamps at 40
      (2L, 0, 0L, 10)   // single short window
    ), s"window rule drifted: $got")
    // overlap invariant: consecutive windows share w − stride tokens
    val doc1 = SparkEntry.queries("q_x_rag_chunks")(spark, dir)
      .filter(col("doc_id") === 1L).count()
    assert(doc1 == 2)
  }

  test("dataset card: internally consistent and bounded by its ingredients") {
    val card = SparkEntry.queries("q_x_dataset_card")(spark, sfDir).collect()
    assert(card.nonEmpty)
    card.foreach { r =>
      val nd = r.getLong(2)
      assert(r.getLong(7) + r.getLong(8) + r.getLong(9) == nd,
        s"split counts must partition the stratum: $r")
      assert(r.getLong(5) <= nd && r.getLong(6) <= nd,
        s"pass/dup counts bounded by n_docs: $r")
      assert(r.getLong(10) == r.getLong(5) * 10000L / nd, s"gopher_pass_bp: $r")
      assert(r.getLong(11) == r.getLong(6) * 10000L / nd, s"dup_bp: $r")
    }
    // the card's totals must agree with the corpus (no doc dropped or
    // double-counted by the three-way ingredient join)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(card.map(_.getLong(2)).sum == docs.count())
    assert(card.map(_.getLong(3)).sum ==
      docs.agg(sum(col("n_chars"))).head.getLong(0))
  }

  test("rarity score: hand-checked integer surprisal means and rare counts") {
    // tf: a=3, b=1, c=1 over the two docs; per-occurrence surprisal
    // 1e8 div tf, per-doc integer mean; rare = occurrences with tf <= 2
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // the registry fn reads a dir; replay the identical pipeline inline
    val toks = docs.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy(col("term")).agg(count(lit(1)).as("tf"))
    val got = toks.join(tf, Seq("term")).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        sum(expr("100000000 div tf")).as("__s"),
        sum(when(col("tf") <= 2, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_toks"),
        expr("__s div n_toks").as("rarity_score"), col("n_rare"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, (33333333L * 2 + 100000000L) / 3, 1L)))
    assert(got(2L) == ((2L, (33333333L + 100000000L) / 2, 1L)))
  }

  test("bigram LM: conditional continuation counts and bp under the pinned tie order") {
    val docs = Seq((1L, "x y x y z"), (2L, "x y")).toDF("doc_id", "text")
    val bg = docs.select(explode(TextOps.bigramsFromTokens(
        TextOps.tokens(col("text")))).as("bg"))
      .select(substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
    val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("pair_count"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("pair_count")).as("w1_count"))
    val rows = c2.join(c1, Seq("w1"))
      .select(col("w1"), col("w1_count"), col("w2"), col("pair_count"),
        expr("pair_count * 10000 div w1_count").as("cont_bp"))
      .as[(String, Long, String, Long, Long)].collect().toSet
    // doc1 "x y x y z" -> (x,y),(y,x),(x,y),(y,z); doc2 adds one (x,y):
    // c(x,y)=3, c(y,x)=1, c(y,z)=1; contexts c(x·)=3, c(y·)=2
    assert(rows == Set(
      ("x", 3L, "y", 3L, 10000L),
      ("y", 2L, "x", 1L, 5000L),
      ("y", 2L, "z", 1L, 5000L)))
  }

  test("sourceCapState idBits split: parameterized round-trip, loud raise outside the domain") {
    // r18 ADVICE: the 29/33 → 23/39 re-split dropped the per-doc char
    // ceiling to 8.4 M — a contract change for long-doc corpora. The split
    // is now a parameter: a books corpus opts back into wider char bits
    // with a smaller idBits, as long as producer and finisher agree.
    // Round-trip at idBits = 30 (char ceiling 2^32): a doc OVER the
    // default's 2^23 ceiling encodes and decodes exactly.
    val longDocs = Seq(
      ("web", 1L, 50L), ("web", 2L, 20_000_000L), // > default 8.4 M ceiling
      ("web", 3L, 9_000_000L), ("books", 4L, 4_000_000_000L)) // near 2^32
      .toDF("source", "doc_id", "n_chars")
    val got = TextOps.sourceCapFromState(
        TextOps.sourceCapState(longDocs, k = 2, idBits = 30), idBits = 30)
      .select(col("source"), col("rk"), col("doc_id"), col("n_chars"))
      .as[(String, Int, Long, Long)].collect().toSet
    assert(got == Set(
      ("web", 1, 2L, 20_000_000L), ("web", 2, 3L, 9_000_000L),
      ("books", 1, 4L, 4_000_000_000L)))
    // the DEFAULT split raises loudly on the same corpus (n_chars ≥ 2^23)
    // — never clamps, which would silently re-order the cap
    val ex = intercept[Exception] {
      TextOps.sourceCapState(longDocs, k = 2).collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("encode domain"), s"expected domain raise, got: $msgs")
    // producer/finisher agreement is the caller's contract; the guard on
    // nonsense widths is loud at plan build
    intercept[IllegalArgumentException] {
      TextOps.sourceCapState(longDocs, k = 2, idBits = 62)
    }
  }
}
