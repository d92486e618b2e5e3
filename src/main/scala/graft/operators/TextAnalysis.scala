package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table (extension tier, SURVEY.md §7): token counting,
  * quality scoring, n-gram-heuristic language ID, document fingerprinting.
  *
  * Everything here is built from codegen'd `functions._` expressions — no
  * UDFs — so the whole stage stays inside WholeStageCodegen and the parquet
  * scan only reads the columns actually used.
  */
object TextAnalysis {

  /** Explicit whitespace class used by every tokenizer/normalizer here
    * (and spliced verbatim into the DuckDB oracles): Java's `\s`
    * includes vertical tab (\x0B) while RE2's does not, so a \s-based
    * pattern silently diverges between the engines on a document
    * containing one. One literal, both sides.
    */
  val WsPattern = "[ \\t\\n\\r\\f\\x0B]"

  /** Whitespace tokens, empties dropped (so leading/trailing space is
    * harmless). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** The NORMALIZED word tokens every model surface shares —
    * lowercased, whitespace-class collapsed, empties dropped,
    * null-safe. Defined ONCE: [[tokenStream]], the BPE tokenizer, the
    * DSIR featurization, BM25's query side and the quality classifier
    * all tokenize through this, so no two surfaces can disagree on
    * word boundaries (and the DuckDB oracles mirror exactly one
    * pipeline). */
  def normTokens(text: Column): Column =
    tokens(regexp_replace(lower(coalesce(text, lit(""))),
      WsPattern + "+", " "))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword proxy: word chunks of <=4 chars — counts how many
    * subword units a byte-pair-style tokenizer would roughly emit. Pure
    * regexp, codegen-friendly.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]{1,4}"), lit(0)))

  private val Punct = "[.,!?;:]"
  private val StopEn = "(the|and|of|to|a|in|is|it)"

  /** Quality-score features: char length, token count, punctuation count,
    * stopword count, mean token length ×100 (as a long, to keep the output
    * integral and engine-portable).
    */
  def qualityFeatures(df: DataFrame, text: Column = col("text")): DataFrame =
    df.select(
      col("doc_id"),
      length(text).as("n_chars"),
      tokenCount(text).as("n_tokens"),
      size(regexp_extract_all(text, lit(Punct), lit(0))).as("n_punct"),
      size(regexp_extract_all(lower(text),
        lit("\\b" + StopEn + "\\b"), lit(0))).as("n_stopwords"))

  /** Language-ID by stopword-hit heuristic: count hits of per-language
    * high-frequency word lists, argmax with deterministic lexicographic
    * tie-break. The word lists are tiny on purpose — this is the n-gram
    * heuristic shape (score per language → argmax), not a trained model.
    */
  val LangMarkers: Seq[(String, String)] = Seq(
    "de" -> "(der|die|das|und|nicht|ist)",
    "en" -> "(the|and|of|to|is|in)",
    "es" -> "(el|la|los|las|que|de)",
    "fr" -> "(le|la|les|et|est|que)",
    "zh" -> "(de|shi|le|bu|wo|zai)")

  def langScores(text: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, words) =>
      lang -> size(regexp_extract_all(lower(text),
        lit("\\b" + words + "\\b"), lit(0)))
    }

  /** `(doc_id, lang_pred, score)` — argmax over [[langScores]]; ties go to
    * the lexicographically-first language (the Seq is sorted).
    */
  def languageId(df: DataFrame, text: Column = col("text")): DataFrame = {
    val base = df.select(col("doc_id"), text.as("__t"))
    val scored = langScores(col("__t")).foldLeft(base) {
      case (acc, (lang, score)) => acc.withColumn(s"score_$lang", score)
    }
    val best = LangMarkers.map(_._1).foldLeft(lit(-1) -> lit("und")) {
      case ((bestScore, bestLang), lang) =>
        val s = col(s"score_$lang")
        (when(s > bestScore, s).otherwise(bestScore),
          when(s > bestScore, lit(lang)).otherwise(bestLang))
    }
    scored.select(col("doc_id"), best._2.as("lang_pred"), best._1.as("score"))
  }

  /** Content fingerprint: md5 of the whitespace-normalized, lowercased text.
    * Stable across engines and run order — the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), WsPattern + "+", " "))

  /** Rolling polynomial fingerprint (Rabin-Karp shape) over the normalized
    * text — order-sensitive, so transpositions change it, unlike a bag of
    * words. Backed by the native codegen'd [[graft.functions.RollingHashExpr]].
    */
  def rollingHash(text: Column, base: Long = 257L,
      mod: Long = 1000000007L): Column =
    graft.functions.native.rolling_hash(
      regexp_replace(lower(text), WsPattern + "+", " "), base, mod)

  /** Gopher / MassiveText quality rules (Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * arXiv:2112.11446, §A.1.1): the standard rule-based pre-training
    * quality screen. Emits the rule INPUTS plus the `keep` verdict as
    * columns — not a filter — so a pipeline can audit why a document
    * fails before dropping it:
    *  - word count in [minWords, maxWords]
    *  - mean word length in [3, 10] characters
    *  - symbol-to-word ratio (`#` or `...`) ≤ 0.1
    *  - ≤ 90% of lines start with a bullet (`-`, `*`, `•`)
    *  - ≤ 30% of lines end with an ellipsis
    *  - ≥ 80% of words contain an (ASCII) alphabetic character
    *  - ≥ `minStopHits` (paper default 2) distinct hits from the
    *    paper's stop-word list
    *
    * Map-only: every figure is a per-row projection of codegen'd
    * built-ins (counts from regexp/split, ratios as integer÷integer
    * IEEE divisions) — no UDFs, no shuffle, and every column is
    * bit-reproducible by any engine doing the same integer counts
    * (the q79 oracle). Zero-word documents report 0 ratios and fail
    * the word-count rule rather than dividing by zero.
    */
  /** The seven Gopher rule inputs as named Columns over `text` — the
    * single definition behind [[gopherRules]] (audit form) and
    * [[gopherKeep]] (filter form), so the two can never drift.
    */
  private def gopherFeatures(text: Column): Seq[(String, Column)] = {
    // \s+ split, NOT the single-space [[tokens]] helper: this screen's
    // line rules exist for multi-line documents, where a space-only
    // split would merge the last word of each line into the first word
    // of the next (undercounting words, inflating mean length)
    val ws = filter(split(text, WsPattern + "+"), t => t =!= lit(""))
    val nWords = size(ws).cast("long")
    // sum of word lengths = chars that are not split whitespace
    // (dropped empty tokens contribute 0), one codegen'd replace
    val wordChars = length(regexp_replace(text, WsPattern + "+", ""))
      .cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines,
      l => l.rlike("^" + WsPattern + "*[-*•]"))).cast("long")
    val nEllipsis = size(filter(lines,
      l => l.rlike("(\\.\\.\\.|…)" + WsPattern + "*$"))).cast("long")
    val nAlpha = size(filter(ws,
      w => w.rlike("[A-Za-z]"))).cast("long")
    // '…' counts as an ellipsis here exactly like the line rule above —
    // the two rules must agree on what an ellipsis is
    val nSymbols = (size(regexp_extract_all(text, lit("#"), lit(0))) +
      size(regexp_extract_all(text, lit("(\\.\\.\\.|…)"), lit(0))))
      .cast("long")
    // distinct stop-word hits: presence, not frequency (the rule wants
    // >= minStopHits DIFFERENT stop words). ONE regex pass — extract
    // every bounded stop-word match, count distinct words — where a
    // per-word rlike stack re-scans the text once per stop word (8x
    // the hottest regex cost of this screen)
    val stopHits = size(array_distinct(regexp_extract_all(lower(text),
      lit("\\b(the|be|to|of|and|that|have|with)\\b"), lit(1))))
      .cast("long")
    val safe = (n: Column, d: Column) =>
      when(d === 0, lit(0.0)).otherwise(n.cast("double") / d)
    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> safe(wordChars, nWords),
      "symbol_ratio" -> safe(nSymbols, nWords),
      "bullet_frac" -> safe(nBullet, nLines),
      "ellipsis_frac" -> safe(nEllipsis, nLines),
      "alpha_frac" -> safe(nAlpha, nWords),
      "n_stop_hits" -> stopHits)
  }

  /** The keep verdict over [[gopherFeatures]]-shaped columns. */
  private def gopherVerdict(f: Map[String, Column], minWords: Long,
      maxWords: Long, minStopHits: Long): Column =
    f("n_words") >= minWords && f("n_words") <= maxWords &&
      f("mean_word_len") >= 3.0 && f("mean_word_len") <= 10.0 &&
      f("symbol_ratio") <= 0.1 &&
      f("bullet_frac") <= 0.9 &&
      f("ellipsis_frac") <= 0.3 &&
      f("alpha_frac") >= 0.8 &&
      f("n_stop_hits") >= minStopHits

  def gopherRules(df: DataFrame, text: Column = col("text"),
      minWords: Long = 50L, maxWords: Long = 100000L,
      minStopHits: Long = 2L): DataFrame = {
    val feats = gopherFeatures(text)
    df.select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
      .withColumn("keep",
        gopherVerdict(feats.map { case (n, _) => n -> col(n) }.toMap,
          minWords, maxWords, minStopHits))
  }

  /** [[gopherRules]]' verdict as a pure filter Column — the
    * pipeline-composition form ([[CorpusPrep.prepare]]): a corpus
    * screen is `docs.where(gopherKeep(col("text")))`, one map-only
    * projection with no join-back and no extra pass.
    */
  def gopherKeep(text: Column, minWords: Long = 50L,
      maxWords: Long = 100000L, minStopHits: Long = 2L): Column =
    gopherVerdict(gopherFeatures(text).toMap, minWords, maxWords,
      minStopHits)

  /** Repetition signals (the duplicate-text quality heuristics used to
    * filter training corpora): token duplication and the dominance of the
    * most-repeated bigram. All per-row array arithmetic — integers out, so
    * the figures are engine-portable; turn into ratios downstream.
    */
  def repetitionFeatures(df: DataFrame,
      text: Column = col("text")): DataFrame = {
    val toks = filter(split(regexp_replace(lower(text), WsPattern + "+", " "), " "),
      t => t =!= lit(""))
    // single kernel pass: a nested higher-order formulation re-evaluates
    // the token-array expression once per lambda call — combinatorial
    // blowup measured at sf0.1 (see RepetitionStatsExpr)
    // explode(array(...)) is a Generate barrier: the kernel struct is
    // evaluated ONCE per row even though four fields are projected
    // (CollapseProject would otherwise inline the kernel per field)
    df.select(col("doc_id"),
        explode(array(graft.functions.native.repetition_stats(toks)))
          .as("r"))
      .select(col("doc_id"),
        col("r.n_tokens"), col("r.n_distinct_tokens"),
        col("r.n_bigrams"), col("r.top_bigram_count"))
  }

  /** PII-style redaction: IPv4s and emails replaced with placeholder
    * tags; RE2-and-Java-compatible patterns (no lookaround/backrefs) so
    * the same regexes run in any engine. Returns the redacted text plus
    * match counts.
    */
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  def redact(df: DataFrame, text: Column = col("text")): DataFrame =
    df.select(
      col("doc_id"),
      regexp_replace(regexp_replace(text, Ipv4Pattern, "<IP>"),
        EmailPattern, "<EMAIL>").as("redacted"),
      size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0)))
        .as("n_ips"),
      size(regexp_extract_all(text, lit(EmailPattern), lit(0)))
        .as("n_emails"))

  /** Normalized (lowercased, whitespace-collapsed) token stream:
    * (doc_id, token) rows. */
  def tokenStream(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(normTokens(col("text"))).as("token"))

  /** Corpus vocabulary: top `limit` tokens by frequency, ties broken
    * lexicographically — the term-count pass of a tokenizer-training
    * pipeline. One explode + one partial+final count aggregate; top-k is a
    * TakeOrdered, never a full sort.
    */
  def vocabulary(docs: DataFrame, limit: Int = 200): DataFrame =
    tokenStream(docs)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(limit)

  /** Unigram language-model quality score — the engine-portable core
    * of CCNet-style perplexity filtering (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", arXiv:1911.00359 §4.3: documents scored by an LM, low
    * log-prob = junk): train a top-`topV` unigram model ON the corpus
    * (vocabulary membership deterministic — boundary ties break
    * lexicographically) with add-one smoothing
    * `p(t) = (c(t) + 1) / (N + |V| + 1)` (c = the token's corpus count
    * if it is in the vocabulary, 0 otherwise = OOV; N = total corpus
    * tokens), and score each document by its mean token ln-probability.
    * Returns (doc_id, n_tokens, n_oov, avg_logp) — avg_logp rounded to
    * 6 decimals (engine-portable: every per-token logp is a pure
    * function of integer counts, each doc's tokens live in one
    * partition so the partial sum folds in text order, and a 1-ulp
    * ln() divergence cannot move a 6-decimal rounding except within
    * ~1e-14 of a boundary); zero-token docs report (0, 0, null).
    *
    * Scale shape: one token-count aggregate, a bounded
    * TakeOrdered top-V (the q47 vocabulary pass), ONE broadcast of the
    * ≤ topV vocabulary + the two scalar totals, then a map-side left
    * join and one per-doc aggregate — the q48 cost class, shuffles ∝
    * corpus tokens, nothing vocabulary-wide crosses the wire twice.
    */
  def lmScore(docs: DataFrame, topV: Int = 65536): DataFrame = {
    val toks = tokenStream(docs)
    val vocab = vocabulary(docs, topV)
    val totals = toks.agg(count(lit(1)).as("n_total"))
      .crossJoin(vocab.agg(count(lit(1)).as("v_size")))
    val perDoc = toks
      .join(broadcast(vocab), Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), coalesce(col("cnt"), lit(0L)).as("c"),
        col("n_total"), col("v_size"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("c") === 0, 1L).otherwise(0L)).as("n_oov"),
        round(avg(log((col("c") + 1).cast("double") /
          (col("n_total") + col("v_size") + 1).cast("double"))), 6)
          .as("avg_logp"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        col("avg_logp"))
  }

  /** Exact heavy hitters (tokens with global count ≥ `minCount`) via the
    * scalable sketch-then-verify pipeline: a Misra–Gries
    * `TypedImperativeAggregate` ([[graft.functions.MisraGriesAgg]]) finds
    * a candidate superset in ONE pass with ≤ k counters per task and ≤ k
    * rows through the final merge — never a full-vocabulary shuffle —
    * then an exact recount of only the candidates makes the output exact.
    * The superset guarantee needs total tokens n < minCount·(k+1), and
    * the sketch now carries n so the precondition is CHECKED at runtime:
    * if the corpus outgrew the sketch, heavyHitters falls back to the
    * plain exact groupBy recount instead of silently dropping rows.
    * Size `k` so the fallback never fires (k rows of sketch state is the
    * entire memory and shuffle footprint, so overshooting is cheap).
    */
  def heavyHitters(docs: DataFrame, minCount: Long,
      k: Int = 8192): DataFrame = {
    require(minCount > 0, "minCount must be positive")
    val toks = tokenStream(docs)
    def exactRecount(in: DataFrame): DataFrame =
      in.groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= minCount)
    // one distributed pass; the struct row coming back to the driver is
    // index metadata (≤ k items), not data
    val sketch = toks
      .agg(graft.functions.sketches.misra_gries(col("token"), k)
        .as("sketch"))
      .select(col("sketch.n").as("n"),
        col("sketch.candidates.item").as("items"))
      .head()
    val n = sketch.getLong(0)
    if (n >= minCount * (k + 1L)) {
      // precondition void — a true heavy hitter may have been evicted.
      // Exact-but-heavier path: full-vocabulary count (still partial-agg
      // before the shuffle; correct at any scale, just not sketch-cheap).
      exactRecount(toks)
    } else {
      val items = sketch.getSeq[String](1)
      val candidates = docs.sparkSession.createDataset(items)(
        org.apache.spark.sql.Encoders.STRING).toDF("token")
      exactRecount(
        toks.join(broadcast(candidates), Seq("token"), "left_semi"))
    }
  }

  /** Per-document top terms by tf/df weighting (document-frequency
    * normalized term frequency — the engine-portable core of tf-idf: the
    * ratio of two ints is one IEEE division, bit-identical across engines,
    * where a log-based idf would not be). df has one row per DISTINCT
    * token — at corpus scale that is billions of rows, so it must NOT be
    * broadcast: both sides are keyed by `token`, a plain shuffle join
    * co-partitions them. The per-doc window is fine (doc_id is
    * high-cardinality).
    */
  def topTermsPerDoc(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = tokenStream(docs)
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy((col("tf").cast("double") / col("df")).desc,
        col("token").asc)
    tf.join(df.hint("shuffle_hash"), Seq("token"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("rank"))
  }
}
