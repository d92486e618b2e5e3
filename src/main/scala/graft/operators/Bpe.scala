package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{native, BpeEncodeExpr}

/** Byte-pair-encoding subword tokenizer (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units",
  * arXiv:1508.07909): TRAIN a merge list from corpus word-type counts,
  * PERSIST it under the model-write discipline, and APPLY it
  * corpus-wide as a map-only projection — the real-subword upgrade of
  * [[TextAnalysis.subwordCount]]'s fixed-regex proxy, and the missing
  * middle of a training-data pipeline's token accounting (budgets,
  * shards and packing all count in MODEL tokens, not whitespace
  * words).
  *
  * Split of labor, sized for 100 TB:
  *   - the word-TYPE count is distributed (one token-stream aggregate,
  *     shuffle ∝ corpus tokens collapsing map-side to ≤ |vocab| rows);
  *   - the merge LOOP runs on the driver over a deterministically
  *     CAPPED type table (top `maxTypes` by count, ties
  *     lexicographic — the [[graft.Pipeline.trainQualityModel]]
  *     seed-cap discipline, and standard practice: subword vocabularies
  *     are trained on bounded samples, applied corpus-wide). BPE
  *     training is inherently sequential (merge m+1's counts depend on
  *     merge m), so "distributing" it would serialize the cluster
  *     behind one pair-argmax per merge; bounding the driver table is
  *     the honest shape, and the cap is a disclosed knob.
  *   - ENCODING is the scale path: a native codegen'd kernel
  *     ([[graft.functions.BpeEncodeExpr]]) carrying the model-sized
  *     merge list into generated code — map-only, no join, no shuffle,
  *     no per-row driver contact.
  */
object Bpe {

  /** Lowercased, whitespace-collapsed word tokens — the SAME
    * normalization as [[TextAnalysis.tokenStream]], stated once here
    * so training and encoding can never disagree on word boundaries.
    */
  def bpeTokens(text: Column): Column = TextAnalysis.normTokens(text)

  /** Distributed word-type table: top `maxTypes` (word, cnt) by count,
    * ties lexicographic — deterministic, bounded (TakeOrdered). */
  def wordTypes(docs: DataFrame, maxTypes: Int,
      text: Column = col("text")): DataFrame =
    docs.select(explode(bpeTokens(text)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(maxTypes)

  /** Train a BPE merge list: `numMerges` greedy merges over the capped
    * word-type table. Deterministic end to end — the cap's tie-break
    * is lexicographic, and each merge step picks the highest pair
    * count with (left, right) lexicographic as the total tie-break.
    * Training stops early when no pair occurs in ≥ 2 type instances
    * weighted by count (a pair seen once compresses nothing).
    * Returns the merges in rank order.
    */
  def train(docs: DataFrame, numMerges: Int = 1000,
      maxTypes: Int = 20000,
      text: Column = col("text")): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be > 0, got $numMerges")
    require(maxTypes > 0, s"maxTypes must be > 0, got $maxTypes")
    val types = wordTypes(docs, maxTypes, text).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainOnTypes(types, numMerges)
  }

  /** The sequential merge loop, factored for spec-level bit-equality
    * checks against hand-computed merges. */
  private[graft] def trainOnTypes(types: Array[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val words: Array[(mutable.ArrayBuffer[String], Long)] =
      types.map { case (w, c) =>
        val b = new mutable.ArrayBuffer[String](w.length + 1)
        var ci = 0
        while (ci < w.length) {
          val cp = w.codePointAt(ci)
          val n = Character.charCount(cp)
          b += w.substring(ci, ci + n)
          ci += n
        }
        b += BpeEncodeExpr.Eow
        (b, c)
      }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    var go = true
    while (m < numMerges && go) {
      val pc = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      // deterministic argmax: highest count, then lexicographic pair.
      // Pairs whose CONCATENATION equals a RESERVED symbol are never
      // learned: the markers live in the same symbol namespace as
      // corpus characters, so a corpus word containing the literal
      // characters "</w>", "<unk>" or "<|endoftext|>" (ML/web scrapes
      // carry the latter two constantly) could otherwise mint a
      // merged symbol EQUAL to a convention marker — ambiguous word
      // boundaries for the terminator, and decode output where real
      // corpus text is indistinguishable from OOV damage or document
      // edges for the sentinels. Skipping the pair keeps every marker
      // unreachable: every multi-char symbol is a merge result, and
      // no permitted merge produces one.
      var best: (String, String) = null
      var bestC = 0L
      pc.foreach { case (k, c) =>
        if (!BpeEncodeExpr.Reserved.contains(k._1 + k._2) &&
            (c > bestC || (c == bestC && best != null &&
              (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2))))) {
          best = k; bestC = c
        }
      }
      if (best == null || bestC < 2L) go = false
      else {
        merges += best
        val (l, r) = best
        words.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == l && syms(i + 1) == r) {
              syms(i) = l + r
              syms.remove(i + 1)
            } else i += 1
          }
        }
        m += 1
      }
    }
    merges.toSeq
  }

  /** Encode every document under a trained merge list: adds
    * `subwords` (the BPE symbol stream in token order, `</w>`
    * end-of-word symbols included) and `n_subwords`. Map-only — the
    * merges ride the codegen'd kernel as a reference object; at any
    * corpus size this is a projection, never a join.
    */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
      text: Column = col("text")): DataFrame =
    docs.withColumn("subwords", native.bpe_encode(bpeTokens(text), merges))
      .withColumn("n_subwords", size(col("subwords")))

  // -------------------------------------- the token-ID tier (vocab)

  /** A complete BPE model: the training ALPHABET (every distinct code
    * point of the capped word-type table, sorted, plus the end-of-word
    * marker) and the learned merges. The alphabet is what the
    * merges-only form cannot give you: vocabulary IDS need the id of
    * every single-character symbol, including the ones no merge ever
    * touched — without the stored alphabet, an unmerged rare character
    * would silently become out-of-vocabulary on one engine and not
    * another. String-level encoding ([[encode]]) keeps working from
    * merges alone. */
  final case class BpeModel(alphabet: Seq[String],
      merges: Seq[(String, String)])

  /** Canonical SHA-256 over length-prefixed UTF-8 sections under a
    * domain tag — the one framing behind [[modelDigest]] and
    * [[mergesDigest]], unambiguous for arbitrary symbol strings
    * (length prefixes, not separators: corpus code points can be
    * anything) and deliberately engine-portable (pure bytes, no JVM
    * hashCode). */
  private def sectionDigest(domain: String,
      sections: Iterator[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def put(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      md.update(java.nio.ByteBuffer.allocate(4).putInt(b.length).array())
      md.update(b)
    }
    put(domain)
    sections.foreach(put)
    md.digest().map("%02x".format(_)).mkString
  }

  /** CONTENT digest of a complete model — the ordered alphabet and the
    * ordered merge list, not their counts. Two different models can
    * (and realistically do) agree on (n_merges, n_alphabet): a season
    * retrain over a drifted corpus runs the merge loop to the same cap
    * and keeps a same-language corpus' character set — so any gate
    * deciding "same id space?" from counts alone silently passes a
    * retrain and mixes vocabularies. This digest is what those gates
    * compare ([[graft.Pipeline.writeTrainingShards]]' append,
    * [[graft.Pipeline.readTrainingShards]]' model check); the counts
    * stay as the friendlier first-line diagnostic. */
  def modelDigest(model: BpeModel): String =
    sectionDigest("graft-bpe-model-v1",
      Iterator(model.alphabet.size.toString) ++ model.alphabet.iterator
        ++ Iterator(model.merges.size.toString)
        ++ model.merges.iterator.flatMap { case (l, r) =>
          Iterator(l, r) })

  /** CONTENT digest of a bare merge list — the unit of account for
    * STRING-level encoding (subword segmentation and counts depend
    * only on the merges; the alphabet only shapes ids), so the refresh
    * report's per-batch tokenizer provenance records this form: it is
    * computable for legacy merges-only models too. A distinct domain
    * tag keeps the two digest spaces disjoint by construction. */
  def mergesDigest(merges: Seq[(String, String)]): String =
    sectionDigest("graft-bpe-merges-v1",
      Iterator(merges.size.toString) ++
        merges.iterator.flatMap { case (l, r) => Iterator(l, r) })

  /** The training alphabet of a word-type table: distinct code-point
    * symbols across all types, lexicographically sorted (deterministic
    * like every id-bearing artifact here), with [[graft.functions
    * .BpeEncodeExpr.Eow]] appended as the one multi-char base symbol. */
  private[graft] def alphabetOf(
      types: Array[(String, Long)]): Seq[String] = {
    val syms = scala.collection.mutable.SortedSet.empty[String]
    types.foreach { case (w, _) =>
      var ci = 0
      while (ci < w.length) {
        val n = Character.charCount(w.codePointAt(ci))
        syms += w.substring(ci, ci + n)
        ci += n
      }
    }
    syms.toSeq :+ graft.functions.BpeEncodeExpr.Eow
  }

  /** [[train]] returning the complete model (alphabet + merges) —
    * same capped type table, same merge loop, one collect. */
  def trainModel(docs: DataFrame, numMerges: Int = 1000,
      maxTypes: Int = 20000,
      text: Column = col("text")): BpeModel = {
    require(numMerges > 0, s"numMerges must be > 0, got $numMerges")
    require(maxTypes > 0, s"maxTypes must be > 0, got $maxTypes")
    val types = wordTypes(docs, maxTypes, text).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    BpeModel(alphabetOf(types), trainOnTypes(types, numMerges))
  }

  /** The model's id table as (id, symbol) rows — [[graft.functions
    * .BpeEncodeExpr.vocabIds]]' single definition, exposed for
    * inspection and for decoding an id stream back to symbols. Id 0
    * (out-of-vocabulary) has no symbol and no row. */
  def vocab(spark: SparkSession, model: BpeModel): DataFrame = {
    import spark.implicits._
    graft.functions.BpeEncodeExpr.vocabIds(model.alphabet, model.merges)
      .map { case (s, i) => (i, s) }.toDF("id", "symbol")
  }

  /** The end-of-document separator id convention for a model: one past
    * the vocabulary (ids 1..V; 0 is OOV) — the GPT `<|endoftext|>`
    * slot. Stated ONCE so the packer, the export, and any consumer
    * agree on which id marks a document edge. */
  def eosIdOf(model: BpeModel): Int =
    graft.functions.BpeEncodeExpr
      .vocabIds(model.alphabet, model.merges).size + 1

  /** Encode every document to VOCABULARY IDS under a trained model:
    * adds `ids` (array<int>, the subword stream as ids — id 0 marks a
    * code point outside the training alphabet) and `n_ids`. Map-only
    * like [[encode]]; `n_ids` always equals [[encode]]'s `n_subwords`
    * (same segmentation — the count never depends on vocabulary
    * membership, only the ID does). */
  def encodeIds(docs: DataFrame, model: BpeModel,
      text: Column = col("text")): DataFrame =
    docs.withColumn("ids", graft.functions.native.bpe_encode_ids(
        bpeTokens(text), model.alphabet, model.merges))
      .withColumn("n_ids", size(col("ids")))

  // ------------------------------------------------ the decode path

  /** Decoded stand-in for id 0 (a code point outside the training
    * alphabet — the original text is not recoverable from the id). */
  val OovSymbol = "<unk>"

  /** Decoded stand-in for the end-of-document separator id
    * ([[eosIdOf]]) — the GPT `<|endoftext|>` convention. */
  val EosSymbol = "<|endoftext|>"

  // both sentinels MUST be mint-unreachable ([[graft.functions
  // .BpeEncodeExpr.Reserved]] — the train/persist/read/kernel guards
  // all check that set): a corpus-minted symbol EQUAL to a sentinel
  // would make decode output indistinguishable from OOV damage or a
  // document edge. Cross-checked at class-load so the two definition
  // sites can never drift apart silently.
  require(graft.functions.BpeEncodeExpr.Reserved.contains(OovSymbol) &&
    graft.functions.BpeEncodeExpr.Reserved.contains(EosSymbol),
    "Bpe decode sentinels must be in BpeEncodeExpr.Reserved")

  /** Decode an id array back to its SUBWORD symbol stream — the
    * inverse of [[encodeIds]] for in-vocabulary ids, and the first
    * tool an operator reaches for on a suspicious training shard
    * (without it, "read the artifact back as text" is a hand-written
    * join against [[vocab]] with the `</w>`/eos/OOV conventions
    * re-derived by every reader). Map-only: the id→symbol table rides
    * the plan as one array literal (model-sized, the same scale class
    * as the merge list riding the encode kernel), so decoding a 100 TB
    * artifact is a projection — no join, no shuffle.
    *
    * Conventions, stated once: id 0 → [[OovSymbol]] (the original code
    * point is gone), V+1 → [[EosSymbol]], anything outside [0, V+1] →
    * `<bad:id>` (a foreign or mixed-model artifact — kept loud in the
    * output rather than throwing mid-scan, so an audit can COUNT the
    * damage).
    */
  def decodeIds(ids: Column, model: BpeModel): Column = {
    val syms = graft.functions.BpeEncodeExpr
      .vocabIds(model.alphabet, model.merges).map(_._1)
    val v = syms.size
    val lut = typedLit(syms)
    transform(ids, i =>
      when(i === lit(0), lit(OovSymbol))
        .when(i === lit(v + 1), lit(EosSymbol))
        .when(i >= lit(1) && i <= lit(v), element_at(lut, i))
        .otherwise(concat(lit("<bad:"), i.cast("string"), lit(">"))))
  }

  /** Reassemble a decoded subword stream into WORDS: concatenate
    * symbols up to each end-of-word marker and strip the marker —
    * `decodeWords(decodeIds(ids, m), m)` inverts [[encodeIds]] back to
    * [[bpeTokens]]' normalized word stream for in-vocabulary text
    * (BpeSpec pins the round trip). [[EosSymbol]] comes out as its own
    * word (a packed sequence holds many documents; the separator must
    * survive as a visible boundary, not glue two documents' words).
    * Lossy edges, disclosed: a word whose FINAL symbol decoded to
    * [[OovSymbol]] lost its marker and merges into the next word, and
    * a sequence cut mid-word ([[Sharding.materializeSequences]] cuts
    * at exact seqLen) leaves its trailing fragment unterminated — both
    * are audit-visible, neither silently drops ids.
    */
  def decodeWords(subwords: Column): Column = {
    val eow = graft.functions.BpeEncodeExpr.Eow
    val marked = transform(subwords, s =>
      when(s === lit(EosSymbol), concat(s, lit(eow))).otherwise(s))
    filter(
      split(array_join(marked, ""),
        java.util.regex.Pattern.quote(eow), -1),
      w => length(w) > 0)
  }

  /** Decode-damage AUDIT over a decoded subword stream ([[decodeIds]]
    * output): the disclosed lossy edges of the decode path, COUNTABLE —
    * one struct per stream
    * `(n_symbols, n_bad, n_unk, n_word_merge_risk, n_unterminated)`:
    *
    *   - `n_bad` — `<bad:id>` symbols (ids outside [0, V+1]: a foreign
    *     or mixed-model artifact; decode keeps them loud instead of
    *     throwing mid-scan exactly so this count exists);
    *   - `n_unk` — [[OovSymbol]] symbols (code points outside the
    *     training alphabet; the original text is gone by design, the
    *     word boundary usually intact);
    *   - `n_word_merge_risk` — words (in [[decodeWords]]' output)
    *     containing [[OovSymbol]] at a NON-final position: the
    *     countable upper bound on lost-terminator word merges (a word
    *     whose final symbol decoded to `<unk>` lost its `</w>` and
    *     swallowed the next word — after the swallow, its `<unk>` sits
    *     mid-word). Benign mid-word OOV lands in the same count
    *     because the two are post-hoc indistinguishable (the lost
    *     symbol's content is gone) — an upper bound an audit can
    *     STATE ("at most N words mangled") beats a disclosed-but-
    *     uncountable edge;
    *   - `n_unterminated` — 1 when the stream's final word lacks its
    *     terminator (a sequence cut mid-word by
    *     [[Sharding.materializeSequences]]' exact-seqLen cut — expect
    *     it on per-sequence decodes, never on per-document
    *     reconstructions), else 0.
    *
    * Map-only like the decode itself (HOFs over the already-decoded
    * array — no join, no shuffle); `CorpusMain audit-shards` sums it
    * across the artifact.
    */
  def decodeAudit(subwords: Column): Column = {
    val eow = graft.functions.BpeEncodeExpr.Eow
    val words = decodeWords(subwords)
    // occurrences of <unk> inside a word, via split (the symbol can
    // never overlap itself — it has distinct first/last chars)
    def occ(w: Column): Column =
      size(split(w, java.util.regex.Pattern.quote(OovSymbol), -1)) - 1
    val lastSym = element_at(subwords, -1)
    struct(
      size(subwords).as("n_symbols"),
      size(filter(subwords, s => s.startsWith("<bad:"))).as("n_bad"),
      size(filter(subwords, s => s === lit(OovSymbol))).as("n_unk"),
      size(filter(words, w =>
        occ(w) > when(w.endsWith(OovSymbol), lit(1)).otherwise(lit(0))))
        .as("n_word_merge_risk"),
      when(size(subwords) > 0 &&
          !(lastSym.endsWith(eow) || lastSym === lit(EosSymbol)),
        lit(1)).otherwise(lit(0)).as("n_unterminated"))
  }

  /** Persist a trained merge list under `dir`:
    *   - `merges/`: (rank, left, right) parquet, one file;
    *   - `params/`: ONE row (n_merges, family) written LAST — the
    *     params-last crash discipline every written family here uses.
    */
  def writeModel(spark: SparkSession, merges: Seq[(String, String)],
      dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    require(merges.nonEmpty, "writeModel: empty merge list — train first")
    // the training-side guard, re-stated at the persistence boundary:
    // a merge list minting a reserved symbol (foreign tooling, a
    // hand-built list) would make every consumer's subword stream
    // ambiguous at word boundaries — or its decode output conflate
    // real text with OOV damage / document edges — refuse before it
    // becomes a model
    require(merges.forall { case (l, r) =>
        !BpeEncodeExpr.Reserved.contains(l + r) },
      "writeModel: a merge's concatenation equals a reserved symbol " +
        s"(${BpeEncodeExpr.Reserved.mkString("'", "', '", "'")} are " +
        "convention markers in the subword/decode stream); retrain " +
        "(graft training never emits them)")
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(s"$dir/params")))
      fs.delete(new Path(s"$dir/params"), true)
    merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    Seq((merges.size.toLong, "bpe_merges"))
      .toDF("n_merges", "family")
      .coalesce(1).write.parquet(s"$dir/params")
  }

  /** Persist a COMPLETE model (alphabet + merges) under `dir`:
    * `alphabet/` (rank, symbol) joins `merges/` (rank, left, right),
    * and `params/` gains `n_alphabet` — still ONE row, written LAST
    * (the params-last crash discipline). [[readModel]] keeps reading
    * these models (merges only, backward-compatible); the id-bearing
    * consumers go through [[readFullModel]]. */
  def writeModel(spark: SparkSession, model: BpeModel,
      dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    require(model.merges.nonEmpty,
      "writeModel: empty merge list — train first")
    require(model.merges.forall { case (l, r) =>
        !graft.functions.BpeEncodeExpr.Reserved.contains(l + r) },
      "writeModel: a merge's concatenation equals a reserved symbol " +
        s"(${graft.functions.BpeEncodeExpr.Reserved
          .mkString("'", "', '", "'")} are convention markers in the " +
        "subword/decode stream); retrain (graft training never emits " +
        "them)")
    require(model.alphabet.contains(graft.functions.BpeEncodeExpr.Eow),
      "writeModel: the alphabet must carry the end-of-word marker — " +
        "every word's final symbol derives from it (trainModel always " +
        "includes it)")
    require(model.alphabet.distinct == model.alphabet,
      "writeModel: duplicate alphabet symbols would double-assign ids")
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(s"$dir/params")))
      fs.delete(new Path(s"$dir/params"), true)
    // alphabet/ and merges/ are independent driver-sized writes to
    // disjoint dirs, and params (below) was deleted first and lands
    // LAST — no reader accepts the layout whichever of the two lands
    // first, so they overlap (Par, guide §2.6: two fixed job floors
    // become one). Each thunk builds its OWN frame from the in-memory
    // model (Par's no-shared-lazy-frame contract holds trivially).
    Par.run(2)(Seq(
      () => model.alphabet.zipWithIndex.map { case (s, i) => (i, s) }
        .toDF("rank", "symbol")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/alphabet"),
      () => model.merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
        .toDF("rank", "left", "right")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")))
    // the params row carries the CONTENT digest next to the counts:
    // id-space provenance gates compare the digest (a same-count
    // retrain is the realistic silent-corruption path), humans read
    // the counts
    Seq((model.merges.size.toLong, model.alphabet.size.toLong,
        modelDigest(model), "bpe_merges"))
      .toDF("n_merges", "n_alphabet", "model_digest", "family")
      .coalesce(1).write.parquet(s"$dir/params")
  }

  /** Read a COMPLETE persisted model back. Refuses params-less dirs,
    * rank holes (both datasets), and LEGACY merges-only models (no
    * stored alphabet ⇒ no deterministic id for unmerged characters —
    * retrain with [[trainModel]] and persist the model form; string
    * encoding via [[readModel]] keeps working on legacy dirs). */
  def readFullModel(spark: SparkSession, dir: String): BpeModel = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(s"$dir/params")),
      s"$dir has no params/ — not a written BPE model (or its write " +
        "crashed before the params commit); re-run writeModel")
    val p = spark.read.parquet(s"$dir/params")
    require(p.schema.fieldNames.contains("n_alphabet"),
      s"$dir is a legacy merges-only BPE model — it stores no " +
        "alphabet, so vocabulary ids for unmerged characters would be " +
        "engine-dependent; retrain with trainModel and persist the " +
        "BpeModel form (readModel still reads this dir for string " +
        "encoding)")
    val pRow = p.head()
    val nA = pRow.getAs[Long]("n_alphabet")
    val rows = spark.read.parquet(s"$dir/alphabet")
      .orderBy(col("rank").asc).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("symbol")))
    require(rows.length.toLong == nA &&
        rows.zipWithIndex.forall { case ((rk, _), i) => rk == i },
      s"$dir/alphabet rank sequence is broken (expected 0..${nA - 1})" +
        " — refusing to mis-assign ids; re-run writeModel")
    // the merges half reuses THIS params row instead of re-reading it
    // (readModel standalone pays its own params read)
    val model = BpeModel(rows.map(_._2).toSeq,
      readMerges(spark, dir, pRow.getAs[Long]("n_merges")))
    // storage-integrity check when the write stamped a digest (models
    // written before the column read it back absent — tolerated, the
    // id-bearing CONSUMERS recompute the digest from this returned
    // model anyway): alphabet/ and merges/ are two datasets, and a
    // foreign overwrite of one of them between params commits is
    // exactly the mixed-provenance state the digest exists to catch
    if (p.schema.fieldNames.contains("model_digest")) {
      val stored = pRow.getAs[String]("model_digest")
      require(stored == modelDigest(model),
        s"$dir params' model_digest does not match the stored " +
          "alphabet++merges content — alphabet/ or merges/ was " +
          "overwritten outside writeModel (mixed provenance); " +
          "retrain and re-run writeModel")
    }
    model
  }

  /** Read a persisted merge list back in rank order. Refuses a
    * params-less dir (crashed write) and a rank sequence with holes
    * (corruption a blind zip would silently mis-rank). */
  def readModel(spark: SparkSession, dir: String): Seq[(String, String)] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(s"$dir/params")),
      s"$dir has no params/ — not a written BPE model (or its write " +
        "crashed before the params commit); re-run writeModel")
    readMerges(spark, dir,
      spark.read.parquet(s"$dir/params").head().getAs[Long]("n_merges"))
  }

  /** The merges half of [[readModel]] against an already-read params
    * count — [[readFullModel]] reuses its own params row through this
    * seam instead of paying a second params read. */
  private def readMerges(spark: SparkSession, dir: String,
      n: Long): Seq[(String, String)] = {
    val rows = spark.read.parquet(s"$dir/merges")
      .orderBy(col("rank").asc).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right")))
    require(rows.length.toLong == n &&
        rows.zipWithIndex.forall { case ((rk, _, _), i) => rk == i },
      s"$dir/merges rank sequence is broken (expected 0..${n - 1}) — " +
        "refusing to mis-rank; re-run writeModel")
    // the marker guard at the READ boundary: a model trained before
    // the guard existed (on marker-bearing text) must refuse HERE,
    // on the driver with the retrain recovery, not deep inside an
    // executor task when the Coder's own require fires mid-publish
    // (the early-refusal discipline)
    require(rows.forall { case (_, l, r) =>
        !graft.functions.BpeEncodeExpr.Reserved.contains(l + r) },
      s"$dir stores a merge whose concatenation equals a reserved " +
        s"symbol (${graft.functions.BpeEncodeExpr.Reserved
          .mkString("'", "', '", "'")} are convention markers in the " +
        "subword/decode stream — trained before the reserved-symbol " +
        "guard, on text containing the literal marker characters); " +
        "retrain and re-run writeModel")
    rows.map { case (_, l, r) => (l, r) }.toSeq
  }
}
