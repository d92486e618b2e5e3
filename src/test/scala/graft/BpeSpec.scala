package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE tokenizer: hand-computed Sennrich merges, greedy-by-rank
  * encoding, invariants, model round-trip.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  // the paper's running example, counts weighted by word frequency
  private val sennrich = Array(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("train replays the hand-computed Sennrich merge sequence " +
      "(weighted pair counts, count-then-lexicographic tie-break)") {
    // pair counts round 1: (e,s)=9 (s,t)=9 (t,</w>)=9 tie on count,
    // lexicographic left breaks it: e < s < t -> (e,s); then es+t,
    // est+</w>; then the low/lower family: (l,o)=7 (o,w)=7 -> (l,o),
    // then (lo,w)
    val m = Bpe.trainOnTypes(sennrich, 5)
    assert(m === Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")))
  }

  test("encode applies merges greedy-by-rank; concatenation invariant; " +
      "more merges never increase the subword count") {
    val merges = Bpe.trainOnTypes(sennrich, 5)
    val docs = Seq(
      (0L, "low newest"),
      (1L, "lowest"),   // unseen word: prefix merges still fire
      (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = Bpe.encode(docs, merges).orderBy($"doc_id")
      .select($"doc_id", $"subwords", $"n_subwords").collect()
      .map(x => (x.getLong(0), x.getSeq[String](1), x.getInt(2)))
    // "low" -> l o w </w> -> lo w </w> -> low </w>;
    // "newest" -> n e w es t </w> -> n e w est </w> -> n e w est</w>
    assert(r(0)._2 === Seq("low", "</w>", "n", "e", "w", "est</w>"))
    assert(r(0)._3 === 6)
    // "lowest": low + est</w> via (e,s),(es,t),(est,</w>),(l,o),(lo,w)
    assert(r(1)._2 === Seq("low", "est</w>"))
    assert(r(2)._2 === Seq.empty && r(3)._2 === Seq.empty)
    // invariant: stripping </w> and concatenating reproduces the
    // normalized words
    val joined = r(0)._2.mkString("").replace("</w>", " ").trim
    assert(joined === "low newest")
    // monotone: k merges never tokenize to MORE subwords than k-1
    val counts = (0 to 5).map { k =>
      Bpe.encode(docs.where($"doc_id" === 0L), merges.take(k))
        .select($"n_subwords").head().getInt(0)
    }
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
    // zero merges = the raw character+</w> stream
    assert(counts(0) === "lownewest".length + 2)
  }

  test("training stops early when no pair repeats; distributed " +
      "wordTypes cap is deterministic") {
    // all-distinct characters: every pair count is 1 -> zero merges
    assert(Bpe.trainOnTypes(Array(("abc", 1L), ("xyz", 1L)), 10) ===
      Seq.empty)
    val docs = Seq((0L, "b b b a a c"), (1L, "B A a")).toDF("doc_id", "text")
    // lowercased counts: a=4 b=4 c=1; cap 2 keeps (a,4),(b,4) — count
    // desc, lexicographic tie
    val types = Bpe.wordTypes(docs, 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(types.toSeq === Seq(("a", 4L), ("b", 4L)))
  }

  test("model round-trip preserves merge order; params-less and " +
      "rank-holed models refuse") {
    val merges = Bpe.trainOnTypes(sennrich, 5)
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Bpe.writeModel(spark, merges, dir)
    assert(Bpe.readModel(spark, dir) === merges)
    // encoding under the stored model == encoding under the in-memory
    // merges, bit for bit
    val docs = Seq((0L, "low lower newest widest")).toDF("doc_id", "text")
    val a = Bpe.encode(docs, merges).select($"subwords").head()
      .getSeq[String](0)
    val b = Bpe.encode(docs, Bpe.readModel(spark, dir))
      .select($"subwords").head().getSeq[String](0)
    assert(a === b)
    // crashed write (no params) refuses
    val crashed = java.nio.file.Files.createTempDirectory("bpec").toString
    merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .write.parquet(s"$crashed/merges")
    intercept[IllegalArgumentException] {
      Bpe.readModel(spark, crashed)
    }
    // a rank hole refuses instead of silently mis-ranking
    val holed = java.nio.file.Files.createTempDirectory("bpeh").toString
    Seq((0, "e", "s"), (2, "es", "t")).toDF("rank", "left", "right")
      .write.parquet(s"$holed/merges")
    Seq((2L, "bpe_merges")).toDF("n_merges", "family")
      .write.parquet(s"$holed/params")
    intercept[IllegalArgumentException] {
      Bpe.readModel(spark, holed)
    }
  }

  test("the count-only kernel segments identically to the encoder") {
    import graft.functions.native
    val merges = Bpe.trainOnTypes(sennrich, 5)
    val docs = Seq((0L, "low lower newest widest"), (1L, "lowest"),
      (2L, ""), (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val enc = Bpe.encode(docs, merges)
      .select($"doc_id", $"n_subwords",
        native.bpe_count(Bpe.bpeTokens($"text"), merges).as("n2"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    enc.foreach { case (id, a, b) => assert(a === b, s"doc $id") }
  }

  test("the end-of-word marker is unreachable: no learned merge " +
      "concatenates to '</w>', and lists minting it refuse") {
    // a corpus drowning in the literal word "</w>" — its character
    // symbols are < / w >, and the unguarded greedy walk would mint a
    // merged symbol EQUAL to the marker (ambiguous word boundaries)
    val types = Array(("</w>", 50L), ("low", 2L))
    val m = Bpe.trainOnTypes(types, 10)
    assert(m.nonEmpty)
    assert(m.forall { case (l, r) => l + r != "</w>" })
    // the pathological word still encodes, and the concatenation
    // invariant survives it: concat == word + marker, per word
    val docs = Seq((0L, "</w> low")).toDF("doc_id", "text")
    val sub = Bpe.encode(docs, m).select($"subwords").head()
      .getSeq[String](0)
    assert(sub.mkString("") === "</w>" + "</w>" + "low" + "</w>")
    // a foreign/hand-built list that mints the marker refuses at the
    // persistence boundary AND at kernel construction
    val bad = Seq(("<", "/"), ("</", "w>"))
    intercept[IllegalArgumentException] {
      Bpe.writeModel(spark, bad,
        java.nio.file.Files.createTempDirectory("bpeeow").toString)
    }
    intercept[IllegalArgumentException] {
      new graft.functions.BpeEncodeExpr.Coder(bad)
    }
    // a PERSISTED pre-guard model refuses at the READ boundary (on
    // the driver, with the retrain recovery) — not deep inside an
    // executor task when the Coder constructs (hand-write the legacy
    // layout; writeModel itself refuses such lists now)
    val pre = java.nio.file.Files.createTempDirectory("bpepre").toString
    Seq((0, "<", "/"), (1, "</", "w>")).toDF("rank", "left", "right")
      .write.parquet(s"$pre/merges")
    Seq((2L, "bpe_merges")).toDF("n_merges", "family")
      .write.parquet(s"$pre/params")
    val e = intercept[IllegalArgumentException] {
      Bpe.readModel(spark, pre)
    }
    assert(e.getMessage.contains("retrain"), e.getMessage)
  }

  test("the DECODE sentinels are mint-unreachable like the marker: " +
      "training on text drowning in literal '<unk>'/'<|endoftext|>' " +
      "never mints them, the vocabulary can never carry them, and " +
      "foreign lists refuse at the persist and kernel boundaries") {
    // ML/web scrapes carry these strings literally all the time — a
    // minted in-vocabulary symbol EQUAL to a sentinel would make
    // decoded output indistinguishable from OOV damage (<unk>) or
    // grow phantom document boundaries (<|endoftext|>, which
    // decodeWords additionally force-terminates)
    val types = Array(("<unk>", 60L), ("<|endoftext|>", 40L), ("lo", 2L))
    val m = Bpe.trainOnTypes(types, 40)
    assert(m.nonEmpty)
    assert(m.forall { case (l, r) =>
      !graft.functions.BpeEncodeExpr.Reserved.contains(l + r) })
    // the pathological words still encode; concat invariant intact
    val docs = Seq((0L, "<unk> <|endoftext|>")).toDF("doc_id", "text")
    val sub = Bpe.encode(docs, m).select($"subwords").head()
      .getSeq[String](0)
    assert(sub.mkString("") === "<unk>" + "</w>" + "<|endoftext|>" + "</w>")
    // so NO id can ever decode to a sentinel string: the vocabulary
    // (alphabet + minted symbols) excludes them by construction
    val model = Bpe.BpeModel(Bpe.alphabetOf(types), m)
    val syms = graft.functions.BpeEncodeExpr
      .vocabIds(model.alphabet, model.merges).map(_._1)
    assert(!syms.contains(Bpe.OovSymbol) &&
      !syms.contains(Bpe.EosSymbol))
    // and the decode round trip through ids survives the corpus
    val ids = Bpe.encodeIds(docs, model)
    val decoded = ids.select(array_join(
        Bpe.decodeWords(Bpe.decodeIds($"ids", model)), " ").as("d"))
      .head().getString(0)
    assert(decoded === "<unk> <|endoftext|>")
    // foreign lists minting a sentinel refuse at persist AND kernel
    val bad = Seq(("<", "u"), ("<u", "nk"), ("<unk", ">"))
    intercept[IllegalArgumentException] {
      Bpe.writeModel(spark, bad,
        java.nio.file.Files.createTempDirectory("bpesent").toString)
    }
    intercept[IllegalArgumentException] {
      new graft.functions.BpeEncodeExpr.Coder(bad)
    }
  }

  test("the ID tier: vocab ids are deterministic (alphabet then " +
      "merges, first mint wins), encodeIds is the vocab-inverse of " +
      "encode, OOV code points map to 0, n_ids == n_subwords") {
    val docs = Seq((0L, "low newest"), (1L, "lowest"),
      (2L, "zzz"), // 'z' never appears in the training types
      (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val model = operators.Bpe.BpeModel(
      operators.Bpe.alphabetOf(sennrich),
      operators.Bpe.trainOnTypes(sennrich, 5))
    // alphabet: sorted distinct code points of the types + '</w>'
    assert(model.alphabet ===
      Seq("d", "e", "i", "l", "n", "o", "r", "s", "t", "w", "</w>"))
    val v = graft.functions.BpeEncodeExpr
      .vocabIds(model.alphabet, model.merges).toMap
    // ids: alphabet 1..11 in order, merges 12.. in rank order
    assert(v("d") === 1 && v("</w>") === 11)
    assert(v("es") === 12 && v("est") === 13 && v("est</w>") === 14 &&
      v("lo") === 15 && v("low") === 16)
    // duplicate mints: (a,bc) and (ab,c) both -> abc; first rank wins
    assert(graft.functions.BpeEncodeExpr.vocabIds(Seq("a", "b", "c"),
      Seq(("b", "c"), ("a", "bc"), ("ab", "c"))).toMap.size === 5)
    val enc = Bpe.encode(docs, model.merges).orderBy($"doc_id")
      .select($"subwords").collect().map(_.getSeq[String](0))
    val ids = Bpe.encodeIds(docs, model).orderBy($"doc_id")
      .select($"ids", $"n_ids").collect()
      .map(r => (r.getSeq[Int](0), r.getInt(1)))
    // the id stream is the symbol stream through the vocab, OOV -> 0
    enc.zip(ids).foreach { case (syms, (idSeq, n)) =>
      assert(idSeq === syms.map(s => v.getOrElse(s, 0)))
      assert(n === syms.length)
    }
    // 'z' is outside the training alphabet: OOV ids, but the Eow
    // marker of that word still resolves
    assert(ids(2)._1 === Seq(0, 0, 0, v("</w>")))
    // the vocab DataFrame mirrors the kernel's table exactly
    val vdf = operators.Bpe.vocab(spark, model).collect()
      .map(r => (r.getString(1), r.getInt(0))).toMap
    assert(vdf === v)
  }

  test("complete-model round-trip: alphabet + merges persist " +
      "params-last; legacy merges-only dirs refuse readFullModel but " +
      "keep readModel; rank holes refuse") {
    val model = operators.Bpe.BpeModel(
      operators.Bpe.alphabetOf(sennrich),
      operators.Bpe.trainOnTypes(sennrich, 5))
    val dir = java.nio.file.Files.createTempDirectory("bpefull").toString
    Bpe.writeModel(spark, model, dir)
    val back = Bpe.readFullModel(spark, dir)
    assert(back === model)
    // merges-only readers keep working on the new layout
    assert(Bpe.readModel(spark, dir) === model.merges)
    // ids under the stored model == ids under the in-memory one
    val docs = Seq((0L, "low newest zest")).toDF("doc_id", "text")
    assert(Bpe.encodeIds(docs, back).select($"ids").head()
      .getSeq[Int](0) ===
      Bpe.encodeIds(docs, model).select($"ids").head().getSeq[Int](0))
    // a legacy merges-only model refuses the id-bearing read with the
    // retrain recovery, while readModel still serves it
    val legacy = java.nio.file.Files.createTempDirectory("bpeleg").toString
    Bpe.writeModel(spark, model.merges, legacy)
    val e = intercept[IllegalArgumentException] {
      Bpe.readFullModel(spark, legacy)
    }
    assert(e.getMessage.contains("legacy"), e.getMessage)
    assert(Bpe.readModel(spark, legacy) === model.merges)
    // an alphabet rank hole refuses instead of silently mis-assigning
    val holed = java.nio.file.Files.createTempDirectory("bpefh").toString
    Bpe.writeModel(spark, model, holed)
    Seq((0, "a"), (2, "b")).toDF("rank", "symbol")
      .write.mode("overwrite").parquet(s"$holed/alphabet")
    intercept[IllegalArgumentException] {
      Bpe.readFullModel(spark, holed)
    }
  }

  test("model content digest: deterministic, count-blind-proof " +
      "(same-count models differ), framing-unambiguous, stamped by " +
      "writeModel and verified by readFullModel") {
    import operators.Bpe.BpeModel
    val mA = BpeModel(Seq("a", "b", "c", "</w>"), Seq(("a", "b")))
    // SAME counts (4 alphabet, 1 merge), different content — the
    // realistic season-retrain shape a count-only gate waves through
    val mB = BpeModel(Seq("a", "b", "d", "</w>"), Seq(("a", "b")))
    val mC = BpeModel(Seq("a", "b", "c", "</w>"), Seq(("b", "a")))
    assert(Bpe.modelDigest(mA) === Bpe.modelDigest(mA.copy()))
    assert(Bpe.modelDigest(mA) !== Bpe.modelDigest(mB))
    assert(Bpe.modelDigest(mA) !== Bpe.modelDigest(mC))
    // merge ORDER is content (rank changes the greedy segmentation)
    val mD = BpeModel(Seq("a", "b", "c", "</w>"),
      Seq(("a", "b"), ("b", "c")))
    val mE = BpeModel(Seq("a", "b", "c", "</w>"),
      Seq(("b", "c"), ("a", "b")))
    assert(Bpe.modelDigest(mD) !== Bpe.modelDigest(mE))
    // framing: symbols must not concatenate ambiguously across the
    // alphabet/merge boundary (length-prefixed sections)
    val mF = BpeModel(Seq("a", "bc", "</w>"), Seq(("a", "bc")))
    val mG = BpeModel(Seq("ab", "c", "</w>"), Seq(("ab", "c")))
    assert(Bpe.modelDigest(mF) !== Bpe.modelDigest(mG))
    // the merges digest is a disjoint domain (never compares equal to
    // a model digest even over identical strings)
    assert(Bpe.mergesDigest(mA.merges) !== Bpe.modelDigest(mA))
    assert(Bpe.mergesDigest(mD.merges) !== Bpe.mergesDigest(mE.merges))
    // writeModel stamps it; readFullModel round-trips and verifies
    val dir = java.nio.file.Files.createTempDirectory("bpedig").toString
    Bpe.writeModel(spark, mA, dir)
    assert(spark.read.parquet(s"$dir/params").head()
      .getAs[String]("model_digest") === Bpe.modelDigest(mA))
    assert(Bpe.readFullModel(spark, dir) === mA)
    // mixed provenance (one sub-dataset overwritten by a same-shape
    // foreign write) refuses on the digest, not silently mis-decodes
    val dirB = java.nio.file.Files.createTempDirectory("bpedigB").toString
    Bpe.writeModel(spark, mB, dirB)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/alphabet"), true)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$dirB/alphabet"), fs,
      new org.apache.hadoop.fs.Path(s"$dir/alphabet"), false,
      spark.sparkContext.hadoopConfiguration)
    val e = intercept[IllegalArgumentException] {
      Bpe.readFullModel(spark, dir)
    }
    assert(e.getMessage.contains("model_digest"), e.getMessage)
    // a pre-digest-era model (params without the column) still reads —
    // consumers recompute the digest from the returned model
    val legacy = java.nio.file.Files.createTempDirectory("bpedigL")
      .toString
    Bpe.writeModel(spark, mA, legacy)
    spark.read.parquet(s"$legacy/params").drop("model_digest")
      .write.mode("overwrite").parquet(s"$legacy/params2")
    fs.delete(new org.apache.hadoop.fs.Path(s"$legacy/params"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$legacy/params2"),
      new org.apache.hadoop.fs.Path(s"$legacy/params"))
    assert(Bpe.readFullModel(spark, legacy) === mA)
  }

  test("decode round-trips: decodeWords(decodeIds(encodeIds(text))) " +
      "== normTokens(text) for in-vocabulary text; OOV, eos, and " +
      "bad-id conventions are pinned") {
    import operators.{Bpe, TextAnalysis}
    val docs = Seq(
      (0L, "low lower newest widest"),
      (1L, "newest low lowest"),
      (2L, "  Low\tLOWER  newest ")).toDF("doc_id", "text")
    // the alphabet of the full type table covers every code point, so
    // nothing is OOV and the round trip must be exact
    val model = Bpe.trainModel(docs, numMerges = 6, maxTypes = 100)
    val got = Bpe.encodeIds(docs, model)
      .select($"doc_id",
        Bpe.decodeWords(Bpe.decodeIds($"ids", model)).as("words"),
        TextAnalysis.normTokens($"text").as("want"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2), s"doc ${r.get(0)}")
    }
    // subword-level inverse: decodeIds inverts the id stream symbol
    // for symbol (encode's string stream, verbatim)
    val pair = Bpe.encodeIds(Bpe.encode(docs, model.merges), model)
      .select(Bpe.decodeIds($"ids", model).as("dec"), $"subwords")
      .collect()
    pair.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
    // eos decodes to the standalone <|endoftext|> word between docs
    val eos = Bpe.eosIdOf(model)
    val packed = Bpe.encodeIds(docs.where($"doc_id" < 2), model)
      .orderBy($"doc_id")
      .select($"ids").collect().map(_.getSeq[Int](0))
      .reduce((a, b) => (a :+ eos) ++ b)
    val decodedPacked = Seq(Tuple1(packed)).toDF("ids")
      .select(Bpe.decodeWords(Bpe.decodeIds($"ids", model)).as("w"))
      .head().getSeq[String](0)
    assert(decodedPacked ===
      (Seq("low", "lower", "newest", "widest", Bpe.EosSymbol) ++
        Seq("newest", "low", "lowest")))
    // OOV (id 0) decodes to <unk> inside its word; a foreign id is
    // loud, not a throw — the audit can count the damage
    val weird = Seq(Tuple1(Seq(0, eos + 7))).toDF("ids")
      .select(Bpe.decodeIds($"ids", model).as("s")).head()
      .getSeq[String](0)
    assert(weird === Seq(Bpe.OovSymbol, s"<bad:${eos + 7}>"))
    // ... and an OOV code point in real text round-trips to a word
    // containing <unk> (the original code point is gone by design)
    val ov = Seq((9L, "low löw")).toDF("doc_id", "text")
    val ow = Bpe.encodeIds(ov, model)
      .select(Bpe.decodeWords(Bpe.decodeIds($"ids", model)).as("w"))
      .head().getSeq[String](0)
    assert(ow.head === "low" && ow(1).contains(Bpe.OovSymbol), ow)
  }

  test("decodeAudit counts the decode path's lossy edges: bad ids, " +
      "OOV symbols, lost-terminator word merges (upper bound), and " +
      "an unterminated tail") {
    import operators.Bpe
    def audit(subs: Seq[String]): (Int, Int, Int, Int, Int) = {
      val r = Seq(Tuple1(subs)).toDF("subs")
        .select(Bpe.decodeAudit($"subs").as("a")).head()
        .getStruct(0)
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
    }
    // healthy stream: zero on every damage axis
    assert(audit(Seq("lo", "w</w>", "lower</w>")) === (3, 0, 0, 0, 0))
    // the planted OOV-FINAL-SYMBOL edge: "w</w>" decoded to <unk>, so
    // "lo" swallowed "lower" — ONE countable merge-risk word
    assert(audit(Seq("lo", "<unk>", "lower</w>")) === (3, 0, 1, 1, 0))
    // benign FINAL-char OOV (terminator survived as its own symbol):
    // <unk> sits word-final — NOT counted as merge risk
    assert(audit(Seq("caf", "<unk>", "</w>")) === (3, 0, 1, 0, 0))
    // a foreign id is loud and counted; here non-final, so no
    // unterminated flag from it
    assert(audit(Seq("<bad:99>", "w</w>")) === (2, 1, 0, 0, 0))
    // a sequence cut mid-word: the tail fragment lacks its terminator
    assert(audit(Seq("lo", "w</w>", "low")) === (3, 0, 0, 0, 1))
    // eos as the final symbol is a boundary, not an unterminated tail
    assert(audit(Seq("low</w>", Bpe.EosSymbol)) === (2, 0, 0, 0, 0))
    // multi-occurrence word: trailing <unk> is benign, the mid one
    // still counts the word once
    assert(audit(Seq("a", "<unk>", "b", "<unk>", "</w>"))
      === (5, 0, 2, 1, 0))
    // ---- through the REAL pipeline: encode, then plant the damage by
    // zeroing the id of the first word's terminator-bearing symbol —
    // the audit counts exactly one merged word on the decoded stream
    val docs = Seq((0L, "low lower newest")).toDF("doc_id", "text")
    val model = Bpe.trainModel(docs, numMerges = 6, maxTypes = 100)
    val subs = Bpe.encode(docs, model.merges)
      .select($"subwords").head().getSeq[String](0)
    val cut = subs.indexWhere(_.endsWith("</w>"))
    assert(cut >= 0 && cut < subs.length - 1) // damage mid-stream
    val ids = Bpe.encodeIds(docs, model)
      .select($"ids").head().getSeq[Int](0)
      .zipWithIndex.map { case (id, i) => if (i == cut) 0 else id }
    val r = Seq(Tuple1(ids)).toDF("ids")
      .select(Bpe.decodeAudit(Bpe.decodeIds($"ids", model)).as("a"))
      .head().getStruct(0)
    assert(r.getAs[Int]("n_unk") === 1)
    assert(r.getAs[Int]("n_word_merge_risk") === 1)
    assert(r.getAs[Int]("n_bad") === 0)
    // the healthy stream for the same doc audits clean
    val clean = Bpe.encodeIds(docs, model)
      .select(Bpe.decodeAudit(Bpe.decodeIds($"ids", model)).as("a"))
      .head().getStruct(0)
    assert(clean.getAs[Int]("n_unk") === 0 &&
      clean.getAs[Int]("n_word_merge_risk") === 0 &&
      clean.getAs[Int]("n_unterminated") === 0)
  }

  test("trainBpeModel builds a readable model from a published corpus " +
      "under the model dir's lease") {
    val root = java.nio.file.Files.createTempDirectory("bpetm").toString
    Seq((0L, "low low low newest newest"), (1L, "lower widest newest"))
      .toDF("doc_id", "text")
      .write.parquet(s"$root/c/corpus")
    val n = graft.Pipeline.trainBpeModel(spark, s"$root/c",
      s"$root/model", numMerges = 8)
    val merges = Bpe.readModel(spark, s"$root/model")
    assert(merges.size === n && n > 0)
    // the cron line persists the COMPLETE model: the id tier reads it
    val full = Bpe.readFullModel(spark, s"$root/model")
    assert(full.merges === merges &&
      full.alphabet.contains("</w>") && full.alphabet.size > 1)
    // lease released on completion: a second build succeeds
    assert(graft.Pipeline.trainBpeModel(spark, s"$root/c",
      s"$root/model", numMerges = 8) === n)
    // a held lease refuses the build
    graft.operators.Lease.acquire(spark, s"$root/model", "someone-else")
    intercept[IllegalStateException] {
      graft.Pipeline.trainBpeModel(spark, s"$root/c", s"$root/model")
    }
  }
}
