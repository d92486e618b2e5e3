package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, TextAnalysis}

class VocabClusterSpec extends SparkSuite {
  import spark.implicits._

  test("vocabulary counts tokens with deterministic tie-break") {
    val docs = Seq((0L, "a b b c"), (1L, "b c c a")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabulary(docs, 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("b", 3L), ("c", 3L), ("a", 2L)))
  }

  test("top terms per doc rank by tf/df, ties lexicographic") {
    val docs = Seq(
      (0L, "rare rare common"),
      (1L, "common other")).toDF("doc_id", "text")
    val got = TextAnalysis.topTermsPerDoc(docs, k = 1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    // doc 0: rare tf=2 df=1 → 2.0 beats common 1/2
    assert(got(0) === ((0L, "rare", 2L, 1L)))
    // doc 1: other tf=1 df=1 → 1.0 beats common 1/2
    assert(got(1) === ((1L, "other", 1L, 1L)))
  }

  test("near-dup clustering finds transitive components with min-id " +
      "canonical") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.nearDupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
      11L -> 10L))
  }

  test("chained components converge across iterations") {
    // a path graph 0-1-2-...-6 needs several propagation rounds
    val pairs = (0L until 6L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.nearDupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet === Set(0L))
    assert(got.size === 7)
  }

  test("star-rounds components solve a 200-node chain within the " +
      "O(log n) round budget and agree with propagation on random " +
      "graphs") {
    // a 200-node path has diameter 199: propagation would need ~200
    // rounds; alternating stars must finish well inside maxIter = 25
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val stars = Dedup.connectedComponentsStars(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stars.size === 200)
    assert(stars.values.toSet === Set(0L))
    // random sparse graphs: same components as min-label propagation
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(120)(
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("id_a", "id_b")
    val viaStars = Dedup.connectedComponentsStars(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaProp = Dedup.nearDupClusters(pairs, maxIter = 100).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStars === viaProp)
  }

  test("repetition features count token and bigram duplication") {
    val docs = Seq(
      (0L, "spam spam spam spam"),
      (1L, "all words are different here"),
      (2L, "one")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionFeatures(docs).orderBy($"doc_id")
      .collect()
    // doc 0: 4 tokens, 1 distinct; bigrams: 3× "spam spam"
    assert(got(0).getInt(1) === 4 && got(0).getInt(2) === 1)
    assert(got(0).getInt(4) === 3)
    // doc 1: no repetition
    assert(got(1).getInt(1) === 5 && got(1).getInt(2) === 5)
    assert(got(1).getInt(4) === 1)
    // doc 2: single token → zero bigrams, null top count
    assert(got(2).getInt(3) === 0 && got(2).isNullAt(4))
  }

  test("redaction replaces IPs and emails, counts matches") {
    val docs = Seq(
      (0L, "contact bob@example.com from 192.168.0.1 or 10.0.0.2"),
      (1L, "no pii here")).toDF("doc_id", "text")
    val got = TextAnalysis.redact(docs).orderBy($"doc_id").collect()
    assert(got(0).getString(1) ===
      "contact <EMAIL> from <IP> or <IP>")
    assert(got(0).getInt(2) === 2 && got(0).getInt(3) === 1)
    assert(got(1).getString(1) === "no pii here")
    assert(got(1).getInt(2) === 0 && got(1).getInt(3) === 0)
  }

  test("multimodal resize preserves aspect ratio, matches the codec " +
      "formula") {
    val decoded = Seq((0L, 640, 480, 1), (1L, 100, 50, 1), (2L, 10, 10, 1))
      .toDF("media_id", "width", "height", "n_frames")
    val got = Multimodal.resized(decoded, 224, 224).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getInt(4))).toSeq.sortBy(_._1)
    assert(got(0) === ((0L, Multimodal.FakeCodec.resize(640, 480, 224,
      224)._1, Multimodal.FakeCodec.resize(640, 480, 224, 224)._2)))
    assert(got(1) === ((1L, 100, 50)))  // already fits, unchanged
    assert(got(2) === ((2L, 10, 10)))
    // aspect ratio within integer truncation
    val (ow, oh) = (got(0)._2, got(0)._3)
    assert(math.abs(ow.toDouble / oh - 640.0 / 480) < 0.02)
  }
}
