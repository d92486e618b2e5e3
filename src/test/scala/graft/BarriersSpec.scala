package graft

import graft.operators.{Barriers, Dedup}

/** Durable-barrier mode: reliable checkpoints for the iterative
  * operators must change fault-tolerance, never results or the default
  * plan. NOTE: the fail-fast test must run before any test sets a
  * checkpoint dir (setCheckpointDir is sticky on the shared session).
  */
class BarriersSpec extends SparkSuite {
  import spark.implicits._

  // chain + star + isolated pair: exercises multi-round convergence in
  // both clustering strategies
  private def edgePairs = Seq(
    (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
    (10L, 11L), (12L, 11L), (12L, 13L),
    (20L, 21L)).toDF("id_a", "id_b")

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("durable barriers without a checkpoint dir fail fast with " +
      "guidance, and the default mode needs none") {
    // setCheckpointDir is sticky on the shared SparkContext and cannot
    // be unset, so the no-dir regime is only observable before any
    // suite sets one. assume (not assert): under test filtering or
    // reordering that runs a dir-setting test first, this test cancels
    // with the reason instead of failing spuriously.
    assume(spark.sparkContext.getCheckpointDir.isEmpty,
      "checkpoint dir already set on the shared session; the fail-fast " +
        "regime is unobservable in this JVM — run this suite first")
    // default mode: no dir needed, everything works
    assert(Dedup.nearDupClusters(edgePairs).count() === 11L)
    spark.conf.set(Barriers.DurableBarriersKey, "true")
    try {
      val e = intercept[IllegalArgumentException] {
        Dedup.nearDupClusters(edgePairs).count()
      }
      assert(e.getMessage.contains("setCheckpointDir"))
    } finally spark.conf.set(Barriers.DurableBarriersKey, "false")
  }

  test("durable barriers produce identical labels for both clustering " +
      "strategies and actually write reliable checkpoints") {
    val localProp = labelsOf(Dedup.nearDupClusters(edgePairs))
    val localStars = labelsOf(Dedup.connectedComponentsStars(edgePairs))
    assert(localProp === localStars) // sanity: same fixpoint
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    spark.conf.set(Barriers.DurableBarriersKey, "true")
    try {
      assert(labelsOf(Dedup.nearDupClusters(edgePairs)) === localProp)
      assert(labelsOf(Dedup.connectedComponentsStars(edgePairs))
        === localStars)
      // the rounds really went to the reliable location
      val walk = java.nio.file.Files.walk(ckpt)
      val written = try walk.count() finally walk.close()
      assert(written > 1L, s"no reliable checkpoint files under $ckpt")
    } finally spark.conf.set(Barriers.DurableBarriersKey, "false")
  }

  test("semantic dedup survivors are mode-independent") {
    val rnd = new scala.util.Random(11)
    val emb = (0 until 120).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    // kmeansIters = 0: hash-sampled centroids are fully deterministic
    // (no distributed double sums), so any survivor difference here is
    // the barrier mode's fault and nothing else's. Threshold 0.2 makes
    // the pair graph dense enough for a real multi-round CC run.
    def run() = Dedup.semanticDedup(emb, nlist = 8, threshold = 0.2,
      kmeansIters = 0).select($"vec_id").collect()
      .map(_.getLong(0)).toSet
    val local = run()
    assert(local.size < 120) // the CC tail actually dropped duplicates
    spark.conf.set(Barriers.DurableBarriersKey, "true")
    try assert(run() === local)
    finally spark.conf.set(Barriers.DurableBarriersKey, "false")
  }
}
