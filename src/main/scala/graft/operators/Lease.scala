package graft.operators

import org.apache.spark.sql.SparkSession

/** Single-writer lease over an index (or corpus) directory — the
  * enforcement of the discipline every maintenance pass and streaming
  * bridge here documents ("single writer per index"): a cron
  * misconfiguration that runs `CorpusMain maintain` concurrently with a
  * `refresh`, or a bridge append during a compaction's staging swap,
  * must refuse loudly instead of interleaving two writers' renames.
  *
  * Mechanics: `<dir>/_LEASE` is created with `overwrite = false` —
  * single-file create-if-absent is atomic on HDFS and on the object
  * stores whose rename is copy+delete (the `_COMMIT` marker's argument)
  * — holding (owner, ISO-8601 acquire time, JVM name) for the refusal
  * message. Completion (or failure inside the leased block) releases
  * it; only a crashed JVM leaves the file behind.
  *
  * READERS ARE NEVER BLOCKED: probes do not consult the lease — a
  * probe overlapping a staging swap fails loudly on the missing
  * sub-dataset and retries, the long-documented contract. The lease is
  * writer-vs-writer only.
  *
  * STALE-LEASE TAKEOVER, the operator contract: a refusal names the
  * holder and its acquire time; after confirming that holder's process
  * is dead (the lease file cannot tell a slow writer from a crashed
  * one — that is operational knowledge), break the lease with
  * [[Lease.breakLease]] / `CorpusMain break-lease <dir>` and re-run
  * the interrupted pass (every mutating pass here documents its
  * re-run-to-completion recovery). Breaking the lease of a LIVE writer
  * re-creates exactly the double-writer hazard the lease exists for.
  */
object Lease {

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def leasePath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_LEASE")

  /** Acquire the lease on `dir` or refuse loudly naming the holder.
    * Prefer [[withLeases]], which pairs every acquire with its
    * release. */
  def acquire(spark: SparkSession, dir: String, owner: String): Unit = {
    val path = leasePath(dir)
    val fs = fsOf(spark, path)
    val stamp = s"$owner\n${java.time.Instant.now()}\n${
      java.lang.management.ManagementFactory.getRuntimeMXBean.getName}"
    try {
      val out = fs.create(path, false)
      // the create succeeded — the lease is OURS from here on. A
      // failure writing the stamp must not masquerade as "held by
      // another writer" (nor orphan an empty lease nobody releases):
      // clean up our own file and surface the real IO failure.
      try {
        try out.write(stamp.getBytes("UTF-8")) finally out.close()
      } catch {
        case e: java.io.IOException =>
          try fs.delete(path, false)
          catch { case ie: java.io.IOException => e.addSuppressed(ie) }
          throw e
      }
    } catch {
      case e: java.io.IOException =>
        if (!fs.exists(path)) throw e // a real IO failure, not a holder
        val holder =
          try {
            val in = fs.open(path)
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              .replace('\n', ' ')
            finally in.close()
          } catch { case _: java.io.IOException => "<unreadable>" }
        throw new IllegalStateException(
          s"$dir is held by another writer [$holder] — single-writer " +
            s"discipline refuses a concurrent '$owner'. Wait for the " +
            "holder to finish; if its process crashed, break the stale " +
            "lease (Lease.breakLease / CorpusMain break-lease) and " +
            "re-run the interrupted pass to completion first", e)
    }
  }

  /** Release a lease this process acquired. Missing file is a no-op
    * (idempotent — a crashed-then-broken lease may already be gone). */
  def release(spark: SparkSession, dir: String): Unit = {
    val path = leasePath(dir)
    val fs = fsOf(spark, path)
    if (fs.exists(path)) fs.delete(path, false)
  }

  /** Operator-invoked stale-lease takeover — see the scaladoc's
    * contract: only after confirming the recorded holder is dead. */
  def breakLease(spark: SparkSession, dir: String): Unit =
    release(spark, dir)

  /** Held leases under `root` (root itself + direct children — the
    * [[breakAllUnder]] blast radius), one row per lease: (dir, owner,
    * acquired ISO-8601, held seconds, holder JVM name). The
    * look-before-you-break half of the takeover contract: a refusal
    * names ONE holder; this surveys every lease a wedged root holds so
    * the operator can check the recorded JVMs for liveness and judge
    * staleness from the age BEFORE breaking anything. Purely
    * diagnostic — reads files, never blocks or mutates.
    */
  def status(spark: SparkSession, root: String):
      Seq[(String, String, String, Long, String)] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = fsOf(spark, rootPath)
    val candidates = root +: (
      if (fs.exists(rootPath))
        fs.listStatus(rootPath).filter(_.isDirectory)
          .map(_.getPath.toString).toSeq
      else Seq.empty)
    candidates.flatMap(d => statusOf(spark, d).map {
      case (owner, acquired, heldSec, jvm) =>
        (d, owner, acquired, heldSec, jvm)
    })
  }

  /** [[status]] for ONE directory: (owner, acquired, heldSec, jvm) of
    * `dir`'s own lease, None when unleased. The single-file read a
    * caller that already holds the path wants (e.g. the fsck survey) —
    * no child listing. */
  def statusOf(spark: SparkSession,
      dir: String): Option[(String, String, Long, String)] = {
    val p = leasePath(dir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val stamp =
        try {
          val in = fs.open(p)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        } catch { case _: java.io.IOException => "" }
      val parts = stamp.split('\n')
      val (owner, acquired, jvm) = (
        parts.lift(0).getOrElse("<unreadable>"),
        parts.lift(1).getOrElse(""),
        parts.lift(2).getOrElse("<unknown>"))
      val heldSec =
        try java.time.Duration.between(
          java.time.Instant.parse(acquired),
          java.time.Instant.now()).getSeconds
        catch { case _: java.time.format.DateTimeParseException => -1L }
      Some((owner, acquired, heldSec, jvm))
    }
  }

  /** Takeover for a crashed MULTI-DIR pass (a refresh holds the corpus
    * dir plus up to five family dirs — one `break-lease` per dir would
    * make recovery a six-command hunt): breaks the lease on `root`
    * itself and on every DIRECT child directory holding one, returning
    * the dirs actually broken. Same contract as [[breakLease]] — only
    * after confirming the recorded holder is dead; the stale leases of
    * ONE crashed pass are exactly root-plus-children, so one level is
    * the right blast radius (never recursive — a deeper unrelated
    * index tree keeps its live writers' leases). */
  def breakAllUnder(spark: SparkSession, root: String): Seq[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = fsOf(spark, rootPath)
    val candidates = root +: (
      if (fs.exists(rootPath))
        fs.listStatus(rootPath).filter(_.isDirectory)
          .map(_.getPath.toString).toSeq
      else Seq.empty)
    candidates.filter { d =>
      val held = fs.exists(leasePath(d))
      if (held) release(spark, d)
      held
    }
  }

  /** Run `body` holding the leases on every dir in `dirs` (acquired in
    * sorted order, all released on exit — success OR failure; only a
    * JVM crash leaves them held). Duplicate dirs collapse. */
  def withLeases[A](spark: SparkSession, dirs: Seq[String],
      owner: String)(body: => A): A = {
    val ordered = dirs.distinct.sorted
    val held = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      ordered.foreach { d => acquire(spark, d, owner); held += d }
      body
    } finally held.reverseIterator.foreach(release(spark, _))
  }
}
