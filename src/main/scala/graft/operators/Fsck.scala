package graft.operators

import scala.collection.mutable.ListBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Read-only integrity survey over an index root (or corpus root) — the
  * operational `fsck` for the persisted-index tier. Every crash state
  * in this repo is DOCUMENTED (data-without-params refuses, a crashed
  * rebuild resumes from `rebuild_staged/`, a crashed shingle re-bucket
  * migration re-runs, compaction temps are swept by the next pass…),
  * but until now each was discovered one refusal at a time, mid-pass.
  * This survey reads the whole tree up front and names every anomaly
  * with its documented recovery, so an operator inspecting a wedged
  * root after a crash (or before a season's maintenance window) sees
  * the full repair list in one diagnostic instead of tripping over it.
  *
  * STRICTLY read-only: driver-side file listings plus params-footer
  * reads — no data jobs, no mutation, no lease taken (readers are
  * never blocked, and a diagnostic must run WHILE a writer is wedged).
  * Scale: cost ∝ directory and partition-dir COUNT, never rows — the
  * same metadata-sized footprint as a probe's params read.
  *
  * Severity contract:
  *   - `error`: probes or appends on this directory will refuse (or,
  *     worse, a bucket-pruned read would silently miss rows) until the
  *     named recovery runs;
  *   - `warn`: answers are unaffected, but an operator should know
  *     (held lease, crash leftovers awaiting sweep, legacy markers);
  *   - `ok`: one row per healthy recognized index, naming its family —
  *     the "survey saw it" receipt that distinguishes a clean index
  *     from one the walk never visited.
  */
object Fsck {

  /** One finding: directory, component ("params", "shingles", …),
    * severity ("ok" | "warn" | "error"), and the human diagnosis with
    * its recovery. */
  final case class Finding(dir: String, component: String,
      level: String, detail: String)

  /** Sub-dataset names that mark a directory as index data even when
    * `params/` is missing (the crashed-write state). */
  private val DataSubdirs = Set("bands", "shingles", "cells",
    "centroids", "pieces", "chunks", "hashes", "postings", "vectors",
    "doclen")

  /** Required data sub-datasets per family (params/ aside). */
  private val FamilySubdirs: Map[String, Seq[String]] = Map(
    "minhash" -> Seq("bands", "shingles"),
    "containment" -> Seq("postings", "shingles"),
    "chunk" -> Seq("chunks"),
    "hamming" -> Seq("pieces"),
    "benchmark" -> Seq("hashes"),
    "bm25" -> Seq("postings", "doclen"),
    "ivf" -> Seq("cells", "centroids"))

  /** Survey `root` and its direct children (the [[Lease.breakAllUnder]]
    * blast radius — an index root's families live one level down).
    * Findings most-severe-first, then by path. */
  def check(spark: SparkSession, root: String): Seq[Finding] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath))
      return Seq(Finding(root, "root", "error",
        s"$root does not exist"))
    // child paths keep the CALLER's root string verbatim (listStatus
    // would re-scheme a bare /tmp/... as file:/tmp/... and every
    // finding's dir would stop matching the operator's own paths)
    val children =
      fs.listStatus(rootPath).filter(_.isDirectory)
        .map(s => s"$root/${s.getPath.getName}").toSeq.sorted
    // distinct: a stagedWrite aside under corpus/ is visited twice
    // (once through the corpus-root surface, once as corpus/'s own
    // universal surface) and must report once
    val all = (checkDir(spark, fs, root) ++
      children.flatMap(d => checkDir(spark, fs, d))).distinct
    val sev = Map("error" -> 0, "warn" -> 1, "ok" -> 2)
    all.sortBy(f => (sev.getOrElse(f.level, 3), f.dir, f.component))
  }

  /** [[check]] as a DataFrame, for Spark-side consumers. */
  def checkDf(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    check(spark, root).toDF()
  }

  private def ls(fs: FileSystem, dir: String): Seq[(String, Boolean)] = {
    val p = new Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(s => (s.getPath.getName, s.isDirectory))
  }

  private def checkDir(spark: SparkSession, fs: FileSystem,
      dir: String): Seq[Finding] = {
    val entries = ls(fs, dir)
    val names = entries.map(_._1).toSet
    val b = ListBuffer.empty[Finding]

    // ---- universal surface: leases and maintenance-staging leftovers
    if (names.contains("_LEASE"))
      Lease.statusOf(spark, dir).foreach {
        case (owner, acquired, heldSec, jvm) =>
          b += Finding(dir, "_LEASE", "warn",
            s"held by '$owner' since $acquired (${heldSec}s, JVM $jvm) " +
              "— a live writer, or a crashed one awaiting break-lease; " +
              "see CorpusMain lease-status / break-lease")
      }
    // a stagedWrite aside (`_old_<leaf>`, '=' re-spelled '~') is NOT
    // always safe to delete: a crash BETWEEN the two renames leaves the
    // aside holding the destination's ONLY copy — tell the two states
    // apart by whether the destination is back
    def oldAside(parent: String, n: String): Finding = {
      val dest = n.stripPrefix("_old_").replace('~', '=')
      // list the aside's OWN parent — `names` is the enclosing dir's
      // listing and is the wrong one when parent = <dir>/corpus (it
      // would find a same-named SIBLING of corpus/ and call an orphan
      // aside safe); one extra listing per aside is diagnostic-only
      if (ls(fs, parent).exists(_._1 == dest))
        Finding(s"$parent/$n", "staging", "warn",
          s"completed staged-write aside ($dest is live; only its " +
            "delete was lost) — never read (invisible to Spark's " +
            "listing); safe to delete")
      else
        Finding(s"$parent/$n", "staging", "error",
          s"staged-write aside with NO live $dest — a crash between " +
            "the two staged renames; this aside holds the " +
            "destination's ONLY copy. Recover: rename it back to " +
            s"$dest, then re-run the interrupted pass. Do NOT delete")
    }
    // the shard export's crashed-overwrite generation floor: while
    // params/ is gone the floor holds the seq-id-space generation's
    // ONLY copy (writeTrainingShards re-runs restamp PAST it so
    // stale epoch-resume cursors keep refusing) — an operator
    // sweeping "stray underscore files" mid-crash would silently
    // reset the generation lineage, the exact cursor-acceptance
    // hazard the floor exists to close. Next to live params it is
    // inert debris (the next overwrite absorbs it via max()).
    if (names.contains("_layout_gen_floor")) {
      if (names.contains("params"))
        b += Finding(s"$dir/_layout_gen_floor", "staging", "warn",
          "completed overwrite's generation-floor leftover (params/ " +
            "re-landed; only the floor's delete was lost) — inert: " +
            "the next mode=overwrite absorbs it via max(); safe to " +
            "delete")
      else
        b += Finding(s"$dir/_layout_gen_floor", "staging", "error",
          "mid-overwrite crash: this floor holds the export's " +
            "seq-id-space generation — its ONLY copy while params/ " +
            "is gone. Do NOT delete; re-run the export " +
            "(mode=overwrite) — it restamps PAST the floor so stale " +
            "epoch-resume cursors keep refusing")
    }
    entries.foreach {
      case (n, true) if n.endsWith("__compact_tmp") ||
          n.endsWith("__old") =>
        b += Finding(s"$dir/$n", "staging", "warn",
          "crashed compaction leftover — never read by probes; the " +
            "next compactIndex sweeps it (safe to delete)")
      case (n, true) if n.startsWith("_stage_") =>
        b += Finding(s"$dir/$n", "staging", "warn",
          "crashed staged-write temp — never read (invisible to " +
            "Spark's listing: '_'-prefixed without '='); the next run " +
            "of the same pass overwrites it (safe to delete)")
      case (n, true) if n.startsWith("_old_") =>
        b += oldAside(dir, n)
      case _ => ()
    }

    // ---- corpus-root surface
    if (names.contains("corpus") || names.contains("reports")) {
      if (!names.contains("modalities"))
        b += Finding(dir, "modalities", "warn",
          "corpus predates the modality marker — the drift guard " +
            "validates from the index dirs until the next refresh " +
            "records modalities/")
      if (!names.contains("retraction_base"))
        b += Finding(dir, "retraction_base", "warn",
          "corpus predates the retraction ledger — the first " +
            "retraction pays one corpus count to stamp the base, once")
      ls(fs, s"$dir/corpus").foreach { case (n, isD) =>
        // stagedWrite's own temps/asides land HERE (the partitions'
        // parent) — report them with the staging semantics above, not
        // as foreign; other '_'/'.'-prefixed names are invisible to
        // Spark's listing and harmless
        if (isD && n.startsWith("_old_"))
          b += oldAside(s"$dir/corpus", n)
        else if (isD && n.startsWith("_stage_"))
          // text identical to the universal-surface finding: the same
          // leftover is also visited through corpus/ as a direct
          // child, and check()'s distinct must collapse the pair
          b += Finding(s"$dir/corpus/$n", "staging", "warn",
            "crashed staged-write temp — never read (invisible to " +
              "Spark's listing: '_'-prefixed without '='); the next run " +
              "of the same pass overwrites it (safe to delete)")
        else if (isD && !n.startsWith("batch_id=") &&
            !n.startsWith("_") && !n.startsWith("."))
          b += Finding(s"$dir/corpus/$n", "corpus", "error",
            "unexpected entry in the published corpus — batches are " +
              "batch_id=<n> partitions; a visible foreign dir breaks " +
              "the partition-column listing")
      }
    }

    // ---- streaming staging surface (stream_out/ roots): the bridges'
    // stagings are `batch_<epochId>` — digits, never '=' (which would
    // match the published corpus' `batch_id=<n>` partitions instead)
    entries.foreach {
      case (n, true) if n.matches("batch_[0-9]+") =>
        if (!ls(fs, s"$dir/$n").exists(_._1 == "_COMMIT"))
          b += Finding(s"$dir/$n", "_COMMIT", "warn",
            "marker-less partial staging (crash mid-batch) — the " +
              "bridge deletes and recomputes it on replay; safe")
      case _ => ()
    }

    // ---- index surface
    val dataPresent = names.intersect(DataSubdirs)
    val hasParams = names.contains("params")
    if (!hasParams && dataPresent.nonEmpty) {
      if (names.contains("rebuild_staged"))
        b += Finding(dir, "params", "error",
          "params/ absent with rebuild_staged/ present — a crashed " +
            "IVF rebuild mid-rewrite; every probe refuses. Recover: " +
            "re-run rebuildIvfIndex with explicit multiAssign/" +
            "quantizer/storage (the stored geometry died with params/)")
      else
        b += Finding(dir, "params", "error",
          s"data sub-datasets (${dataPresent.toSeq.sorted.mkString(", ")}) " +
            "with no params/ — a crashed index write; every " +
            "self-describing probe refuses. Recover: re-run the " +
            "interrupted writer to completion")
      return b.toList
    }
    // the MODEL families' canonical crash state: data written FIRST
    // (weights/merges/ratios), params/ LAST — a params-less model dir
    // is a crashed write every reader refuses, and must alarm here
    // exactly like a crashed index write (their subdir names are not
    // in DataSubdirs, so the check above cannot see them)
    val modelData = names.intersect(
      Set("weights", "merges", "ratios", "alphabet", "sequences"))
    if (!hasParams && modelData.nonEmpty) {
      modelData.toSeq.sorted.foreach { sub =>
        b += Finding(dir, sub, "error",
          s"model data $sub/ with no params/ — a crashed model or " +
            "export write (params are written LAST); every reader " +
            "refuses. Recover: re-run the matching writeModel/" +
            "writeDsirModel/writeTrainingShards to completion")
      }
      return b.toList
    }
    if (!hasParams) return b.toList // not an index dir

    val family =
      try Dedup.indexFamily(spark, dir)
      catch {
        case e: Exception =>
          // not one of the probe families — a quality-classifier MODEL
          // dir declares itself via its params family column and is a
          // recognized healthy shape, not an error
          val fields =
            try spark.read.parquet(s"$dir/params").schema.fieldNames.toSet
            catch { case _: Exception => Set.empty[String] }
          if (fields.contains("bias")) {
            if (names.contains("weights"))
              b += Finding(dir, "params", "ok",
                "healthy quality-classifier model (weights/ + params)")
            else
              b += Finding(dir, "weights", "error",
                "classifier-model params/ with no weights/ — a crashed " +
                  "writeModel (weights are written FIRST, so this is " +
                  "params over a deleted tree); re-run writeModel")
          } else if (fields.contains("seq_len")) {
            // BEFORE the n_merges branch: the export's params also
            // records its model's n_merges/n_alphabet provenance, and
            // classifying it as a BPE model would demand a merges/ it
            // rightly does not have
            if (names.contains("sequences")) {
              // a crashed repair's staged-swap residue: an
              // `_old_pack~N` aside whose pack dir is absent IS that
              // pack, sitting invisible to every reader (underscore
              // prefix) — name it here so an operator who never runs
              // repair still learns the state exists
              // the aside warn is ADDITIVE: an export can hold swap
              // residue AND be a pre-digest export at once, and a
              // short-circuit here would let the louder finding mask
              // the other (each has its own distinct recovery)
              val asides = ls(fs, s"$dir/sequences").map(_._1)
                .filter(_.startsWith("_old_pack~"))
              if (asides.nonEmpty)
                b += Finding(dir, "sequences", "warn",
                  s"staged-swap residue under sequences/ " +
                    s"(${asides.sorted.mkString(", ")}) — a crashed " +
                    "repairTrainingShards; re-run the repair (it " +
                    "heals the aside before detection) or rename the " +
                    "aside back to its pack= dir by hand")
              // a crashed compaction's in-flight marker: merged docs
              // may sit duplicated next to their old packs, and every
              // strict read / stats / repair refuses until the re-run
              // converges it — name the state and its ONE recovery
              val cmarks = ls(fs, s"$dir/sequences").map(_._1)
                .filter(_.startsWith("_compact~"))
              if (cmarks.nonEmpty)
                b += Finding(dir, "sequences", "warn",
                  s"compaction in-flight marker under sequences/ " +
                    s"(${cmarks.sorted.mkString(", ")}) — an " +
                    "in-flight or crashed compactTrainingShards; " +
                    "wait for it to finish or re-run it (a re-run " +
                    "finishes or abandons the merge, then restamps " +
                    "params)")
              if (fields.contains("model_digest"))
                // additive with the aside warn, but never "healthy"
                // next to it: an aside'd pack is invisible to every
                // reader, and tooling filtering on ok-level findings
                // must not read the export as whole while it is
                b += Finding(dir, "params", "ok",
                  if (asides.isEmpty && cmarks.isEmpty)
                    "healthy training-shards export (sequences/ + " +
                      "params, model content digest stamped)"
                  else
                    "digest-stamped training-shards export " +
                      "(sequences/ + params) — see the residue " +
                      "warn(s); the tree is mid-recovery, not whole")
              else
                b += Finding(dir, "params", "warn",
                  "pre-digest-era training-shards export: params/ " +
                    "records only model COUNTS, which a retrain can " +
                    "reproduce — appends and model-checked reads " +
                    "refuse until a mode=overwrite re-export stamps " +
                    "the content digest")
            } else
              b += Finding(dir, "sequences", "error",
                "shards-export params/ with no sequences/ — a crashed " +
                  "writeTrainingShards (sequences are written FIRST, " +
                  "so this is params over a deleted tree); re-run the " +
                  "export")
          } else if (fields.contains("n_merges")) {
            if (!names.contains("merges"))
              b += Finding(dir, "merges", "error",
                "BPE-model params/ with no merges/ — a crashed " +
                  "Bpe.writeModel (merges are written FIRST, so this " +
                  "is params over a deleted tree); re-run writeModel")
            else if (fields.contains("n_alphabet") &&
                !names.contains("alphabet"))
              b += Finding(dir, "alphabet", "error",
                "complete BPE-model params/ (n_alphabet) with no " +
                  "alphabet/ — a crashed Bpe.writeModel(model); " +
                  "readFullModel refuses (ids would mis-assign); " +
                  "re-run writeModel")
            else if (fields.contains("n_alphabet"))
              b += Finding(dir, "params", "ok",
                "healthy complete BPE tokenizer model (alphabet/ + " +
                  "merges/ + params" +
                  (if (fields.contains("model_digest"))
                     ", content digest stamped)"
                   else "; pre-digest write — readFullModel " +
                     "tolerates it, consumers recompute the digest; " +
                     "re-run writeModel to stamp it)"))
            else
              b += Finding(dir, "params", "ok",
                "healthy BPE tokenizer model (merges/ + params; " +
                  "legacy merges-only — string encoding reads it, the " +
                  "id tier needs a trainModel retrain)")
          } else if (fields.contains("n_buckets")) {
            if (names.contains("ratios"))
              b += Finding(dir, "params", "ok",
                "healthy DSIR importance model (ratios/ + params)")
            else
              b += Finding(dir, "ratios", "error",
                "DSIR-model params/ with no ratios/ — a crashed " +
                  "writeDsirModel (ratios are written FIRST, so this " +
                  "is params over a deleted tree); re-run " +
                  "writeDsirModel")
          } else
            b += Finding(dir, "params", "error",
              s"params/ unreadable or unrecognized: ${e.getMessage}")
          return b.toList
      }

    val missing = FamilySubdirs(family).filterNot(names.contains)
    missing.foreach { sub =>
      b += Finding(dir, sub, "error",
        s"$family index is missing $sub/ — a crashed write (params " +
          "are written LAST, so this is params from a previous " +
          "generation over a half-deleted tree); re-run the writer")
    }
    if (missing.nonEmpty) return b.toList

    // Bucket-partitioned layout audit: does the data's directory shape
    // agree with the params' declared layout? `_`/`.`-prefixed entries
    // (markers, _SUCCESS) are invisible to Spark's listing and to us.
    def bucketAudit(sub: String, partCol: String,
        declared: Option[Int]): Unit = {
      val visible = ls(fs, s"$dir/$sub").filter { case (n, _) =>
        !n.startsWith("_") && !n.startsWith(".")
      }
      val partDirs = visible.collect {
        case (n, true) if n.startsWith(s"$partCol=") =>
          n.stripPrefix(s"$partCol=")
      }
      val flatFiles = visible.exists(!_._2)
      if (partDirs.nonEmpty && flatFiles)
        b += Finding(s"$dir/$sub", sub, "error",
          s"flat parquet files NEXT TO $partCol= partition dirs — " +
            "the conflicting-directory-structures state (a flat " +
            "append into a crashed re-bucket migration); reads fail. " +
            "Recover: remove the flat files or re-run " +
            "migrateShingleBuckets, then compactIndex")
      declared match {
        case Some(n) =>
          val bad = partDirs.filter(v =>
            v.toIntOption.forall(i => i < 0 || i >= n))
          if (bad.nonEmpty)
            b += Finding(s"$dir/$sub", sub, "error",
              s"$partCol values out of range for the stored " +
                s"$n-partition layout: ${bad.sorted.take(5).mkString(", ")}" +
                " — written under different params; bucket-pruned " +
                "probes would MISS these rows. Recover: rebuild the " +
                "index (or re-append under stored params)")
          if (visible.nonEmpty && partDirs.isEmpty)
            b += Finding(s"$dir/$sub", sub, "error",
              s"params declare a $n-partition $partCol= layout but " +
                s"$sub/ holds no partition dirs — inconsistent (no " +
                "writer here produces this); rebuild the index")
        case None =>
          // flat-declared layouts (legacy shingles) must hold flat data
          if (partDirs.nonEmpty)
            b += Finding(s"$dir/$sub", sub, "error",
              s"params declare a FLAT $sub/ but the data is " +
                s"$partCol-partitioned — the crashed re-bucket-" +
                "migration state (params demoted, data bucketed); " +
                "appends refuse. Recover: re-run migrateShingleBuckets")
      }
    }

    // ONE params read per dir, shared by every lookup below (the
    // survey's cost-∝-directory-count claim; indexFamily already paid
    // one — this caps the rest at one more)
    lazy val paramsRow: org.apache.spark.sql.Row = {
      val p = spark.read.parquet(s"$dir/params")
      p.head()
    }
    def paramInt(name: String): Option[Int] =
      if (paramsRow.schema.fieldNames.contains(name) &&
          !paramsRow.isNullAt(paramsRow.fieldIndex(name)))
        Some(paramsRow.getAs[Int](name))
      else None

    family match {
      case "minhash" =>
        bucketAudit("bands", "bucket", paramInt("band_buckets"))
        bucketAudit("shingles", "bucket",
          paramInt("shingle_buckets"))
      case "containment" =>
        bucketAudit("postings", "bucket", paramInt("posting_buckets"))
        bucketAudit("shingles", "bucket",
          paramInt("shingle_buckets"))
      case "chunk" =>
        bucketAudit("chunks", "bucket", paramInt("chunk_buckets"))
      case "hamming" =>
        bucketAudit("pieces", "bucket", paramInt("piece_buckets"))
      case "benchmark" =>
        bucketAudit("hashes", "bucket", paramInt("hash_buckets"))
      case "bm25" =>
        bucketAudit("postings", "bucket", paramInt("token_buckets"))
        bucketAudit("doclen", "dbucket", paramInt("dl_buckets"))
      case "ivf" =>
        val (storage, vecBuckets) = Similarity.readIvfStorage(spark, dir)
        if (storage == "sq8") {
          if (!names.contains("vectors"))
            b += Finding(dir, "vectors", "error",
              "sq8 storage with no vectors/ — the exact-re-rank side " +
                "is gone and every probe's re-rank join returns " +
                "nothing; restore vectors/ or rebuild from source " +
                "embeddings")
          else bucketAudit("vectors", "vbucket", Some(vecBuckets))
        } else if (names.contains("vectors"))
          b += Finding(dir, "vectors", "warn",
            "f32 storage with a vectors/ dir — a crashed f32 " +
              "conversion's leftover (nothing reads it under f32 " +
              "params); safe to delete")
        if (names.contains("rebuild_staged"))
          b += Finding(s"$dir/rebuild_staged", "staging", "warn",
            "rebuild staging left behind a COMPLETED rebuild (params " +
              "present) — the next rebuild sweeps it; safe to delete")
      case _ => ()
    }

    if (!b.exists(_.level == "error"))
      b += Finding(dir, "index", "ok",
        s"$family index: layout consistent")
    b.toList
  }
}
