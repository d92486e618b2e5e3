package graft

import org.apache.spark.sql.SparkSession

/** Scheduler entry point for the extension-tier corpus lifecycle — the
  * E3-analog shell surface ([[RefDataMain]] is the reference-tier
  * model): one subcommand per composed job.
  *
  *   - `refresh <batchDir> <indexRoot> <corpusDir> [embeddingsDir]
  *     [emb=<dir>] [bench=<benchDir>] [containment=<threshold>]
  *     [semeval=<evalEmbDir>] [quality=<modelDir>]` —
  *     [[Pipeline.refreshCorpus]] over a parquet batch, with every
  *     optional modality cron-able: `emb` (or the legacy bare 4th
  *     arg) = the batch's `(vec_id, embedding)` parquet, `bench` = a
  *     standing [[graft.operators.Dedup.writeBenchmarkIndex]] suite
  *     to screen against (probe-only), `containment` = the doc-in-doc
  *     overlap threshold, `semeval` = an eval-embedding parquet for
  *     the embedding-level contamination screen (probe-only, requires
  *     `emb`), `quality` = a persisted
  *     [[graft.operators.QualityClassifier]] model whose score rides
  *     every published doc (probe-only), `tokenizer` = a persisted
  *     [[graft.operators.Bpe]] model whose subword count rides every
  *     published doc (probe-only token accounting), `shards` = a
  *     standing training-shard export the published batch is folded
  *     into after the refresh (knob-inert append; requires
  *     `tokenizer`; whole contract pre-flighted before anything
  *     publishes), `chunkrule` = the substring
  *     clean granularity for the FIRST batch (`grid` default, `cdc`,
  *     or `line` — once the chunk index exists its stored rule drives
  *     every later batch). Prints the one-row report.
  *   - `retract <idsDir> <indexRoot> <corpusDir>` —
  *     [[Pipeline.retractCorpus]] over a one-column parquet of ids;
  *     prints the one-row report.
  *   - `maintain <indexRoot>` — [[Pipeline.maintainIndexes]]
  *     compaction sweep.
  *   - `stats <indexRoot>` — [[graft.operators.Dedup.indexStats]] over
  *     every family present: one JSON line per index sub-dataset
  *     (duplicate-row volume and files-per-bucket amplification — the
  *     numbers that say whether `maintain` is due).
  *   - `index-benchmark <suiteDir> <benchDir> [append]` —
  *     [[graft.operators.Dedup.writeBenchmarkIndex]] over a
  *     `(doc_id, text)` parquet eval suite: create the
  *     decontamination index, or fold a newly-adopted suite into a
  *     standing one with `append` — the out-of-band adoption step the
  *     probe-only benchmark modality of `refresh` relies on.
  *   - `rebuild-ivf <indexRoot> <nlist>` —
  *     [[graft.operators.Similarity.rebuildIvfIndex]] over the
  *     `<indexRoot>/ivf` family: re-train the cell geometry at the
  *     operator-chosen `nlist` once a season of refreshes has outgrown
  *     the frozen centroids (the compaction sweep never touches
  *     geometry).
  *   - `sweep-containment <corpusDir> <outDir> <threshold> [sampleK]
  *     [indexRoot]` — [[Pipeline.sweepContainment]]: the full
  *     sampled-probe containment pass over the published corpus,
  *     covering the big-big pairs the weekly incremental probe
  *     deliberately skips; pairs land under `outDir`, one JSON line
  *     reports the count. Run it at `maintain` cadence. With
  *     `indexRoot` the sweep reads the standing `containment/`
  *     family's stored shingle arrays instead of re-shingling the
  *     corpus text — same pairs, minus the sweep's largest stage.
  *   - `train-quality <corpusDir> <modelDir> [topV]` —
  *     [[Pipeline.trainQualityModel]]: distill the published corpus'
  *     LM quality signal (head tercile = good, tail = bad — CCNet's
  *     construction) into a persisted classifier model under
  *     `modelDir`, ready for `refresh quality=<modelDir>`. One
  *     corpus-scale LM pass + a sample-capped LR fit — run it at
  *     `maintain` cadence, once a season or when the corpus mix
  *     shifts. Holds the model dir's lease while writing.
  *   - `train-bpe <corpusDir> <modelDir> [numMerges] [maxTypes]` —
  *     [[Pipeline.trainBpeModel]]: learn a BPE subword merge list from
  *     the published corpus' word-type counts (distributed count,
  *     capped driver merge loop) and persist it for
  *     [[graft.operators.Bpe.encode]]'s map-only corpus-wide
  *     tokenization. Same season cadence and lease discipline as
  *     `train-quality`.
  *   - `train-dsir <corpusDir> <targetDir> <modelDir> [buckets]` —
  *     [[Pipeline.trainDsirModel]]: fit the DSIR importance ratios of
  *     a curated target set against the published corpus and persist
  *     the bucket-weight table for
  *     [[graft.operators.Sharding.dsirScore]]'s per-batch scoring.
  *     Same cadence and lease discipline.
  *   - `export-shards <corpusDir> <bpeModelDir> <outDir> [seqLen]
  *     [numShards] [overwrite|append]` — [[Pipeline
  *     .writeTrainingShards]]: bootstrap (or explicitly append to)
  *     the packed-id training artifact. The weekly cadence usually
  *     rides `refresh shards=<outDir>` instead ([[Pipeline
  *     .appendTrainingShards]] — knob-inert, the export's own params
  *     drive the append), keeping one cron line per batch.
  *   - `repair-shards <corpusDir> <bpeModelDir> <outDir>
  *     [maxConcurrent]` — [[Pipeline.repairTrainingShards]]: the
  *     GDPR-cadence recovery after `retract`, rewriting ONLY the
  *     pack generations whose spans touch retracted docs (bounded
  *     concurrent rebuilds, per-pack staged swaps).
  *   - `audit-shards <outDir> <bpeModelDir> [corpusDir]` — strict +
  *     model-checked read plus one decoded sample; with `corpusDir`,
  *     the FULL audit ([[Pipeline.auditTrainingShards]]): every doc
  *     reconstructed from the artifact's spans, decoded, and diffed
  *     against the model's encode-then-decode image of the corpus
  *     text (so a capped model's OOV never false-flags — n_unk
  *     discloses it) — mismatched doc_ids and the decode-damage
  *     counts reported, non-zero exit on mismatch.
  *   - `stats-shards <outDir>` — [[Pipeline.statsTrainingShards]]:
  *     metadata-priced per-pack survey (sizes, short tails, padding
  *     waste, shard spread — the is-a-re-pack-due numbers).
  *   - `compact-shards <outDir> [minFill]` —
  *     [[Pipeline.compactTrainingShards]]: merge adjacent short /
  *     repair-shrunk pack generations into dense ones by re-cutting
  *     their id streams (never re-encoding) — the waste-proportional
  *     re-pack the stats columns trigger, instead of a corpus-scale
  *     mode=overwrite re-export.
  *   - `epoch-stream <outDir> <epoch> <destDir> [salt] [numParts]` —
  *     [[graft.operators.Sharding.epochReorder]]: materialize ONE
  *     epoch's deterministic training order from a standing export
  *     (strict read, map-only key, one size-scaled range exchange).
  *     The emitted JSON carries `layout_gen` — store it beside the
  *     loader's checkpoint cursor; `epoch-resume` demands it back.
  *   - `epoch-resume <outDir> <epoch> <lastKey> <lastId> <layoutGen>
  *     <destDir> [salt] [numParts] [snapshot=<nextSeqId>]` —
  *     [[Pipeline.epochResumeShards]]: materialize the strict
  *     REMAINDER of a crashed epoch past the loader's checkpointed
  *     `(epoch_key, seq_id)` cursor — gated on the seq-id-space
  *     generation the cursor was minted under, because a repair or
  *     compaction since then REWROTE seq_ids and the old cursor
  *     points at different data (the refusal names the restart).
  *     `snapshot=` bounds the remainder to the `next_seq_id` the
  *     loader read at epoch start (pure snapshot semantics under
  *     mid-epoch appends; default = appended sequences join after
  *     the cursor in key order).
  *
  *     Materialized epoch dirs are SNAPSHOTS: the stream's rows copy
  *     the artifact's id streams, so a retraction repair can never
  *     reach them — after `retract` + `repair-shards`, delete or
  *     re-stream every standing epoch materialization (the same
  *     discipline as any derived copy of retracted data).
  *   - `break-lease <dir> [dir ...]` —
  *     [[graft.operators.Lease.breakLease]]: the STALE-lease takeover
  *     surface. Every mutating pass above holds `<dir>/_LEASE` while
  *     it runs and a concurrent writer refuses naming the holder;
  *     when the holder's process CRASHED (and only then — breaking a
  *     live writer's lease re-creates the double-writer hazard),
  *     break the lease(s) and re-run the interrupted pass to
  *     completion. `break-leases <root>`
  *     ([[graft.operators.Lease.breakAllUnder]]) sweeps the root plus
  *     its direct children in one command — a crashed `refresh` holds
  *     up to six dirs, and hunting them one flag at a time is exactly
  *     the operational friction a wedged weekly cron doesn't need.
  *     `lease-status <root>` ([[graft.operators.Lease.status]]) is the
  *     look-before-you-break survey: every held lease under the root
  *     with its owner, age, and JVM — the staleness evidence to weigh
  *     before breaking anything.
  *   - `fsck <root>` — [[graft.operators.Fsck.check]]: read-only
  *     integrity survey of the root and its children (crashed writes,
  *     migration states, layout mismatches, staging leftovers, held
  *     leases), one JSON finding per line with the documented
  *     recovery; exits non-zero on any error-level finding, so a cron
  *     health check can alarm on it.
  *   - `audit <indexRoot> <corpusDir>` — [[Pipeline.auditCorpus]]: the
  *     DATA-level consistency audit (corpus↔index id sync, completion
  *     markers, ledger arithmetic), one JSON finding per line with the
  *     documented recovery; exits non-zero on any error-level finding.
  *     Runs data jobs (unlike `fsck`) — schedule it in a quiet window
  *     at maintenance cadence.
  *   - `migrate-shingles <indexRoot> [buckets]` —
  *     [[graft.operators.Dedup.migrateShingleBuckets]] over the
  *     minhash and containment families present under `indexRoot`:
  *     one-time upgrade of legacy flat `shingles/` layouts to the
  *     doc-id-bucketed one (touched-bucket deletion, pruned verify).
  *     Idempotent; already-bucketed families are a no-op.
  *
  * Thresholds/bucket counts stay at the operators' production defaults
  * on purpose: a deployment that needs different ones calls
  * [[Pipeline.refreshCorpus]] directly (the parameters are the API;
  * this main is the cron line).
  */
object CorpusMain {

  /** Minimal JSON string escaping for the CLI's one-line-per-row
    * output (shared by lease-status / fsck / audit so the three
    * commands' quoting cannot drift). */
  private def jsonEsc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def usage(): Nothing = {
    System.err.println(
      """usage: CorpusMain refresh <batchDir> <indexRoot> <corpusDir> [embeddingsDir] [emb=<dir>] [bench=<dir>] [containment=<t>] [semeval=<dir>] [quality=<modelDir>] [chunkrule=<grid|cdc|line>] [tokenizer=<bpeModelDir>] [shards=<exportDir>]
        |       CorpusMain retract <idsDir> <indexRoot> <corpusDir>
        |       CorpusMain maintain <indexRoot>
        |       CorpusMain stats <indexRoot>
        |       CorpusMain index-benchmark <suiteDir> <benchDir> [append]
        |       CorpusMain rebuild-ivf <indexRoot> <nlist>
        |       CorpusMain sweep-containment <corpusDir> <outDir> <threshold> [sampleK] [indexRoot]
        |       CorpusMain train-quality <corpusDir> <modelDir> [topV]
        |       CorpusMain train-bpe <corpusDir> <modelDir> [numMerges] [maxTypes]
        |       CorpusMain train-dsir <corpusDir> <targetDir> <modelDir> [buckets]
        |       CorpusMain export-shards <corpusDir> <bpeModelDir> <outDir> [seqLen] [numShards] [overwrite|append]
        |       CorpusMain repair-shards <corpusDir> <bpeModelDir> <outDir> [maxConcurrent]
        |       CorpusMain epoch-stream <outDir> <epoch> <destDir> [salt] [numParts]
        |       CorpusMain epoch-resume <outDir> <epoch> <lastKey> <lastId> <layoutGen> <destDir> [salt] [numParts] [snapshot=<nextSeqId>]
        |       CorpusMain audit-shards <outDir> <bpeModelDir> [corpusDir]
        |       CorpusMain stats-shards <outDir>
        |       CorpusMain compact-shards <outDir> [minFill] [maxConcurrent]
        |       CorpusMain migrate-shingles <indexRoot> [buckets]
        |       CorpusMain break-lease <dir> [dir ...]
        |       CorpusMain break-leases <root>
        |       CorpusMain lease-status <root>
        |       CorpusMain fsck <root>
        |       CorpusMain audit <indexRoot> <corpusDir>""".stripMargin)
    sys.exit(2)
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) usage()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .appName("graft-corpus")
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toList)
    finally spark.stop()
  }

  /** The subcommand dispatch, session-agnostic so specs can drive it
    * on a shared session (main owns session lifecycle, this owns the
    * job). Prints one JSON line per result row.
    */
  def run(spark: SparkSession, args: List[String]): Unit =
    args match {
      case "refresh" :: batchDir :: indexRoot :: corpusDir :: rest =>
        // optional modalities as key=value (a bare 4th arg keeps the
        // legacy embeddingsDir meaning): emb=<dir> bench=<benchDir>
        // containment=<threshold>. Only the RECOGNIZED prefixes parse
        // as flags — a legacy positional path that happens to contain
        // '=' stays positional — and a duplicated flag is refused
        // instead of silently last-winning
        val flagKeys = Set("emb", "bench", "containment", "semeval",
          "quality", "chunkrule", "tokenizer", "shards")
        val (kv0, legacy) = rest.partition(a =>
          flagKeys.exists(k => a.startsWith(s"$k=")))
        val kvPairs = kv0.map { a =>
          val Array(k, v) = a.split("=", 2); k -> v
        }
        val kv = kvPairs.toMap
        if (legacy.length > 1 ||
          kvPairs.length != kv.size ||
          (legacy.nonEmpty && kv.contains("emb"))) usage()
        // the shards= flag's WHOLE contract is checked BEFORE the
        // refresh mutates anything (the early-refusal discipline): a
        // cron line that forgot the tokenizer, points at a typo'd,
        // un-bootstrapped, or pre-append-era export dir, carries a
        // legacy merges-only or RETRAINED tokenizer, or runs over a
        // corpus retracted from since the export must not publish a
        // batch and THEN die, leaving the export silently lagging
        // the corpus
        // ONE full-model read threads the whole shards= cron line
        // (pre-flight, refresh, append) instead of each step paying
        // its own params+alphabet+merges read of the same model
        // (guide §1.2); the read itself runs the full refusal chain,
        // so every gate fires identically
        val shardsModel = kv.get("shards").map { exportDir =>
          require(kv.contains("tokenizer"),
            "refresh shards=<exportDir> requires tokenizer=" +
              "<modelDir> — the export encodes under that model")
          val m = graft.operators.Bpe.readFullModel(spark,
            kv("tokenizer"))
          // the rest of the contract — standing export, append-era
          // layout, complete model with matching content digest,
          // settled retraction ledger — is one metadata-priced call
          // ([[Pipeline.preflightShardsAppend]]): each is a condition
          // the append itself would refuse on POST-publish, the lag
          // state this early refusal exists to prevent
          Pipeline.preflightShardsAppendWith(spark, corpusDir,
            kv("tokenizer"), exportDir, modelOpt = Some(m))
          m
        }
        val emb = legacy.headOption.orElse(kv.get("emb"))
          .map(spark.read.parquet(_))
        val out = Pipeline.refreshCorpus(spark,
          spark.read.parquet(batchDir), indexRoot, corpusDir,
          embeddings = emb,
          benchmarkIndexDir = kv.get("bench"),
          containmentThreshold = kv.get("containment").map(_.toDouble),
          semanticEvalDir = kv.get("semeval"),
          qualityModelDir = kv.get("quality"),
          tokenizerModelDir = kv.get("tokenizer"),
          // first batch only — a standing chunk index's STORED rule
          // drives every later batch (the knob-inert contract)
          chunkRule = kv.getOrElse("chunkrule", "grid"),
          tokenizerModel = shardsModel)
        println(out.report.head().json)
        // shards=<exportDir>: the TRAINING ARTIFACT follows the corpus
        // (the bm25 follow-the-corpus rule, via the cron surface) —
        // fold the published batch into the standing export, knob-
        // inert (seqLen/numShards/eos from the export's own params).
        // Runs AFTER the refresh's leased scope on purpose:
        // writeTrainingShards takes the corpus lease itself, and
        // leases are not reentrant — nesting would self-deadlock.
        // Every append gate holds (watermark skips re-runs, the
        // ledger gate refuses post-retraction staleness naming
        // repair-shards, the digest refuses a retrained model).
        kv.get("shards").foreach { exportDir =>
          val r = Pipeline.appendTrainingShardsWith(spark, corpusDir,
            kv("tokenizer"), exportDir, modelOpt = shardsModel).head()
          println(s"""{"shards":"${jsonEsc(exportDir)}",""" +
            s""""n_sequences":${r.getAs[Long]("n_sequences")},""" +
            s""""n_ids_total":${r.getAs[Long]("n_ids_total")},""" +
            s""""max_doc_id":${r.getAs[Long]("max_doc_id")}}""")
        }
      case "retract" :: idsDir :: indexRoot :: corpusDir :: Nil =>
        val report = Pipeline.retractCorpus(spark,
          spark.read.parquet(idsDir), indexRoot, corpusDir)
        println(report.head().json)
      case "maintain" :: indexRoot :: Nil =>
        Pipeline.maintainIndexes(spark, indexRoot)
        println(s"""{"maintained":"$indexRoot"}""")
      case "stats" :: indexRoot :: Nil =>
        val fs = new org.apache.hadoop.fs.Path(indexRoot)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        Seq("minhash", "hamming", "chunk", "ivf", "benchmark",
            "containment", "bm25")
          .filter(f => fs.exists(
            new org.apache.hadoop.fs.Path(s"$indexRoot/$f/params")))
          .foreach { f =>
            graft.operators.Dedup.indexStats(spark, s"$indexRoot/$f")
              .collect().foreach(r => println(r.json))
          }
      case "index-benchmark" :: suiteDir :: benchDir :: rest
          if rest.isEmpty || rest == List("append") =>
        // an index-mutating pass like every other: without the lease a
        // cron `maintain` compacting benchmark/ could rename the suite
        // write aside mid-swap (the double-writer interleave)
        graft.operators.Lease.withLeases(spark, Seq(benchDir),
          "index-benchmark") {
          graft.operators.Dedup.writeBenchmarkIndex(
            spark.read.parquet(suiteDir), benchDir,
            mode = if (rest.isEmpty) "overwrite" else "append")
        }
        println(s"""{"indexed":"$benchDir","mode":"${
          if (rest.isEmpty) "overwrite" else "append"}"}""")
      case "rebuild-ivf" :: indexRoot :: nlist :: Nil =>
        graft.operators.Similarity.rebuildIvfIndex(spark,
          s"$indexRoot/ivf", nlist.toInt)
        println(s"""{"rebuilt":"$indexRoot/ivf","nlist":$nlist}""")
      case "migrate-shingles" :: indexRoot :: rest if rest.length <= 1 =>
        val buckets = rest.headOption.map(_.toInt).getOrElse(64)
        val fs = new org.apache.hadoop.fs.Path(indexRoot)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        Seq("minhash", "containment")
          .filter(f => fs.exists(
            new org.apache.hadoop.fs.Path(s"$indexRoot/$f/params")))
          .foreach { f =>
            graft.operators.Dedup.migrateShingleBuckets(spark,
              s"$indexRoot/$f", buckets)
            println(s"""{"migrated":"$indexRoot/$f","buckets":$buckets}""")
          }
      case "break-lease" :: dirs if dirs.nonEmpty =>
        dirs.foreach { dir =>
          graft.operators.Lease.breakLease(spark, dir)
          println(s"""{"lease_broken":"$dir"}""")
        }
      case "break-leases" :: root :: Nil =>
        val broken = graft.operators.Lease.breakAllUnder(spark, root)
        println(s"""{"leases_broken":[${
          broken.map(d => s""""$d"""").mkString(",")}],"root":"$root"}""")
      case "lease-status" :: root :: Nil =>
        // look BEFORE you break: one JSON line per held lease with the
        // recorded holder, age, and JVM — the staleness evidence the
        // takeover contract asks the operator to weigh
        graft.operators.Lease.status(spark, root).foreach {
          case (d, owner, acquired, heldSec, jvm) => println(
            s"""{"dir":"${jsonEsc(d)}","owner":"${jsonEsc(owner)}",""" +
              s""""acquired":"${jsonEsc(acquired)}","held_sec":$heldSec,""" +
              s""""jvm":"${jsonEsc(jvm)}"}""")
        }
      case "train-quality" :: corpusDir :: modelDir :: rest
          if rest.length <= 1 =>
        val (n, bias) = Pipeline.trainQualityModel(spark, corpusDir,
          modelDir, topV = rest.headOption.map(_.toInt).getOrElse(4096))
        println(s"""{"model":"${jsonEsc(modelDir)}","n_weights":$n,""" +
          s""""bias":$bias}""")
      case "train-dsir" :: corpusDir :: targetDir :: modelDir :: rest
          if rest.length <= 1 =>
        val b = Pipeline.trainDsirModel(spark, corpusDir, targetDir,
          modelDir,
          buckets = rest.headOption.map(_.toInt).getOrElse(10000))
        println(s"""{"model":"${jsonEsc(modelDir)}","n_buckets":$b}""")
      case "train-bpe" :: corpusDir :: modelDir :: rest
          if rest.length <= 2 =>
        val n = Pipeline.trainBpeModel(spark, corpusDir, modelDir,
          numMerges = rest.headOption.map(_.toInt).getOrElse(1000),
          maxTypes = rest.drop(1).headOption.map(_.toInt)
            .getOrElse(20000))
        println(s"""{"model":"${jsonEsc(modelDir)}","n_merges":$n}""")
      case "export-shards" :: corpusDir :: modelDir :: outDir :: rest
          if rest.length <= 3 =>
        val r = Pipeline.writeTrainingShards(spark, corpusDir, modelDir,
          outDir,
          seqLen = rest.headOption.map(_.toLong).getOrElse(2048L),
          numShards = rest.drop(1).headOption.map(_.toInt)
            .getOrElse(256),
          mode = rest.drop(2).headOption.getOrElse("overwrite")).head()
        println(s"""{"out":"${jsonEsc(outDir)}",""" +
          s""""n_sequences":${r.getAs[Long]("n_sequences")},""" +
          s""""n_ids_total":${r.getAs[Long]("n_ids_total")},""" +
          s""""max_doc_id":${r.getAs[Long]("max_doc_id")}}""")
      case "repair-shards" :: corpusDir :: modelDir :: outDir :: rest
          if rest.length <= 1 =>
        // the GDPR-cadence recovery: after retractCorpus, rewrite
        // ONLY the pack generations whose spans touch retracted
        // doc_ids and restamp the ledger gate — ∝ touched packs,
        // never the corpus-scale re-export; the optional 4th arg
        // bounds the concurrent per-pack rebuilds (default 4)
        val r = Pipeline.repairTrainingShards(spark, corpusDir,
          modelDir, outDir,
          maxConcurrentRebuilds =
            rest.headOption.map(_.toInt).getOrElse(4)).head()
        println(s"""{"out":"${jsonEsc(outDir)}",""" +
          s""""n_sequences":${r.getAs[Long]("n_sequences")},""" +
          s""""n_ids_total":${r.getAs[Long]("n_ids_total")},""" +
          s""""retraction_total":${
            r.getAs[Long]("retraction_total")}}""")
      case "compact-shards" :: outDir :: rest if rest.length <= 2 =>
        // the waste-proportional re-pack stats-shards' padding_waste /
        // n_short columns call for: adjacent short/repair-shrunk pack
        // generations merge into dense ones (id streams re-cut, never
        // re-encoded — no model, no corpus read), ∝ short packs; the
        // optional 3rd arg bounds the concurrent run merges (default 4)
        val r = Pipeline.compactTrainingShards(spark, outDir,
          minFill = rest.headOption.map(_.toDouble).getOrElse(0.9),
          maxConcurrentMerges =
            rest.drop(1).headOption.map(_.toInt).getOrElse(4))
          .head()
        println(s"""{"out":"${jsonEsc(outDir)}",""" +
          s""""n_sequences":${r.getAs[Long]("n_sequences")},""" +
          s""""n_ids_total":${r.getAs[Long]("n_ids_total")}}""")
      case "stats-shards" :: outDir :: Nil =>
        // metadata-priced survey of the export (n_ids/shard/pack only,
        // never the id arrays): pack sizes, repair-shrunk packs, the
        // padding waste a fixed-shape loader pays for short tails, and
        // per-pack shard imbalance — the numbers that say whether a
        // mode=overwrite re-pack is due (the `stats` line's shape)
        Pipeline.statsTrainingShards(spark, outDir).collect()
          .foreach(r => println(r.json))
      case "epoch-stream" :: outDir :: epoch :: destDir :: rest
          if rest.length <= 2 =>
        // materialize ONE epoch's training order from a standing
        // export: strict read (the artifact must agree with its
        // params before a training run consumes it), the map-only
        // epoch key, one range exchange, written in consumable order.
        // A new epoch (or salt) is an independent redraw of the same
        // bytes — re-run with the next epoch number.
        val (seqs, p) = Pipeline.readTrainingShards(spark, outDir,
          strict = true)
        // range-partition count scales with the ARTIFACT, not a
        // constant — the operator's own default rule
        // ([[graft.operators.Sharding.epochPartitions]]), fed here
        // from the params row (already read — saves the operator's
        // Σ n_ids metadata aggregate); override with the optional
        // 5th arg when the loader wants its own resume granularity
        val numParts = rest.drop(1).headOption.map(_.toInt).getOrElse(
          graft.operators.Sharding.epochPartitions(
            p.getAs[Long]("n_ids_total")))
        // destDir is derived data under the single-writer discipline
        // like every written family: two concurrent epoch-streams (or
        // an epoch-stream racing its own cron re-run) must refuse,
        // not interleave their overwrites. The rows land under
        // destDir/data so the overwrite can never clobber the lease
        // file at the leased root (the index families' layout rule).
        graft.operators.Lease.withLeases(spark, Seq(destDir),
          "epoch-stream") {
          graft.operators.Sharding.epochReorder(seqs, epoch.toInt,
              salt = rest.headOption.getOrElse("ep"),
              numParts = numParts)
            .write.mode("overwrite").parquet(s"$destDir/data")
        }
        // layout_gen rides the report: the loader stores it beside
        // its checkpoint cursor, and epoch-resume demands it back —
        // a repair/compaction since minting rewrote seq_ids and the
        // resume must refuse, not silently skip/repeat sequences.
        // Minted from the SAME params row the strict read validated
        // (`p`), never a second read: a compaction finishing between
        // the stream and a later read would stamp the NEW generation
        // onto old-generation data and the gate would wave the
        // mismatch through.
        println(s"""{"out":"${jsonEsc(destDir)}/data","epoch":${
          epoch.toInt},"n_sequences":${
          p.getAs[Long]("n_sequences")},"num_parts":$numParts,${
          ""}"layout_gen":${Pipeline.layoutGenOf(p)}}""")
      case "epoch-resume" :: outDir :: epoch :: lastKey :: lastId ::
          layoutGen :: destDir :: allRest if allRest.length <= 3 =>
        val (snapArgs, rest) =
          allRest.partition(_.startsWith("snapshot="))
        // the crash-recovery sibling of epoch-stream: the strict
        // REMAINDER of one epoch past the loader's checkpointed
        // cursor, generation-gated (Pipeline.epochResumeShards
        // refuses a cursor minted before a repair/compaction rewrote
        // the seq-id space). Same lease + dest layout as
        // epoch-stream; the remainder is written in consumable order
        // with the same artifact-scaled range partitioning.
        // sizing read BEFORE the gated resume (the sizing row is
        // then same-or-older than the row the generation gate
        // validates, so a rewrite landing in between refuses at the
        // gate instead of sizing from a newer snapshot) — and ONLY
        // when no explicit count was passed; a missing/mid-swap
        // params falls through to the resume, whose strict read
        // raises the export tier's NAMED recovery instead of a raw
        // path error here
        val numParts2 = rest.drop(1).headOption.map(_.toInt)
          .getOrElse {
            val pp = new org.apache.hadoop.fs.Path(s"$outDir/params")
            val pfs = pp.getFileSystem(
              spark.sparkContext.hadoopConfiguration)
            if (!pfs.exists(pp)) 32 // unreachable past the refusal
            else graft.operators.Sharding.epochPartitions(
              spark.read.parquet(s"$outDir/params").head()
                .getAs[Long]("n_ids_total"))
          }
        val remainder = Pipeline.epochResumeShards(spark, outDir,
          epoch.toInt, lastKey.toLong, lastId.toLong,
          layoutGen.toLong, salt = rest.headOption.getOrElse("ep"),
          snapshotNextSeqId = snapArgs.headOption
            .map(_.stripPrefix("snapshot=").toLong))
        graft.operators.Lease.withLeases(spark, Seq(destDir),
          "epoch-resume") {
          remainder
            .repartitionByRange(numParts2, org.apache.spark.sql
              .functions.col("epoch_key"), org.apache.spark.sql
              .functions.col("seq_id"))
            .sortWithinPartitions(org.apache.spark.sql.functions
              .col("epoch_key"), org.apache.spark.sql.functions
              .col("seq_id"))
            .write.mode("overwrite").parquet(s"$destDir/data")
        }
        println(s"""{"out":"${jsonEsc(destDir)}/data","epoch":${
          epoch.toInt},"resumed_after":[${lastKey.toLong},${
          lastId.toLong}],"layout_gen":${layoutGen.toLong}}""")
      case "audit-shards" :: outDir :: modelDir :: rest
          if rest.length <= 1 =>
        // read-back audit of the packed-id artifact: the strict +
        // model-checked read (counts agree, the encoding model's
        // CONTENT digest matches), then ONE sequence decoded back to
        // words — the eyeball check an operator wants before pointing
        // a training run at the bytes. Decode is the map-only
        // Bpe.decodeIds/decodeWords pair. The sample row is FOUND by
        // a seq_id-only min (a TakeOrdered over (seq_id, ids) would
        // deserialize every sequence's id array — the artifact's
        // whole bulk — to print 24 words) and fetched by an equality
        // filter parquet stats can skip row groups on. (The model is
        // read ONCE and threaded through the reader's provenance
        // check — readTrainingShardsWith.)
        val model = graft.operators.Bpe.readFullModel(spark, modelDir)
        val (seqs, p) = Pipeline.readTrainingShardsWith(spark, outDir,
          strict = true, model = Some(modelDir -> model))
        import org.apache.spark.sql.functions.{col, min}
        val minSeq = seqs.agg(min(col("seq_id"))).head().getLong(0)
        val sample = seqs.where(col("seq_id") === minSeq)
          .select(col("seq_id"),
            graft.operators.Bpe.decodeWords(
              graft.operators.Bpe.decodeIds(col("ids"), model))
              .as("words"))
          .head()
        val words = sample.getSeq[String](1)
        println(s"""{"out":"${jsonEsc(outDir)}",""" +
          s""""n_sequences":${p.getAs[Long]("n_sequences")},""" +
          s""""n_ids_total":${p.getAs[Long]("n_ids_total")},""" +
          s""""model_digest":"${p.getAs[String]("model_digest")}",""" +
          s""""sample_seq_id":${sample.getLong(0)},""" +
          s""""sample_words":"${jsonEsc(
            words.take(24).mkString(" "))}"}""")
        // FULL mode (a corpusDir as the 3rd arg): reconstruct every
        // document from the artifact's spans, decode, and diff
        // against the corpus normalization — mismatched doc_ids and
        // the decode-damage sums are the report; any mismatch or
        // foreign id exits non-zero (the fsck/audit cron convention)
        rest.headOption.foreach { corpusDir =>
          val r = Pipeline.auditTrainingShards(spark, outDir, modelDir,
            corpusDir).head()
          val ids = r.getSeq[Long](r.fieldIndex("mismatched_doc_ids"))
          println(s"""{"out":"${jsonEsc(outDir)}",""" +
            s""""n_docs":${r.getAs[Long]("n_docs")},""" +
            s""""n_mismatched":${r.getAs[Long]("n_mismatched")},""" +
            s""""mismatched_doc_ids":[${ids.mkString(",")}],""" +
            s""""n_bad":${r.getAs[Long]("n_bad")},""" +
            s""""n_unk":${r.getAs[Long]("n_unk")},""" +
            s""""n_word_merge_risk":${
              r.getAs[Long]("n_word_merge_risk")},""" +
            s""""n_unterminated":${
              r.getAs[Long]("n_unterminated")}}""")
          if (r.getAs[Long]("n_mismatched") > 0 ||
              r.getAs[Long]("n_bad") > 0) sys.exit(1)
        }
      case "fsck" :: root :: Nil =>
        // read-only integrity survey: one JSON line per finding,
        // most-severe first, each naming its documented recovery;
        // exit 1 if any error-level finding (cron-able health check)
        val findings = graft.operators.Fsck.check(spark, root)
        findings.foreach { f => println(
          s"""{"dir":"${jsonEsc(f.dir)}","component":"${jsonEsc(f.component)}",""" +
            s""""level":"${f.level}","detail":"${jsonEsc(f.detail)}"}""")
        }
        if (findings.exists(_.level == "error")) sys.exit(1)
      case "audit" :: indexRoot :: corpusDir :: Nil =>
        // data-level consistency audit: one JSON line per check,
        // most-severe first, each naming its documented recovery;
        // exit 1 on any error-level finding (cron-able, quiet-window)
        val rows = Pipeline.auditCorpus(spark, indexRoot, corpusDir)
          .collect()
        rows.foreach { r => println(
          s"""{"component":"${jsonEsc(r.getString(0))}",""" +
            s""""level":"${r.getString(1)}","n_bad":${r.getLong(2)},""" +
            s""""detail":"${jsonEsc(r.getString(3))}"}""")
        }
        if (rows.exists(_.getString(1) == "error")) sys.exit(1)
      case "sweep-containment" :: corpusDir :: outDir :: threshold ::
          rest if rest.length <= 2 =>
        val pairs = Pipeline.sweepContainment(spark, corpusDir,
          threshold.toDouble,
          sampleK = rest.headOption.map(_.toInt).getOrElse(64),
          indexRoot = rest.drop(1).headOption)
        pairs.write.mode("overwrite").parquet(outDir)
        val n = spark.read.parquet(outDir).count()
        println(s"""{"swept":"$corpusDir","n_pairs":$n,"out":"$outDir"}""")
      case _ => usage()
    }
}
