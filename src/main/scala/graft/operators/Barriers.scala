package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-truncation barriers for iterative operators.
  *
  * The iterative/tagged stages (connected-components rounds, k-means
  * cell tagging, all-pairs shingle materialization) truncate lineage
  * every round so plans stay bounded — by default with
  * `localCheckpoint()`, whose blocks are EXECUTOR-LOCAL and
  * non-replicated: cheap (no distributed-FS write), but an executor
  * lost mid-iteration makes the truncated lineage unrecoverable and
  * kills the job. Acceptable for bounded interactive runs; not for a
  * multi-hour 100 TB connected-components job.
  *
  * Setting `spark.graft.durableBarriers=true` (plus a configured
  * `sparkContext.setCheckpointDir`, the standard Spark reliable
  * checkpoint location — HDFS/S3 on a cluster) switches every such
  * barrier to a reliable `checkpoint()`: rounds are persisted to the
  * checkpoint dir and an executor loss replays from the last round
  * instead of failing the job. Results are identical under both modes
  * (BarriersSpec proves it); the default plan shape is untouched.
  *
  * DISK ACCUMULATION in durable mode: Spark never deletes a
  * checkpoint on its own, so a multi-hour iterative job (one
  * checkpoint per CC/star-contraction round) accumulates a full
  * labels/edges snapshot per round in the checkpoint dir. Set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` alongside
  * the durable flag: the ContextCleaner then deletes each round's
  * files once the driver GCs that round's dataset — rounds become
  * unreachable as the loop variable advances, so reclamation tracks
  * loop progress (the same lifecycle PeriodicCheckpointer manages by
  * hand) instead of waiting for job end. Deleting eagerly from inside
  * [[barrier]] itself would be WRONG: the helper cannot know whether
  * an earlier barrier's output is still referenced by a concurrent
  * consumer (e.g. a tagged corpus feeding both a pair join and a
  * recall report), and a deleted-but-referenced checkpoint fails the
  * job at next use.
  */
object Barriers {

  /** Runtime conf key selecting reliable checkpoints for iteration
    * barriers. Default false = executor-local blocks. */
  val DurableBarriersKey = "spark.graft.durableBarriers"

  /** Truncate `df`'s lineage: reliable `checkpoint()` when
    * [[DurableBarriersKey]] is set (requiring a checkpoint dir, with a
    * clear error instead of Spark's late one), `localCheckpoint()`
    * otherwise.
    */
  private[graft] def barrier(df: DataFrame): DataFrame =
    if (df.sparkSession.conf
        .get(DurableBarriersKey, "false").toBoolean) {
      require(
        df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        s"$DurableBarriersKey=true needs a reliable checkpoint " +
          "location: call sparkContext.setCheckpointDir(<HDFS/S3 " +
          "path>) first")
      df.checkpoint()
    } else df.localCheckpoint()
}
