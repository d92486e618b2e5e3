package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// dev-only measurement scratch for the r19 optimization round; deleted
// before the round's final commit
object Exp {
  val jobs = new java.util.concurrent.atomic.AtomicInteger

  def timeit[T](label: String)(f: => T): T = {
    val j0 = jobs.get()
    val t0 = System.nanoTime()
    val r = f
    println(f"[exp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
      s"${jobs.get() - j0} jobs")
    r
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "1m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobLog =
      new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    @volatile var trace = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (trace) {
            val det = js.stageInfos.headOption.map(_.details).getOrElse("")
            val cs = det.split("\n")
              .find(l => l.contains("graft.") && !l.contains("Exp"))
              .getOrElse(js.stageInfos.headOption.map(_.name).getOrElse("?"))
              .trim
            jobLog.put(js.jobId, (cs, js.time))
          }
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (trace) {
            Option(jobLog.get(je.jobId)).foreach { case (cs, t0) =>
              println(f"[job] ${je.jobId}%4d ${je.time - t0}%5d ms  $cs")
            }
          }
      })
    spark.range(1000).selectExpr("sum(id)").collect()
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") < 1000)
      .select(col("doc_id"), col("text"))
    docs.count()

    // build the fixture tree once (untraced), then trace the q150
    // surface refresh-append job by job
    val root = "/tmp/exp_fix_t"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val b0 = math.min(300L, maxId / 2 + 1)
    docs.write.mode("overwrite").parquet(s"$root/seed/corpus")
    Pipeline.trainBpeModel(spark, s"$root/seed", s"$root/model",
      numMerges = 64, maxTypes = 1 << 20)
    docs.where(col("doc_id") < b0).write.mode("overwrite")
      .parquet(s"$root/batch_0")
    timeit("publish batch_0") {
      Pipeline.refreshCorpus(spark,
        spark.read.parquet(s"$root/batch_0"), s"$root/idx",
        s"$root/corpus", jaccardThreshold = 0.5, chunkTokens = 10,
        bandBuckets = 32, pieceBuckets = 32, chunkBuckets = 32,
        tokenizerModelDir = Some(s"$root/model"))
    }
    Pipeline.writeTrainingShards(spark, s"$root/corpus", s"$root/model",
      s"$root/shards", seqLen = 64, numShards = 4)
    val t1 = maxId - 3
    docs.where(col("doc_id") >= b0 && col("doc_id") < t1)
      .write.mode("overwrite").parquet(s"$root/batch_1")
    timeit("q150 surface refresh-append") {
      CorpusMain.run(spark, List("refresh", s"$root/batch_1",
        s"$root/idx", s"$root/corpus", s"tokenizer=$root/model",
        s"shards=$root/shards"))
    }
    timeit("auditTrainingShards") {
      Pipeline.auditTrainingShards(spark, s"$root/shards",
        s"$root/model", s"$root/corpus").count()
    }
    // second full round on a fresh root: steady-state numbers
    val root2 = "/tmp/exp_fix_t2"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root2))
    docs.write.mode("overwrite").parquet(s"$root2/seed/corpus")
    Pipeline.trainBpeModel(spark, s"$root2/seed", s"$root2/model",
      numMerges = 64, maxTypes = 1 << 20)
    docs.where(col("doc_id") < b0).write.mode("overwrite")
      .parquet(s"$root2/batch_0")
    timeit("publish batch_0 (steady)") {
      Pipeline.refreshCorpus(spark,
        spark.read.parquet(s"$root2/batch_0"), s"$root2/idx",
        s"$root2/corpus", jaccardThreshold = 0.5, chunkTokens = 10,
        bandBuckets = 32, pieceBuckets = 32, chunkBuckets = 32,
        tokenizerModelDir = Some(s"$root2/model"))
    }
    Pipeline.writeTrainingShards(spark, s"$root2/corpus", s"$root2/model",
      s"$root2/shards", seqLen = 64, numShards = 4)
    docs.where(col("doc_id") >= b0 && col("doc_id") < t1)
      .write.mode("overwrite").parquet(s"$root2/batch_1")
    timeit("q150 surface refresh-append (steady)") {
      CorpusMain.run(spark, List("refresh", s"$root2/batch_1",
        s"$root2/idx", s"$root2/corpus", s"tokenizer=$root2/model",
        s"shards=$root2/shards"))
    }
    spark.stop()
  }
}
