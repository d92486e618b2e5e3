package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only profiling entry (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    time("normalize only") {
      docs.select(md5(Dedup.normalized(col("text")))).count()
    }
    time("shingleArrays") {
      Dedup.shingleArrays(docs).select(size(col("shingles"))).count()
    }
    time("minhashSignatures") {
      Dedup.minhashSignatures(docs).select(size(col("signature"))).count()
    }
    time("bands no explode") {
      Dedup.shingleArrays(docs)
        .select(size(graft.functions.native.minhash_bands(col("shingles"))))
        .count()
    }
    time("posexplode of literalish") {
      Dedup.shingleArrays(docs)
        .select(col("doc_id"), posexplode(array((0 until 8).map(lit): _*)))
        .count()
    }
    time("lshBands") { Dedup.lshBands(docs).count() }
    Dedup.lshBands(docs).explain("formatted")
    time("candidates") { Dedup.minhashCandidates(docs).count() }
    time("nearDupPairs") { Dedup.nearDupPairs(docs, 0.5).count() }
    spark.stop()
  }
}
