package graft.sources

import java.util.Properties

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Sinks (SURVEY.md §2 ops 4-5).
  *
  * Op 4 mirrors the reference's `UNLOAD … PARALLEL OFF` + boto3 rename dance
  * (reference main.py:232-260): a single stable-named CSV artifact. The
  * single-writer `coalesce(1)` bottleneck is accepted ONLY here, as the
  * reference does — the artifact is small, post-aggregation output. Never
  * use this on a fact-sized DataFrame.
  *
  * Op 5 replaces the reference's psql `\COPY` subprocess (reference
  * main.py:296-309) with Spark's batched JDBC writer — executors write in
  * parallel, `batchsize` plays the role of the bulk path that turned a >2h
  * row-insert load into ~5s (reference main.py:321-322).
  */
object Sinks {

  /** Op 4: write exactly one CSV file named `fileName` inside `dir`
    * (default `count.csv`, like the reference's renamed `count000`).
    */
  def singleFileCsv(df: DataFrame, dir: String,
      fileName: String = "count.csv", header: Boolean = false): Unit = {
    val tmp = s"$dir/_tmp_single_csv"
    df.coalesce(1).write.mode("overwrite")
      .option("header", header.toString).csv(tmp)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(tmp), conf)
    val part = fs.globStatus(new Path(s"$tmp/part-*"))(0).getPath
    val dest = new Path(s"$dir/$fileName")
    if (fs.exists(dest)) fs.delete(dest, false)
    fs.rename(part, dest)
    fs.delete(new Path(tmp), true)
  }

  /** Op 5: JDBC/warehouse sink, batched. */
  def jdbc(df: DataFrame, url: String, table: String,
      user: String = "", password: String = "",
      batchSize: Int = 10000, mode: String = "append"): Unit = {
    val props = new Properties()
    if (user.nonEmpty) props.setProperty("user", user)
    if (password.nonEmpty) props.setProperty("password", password)
    props.setProperty("batchsize", batchSize.toString)
    df.write.mode(mode).jdbc(url, table, props)
  }

  /** Ops 22-23 analog: partitioned, sorted parquet — the file-world
    * equivalent of the reference's date/country indexes (reference
    * main.py:530-552): `partitionBy` gives partition pruning on the hot
    * date predicate; the sort gives parquet min/max row-group pruning on
    * country/risk.
    */
  def indexedParquet(df: DataFrame, dir: String,
      partitionCols: Seq[String], sortCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(dir)
  }
}
