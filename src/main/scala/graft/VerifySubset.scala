package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop companion to [[Verify]]: dump only the NAMED queries (plus
  * their oracle SQL) so `tools/oracle_check.py` can gate a focused
  * subset in seconds instead of re-running all ~150 entries — the
  * edit-run-check loop for converting a rows-only entry to
  * oracle-checked, or for re-proving just the queries a change
  * touched.
  *
  * Usage (classpath = target/scala-2.13/classes plus the Spark jars
  * dir glob):
  *   java -cp "&lt;classes&gt;:&lt;sparkJars&gt;"
  *     graft.VerifySubset &lt;sfDir&gt; &lt;outDir&gt; &lt;queryName&gt;...
  *   python3 tools/oracle_check.py &lt;sfDir&gt; &lt;outDir&gt;
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: VerifySubset <sfDir> <outDir> <queryName>...")
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-verify-subset")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$n")
    }
    // same JSON escaping contract as Verify (kept tiny, not shared:
    // the two mains must stay independently runnable from a bare
    // classes dir)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
