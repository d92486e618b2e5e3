package graft.config

import java.nio.file.{Files, Paths}

/** Driver-side configuration (SURVEY.md §2 ops 24-25).
  *
  * The reference loads a JSON config with `$ENV_VAR` placeholders
  * substituted from the environment, failing on missing variables
  * (reference main.py:25-38), and splits `s3://bucket/key` URLs
  * (reference main.py:41-50).
  */
object Config {

  /** Substitute `$VAR` / `${VAR}` from `env`; a referenced-but-missing
    * variable is an error, like `string.Template.substitute`. */
  def substituteEnv(template: String,
      env: Map[String, String] = sys.env): String = {
    val pattern = raw"\$$\{?([A-Za-z_][A-Za-z0-9_]*)\}?".r
    pattern.replaceAllIn(template, m => {
      val k = m.group(1)
      env.getOrElse(k,
        throw new IllegalArgumentException(s"missing env var: $k"))
        .replace("\\", "\\\\").replace("$", "\\$")
    })
  }

  /** Load an env-templated JSON config into a flat key→string map (the
    * reference's config is one flat JSON object of scalars).
    */
  def load(path: String, env: Map[String, String] = sys.env)
      : Map[String, String] = {
    val raw = substituteEnv(Files.readString(Paths.get(path)), env)
    parseFlatJson(raw)
  }

  /** Minimal flat-JSON-object parser (strings/numbers/bools), no library
    * dependency. Nested values are kept as raw JSON text.
    */
  private[config] def parseFlatJson(s: String): Map[String, String] = {
    val kv = raw""""([^"]+)"\s*:\s*("(?:[^"\\]|\\.)*"|-?\d+(?:\.\d+)?|true|false|null)""".r
    kv.findAllMatchIn(s).map { m =>
      val v = m.group(2)
      m.group(1) -> (if (v.startsWith("\"")) v.substring(1, v.length - 1)
        else v)
    }.toMap
  }

  /** `s3://bucket/key` → (bucket, key) (reference main.py:41-50). Hadoop's
    * `Path` handles these natively on executors; this is for driver-side
    * manifest bookkeeping.
    */
  def parseS3Path(url: String): (String, String) = {
    require(url.startsWith("s3://") || url.startsWith("s3a://"),
      s"not an s3 url: $url")
    val rest = url.substring(url.indexOf("//") + 2)
    val slash = rest.indexOf('/')
    if (slash < 0) (rest, "")
    else (rest.substring(0, slash), rest.substring(slash + 1))
  }
}
