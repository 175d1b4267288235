package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** INI/cfg configuration ingestion — the reference's config surface
  * (`email_config.cfg-sample`, `luigi.cfg-sample`: Python configparser
  * dialect) behind the engine's JSON-driven config objects, closing the
  * one reference file format the repo didn't model.
  *
  * Dialect (the subset the reference's samples exercise, matching
  * configparser defaults):
  *  - sections as `[Name]` (case preserved); keys must live inside one —
  *    a key before any section header is an error, like configparser's
  *    MissingSectionHeaderError;
  *  - `key = value` or `key : value`; keys lowercased (configparser's
  *    default key transform), values trimmed, empty values allowed;
  *  - full-line comments start with `#` or `;`;
  *  - inline comments: ` #` or ` ;` preceded by whitespace strips the
  *    tail (the samples carry `password=<password>  # CHANGE ME`); a
  *    bare `#` INSIDE a value (no preceding space) is value text;
  *  - duplicate keys: last wins (configparser strict=False);
  *  - backslashes are plain characters (`top_node=\Central Subject
  *    Registry\` round-trips untouched).
  *
  * Config files are driver-side kilobytes, so parsing is plain Scala; the
  * [[toDf]] view exists so landed configs join pipeline-history queries
  * (e.g. "which runs used which drop_dir") like any other table.
  */
object CfgSource {

  final case class Entry(section: String, key: String, value: String)

  /** Parse cfg text into ordered entries. */
  def parse(text: String): Seq[Entry] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[(String, String), Entry]
    var section: Option[String] = None
    text.linesIterator.zipWithIndex.foreach { case (raw, ln) =>
      val line = raw.replaceAll("[\\r\\n]+$", "")
      val t = line.trim
      if (t.isEmpty || t.startsWith("#") || t.startsWith(";")) ()
      else if (t.startsWith("[")) {
        require(t.endsWith("]"), s"cfg line ${ln + 1}: unterminated section header: $t")
        section = Some(t.substring(1, t.length - 1).trim)
      } else {
        val sep = {
          val eq = t.indexOf('='); val co = t.indexOf(':')
          if (eq < 0) co else if (co < 0) eq else math.min(eq, co)
        }
        require(sep > 0, s"cfg line ${ln + 1}: expected key=value: $t")
        val sec = section.getOrElse(
          sys.error(s"cfg line ${ln + 1}: key outside any [section]: $t"))
        val key = t.substring(0, sep).trim.toLowerCase
        val value = stripInlineComment(t.substring(sep + 1)).trim
        out((sec, key)) = Entry(sec, key, value)
      }
    }
    out.values.toSeq
  }

  /** Strip a trailing ` #...`/` ;...` comment (whitespace-preceded only,
    * the configparser inline rule). */
  private def stripInlineComment(v: String): String = {
    var i = 1
    while (i < v.length) {
      val c = v.charAt(i)
      if ((c == '#' || c == ';') && Character.isWhitespace(v.charAt(i - 1)))
        return v.substring(0, i)
      i += 1
    }
    v
  }

  /** section → (key → value), for typed binding. */
  def sections(text: String): Map[String, Map[String, String]] =
    parse(text).groupBy(_.section).view
      .mapValues(_.map(e => e.key -> e.value).toMap).toMap

  def parseFile(path: String): Map[String, Map[String, String]] =
    sections(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  /** The landed-table view: (section, key, value). */
  def toDf(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    parse(text).map(e => (e.section, e.key, e.value)).toDF("section", "key", "value")
  }

  /** The reference's e-mail settings shape (email_config.cfg-sample:
    * [email] receiver/sender/prefix + [smtp] host/port/username) bound to
    * the engine's notification surface — `prefix` feeds
    * `RunReport.notify`, the transport fields stay injected exactly like
    * the reference's send() credentials. */
  final case class EmailConfig(receiver: String, sender: String, prefix: String,
                               smtpHost: String, smtpPort: Int, smtpUser: String)
  def emailConfig(text: String): EmailConfig = {
    val s = sections(text)
    def get(sec: String, key: String): String =
      s.getOrElse(sec, sys.error(s"cfg: missing [$sec]"))
        .getOrElse(key, sys.error(s"cfg: missing $key in [$sec]"))
    EmailConfig(get("email", "receiver"), get("email", "sender"), get("email", "prefix"),
      get("smtp", "host"), get("smtp", "port").toInt, get("smtp", "username"))
  }

  /** The GlobalConfig paths a cfg-driven deployment binds onto
    * [[graft.pipeline.PipelineConfig]] (drop_dir → dropDir,
    * data_repo_dir → inputDataDir, working_dir → workingDir) — the rest
    * of PipelineConfig (sources, codebook, concepts) stays in the JSON
    * surface, as in the reference's sources_config.json split. */
  def globalPaths(text: String): (String, String, String) = {
    val g = sections(text).getOrElse("GlobalConfig",
      sys.error("cfg: missing [GlobalConfig]"))
    def get(key: String): String =
      g.getOrElse(key, sys.error(s"cfg: missing $key in [GlobalConfig]"))
    (get("drop_dir"), get("data_repo_dir"), get("working_dir"))
  }
}
