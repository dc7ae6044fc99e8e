package graft.core

/** Dotted-scope configuration (SURVEY §2.A row C3): each pipeline
  * component reads its own subtree of one config, addressed by a scope
  * string — reproducing the reference's `Scoped.get_scoped_conf(conf,
  * scope)` contract (/root/reference/job/customized_job.py:37-38;
  * scopes like `publisher.awssqs` at publisher/
  * aws_sqs_csv_puiblisher.py:145-146).
  *
  * Backed by a flat Map of dotted keys; `scoped("a.b")` returns a view
  * whose keys are relative to that prefix. Parses simple
  * `key = value` / `key: value` lines (the subset of HOCON the
  * reference's configs actually use — config/docker.conf:1-15), plus
  * programmatic construction for jobs.
  */
final class ScopedConf private (private val entries: Map[String, String]) extends Serializable {

  def get(key: String): Option[String] = entries.get(key)

  def apply(key: String): String =
    entries.getOrElse(key, throw new NoSuchElementException(s"missing config key: $key"))

  def getOrElse(key: String, default: => String): String = entries.getOrElse(key, default)

  def getBoolean(key: String, default: Boolean = false): Boolean =
    entries.get(key).map(_.trim.toLowerCase == "true").getOrElse(default)

  def getInt(key: String, default: Int): Int = entries.get(key).map(_.trim.toInt).getOrElse(default)

  /** Subtree view: keys under `prefix.` with the prefix stripped. */
  def scoped(prefix: String): ScopedConf = {
    val p = prefix + "."
    new ScopedConf(entries.collect { case (k, v) if k.startsWith(p) => k.drop(p.length) -> v })
  }

  def keys: Set[String] = entries.keySet

  def withFallback(other: ScopedConf): ScopedConf =
    new ScopedConf(other.entries ++ entries)
}

object ScopedConf {

  def apply(entries: (String, String)*): ScopedConf = new ScopedConf(entries.toMap)

  def fromMap(entries: Map[String, String]): ScopedConf = new ScopedConf(entries)

  /** Parse `a.b.c = value` / `a.b.c: value` lines; `#`/`//` comments
    * and blank lines ignored; quotes around values stripped. */
  def parse(text: String): ScopedConf = {
    val kv = text.linesIterator
      .map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#") || l.startsWith("//"))
      .flatMap { line =>
        val idx = line.indexWhere(c => c == '=' || c == ':')
        if (idx <= 0) None
        else {
          val k = line.take(idx).trim
          val v = line.drop(idx + 1).trim.stripPrefix("\"").stripSuffix("\"")
          Some(k -> v)
        }
      }.toMap
    new ScopedConf(kv)
  }
}
