package graft.ingest

import java.util.regex.Pattern

/** Glob matching with full `**` hierarchy semantics.
  *
  * The reference matches object URIs against task source patterns with
  * minimatch (BucketToBigQuery.js:233–241) and calls out full folder-
  * hierarchy `**` support as a feature (readme.md:32). Hadoop's built-in
  * glob does NOT recurse on `**`, so we compile the pattern to a regex and
  * match listed paths ourselves. Matching happens at planning time against
  * file *names* (metadata), never against data rows.
  */
object Glob {

  /** Compile a glob to a regex: `**` crosses `/`, `*` and `?` do not. */
  def compile(glob: String): Pattern = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' if i + 1 < glob.length && glob.charAt(i + 1) == '*' =>
          // `**/` or trailing `**` — match any number of path segments
          if (i + 2 < glob.length && glob.charAt(i + 2) == '/') {
            sb.append("(?:[^/]*/)*"); i += 3
          } else { sb.append(".*"); i += 2 }
        case '*' => sb.append("[^/]*"); i += 1
        case '?' => sb.append("[^/]"); i += 1
        case '{' =>
          val close = glob.indexOf('}', i)
          if (close > i) {
            val alts = glob.substring(i + 1, close).split(",", -1)
              .map(Pattern.quote).mkString("(?:", "|", ")")
            sb.append(alts); i = close + 1
          } else { sb.append(Pattern.quote("{")); i += 1 }
        case c => sb.append(Pattern.quote(c.toString)); i += 1
      }
    }
    Pattern.compile(sb.append("$").toString)
  }

  def matches(glob: String, path: String): Boolean =
    compile(glob).matcher(path).matches()

  /** True if `path` matches ANY of the patterns (reference `_.some`,
    * BucketToBigQuery.js:239).
    */
  def matchesAny(globs: Seq[String], path: String): Boolean = {
    val compiled = globs.map(compile)
    compiled.exists(_.matcher(path).matches())
  }
}
