package graft.query

/** DuckDB star-modifier support (SURVEY §2.8): the reference's gold-job
  * dialect advertises `SELECT * EXCLUDE (...)` and `* REPLACE (expr AS
  * col)` select modifiers (transformation_agent/.../analyzer.py:38-39).
  * Spark 4 parses `* EXCEPT (cols)` natively but knows neither keyword,
  * so a star's modifier chain is folded into one EXCEPT plus appended
  * select items:
  *
  *  - `* EXCLUDE (a, b)` / `* EXCLUDE a`   → `* EXCEPT (a, b)`
  *  - `* REPLACE (e1 AS c1)`               → `* EXCEPT (c1), e1 AS c1`
  *  - `* EXCLUDE (a) REPLACE (e AS c)`     → `* EXCEPT (a, c), e AS c`
  *
  * REPLACE moves the replaced columns to the end of the select list
  * (DuckDB keeps them in place); name-addressed consumers — including the
  * engine's result maps and the correctness gate's name-sorted compare —
  * are position-independent, so this is documented rather than patched.
  *
  * Scanning is quote-aware and applies at any paren depth (subqueries
  * included); only a `*` (or `t.*`) immediately before the keyword
  * triggers, so column names like `exclude_flag` are never touched.
  */
object StarRewriter {

  def rewrite(sql: String): String = {
    var cur = sql
    var continue = true
    while (continue) rewriteOnce(cur) match {
      case Some(next) => cur = next
      case None => continue = false
    }
    cur
  }

  private def rewriteOnce(sql: String): Option[String] = {
    val lower = sql.toLowerCase
    val flags = SqlScan.quoteFlags(sql) // Spark escape rules, backslash incl.
    var lastNonSpace: Char = 0
    var i = 0
    while (i < sql.length) {
      val c = sql(i)
      if (flags(i)) lastNonSpace = c
      else if (!c.isWhitespace) {
        if (lastNonSpace == '*' && (startsWord(lower, i, "exclude") ||
            startsWord(lower, i, "replace")))
          return Some(foldModifiers(sql, lower, i))
        lastNonSpace = c
      }
      i += 1
    }
    None
  }

  /** Parse the EXCLUDE/REPLACE chain starting at `start` and splice the
    * folded EXCEPT + appended replace items back into the SQL. */
  private def foldModifiers(sql: String, lower: String, start: Int): String = {
    var i = start
    val excluded = Seq.newBuilder[String]
    val replaced = Seq.newBuilder[String]
    var more = true
    while (more) {
      val beforeSkip = i
      while (i < sql.length && sql(i).isWhitespace) i += 1
      if (startsWord(lower, i, "exclude")) {
        val (args, end) = parseArgs(sql, i + "exclude".length)
        excluded ++= args
        i = end
      } else if (startsWord(lower, i, "replace")) {
        val (args, end) = parseArgs(sql, i + "replace".length)
        replaced ++= args
        i = end
      } else { i = beforeSkip; more = false }
    }
    val repl = replaced.result()
    val except = excluded.result() ++ repl.map(aliasOf)
    val folded = s"EXCEPT (${except.mkString(", ")})" +
      (if (repl.nonEmpty) s", ${repl.mkString(", ")}" else "")
    sql.substring(0, start) + folded + sql.substring(i)
  }

  private def startsWord(lower: String, i: Int, word: String): Boolean =
    lower.startsWith(word, i) &&
      (i + word.length >= lower.length || !isWordChar(lower(i + word.length)))

  /** The alias after the item's last depth-0 ` AS `. */
  private def aliasOf(item: String): String = {
    val idx = lastTopLevelAs(item)
    require(idx >= 0, s"REPLACE item needs an AS alias: $item")
    item.substring(idx + 4).trim
  }

  private def lastTopLevelAs(s: String): Int = {
    var depth = 0; var found = -1
    val lower = s.toLowerCase
    val flags = SqlScan.quoteFlags(s)
    var i = 0
    while (i < s.length) {
      if (!flags(i)) s(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && lower.startsWith(" as ", i)) found = i
      }
      i += 1
    }
    found
  }

  /** Parse `(a, b, ...)` (top-level comma split) or a single bare
    * identifier; returns (args, indexAfterArgs). */
  private def parseArgs(sql: String, from: Int): (Seq[String], Int) = {
    var i = from
    while (i < sql.length && sql(i).isWhitespace) i += 1
    if (i < sql.length && sql(i) == '(') {
      var depth = 0
      val flags = SqlScan.quoteFlags(sql)
      val args = Seq.newBuilder[String]
      val item = new StringBuilder
      var j = i
      while (j < sql.length) {
        val c = sql(j)
        if (flags(j)) item.append(c)
        else c match {
          case '(' =>
            depth += 1; if (depth > 1) item.append(c)
          case ')' =>
            depth -= 1
            if (depth == 0) {
              if (item.toString.trim.nonEmpty) args += item.toString.trim
              return (args.result(), j + 1)
            } else item.append(c)
          case ',' if depth == 1 =>
            args += item.toString.trim; item.clear()
          case other => item.append(other)
        }
        j += 1
      }
      throw new IllegalArgumentException(s"unbalanced parens after $from: $sql")
    } else {
      // bare single identifier form: EXCLUDE col
      val start = i
      while (i < sql.length && isWordChar(sql(i))) i += 1
      (Seq(sql.substring(start, i)), i)
    }
  }

  private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' || c == '.'
}
