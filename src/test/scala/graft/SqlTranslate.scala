package graft

import scala.util.chaining._

/** The mechanical DuckDB→Spark oracle-text rename chain, shared by the
  * Scratch sqlscan triage tool and SqlSurfaceSpec's pinned sweeps.
  * Every mapping is a function-name (or literal-syntax) swap whose
  * Spark builtin has identical semantics on the inputs this corpus
  * uses; the row-identical check downstream is the actual gate, so a
  * mapping that ever drifts fails loudly rather than passing wrong.
  * Literal replacements apply only OUTSIDE single-quoted strings. */
object SqlTranslate {

  def replaceOutside(s: String, from: String, to: String): String = {
    val out = new StringBuilder
    var i = 0; var q = false
    while (i < s.length) {
      if (s(i) == '\'') { q = !q; out += s(i); i += 1 }
      else if (!q && s.startsWith(from, i)) { out ++= to; i += from.length }
      else { out += s(i); i += 1 }
    }
    out.toString
  }

  /** The rename table. Order matters (epoch_us before epoch, strlen
    * before len, string_split_regex before string_split). */
  val renames: Seq[(String, String)] = Seq(
    ("//", " div "),
    ("string_split_regex(", "split("),
    ("string_split(", "split("),
    ("epoch_us(", "unix_micros("),
    ("epoch(", "unix_seconds("),
    ("quantile_cont(", "percentile("),
    ("strftime(", "date_format("),
    ("unnest(", "explode("),
    ("list_filter(", "filter("),
    ("list_distinct(", "array_distinct("),
    ("array_to_string(", "array_join("),
    ("json_extract_string(", "get_json_object("),
    ("strlen(", "length("),
    ("ord(", "ascii("),
    // len() on a provably-array argument maps to size() in BOTH len
    // readings (string_split has already been renamed to split by the
    // time these fire, so len(string_split( is covered by len(split()
    ("len(split(", "size(split("),
    ("len(filter(", "size(filter("),
    ("len(regexp_extract_all(", "size(regexp_extract_all("),
    ("len(array_distinct(", "size(array_distinct("),
    ("len(sequence(", "size(sequence("),
    ("len(", "size("),
    ("make_timestamp(", "timestamp_micros("),
    ("generate_series(", "sequence("),
    // DuckDB encode(str) is the UTF-8 blob; Spark's octet_length
    // already counts UTF-8 bytes of the raw string
    ("octet_length(encode(", "octet_length(("),
    // DuckDB datediff('day', …) = Spark datediff(DAY, …) — the unit is
    // an identifier in Spark, a string in DuckDB ('day' is the only
    // unit this corpus uses)
    ("datediff('day',", "datediff(DAY,"),
    ("date_diff('day',", "date_diff(DAY,"),
    ("AS VARCHAR)", "AS STRING)"),
    ("AS varchar)", "AS STRING)"),
    // DuckDB puts IGNORE NULLS inside the call parens; ANSI/Spark
    // puts it after the closing paren
    (" IGNORE NULLS)", ") IGNORE NULLS"),
    (", 'g')", ")"), // DuckDB regexp global flag; Spark is global
  )

  /** Applies `f` to the parts of `s` OUTSIDE single-quoted literals
    * (regex post-passes are structural SQL rewrites; a quoted regex
    * like '[0-9]' must never match a list-literal or indexing rule). */
  def mapOutsideQuotes(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var q = false
    def flush(): Unit = { out ++= (if (q) seg.toString else f(seg.toString)); seg.clear() }
    s.foreach { c =>
      if (c == '\'') { flush(); q = !q; out += c }
      else seg += c
    }
    flush()
    out.toString
  }

  /** DuckDB string literals are raw; Spark's parser processes
    * backslash escapes (default escapedStringLiterals=false), so a
    * regex literal like '\s+' silently becomes 's+'. Doubling every
    * backslash inside single-quoted literals preserves the DuckDB
    * reading. */
  def escapeLiteralBackslashes(s: String): String = {
    val out = new StringBuilder
    var q = false
    s.foreach { c =>
      if (c == '\'') { q = !q; out += c }
      else if (q && c == '\\') out ++= "\\\\"
      else out += c
    }
    out.toString
  }

  /** Rewrites `f(args)[i]` (1-based DuckDB indexing on a CALL result,
    * which the word-adjacent regex can't reach) into
    * `element_at(f(args), i)` by walking back over balanced parens to
    * the start of the call. */
  def rewriteParenIndex(s: String): String = {
    val m = java.util.regex.Pattern.compile("""\)\[(-?\d+)\]""").matcher(s)
    if (!m.find()) return s
    val closeIdx = m.start() // position of ')'
    val idx = m.group(1)
    // walk left from the ')' to its matching '('
    var depth = 0
    var i = closeIdx
    while (i >= 0 && { val c = s(i)
        if (c == ')') depth += 1 else if (c == '(') depth -= 1
        depth != 0 }) i -= 1
    // extend over the function name (identifier chars and dots)
    var j = i - 1
    while (j >= 0 && (s(j).isLetterOrDigit || s(j) == '_' || s(j) == '.')) j -= 1
    val rewritten = s.substring(0, j + 1) +
      s"element_at(${s.substring(j + 1, closeIdx + 1)}, $idx)" +
      s.substring(m.end())
    rewriteParenIndex(rewritten) // until no occurrences remain
  }

  /** DuckDB `range(a, b[, s])` (end-EXCLUSIVE list) → Spark
    * `sequence(a, (b) - 1[, s])` (end-inclusive): for integer bounds
    * and positive step both generate a, a+s, … while < b. Paren-aware
    * so bounds may be arbitrary expressions. */
  def rewriteRange(s: String): String = {
    // only SCALAR range — i.e. as a function argument, previous
    // non-space char '(' — is rewritten; `FROM range(a, b)` stays:
    // Spark's native range TVF is also end-exclusive, so it already
    // matches DuckDB's table-function semantics verbatim
    val m = java.util.regex.Pattern.compile("""\(\s*range\(""").matcher(s)
    if (!m.find()) return s
    val open = m.end() - 1
    var depth = 0
    var i = open
    val commas = scala.collection.mutable.ListBuffer[Int]()
    while (i < s.length && { val c = s(i)
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        else if (c == ',' && depth == 1) commas += i
        depth != 0 }) i += 1
    val close = i
    val args = (open +: commas.toList.map(_ + 0) :+ close).sliding(2).map {
      case Seq(a, b) => s.substring(a + 1, b).trim
      case _ => ""
    }.toList
    val rangeStart = m.end() - "range(".length
    val seq = args match {
      case List(a, b) => s"sequence($a, ($b) - 1)"
      case List(a, b, st) => s"sequence($a, ($b) - 1, $st)"
      case _ => s.substring(rangeStart, close + 1) // unexpected arity: leave as-is
    }
    val rewritten = s.substring(0, rangeStart) + seq + s.substring(close + 1)
    if (rewritten == s) s else rewriteRange(rewritten)
  }

  /** Full chain. `lenIsLength` switches the `len(` target: DuckDB's
    * len() covers both lists (Spark `size`) and strings (Spark
    * `length`); a text using it on strings needs the second reading. */
  def apply(s: String, lenIsLength: Boolean = false): String = {
    val table =
      if (lenIsLength) renames.map { case ("len(", _) => ("len(", "length(") case p => p }
      else renames
    val renamed = table.foldLeft(s) { case (acc, (f, t)) => replaceOutside(acc, f, t) }
    escapeLiteralBackslashes(renamed)
      .replace("'%Y-%m-%d'", "'yyyy-MM-dd'")
      .replace("'%Y%m%dT%H%M%S'", "'yyyyMMdd''T''HHmmss'")
      // DuckDB numeric list literals [1, 2, 3] → Spark array(1, 2, 3)
      // (lookbehind keeps arr[3] indexing out; quote-awareness keeps
      // regex literals like '[0-9]' out)
      .pipe(t => mapOutsideQuotes(t)(
        _.replaceAll("""(?<![\w)\]])\[([\d\s,.\-eE]+)\]""", "array($1)")))
      // DuckDB's FILTER (cond) shorthand needs the ANSI WHERE keyword
      .replaceAll("""FILTER \((?!WHERE\b)""", "FILTER (WHERE ")
      // DuckDB arr[i] is 1-based (negative = from the end); Spark [i]
      // is 0-based but element_at matches DuckDB on both counts —
      // literal indexes only, qualified names included, quotes skipped
      .pipe(t => mapOutsideQuotes(t)(
        _.replaceAll("""((?:\w+\.)?\w+)\[(-?\d+)\]""", "element_at($1, $2)")))
      // same, on call results: f(args)[i] -> element_at(f(args), i)
      .pipe(rewriteParenIndex)
      // DuckDB list slicing arr[a:b] (1-based, b inclusive) = Spark
      // slice(arr, a, b-a+1); bounds may be simple arithmetic
      .pipe(t => mapOutsideQuotes(t)(
        _.replaceAll(
          """(\w+)\[([^:\[\]()]+):([^:\[\]()]+)\]""",
          "slice($1, $2, ($3) - ($2) + 1)")))
      // DuckDB scalar range(a, b[, s]) is EXCLUSIVE of b; Spark
      // sequence is inclusive — emitted as sequence(a, (b) - 1[, s]),
      // exact for the integer bounds this corpus uses
      .pipe(rewriteRange)
      // DuckDB regexp_extract_all(s, p) returns whole matches (group
      // 0); Spark's 2-arg form defaults to group 1 and rejects
      // group-free patterns — pin group 0 explicitly
      .replaceAll(
        """regexp_extract_all\(([^,()]+),\s*('(?:[^'])*')\)""",
        "regexp_extract_all($1, $2, 0)")
      // string_split is literal, Spark split is regex: a metachar
      // separator must be escaped after the rename
      .replaceAll("""split\(([^,()]+), '([.|+*?$^])'\)""", "split($1, '\\\\\\\\$2')")
      // DuckDB/Postgres date_part('dow') is Sunday=0; Spark's maps to
      // dayofweek (Sunday=1) — shift down (one paren level allowed)
      .replaceAll(
        """date_part\('dow',\s*((?:[^()]|\([^()]*\))+?)\)""",
        "(date_part('dow', $1) - 1)")
      // DuckDB quantile_disc(col, q) = ANSI percentile_disc
      .replaceAll(
        """quantile_disc\(([^,()]+),\s*([^()]+)\)""",
        "percentile_disc($2) WITHIN GROUP (ORDER BY $1)")
      // DuckDB's in-aggregate ORDER BY = ANSI WITHIN GROUP (one level
      // of nested parens allowed on either side, DOTALL for multiline)
      .replaceAll(
        """(?s)string_agg\(((?:[^()]|\([^()]*\))*?)\s+ORDER\s+BY\s+((?:[^()]|\([^()]*\))+?)\)""",
        "string_agg($1) WITHIN GROUP (ORDER BY $2)")
  }
}
