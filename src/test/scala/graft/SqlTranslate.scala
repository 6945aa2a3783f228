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
    ("list_min(", "array_min("),
    ("list_max(", "array_max("),
    ("list_intersect(", "array_intersect("),
    ("strpos(", "instr("), // both (haystack, needle), 1-based, 0 = absent
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

  /** DuckDB Python-style list comprehensions — `[E for v in L]` and
    * `[E for v in L if C]` — are ANSI higher-order functions in Spark:
    * `transform(L, v -> E)` / `transform(filter(L, v -> C), v -> E)`.
    * Quote-aware, depth-aware (one counter over both bracket kinds —
    * well-formed SQL nests them properly), fixpoint so nested
    * comprehensions (inner vars visible to inner lambdas, exactly as
    * Spark scopes nested lambdas) rewrite on later passes. A bracket
    * span with no top-level `for` (array literal, index, slice) is
    * left for the literal/index rules downstream. */
  def rewriteComprehensions(s: String): String = {
    // top-level keyword positions inside a span: depth 0, whitespace
    // on both sides
    def keyword(content: String, kw: String, from: Int): Int = {
      var depth = 0; var q = false; var i = from
      while (i < content.length) {
        val c = content(i)
        if (q) { if (c == '\'') q = false }
        else c match {
          case '\'' => q = true
          case '[' | '(' => depth += 1
          case ']' | ')' => depth -= 1
          case _ =>
            if (depth == 0 && content.startsWith(kw, i) &&
                i > 0 && content(i - 1).isWhitespace &&
                i + kw.length < content.length &&
                content(i + kw.length).isWhitespace) return i
        }
        i += 1
      }
      -1
    }
    var i = 0; var q = false
    while (i < s.length) {
      val c = s(i)
      if (c == '\'') { q = !q; i += 1 }
      else if (!q && c == '[') {
        // matching close bracket
        var depth = 0; var j = i; var qq = false; var close = -1
        while (j < s.length && close < 0) {
          val d = s(j)
          if (qq) { if (d == '\'') qq = false }
          else d match {
            case '\'' => qq = true
            case '[' | '(' => depth += 1
            case ']' | ')' => depth -= 1; if (depth == 0) close = j
            case _ =>
          }
          j += 1
        }
        if (close < 0) return s // malformed; leave untouched
        val content = s.substring(i + 1, close)
        val forPos = keyword(content, "for", 0)
        val inPos = if (forPos < 0) -1 else keyword(content, "in", forPos + 3)
        if (forPos >= 0 && inPos >= 0) {
          val ifPos = keyword(content, "if", inPos + 2)
          val e = content.substring(0, forPos).trim
          val v = content.substring(forPos + 3, inPos).trim
          val l = content.substring(inPos + 2,
            if (ifPos >= 0) ifPos else content.length).trim
          val cond = if (ifPos >= 0) content.substring(ifPos + 2).trim else ""
          val repl =
            if (cond.isEmpty) s"transform($l, $v -> $e)"
            else s"transform(filter($l, $v -> $cond), $v -> $e)"
          return rewriteComprehensions(
            s.substring(0, i) + repl + s.substring(close + 1))
        }
        i += 1
      }
      else i += 1
    }
    s
  }

  /** Rewrites `name(args…)` calls whose Spark form is not a plain
    * rename — the full balanced argument text is handed to `make`,
    * split at top-level commas. Quote-aware; fixpoint over every
    * occurrence (innermost calls are rewritten on the recursive
    * passes their enclosing text triggers). */
  def rewriteCall(s: String, name: String, from: Int = 0)(make: Seq[String] => String): String = {
    val at = {
      var i = from; var q = false; var found = -1
      while (i < s.length && found < 0) {
        val c = s(i)
        if (c == '\'') q = !q
        else if (!q && s.startsWith(name, i) &&
            (i == 0 || !(s(i - 1).isLetterOrDigit || s(i - 1) == '_')))
          found = i
        i += 1
      }
      found
    }
    if (at < 0) return s
    val open = at + name.length - 1 // name includes the '('
    var depth = 0; var j = open; var q = false; var close = -1
    val commas = scala.collection.mutable.ListBuffer[Int]()
    while (j < s.length && close < 0) {
      val c = s(j)
      if (q) { if (c == '\'') q = false }
      else c match {
        case '\'' => q = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1; if (depth == 0) close = j
        case ',' if depth == 1 => commas += j
        case _ =>
      }
      j += 1
    }
    if (close < 0) return s
    val bounds = (open +: commas.toList) :+ close
    val args = bounds.sliding(2).map {
      case Seq(a, b) => s.substring(a + 1, b).trim
      case _ => ""
    }.toSeq
    val repl = make(args)
    if (repl == s.substring(at, close + 1)) // identity: skip past, keep scanning
      rewriteCall(s, name, at + 1)(make)
    else
      rewriteCall(s.substring(0, at) + repl + s.substring(close + 1), name, at)(make)
  }

  /** DuckDB struct literals `{'k': v, …}` → Spark
    * `named_struct('k', v, …)`. Quote-aware, innermost-first; one
    * depth counter over every bracket kind (well-formed nesting).
    * Field ACCESS (`s.k`) is already common syntax. */
  def rewriteStructLiterals(s: String): String = {
    var i = 0; var q = false
    while (i < s.length) {
      val c = s(i)
      if (c == '\'') { q = !q; i += 1 }
      else if (!q && c == '{') {
        var depth = 0; var j = i; var qq = false; var close = -1
        val commas = scala.collection.mutable.ListBuffer[Int]()
        val colons = scala.collection.mutable.ListBuffer[Int]()
        while (j < s.length && close < 0) {
          val d = s(j)
          if (qq) { if (d == '\'') qq = false }
          else d match {
            case '\'' => qq = true
            case '{' | '[' | '(' => depth += 1
            case '}' | ']' | ')' => depth -= 1; if (depth == 0) close = j
            case ',' if depth == 1 => commas += j
            case ':' if depth == 1 => colons += j
            case _ =>
          }
          j += 1
        }
        if (close < 0 || colons.isEmpty) { i += 1 }
        else {
          val bounds = (i +: commas.toList) :+ close
          val parts = bounds.sliding(2).map {
            case Seq(a, b) =>
              val part = s.substring(a + 1, b)
              val cut = colons.find(p => p > a && p < b)
                .map(_ - (a + 1)).getOrElse(-1)
              if (cut < 0) part.trim
              else s"${part.substring(0, cut).trim}, ${part.substring(cut + 1).trim}"
            case _ => ""
          }.mkString(", ")
          return rewriteStructLiterals(
            s.substring(0, i) + s"named_struct($parts)" + s.substring(close + 1))
        }
      }
      else i += 1
    }
    s
  }

  /** DuckDB list literals with arbitrary element expressions —
    * `[a, b]`, `[f(x), l[i]]` — → Spark `array(…)`. A bracket span is
    * a literal only when NOT preceded by a value (identifier, `)`,
    * `]`), which would make it indexing/slicing, and its content has
    * no top-level `:` (slice). The numeric-literal regex upstream
    * already handled digit-only spans; this catches the rest. */
  def rewriteListLiterals(s: String): String = {
    var i = 0; var q = false
    while (i < s.length) {
      val c = s(i)
      if (c == '\'') { q = !q; i += 1 }
      else if (!q && c == '[') {
        val prev = s.take(i).reverse.dropWhile(_.isWhitespace).headOption
        val isValueBefore = prev.exists(p => p.isLetterOrDigit || p == '_' || p == ')' || p == ']')
        var depth = 0; var j = i; var qq = false; var close = -1
        var topColon = false
        while (j < s.length && close < 0) {
          val d = s(j)
          if (qq) { if (d == '\'') qq = false }
          else d match {
            case '\'' => qq = true
            case '[' | '(' | '{' => depth += 1
            case ']' | ')' | '}' => depth -= 1; if (depth == 0) close = j
            case ':' if depth == 1 => topColon = true
            case _ =>
          }
          j += 1
        }
        if (close < 0 || isValueBefore || topColon) i += 1
        else return rewriteListLiterals(
          s.substring(0, i) + s"array(${s.substring(i + 1, close)})" + s.substring(close + 1))
      }
      else i += 1
    }
    s
  }

  /** General 1-based indexing and slicing on any value — `X[e]` →
    * `element_at(X, e)` (DuckDB and element_at agree: 1-based,
    * negative from the end), `X[a:b]` (inclusive b) →
    * `slice(X, a, (b) - (a) + 1)` — where X is a dotted identifier or
    * a balanced `(…)`/`…)`-call/`[…]` value and the index expression
    * may be arbitrary (the upstream literal-only regexes left these).
    * Quote-aware, fixpoint. */
  def rewriteIndexing(s: String): String = {
    var i = 0; var q = false
    while (i < s.length) {
      val c = s(i)
      if (c == '\'') { q = !q; i += 1 }
      else if (!q && c == '[') {
        // is there a value immediately before?
        var p = i - 1
        while (p >= 0 && s(p).isWhitespace) p -= 1
        val xEnd = p
        var xStart = -1
        if (p >= 0 && (s(p) == ')' || s(p) == ']')) {
          var depth = 0
          while (p >= 0 && { val d = s(p)
              if (d == ')' || d == ']') depth += 1
              else if (d == '(' || d == '[') depth -= 1
              depth != 0 }) p -= 1
          p -= 1
          while (p >= 0 && (s(p).isLetterOrDigit || s(p) == '_' || s(p) == '.')) p -= 1
          xStart = p + 1
        } else if (p >= 0 && (s(p).isLetterOrDigit || s(p) == '_')) {
          while (p >= 0 && (s(p).isLetterOrDigit || s(p) == '_' || s(p) == '.')) p -= 1
          xStart = p + 1
          // a bare keyword/number before '[' is not a value access —
          // but SQL keywords never directly precede '[' in this corpus
        }
        if (xStart < 0) { i += 1 }
        else {
          // matching close + top-level colon
          var depth = 0; var j = i; var qq = false; var close = -1; var colon = -1
          while (j < s.length && close < 0) {
            val d = s(j)
            if (qq) { if (d == '\'') qq = false }
            else d match {
              case '\'' => qq = true
              case '[' | '(' | '{' => depth += 1
              case ']' | ')' | '}' => depth -= 1; if (depth == 0) close = j
              case ':' if depth == 1 => colon = j
              case _ =>
            }
            j += 1
          }
          if (close < 0) { i += 1 }
          else {
            val x = s.substring(xStart, xEnd + 1)
            val repl =
              if (colon >= 0) {
                val a = s.substring(i + 1, colon).trim
                val b = s.substring(colon + 1, close).trim
                s"slice($x, $a, ($b) - ($a) + 1)"
              } else
                // CAST: Spark element_at wants INT; sequence()/range()
                // counters arrive as BIGINT (value-preserving here —
                // every corpus index is dimension-bounded)
                s"element_at($x, CAST(${s.substring(i + 1, close).trim} AS INT))"
            return rewriteIndexing(
              s.substring(0, xStart) + repl + s.substring(close + 1))
          }
        }
      }
      else i += 1
    }
    s
  }

  /** DuckDB FROM-clause generator with a column alias —
    * `FROM t, unnest(X) u(col)` (renamed to explode by now) — is
    * Spark's `FROM t LATERAL VIEW explode(X) u AS col`. */
  def rewriteLateralGenerator(s: String, from: Int = 0): String = {
    val m = java.util.regex.Pattern.compile(""",\s*explode\(""").matcher(s)
    if (!m.find(from)) return s
    val open = m.end() - 1
    var depth = 0; var j = open; var q = false; var close = -1
    while (j < s.length && close < 0) {
      val c = s(j)
      if (q) { if (c == '\'') q = false }
      else c match {
        case '\'' => q = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1; if (depth == 0) close = j
        case _ =>
      }
      j += 1
    }
    if (close < 0) return s
    val alias = java.util.regex.Pattern.compile("""\s*(\w+)\((\w+)\)""")
      .matcher(s.substring(close + 1))
    // no `alias(col)` after the close paren = a projection-position
    // explode, not the FROM-clause generator shape — keep scanning
    if (!alias.lookingAt()) return rewriteLateralGenerator(s, m.end())
    val rewritten = s.substring(0, m.start()) +
      s" LATERAL VIEW explode(${s.substring(open + 1, close)}) " +
      s"${alias.group(1)} AS ${alias.group(2)}" +
      s.substring(close + 1 + alias.end())
    rewriteLateralGenerator(rewritten, m.start())
  }

  /** Full chain. `lenIsLength` switches the `len(` target: DuckDB's
    * len() covers both lists (Spark `size`) and strings (Spark
    * `length`); a text using it on strings needs the second reading. */
  def apply(s: String, lenIsLength: Boolean = false): String = {
    val table =
      if (lenIsLength) renames.map { case ("len(", _) => ("len(", "length(") case p => p }
      else renames
    val comprehended = rewriteComprehensions(s)
      // DuckDB recursive unnest (array-of-structs → columns named by
      // the struct fields) is exactly Spark's inline()
      .pipe(t => rewriteCall(t, "unnest(") { args =>
        if (args.length == 2 && args(1).replaceAll("\\s+", "") == "recursive:=true")
          s"inline(${args.head})"
        else s"unnest(${args.mkString(", ")})"
      })
      // DuckDB list(X ORDER BY K) — the ordered array aggregate Spark
      // has no WITHIN GROUP spelling for — is the deterministic
      // sort-after-collect composition (exact when K is unique per
      // group, which every corpus use is); bare list(X) = collect_list
      .pipe(t => rewriteCall(t, "list(") { args =>
        if (args.length != 1) s"list(${args.mkString(", ")})"
        else {
          val m = java.util.regex.Pattern
            .compile("""(?s)^(.*?)\s+ORDER\s+BY\s+(.*)$""").matcher(args.head)
          if (m.matches())
            s"transform(array_sort(collect_list(named_struct(" +
              s"'_o', ${m.group(2)}, '_v', ${m.group(1)}))), s -> s._v)"
          else s"collect_list(${args.head})"
        }
      })
      // DuckDB list_sum is a left fold; Spark spells the identical
      // fold (same association, same IEEE result on double lists —
      // the Similarity oracle-parity contract) as `aggregate`. The
      // DOUBLE zero also covers the corpus's integer-list uses: they
      // feed comparisons/round-trips exact far below 2^53.
      .pipe(t => rewriteCall(t, "list_sum(") { args =>
        s"aggregate(${args.head}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
      })
      // DuckDB scalar xor(a, b) = the ^ operator
      .pipe(t => rewriteCall(t, "xor(") {
        case Seq(a, b) => s"(($a) ^ ($b))"
        case args => s"xor(${args.mkString(", ")})"
      })
    val renamed = table.foldLeft(comprehended) { case (acc, (f, t)) => replaceOutside(acc, f, t) }
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
      // r11 general-form passes (the regex rules above handled only
      // literal-index/numeric-literal special cases)
      .pipe(rewriteStructLiterals)
      .pipe(rewriteListLiterals)
      .pipe(rewriteIndexing)
      .pipe(t => rewriteLateralGenerator(t))
  }
}
