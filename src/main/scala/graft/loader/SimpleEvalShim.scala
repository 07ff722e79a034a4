package graft.loader

/** Translation shim for Python/simpleeval-dialect stream-map expressions.
  *
  * The reference inherits stream maps from singer-sdk 0.35.1
  * (`/root/reference/meltano.yml:18`, capability `stream-maps`), whose
  * expressions are evaluated by `simpleeval` — Python syntax over a
  * `record` dict. This engine's [[StreamMaps]] evaluates Spark SQL
  * expressions instead (a documented dialect deviation). The shim closes
  * the config-portability gap for the common meltano forms, so mappings
  * like `record['a'] + '!'` or `record['x'] if record['y'] > 0 else None`
  * run unmodified:
  *
  *   - `record['name']` / `record["name"]`          → `` `name` ``
  *   - `A if C else B` (Python conditional, nested) → `IF(C, A, B)`
  *   - `+` chains with a string operand             → `CONCAT(...)`
  *   - `==` → `=`, `None` → `NULL`, `True`/`False`  → `TRUE`/`FALSE`
  *   - `str(x)`/`int(x)`/`float(x)`                 → `CAST(x AS ...)`
  *   - `len(x)`                                     → `LENGTH(x)`
  *   - `and`/`or`/`not`, `!=`, `<`, `<=`, …         → pass through (same
  *     meaning in Spark SQL)
  *
  * Translation is purely lexical (token stream, no AST), which covers the
  * rename / copy / concat / conditional shapes real meltano configs use;
  * anything beyond it (comprehensions, method calls, `in`) raises rather
  * than silently mis-translating. SQL-dialect expressions pass through
  * untouched — [[maybeTranslate]] fires on unambiguous Python markers
  * (`record[`, an infix conditional, `None`/`True`/`False`, `str()`-style
  * casts). `==` alone is AMBIGUOUS (Spark SQL accepts it as equality) and
  * resolves in two steps: `+` adjacent to a string literal is Python
  * concatenation and translates; otherwise the expression translates only
  * when it fails to parse as Spark SQL.
  */
object SimpleEvalShim {

  private sealed trait Tok
  private final case class Str(body: String) extends Tok // unquoted content
  private final case class Ident(s: String) extends Tok
  private final case class Num(s: String) extends Tok
  private final case class Op(s: String) extends Tok
  private final case class Col(name: String) extends Tok // record['name']

  private def lex(in: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    val n = in.length
    while (i < n) {
      val c = in.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < n && in.charAt(i) != c) {
          // python escapes: keep \' \" \\ literal, reject the rest (rare in
          // mapping configs, and a wrong guess silently corrupts data)
          if (in.charAt(i) == '\\' && i + 1 < n) {
            val e = in.charAt(i + 1)
            require(e == '\'' || e == '"' || e == '\\',
              s"unsupported escape \\$e in stream-map string literal")
            sb.append(e); i += 2
          } else { sb.append(in.charAt(i)); i += 1 }
        }
        require(i < n, s"unterminated string literal in: $in")
        i += 1
        out += Str(sb.toString)
      } else if (c.isDigit ||
          (c == '.' && i + 1 < n && in.charAt(i + 1).isDigit)) {
        val start = i
        while (i < n && (in.charAt(i).isDigit || in.charAt(i) == '.')) i += 1
        out += Num(in.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (in.charAt(i).isLetterOrDigit || in.charAt(i) == '_')) i += 1
        out += Ident(in.substring(start, i))
      } else {
        val two = if (i + 1 < n) in.substring(i, i + 2) else ""
        if (Set("==", "!=", "<=", ">=", "//", "**").contains(two)) {
          out += Op(two); i += 2
        } else { out += Op(c.toString); i += 1 }
      }
    }
    out.toList
  }

  /** Collapse `record [ 'name' ]` subscripts into [[Col]] tokens. */
  private def foldRecordAccess(toks: List[Tok]): List[Tok] = toks match {
    case Ident("record") :: Op("[") :: Str(name) :: Op("]") :: rest =>
      Col(name) :: foldRecordAccess(rest)
    case Ident("record") :: t :: _ =>
      throw new IllegalArgumentException(
        s"unsupported record access after 'record': $t (only record['field'])")
    case t :: rest => t :: foldRecordAccess(rest)
    case Nil => Nil
  }

  /** Rewrite Python conditionals `A if C else B` (right-associative, may
    * nest in B) to `IF(C, A, B)`, recursing into parenthesized groups. */
  private def foldTernary(toks: List[Tok]): List[Tok] = {
    // depth-0 scan for the FIRST `if`; its matching depth-0 `else` splits
    // the rest. A = everything before (one full expression at depth 0).
    var depth = 0
    var ifAt = -1
    val arr = toks.toVector
    var i = 0
    while (i < arr.length && ifAt < 0) {
      arr(i) match {
        case Op("(") | Op("[") => depth += 1
        case Op(")") | Op("]") => depth -= 1
        // `if` directly followed by `(` is the SQL IF() function form, not
        // a python conditional — leave it alone
        case Ident("if") if depth == 0 &&
            !(i + 1 < arr.length && arr(i + 1) == Op("(")) => ifAt = i
        case _ =>
      }
      i += 1
    }
    if (ifAt < 0) return toks
    var elseAt = -1
    depth = 0
    i = ifAt + 1
    while (i < arr.length && elseAt < 0) {
      arr(i) match {
        case Op("(") | Op("[") => depth += 1
        case Op(")") | Op("]") => depth -= 1
        case Ident("else") if depth == 0 => elseAt = i
        case _ =>
      }
      i += 1
    }
    require(elseAt > ifAt, "python conditional without 'else' branch")
    val a = arr.slice(0, ifAt).toList
    val c = arr.slice(ifAt + 1, elseAt).toList
    val b = arr.slice(elseAt + 1, arr.length).toList
    Ident("IF") :: Op("(") :: (foldTernary(c) :+ Op(",")) :::
      (foldTernary(a) :+ Op(",")) ::: (foldTernary(b) :+ Op(")"))
  }

  /** Rewrite depth-0 `+` chains that contain a string operand to
    * CONCAT(...); numeric-looking chains keep `+`. Applied recursively to
    * parenthesized groups. simpleeval's `+` concatenates strings, while
    * Spark SQL `+` would cast them to double and yield NULL. */
  /** Boundaries a `+` chain never crosses: argument commas, comparison
    * operators (Python binds `+` tighter than `==`), and boolean
    * connectives. Without these, `record['a'] + 'x' == record['b']`
    * would fold the comparison INTO the concat. */
  private val ChainBoundaryOps =
    Set(",", "==", "!=", "<", "<=", ">", ">=")
  private val ChainBoundaryIds = Set("and", "or", "not")

  private def foldConcat(toks: List[Tok], stringCols: Set[String]): List[Tok] = {
    val segs = scala.collection.mutable.ListBuffer.empty[List[Tok]]
    val seps = scala.collection.mutable.ListBuffer.empty[Tok]
    var cur = scala.collection.mutable.ListBuffer.empty[Tok]
    var depth = 0
    for (t <- toks) {
      t match {
        case Op("(") | Op("[") => depth += 1; cur += t
        case Op(")") | Op("]") => depth -= 1; cur += t
        case Op(o) if depth == 0 && ChainBoundaryOps.contains(o) =>
          segs += cur.toList; seps += t
          cur = scala.collection.mutable.ListBuffer.empty[Tok]
        case Ident(w) if depth == 0 && ChainBoundaryIds.contains(w) =>
          segs += cur.toList; seps += t
          cur = scala.collection.mutable.ListBuffer.empty[Tok]
        case _ => cur += t
      }
    }
    segs += cur.toList
    val folded = segs.toList.map(foldConcatChain(_, stringCols))
    folded.head ::: folded.tail.zip(seps).flatMap {
      case (seg, sep) => sep :: seg
    }
  }

  /** Fold one boundary-free expression's depth-0 `+` chain. */
  private def foldConcatChain(toks: List[Tok],
      stringCols: Set[String]): List[Tok] = {
    // split at depth-0 `+` into operand segments (each recursed)
    val segs = scala.collection.mutable.ListBuffer.empty[List[Tok]]
    var cur = scala.collection.mutable.ListBuffer.empty[Tok]
    var depth = 0
    for (t <- toks) {
      t match {
        case Op("(") | Op("[") => depth += 1; cur += t
        case Op(")") | Op("]") => depth -= 1; cur += t
        case Op("+") if depth == 0 => segs += cur.toList; cur = scala.collection.mutable.ListBuffer.empty[Tok]
        case _ => cur += t
      }
    }
    segs += cur.toList
    // recurse into each operand's parenthesized groups and nested calls
    def recurse(seg: List[Tok]): List[Tok] = {
      // find a top-level (...) group and recurse inside it
      val out = scala.collection.mutable.ListBuffer.empty[Tok]
      var rest = seg
      while (rest.nonEmpty) {
        rest.head match {
          case Op("(") =>
            var d = 1
            val inner = scala.collection.mutable.ListBuffer.empty[Tok]
            rest = rest.tail
            while (d > 0) {
              require(rest.nonEmpty, "unbalanced parens in stream-map expression")
              rest.head match {
                case Op("(") => d += 1; if (d > 0) inner += rest.head
                case Op(")") => d -= 1; if (d > 0) inner += rest.head
                case t2 => inner += t2
              }
              rest = rest.tail
            }
            out += Op("(")
            out ++= foldConcat(inner.toList, stringCols)
            out += Op(")")
          case t2 => out += t2; rest = rest.tail
        }
      }
      out.toList
    }
    val rsegs = segs.toList.map(recurse)
    if (rsegs.length == 1) rsegs.head
    else {
      // a chain is string concatenation when any operand is a string
      // literal, a str() cast, or a record field KNOWN to be a string
      // (schema passed in by StreamMaps) — simpleeval's `+` concatenates
      // strings while SQL `+` would cast them to double and yield NULL
      val stringy = rsegs.exists(_.exists {
        case Str(_) => true
        case Ident("str") => true
        case Col(name) => stringCols.contains(name)
        case _ => false
      })
      if (!stringy) rsegs.reduce((a, b) => a ::: Op("+") :: b)
      else Ident("CONCAT") :: Op("(") ::
        rsegs.reduce((a, b) => a ::: Op(",") :: b) ::: List(Op(")"))
    }
  }

  private val CastFns = Map(
    "str" -> "STRING", "int" -> "BIGINT", "float" -> "DOUBLE")
  private val Unsupported = Set("lambda", "for", "in", "is", "import")

  private def render(toks: List[Tok]): String = {
    val sb = new StringBuilder
    var rest = toks
    while (rest.nonEmpty) {
      rest.head match {
        // str(x) -> CAST(x AS STRING): consume through the matching paren
        case Ident(f) if CastFns.contains(f) && rest.tail.headOption.contains(Op("(")) =>
          var d = 1
          var inner = List.empty[Tok]
          rest = rest.tail.tail
          while (d > 0) {
            require(rest.nonEmpty, s"unbalanced parens in $f(...)")
            rest.head match {
              case Op("(") => d += 1; inner = rest.head :: inner
              case Op(")") => d -= 1; if (d > 0) inner = rest.head :: inner
              case t => inner = t :: inner
            }
            rest = rest.tail
          }
          sb.append("CAST(").append(render(inner.reverse))
            .append(" AS ").append(CastFns(f)).append(")")
        // `if` directly followed by `(` is the SQL IF() function (possible
        // when a SQL-dialect expression trips looksLikePython via `==`) —
        // pass it through rather than rejecting it as a python conditional
        case Ident("if") if rest.tail.headOption.contains(Op("(")) =>
          if (sb.nonEmpty && !sb.endsWith("(")) sb.append(' ')
          sb.append("if")
          rest = rest.tail
        case t =>
          val s = t match {
            // backslash-escape, not quote-doubling: Spark's default parser
            // reads 'it''s' as TWO adjacent literals ("it" ++ "s")
            case Str(body) =>
              "'" + body.replace("\\", "\\\\").replace("'", "\\'") + "'"
            case Col(name) => "`" + name.replace("`", "``") + "`"
            case Num(x) => x
            case Op("==") => "="
            case Op(x) => x
            case Ident("None") => "NULL"
            case Ident("True") => "TRUE"
            case Ident("False") => "FALSE"
            case Ident("len") => "LENGTH"
            case Ident(x) if Unsupported.contains(x) =>
              throw new IllegalArgumentException(
                s"unsupported python construct '$x' in stream-map expression")
            // a leftover infix conditional (inside parens/brackets, where
            // foldTernary doesn't descend) must fail loudly, not emit
            // word soup into the SQL parser
            case Ident("if") | Ident("else") | Ident("elif") =>
              throw new IllegalArgumentException(
                "parenthesized python conditional is outside the supported " +
                  "stream-map subset — lift it to the top level")
            case Ident(x) => x
          }
          // no space after '(' / before ')' ',' and around brackets — purely
          // cosmetic, expr() ignores whitespace
          if (sb.nonEmpty && !s.startsWith(")") && !s.startsWith(",") &&
              !sb.endsWith("(")) sb.append(' ')
          sb.append(s)
          rest = rest.tail
      }
    }
    sb.toString
  }

  /** Translate a simpleeval-dialect expression to Spark SQL. Throws on
    * constructs outside the supported subset. `stringCols` (the stream's
    * string-typed fields, supplied by [[StreamMaps]]) lets `+` chains over
    * record fields with no literal operand fold to CONCAT when the
    * operands are known strings. */
  def translate(expr: String, stringCols: Set[String] = Set.empty): String =
    render(foldConcat(foldTernary(foldRecordAccess(lex(expr))), stringCols))

  /** True when `expr` carries an unambiguous Python marker. SQL-dialect
    * expressions (the engine's native form) never match: `record[` is not
    * valid SQL here, SQL spells conditionals `IF(...)`/`CASE`, casts
    * `string(x)`/`CAST`, and null `NULL`. Bare `==` is NOT a marker —
    * Spark SQL accepts `==` as equality, so it cannot distinguish the
    * dialects (see [[maybeTranslate]]). */
  def looksLikePython(expr: String): Boolean = {
    if (expr.contains("record[")) return true
    lazy val toks = try lex(expr) catch { case _: Exception => return false }
    def hasWord(w: String) = toks.exists {
      case Ident(x) => x == w
      case _ => false
    }
    // infix conditional: an `if` that is NOT the IF( function call form
    val infixIf = toks.sliding(2).exists {
      case Seq(Ident("if"), next) => next != Op("(")
      case _ => false
    } || (toks.lastOption.contains(Ident("if")))
    // str( is python's cast — Spark spells it string( — so a str call is
    // unambiguous (int(/float( are valid Spark cast aliases with identical
    // semantics, so they stay neutral and pass-through is correct)
    val strCall = toks.sliding(2).exists {
      case Seq(Ident("str"), Op("(")) => true
      case _ => false
    }
    infixIf || strCall || hasWord("None") || hasWord("True") || hasWord("False")
  }

  private def parsesAsSparkSql(e: String): Boolean =
    try {
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(e)
      true
    } catch { case _: Exception => false }

  /** A `+` with a NON-NUMERIC string-literal operand: Python
    * concatenation. The same text parses as Spark SQL too — as numeric
    * addition over a cast string, which silently yields NULL — so inside
    * the ambiguous `==`-present zone this marker must outrank
    * parseability or a simpleeval filter like `name + '!' == 'x!'` drops
    * every row. Two SQL shapes are deliberately exempt: a numeric string
    * (`total + '10'` is plausible SQL implicit-cast addition and
    * nonsensical Python — int + str raises), and a typed literal
    * (`date '2024-01-01' + interval …`, where the quoted part belongs to
    * the preceding keyword, not to `+`). */
  private def plusStringLiteral(expr: String): Boolean = {
    val toks = try lex(expr).toVector catch { case _: Exception => return false }
    def numeric(b: String) = b.matches("[0-9]+(\\.[0-9]+)?")
    def typedLit(strIdx: Int) = strIdx > 0 && (toks(strIdx - 1) match {
      case Ident("date") | Ident("timestamp") | Ident("interval") => true
      case _ => false
    })
    toks.indices.exists { i =>
      toks(i) == Op("+") && (
        (i > 0 && (toks(i - 1) match {
          case Str(b) => !numeric(b) && !typedLit(i - 1)
          case _ => false
        })) ||
        (i + 1 < toks.size && (toks(i + 1) match {
          case Str(b) => !numeric(b)
          case _ => false
        })))
    }
  }

  /** Translate iff the expression is Python-dialect, else pass through.
    *
    * `==` appears in both dialects (Spark SQL accepts it as equality), so
    * it cannot gate translation by itself: translating a valid SQL
    * expression would break lowercase `is`/`in`, `case … else … end`,
    * `\|\|` concat. An expression whose only Python-ish hint is `==` is
    * resolved in two steps: a `+` adjacent to a string literal is Python
    * concatenation and translates (SQL would null it out, see
    * [[plusStringLiteral]]); otherwise the original is tried as Spark SQL
    * and passes through when it parses, translating only when SQL parsing
    * fails (i.e. the expression cannot be the SQL dialect). */
  def maybeTranslate(expr: String, stringCols: Set[String] = Set.empty): String =
    if (looksLikePython(expr)) translate(expr, stringCols)
    else if (expr.contains("==") &&
        (plusStringLiteral(expr) || !parsesAsSparkSql(expr)))
      translate(expr, stringCols)
    else expr
}
