package graft.core.config

import scala.collection.mutable

/** Minimal HOCON-subset parser (reference loads pipeline config as HOCON
  * via dataconf: core/config/loader.py:14-70). The JVM's canonical HOCON
  * library isn't available in this offline build, so we parse the subset
  * the reference's configs actually use (the examples directory's .conf files):
  *
  *   - `#` and `//` comments
  *   - nested objects `{}` and dotted keys (`spark.app_name = x`)
  *   - `=` or `:` separators; objects may omit the separator
  *   - quoted + unquoted strings, ints, doubles, booleans, null
  *   - arrays `[a, b]`, newline- or comma-separated members
  *   - `${path.in.config}` substitution (resolved against the final
  *     merged tree, chains allowed, cycles rejected), falling back to
  *     environment variables; `${?NAME}` optional form
  *   - `include "other.conf"` at object level, resolved relative to the
  *     including file, object-merged in place (later keys win)
  *
  * Parsed result is an immutable tree of Scala values:
  * Map[String, Any] / List[Any] / String / Long / Double / Boolean / null.
  */
object Hocon {

  final case class ParseError(msg: String, line: Int)
    extends RuntimeException(s"HOCON parse error at line $line: $msg")

  /** Unresolved `${path}` placeholder; eliminated by the resolve pass. */
  private final case class Subst(name: String, optional: Boolean)

  /** Value concatenation (`${root}/data`, `prefix-${x}`): parts joined
    * as strings once every substitution resolves.
    */
  private final case class Concat(parts: List[Any])

  def parse(text: String): Map[String, Any] =
    resolveTree(new Parser(text, None).parseRoot())

  def parseFile(path: String): Map[String, Any] = {
    val p = java.nio.file.Paths.get(path)
    resolveTree(new Parser(
      new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8),
      Option(p.toAbsolutePath.getParent)).parseRoot())
  }

  /** Fixed-point substitution resolution: `${a.b}` reads the (possibly
    * itself substituted) value at that path in the final tree, then the
    * environment. HOCON's lazy-final-value semantics without a full
    * dependency graph: iterate until no placeholder resolves further.
    */
  private def resolveTree(root: Map[String, Any]): Map[String, Any] = {
    var tree: Map[String, Any] = root
    var rounds = 0
    var changed = true
    while (changed) {
      changed = false
      rounds += 1
      if (rounds > 64) throw ParseError("substitution cycle detected", 0)
      // Three-way lookup: Right(value) = resolved; Left(true) = blocked
      // behind a placeholder that a later round may resolve; Left(false)
      // = the path definitely does not exist in the config.
      def lookup(path: String): Either[Boolean, Any] = {
        def go(cur: Any, parts: List[String]): Either[Boolean, Any] = (cur, parts) match {
          case (_: Subst, _) => Left(true)
          case (v2, Nil) => Right(v2)
          case (m: Map[String @unchecked, Any @unchecked], p :: rest) =>
            m.get(p) match {
              case Some(nxt) => go(nxt, rest)
              case None => Left(false)
            }
          case _ => Left(false)
        }
        go(tree, path.split('.').toList)
      }
      def walk(v: Any): Any = v match {
        case s @ Subst(name, optional) =>
          lookup(name) match {
            case Right(resolved) => changed = true; resolved
            case Left(true) => s // not yet resolvable; next round
            case Left(false) => sys.env.get(name) match {
              case Some(ev) => changed = true; ev
              case None if optional => changed = true; null
              case None => throw ParseError(s"unresolved substitution $${$name}", 0)
            }
          }
        case Concat(parts) =>
          val resolved = parts.map(walk)
          if (resolved.exists { case _: Subst => true; case _: Concat => true; case _ => false })
            Concat(resolved) // some part still pending; next round
          else {
            changed = true
            resolved.map {
              case null => "" // optional substitution that resolved empty
              case other => other.toString
            }.mkString
          }
        case m: Map[String @unchecked, Any @unchecked] =>
          m.map { case (k, x) => k -> walk(x) }
        case l: List[Any @unchecked] => l.map(walk)
        case other => other
      }
      tree = walk(tree).asInstanceOf[Map[String, Any]]
    }
    // fixed point with placeholders left = an unresolvable cycle
    def anySubst(v: Any): Boolean = v match {
      case _: Subst => true
      case Concat(parts) => parts.exists(anySubst)
      case m: Map[String @unchecked, Any @unchecked] => m.values.exists(anySubst)
      case l: List[Any @unchecked] => l.exists(anySubst)
      case _ => false
    }
    if (anySubst(tree)) throw ParseError("substitution cycle detected", 0)
    tree
  }

  /** Navigate a dotted path into the parsed tree. */
  def at(tree: Map[String, Any], path: String): Option[Any] = {
    def go(cur: Any, parts: List[String]): Option[Any] = (cur, parts) match {
      case (v, Nil) => Some(v)
      case (m: Map[String @unchecked, Any @unchecked], p :: rest) =>
        m.get(p).flatMap(go(_, rest))
      case _ => None
    }
    go(tree, path.split('.').toList)
  }

  private final class Parser(text: String, baseDir: Option[java.nio.file.Path]) {
    private var pos = 0
    private var line = 1
    private def err(msg: String) = throw ParseError(msg, line)
    private def peek: Char = if (pos < text.length) text(pos) else '\u0000'
    private def advance(): Char = {
      val c = text(pos); pos += 1
      if (c == '\n') line += 1
      c
    }
    private def eof: Boolean = pos >= text.length

    /** Skip whitespace and comments. `stopAtNewline` keeps value
      * termination working (newline ends a field).
      */
    private def skipWs(stopAtNewline: Boolean): Unit = {
      while (!eof) {
        peek match {
          case '\n' if stopAtNewline => return
          case c if c.isWhitespace => advance()
          case '#' => while (!eof && peek != '\n') advance()
          case '/' if pos + 1 < text.length && text(pos + 1) == '/' =>
            while (!eof && peek != '\n') advance()
          case _ => return
        }
      }
    }

    def parseRoot(): Map[String, Any] = {
      skipWs(stopAtNewline = false)
      val m =
        if (peek == '{') parseObject()
        else parseObjectBody(atRoot = true)
      skipWs(stopAtNewline = false)
      if (!eof) err(s"trailing content '${peek}'")
      m
    }

    private def parseObject(): Map[String, Any] = {
      advance() // '{'
      val m = parseObjectBody(atRoot = false)
      if (peek != '}') err("expected '}'")
      advance()
      m
    }

    private def parseObjectBody(atRoot: Boolean): Map[String, Any] = {
      val acc = mutable.LinkedHashMap[String, Any]()
      while ({ skipWs(stopAtNewline = false); !eof && peek != '}' }) {
        // `include "file.conf"` splices the included root object here
        if (text.startsWith("include", pos) &&
            { val after = pos + 7; after < text.length && (text(after) == ' ' || text(after) == '\t') }) {
          pos += 7
          skipWs(stopAtNewline = true)
          if (peek != '"') err("include expects a quoted path")
          val rel = parseQuoted()
          val p0 = java.nio.file.Paths.get(rel)
          val p = if (p0.isAbsolute) p0 else baseDir.fold(p0)(_.resolve(rel))
          if (!java.nio.file.Files.exists(p)) err(s"included file not found: $p")
          val sub = new Parser(
            new String(java.nio.file.Files.readAllBytes(p),
              java.nio.charset.StandardCharsets.UTF_8),
            Option(p.toAbsolutePath.getParent)).parseRoot()
          sub.foreach { case (k, v) => merge(acc, List(k), v) }
          skipWs(stopAtNewline = true)
          if (!eof && (peek == ',' || peek == '\n')) advance()
        } else {
        val keyPath = parseKey()
        skipWs(stopAtNewline = false)
        val value: Any = peek match {
          case '{' => parseObject() // separator optional before object
          case '=' | ':' =>
            advance(); skipWs(stopAtNewline = false); parseValue()
          case c => err(s"expected '=', ':' or '{' after key '${keyPath.mkString(".")}', got '$c'")
        }
        merge(acc, keyPath, value)
        skipWs(stopAtNewline = true)
        if (!eof && (peek == ',' || peek == '\n')) advance()
        }
      }
      acc.toMap
    }

    /** Dotted-path insert with object merge (later keys win on scalars,
      * HOCON object-merge semantics on maps).
      */
    private def merge(acc: mutable.LinkedHashMap[String, Any], path: List[String], v: Any): Unit =
      path match {
        case k :: Nil =>
          (acc.get(k), v) match {
            case (Some(a: Map[String @unchecked, Any @unchecked]),
                  b: Map[String @unchecked, Any @unchecked]) =>
              val sub = mutable.LinkedHashMap[String, Any](a.toSeq: _*)
              b.foreach { case (bk, bv) => merge(sub, List(bk), bv) }
              acc(k) = sub.toMap
            case _ => acc(k) = v
          }
        case k :: rest =>
          val sub = acc.get(k) match {
            case Some(m: Map[String @unchecked, Any @unchecked]) =>
              mutable.LinkedHashMap[String, Any](m.toSeq: _*)
            case _ => mutable.LinkedHashMap[String, Any]()
          }
          merge(sub, rest, v)
          acc(k) = sub.toMap
        case Nil => err("empty key")
      }

    /** A key as a path: dotted unquoted keys nest; a quoted key is one
      * opaque segment even when it contains dots (HOCON semantics —
      * needed for literal keys like "spark.sql.shuffle.partitions").
      */
    private def parseKey(): List[String] = {
      if (peek == '"') return List(parseQuoted())
      val sb = new StringBuilder
      while (!eof && (peek.isLetterOrDigit || "._-".contains(peek))) sb += advance()
      if (sb.isEmpty) err(s"expected key, got '${peek}'")
      sb.toString.split('.').toList
    }

    private def parseQuoted(): String = {
      advance() // '"'
      val sb = new StringBuilder
      while (!eof && peek != '"') {
        val c = advance()
        if (c == '\\' && !eof) {
          advance() match {
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case 'u' =>
              val hex = (0 until 4).map(_ => advance()).mkString
              sb += Integer.parseInt(hex, 16).toChar
            case o => sb += o
          }
        } else sb += c
      }
      if (eof) err("unterminated string")
      advance() // closing '"'
      sb.toString
    }

    private def parseValue(): Any = peek match {
      case '{' => parseObject()
      case '[' => parseArray()
      case _ => parseScalarSequence()
    }

    /** Scalar value = a run of quoted strings, substitutions, and
      * unquoted chunks on one line (HOCON value concatenation:
      * `${root}/data`, `prefix-${x}`, `"a"${b}`). A single unquoted
      * token keeps scalar typing; multiple tokens concatenate as a
      * string once substitutions resolve.
      */
    private def parseScalarSequence(): Any = {
      val parts = mutable.ListBuffer[Any]()
      var done = false
      while (!done && !eof) {
        peek match {
          case '"' => parts += parseQuoted()
          case '$' => parts += parseSubstitution()
          case c if !"\n,}]#".contains(c) &&
              !(c == '/' && pos + 1 < text.length && text(pos + 1) == '/') =>
            val chunk = parseUnquotedChunk()
            if (chunk.nonEmpty) parts += UnquotedChunk(chunk) else done = true
          case _ => done = true
        }
      }
      parts.toList match {
        case Nil => err("empty value")
        case UnquotedChunk(one) :: Nil => typed(one.trim)
        case (s: String) :: Nil => s
        case (s: Subst) :: Nil => s
        case many =>
          // trailing unquoted whitespace (before a newline/comment) is
          // not part of the value
          val normalized = many.map {
            case UnquotedChunk(c) => c
            case other => other
          }
          val trimmed = normalized.reverse match {
            case (s: String) :: rest => ((s.replaceAll("\\s+$", "")) :: rest).reverse
            case other => other.reverse
          }
          Concat(trimmed.map {
            case s: String => s: Any
            case other => other
          })
      }
    }

    /** Raw unquoted run, stopping at value terminators AND at `$`/`"`
      * so concatenation tokens separate. Leading whitespace is kept
      * (interior separators like `a ${x}` preserve their space); the
      * sequence-level logic trims the edges.
      */
    private def parseUnquotedChunk(): String = {
      val sb = new StringBuilder
      while (!eof && !"\n,}]#$\"".contains(peek) &&
          !(peek == '/' && pos + 1 < text.length && text(pos + 1) == '/'))
        sb += advance()
      sb.toString
    }

    private def typed(raw: String): Any = {
      if (raw.isEmpty) err("empty value")
      raw match {
        case "true" => true
        case "false" => false
        case "null" => null
        case _ =>
          try java.lang.Long.parseLong(raw)
          catch {
            case _: NumberFormatException =>
              try java.lang.Double.parseDouble(raw)
              catch { case _: NumberFormatException => raw }
          }
      }
    }

    private def parseArray(): List[Any] = {
      advance() // '['
      val acc = mutable.ListBuffer[Any]()
      while ({ skipWs(stopAtNewline = false); !eof && peek != ']' }) {
        acc += parseValue()
        skipWs(stopAtNewline = false)
        if (peek == ',' || peek == '\n') advance()
      }
      if (eof) err("unterminated array")
      advance() // ']'
      acc.toList
    }

    private def parseSubstitution(): Any = {
      advance() // '$'
      if (peek != '{') err("expected '{' after '$'")
      advance()
      val optional = peek == '?'
      if (optional) advance()
      val sb = new StringBuilder
      while (!eof && peek != '}') sb += advance()
      if (eof) err("unterminated substitution")
      advance() // '}'
      // resolution is deferred to the post-parse pass: config paths first
      // (against the final merged tree), environment second
      Subst(sb.toString.trim, optional)
    }

  }

  /** Parser-internal marker distinguishing unquoted text (whose edges
    * trim and whose lone form types) from quoted strings.
    */
  private final case class UnquotedChunk(text: String)
}
