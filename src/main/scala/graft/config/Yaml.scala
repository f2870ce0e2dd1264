package graft.config

import scala.collection.mutable

/** Minimal YAML-subset parser for pipeline config files (SURVEY §2.1
  * S12; reference `load_config`, src/utils/helpers.py:149-286 loads
  * OmegaConf YAML → dict). No external dependency ships in this
  * environment, so this hand-rolled parser covers exactly the subset
  * the reference's config files (cfgs directory) use:
  *
  *  - flat `key: value` scalar entries
  *  - scalars: `null`/`~`, `true`/`false` (any case), int, float
  *    (incl. scientific `1e-4`), quoted and bare strings
  *  - flow sequences `[a, b, [c]]` (arbitrarily nested)
  *  - flow mappings `{ "k": v, ... }`, possibly spanning multiple
  *    lines (track.yaml's `thresholds:` block)
  *  - ONE level of block-style nesting: a bare `key:` followed by
  *    indented `k: v` lines (block map) or `- item` lines (block
  *    list) — the shape a user hand-writing a config reaches for
  *    first. Deeper nesting (an indented child opening its own
  *    block) still fails loudly: none of the reference configs need
  *    it, and a silent partial parse would be worse than an error.
  *  - `#` comments (full-line and trailing) and blank lines
  *
  * Parsed values are Scala types: `null`, `Boolean`, `Long`, `Double`,
  * `String`, `List[Any]`, `Map[String, Any]` — the same shapes
  * OmegaConf's `to_container` yields, so override merging and dataclass
  * dispatch mirror the reference exactly.
  */
object Yaml {

  def parse(text: String): Map[String, Any] = {
    val out = mutable.LinkedHashMap.empty[String, Any]
    val lines = text.linesIterator.toArray
    var i = 0
    while (i < lines.length) {
      val line = stripComment(lines(i))
      if (line.trim.nonEmpty) {
        val colon = indexOfKeyColon(line)
        require(colon > 0, s"unsupported YAML line (need 'key: value'): ${lines(i)}")
        require(!line.startsWith(" ") && !line.startsWith("\t"),
          s"unexpected indentation (no open block): ${lines(i)}")
        val key = unquote(line.substring(0, colon).trim)
        var rest = line.substring(colon + 1).trim
        if (rest.isEmpty) {
          // bare `key:` — either an explicit null or ONE level of
          // block map / block list in the indented lines that follow
          val children = mutable.ListBuffer.empty[String]
          var indent = -1
          var j = i + 1
          var open = true
          while (j < lines.length && open) {
            val l = stripComment(lines(j))
            if (l.trim.isEmpty) j += 1
            else if (l.startsWith(" ") || l.startsWith("\t")) {
              val ind = l.indexWhere(c => c != ' ' && c != '\t')
              if (indent < 0) indent = ind
              require(ind == indent,
                s"only one level of block nesting is supported (under '$key'): ${lines(j)}")
              children += l.trim
              j += 1
            } else open = false
          }
          if (children.isEmpty) out(key) = null
          else {
            i = j - 1
            out(key) = parseBlock(key, children.toList)
          }
        } else {
          // flow collection spanning multiple lines: accumulate until
          // brackets balance (comments stripped per physical line)
          while (bracketDepth(rest) > 0 && i + 1 < lines.length) {
            i += 1
            rest = rest + " " + stripComment(lines(i)).trim
          }
          require(bracketDepth(rest) == 0, s"unbalanced brackets in value for '$key'")
          out(key) = parseValue(rest)
        }
      }
      i += 1
    }
    out.toMap
  }

  /** One level of block children under `key`: all `- item` lines → a
    * list, all `k: v` lines → a map; mixing or a child opening its own
    * block (empty value) fails loudly.
    */
  private def parseBlock(key: String, children: List[String]): Any =
    if (children.head == "-" || children.head.startsWith("- ")) {
      children.map { c =>
        require(c == "-" || c.startsWith("- "),
          s"mixed block list/map entries under '$key': $c")
        val item = c.drop(1).trim
        // a bare `- key: val` item is a LIST OF MAPS in real YAML —
        // parseValue would silently yield the string "key: val";
        // flow/quoted items ({k: v}, "a: b") are fine
        require(item.isEmpty || "{[\"'".contains(item.head) ||
          indexOfKeyColon(item) < 0,
          s"block list items must be scalars or flow collections, " +
            s"not nested mappings (under '$key'): $c")
        parseValue(item)
      }
    } else {
      val m = mutable.LinkedHashMap.empty[String, Any]
      children.foreach { c =>
        require(!c.startsWith("-"),
          s"mixed block list/map entries under '$key': $c")
        val cc = indexOfKeyColon(c)
        require(cc > 0, s"block entry needs 'key: value' (under '$key'): $c")
        val v = c.substring(cc + 1).trim
        require(v.nonEmpty,
          s"only one level of block nesting is supported (under '$key'): $c")
        require(bracketDepth(v) == 0,
          s"multi-line flow values are not supported inside a block (under '$key'): $c")
        m(unquote(c.substring(0, cc).trim)) = parseValue(v)
      }
      m.toMap
    }

  /** Scalar coercion for a single CLI `key=value` override — the same
    * inference chain as the reference (int → float → bool → str,
    * src/utils/helpers.py:120-132). NOT used for YAML values, which
    * have their own literal syntax (`parseValue`).
    */
  def inferScalar(v: String): Any = {
    val t = v.trim
    toLong(t).getOrElse(
      toDouble(t).getOrElse(
        t.toLowerCase match {
          case "true" => true
          case "false" => false
          case _ => t
        }))
  }

  // ---- internals ----

  /** Index of the key/value `:` — the first colon outside quotes. */
  private def indexOfKeyColon(line: String): Int = {
    var i = 0
    var quote: Char = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == ':') return i
      i += 1
    }
    -1
  }

  /** Strips a `#` comment, respecting quotes. */
  private def stripComment(line: String): String = {
    var i = 0
    var quote: Char = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '#') return line.substring(0, i)
      i += 1
    }
    line
  }

  private def bracketDepth(s: String): Int = {
    var depth = 0
    var quote: Char = 0
    for (c <- s) {
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '[' || c == '{') depth += 1
      else if (c == ']' || c == '}') depth -= 1
    }
    depth
  }

  private[config] def parseValue(raw: String): Any = {
    val s = raw.trim
    if (s.isEmpty || s == "null" || s == "~") null
    else if (s.startsWith("[")) parseFlowSeq(s)
    else if (s.startsWith("{")) parseFlowMap(s)
    else if (s.startsWith("\"") || s.startsWith("'")) unquote(s)
    else s.toLowerCase match {
      case "true" => true
      case "false" => false
      case _ => toLong(s).getOrElse(toDouble(s).getOrElse(s))
    }
  }

  private def parseFlowSeq(s: String): List[Any] = {
    require(s.endsWith("]"), s"unterminated sequence: $s")
    splitTop(s.substring(1, s.length - 1)).map(parseValue)
  }

  private def parseFlowMap(s: String): Map[String, Any] = {
    require(s.endsWith("}"), s"unterminated mapping: $s")
    val entries = splitTop(s.substring(1, s.length - 1)).map { e =>
      val colon = indexOfKeyColon(e)
      require(colon > 0, s"mapping entry needs 'key: value': $e")
      unquote(e.substring(0, colon).trim) -> parseValue(e.substring(colon + 1))
    }
    // LinkedHashMap via foldLeft keeps insertion order deterministic
    entries.foldLeft(mutable.LinkedHashMap.empty[String, Any])(_ += _).toMap
  }

  /** Splits on top-level commas (outside brackets and quotes). */
  private def splitTop(s: String): List[String] = {
    val parts = mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    for (c <- s) {
      if (quote != 0) { if (c == quote) quote = 0; cur += c }
      else if (c == '"' || c == '\'') { quote = c; cur += c }
      else if (c == '[' || c == '{') { depth += 1; cur += c }
      else if (c == ']' || c == '}') { depth -= 1; cur += c }
      else if (c == ',' && depth == 0) { parts += cur.result(); cur.clear() }
      else cur += c
    }
    if (cur.result().trim.nonEmpty) parts += cur.result()
    parts.toList.map(_.trim).filter(_.nonEmpty)
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') ||
      (s.head == '\'' && s.last == '\''))) s.substring(1, s.length - 1)
    else s

  private def toLong(s: String): Option[Long] =
    try Some(java.lang.Long.parseLong(s)) catch { case _: NumberFormatException => None }

  private def toDouble(s: String): Option[Double] =
    try {
      // reject Infinity/NaN words and trailing-garbage forms Java allows
      if (s.exists(c => c.isLetter && c != 'e' && c != 'E') && !s.matches("[-+0-9.eE]+")) None
      else Some(java.lang.Double.parseDouble(s))
    } catch { case _: NumberFormatException => None }
}
