package graft.path

import graft.json._

/** Clean-room implementation of the subset of tidwall/gjson path syntax the
  * reference engine's specs use (reference call sites:
  * /root/reference/entity/transform/transformer.go:313 `gjson.GetBytes`,
  * spec doc /root/reference/entity/spec.go:339-344).
  *
  * Supported syntax:
  *   - dot-separated keys: `foo.bar.baz`
  *   - `\.`-escaped dots inside keys: `fav\.movie`
  *   - numeric segments as array indices (`arr.0`) — on objects they fall
  *     back to a key lookup, mirroring gjson's dynamic behavior
  *   - `#` as final segment → array length
  *   - `#` mid-path → per-element projection (`friends.#.first` ⇒ array of
  *     each element's `first`; elements missing the sub-path are skipped)
  *   - first-match array queries: `data.#(base=="EUR").rates` with operators
  *     `==`, `!=`, `<`, `<=`, `>`, `>=` and string/number/bool literals
  *   - query-all form `#(pred)#` → every matching element (array), with the
  *     remaining path applied per match
  *
  * Result-conversion semantics mirror gjson's `Result` methods exactly
  * (missing → ""/0/0.0/false; numbers keep their literal text; objects and
  * arrays stringify to their raw source substring).
  */
object GJsonPath {

  sealed trait Seg
  final case class Key(name: String) extends Seg
  /** `#` — array length when final segment. */
  case object Count extends Seg
  /** `#(lhsPath op rhs)` — first array element matching the predicate;
    * with the `#(...)#` suffix (`all = true`), ALL matching elements as an
    * array (gjson query-all form, e.g. `friends.#(last=="Murphy")#.first`).
    */
  final case class Query(lhs: List[Seg], op: String, rhs: String, rhsQuoted: Boolean,
      all: Boolean = false) extends Seg

  final case class ParsedPath(segs: List[Seg]) {
    override def toString: String = segs.mkString(".")
  }

  /** Parse a gjson path. Throws IllegalArgumentException on syntax we don't
    * support (surfaced at spec-compile time, never per event).
    */
  def parse(path: String): ParsedPath = {
    val segs = List.newBuilder[Seg]
    val n = path.length
    var i = 0
    val cur = new java.lang.StringBuilder
    var curHasQuery: Query = null

    def flush(): Unit = {
      if (curHasQuery != null) {
        segs += curHasQuery
        curHasQuery = null
        require(cur.length == 0, s"unexpected text after query in path: $path")
      } else {
        segs += Key(cur.toString)
      }
      cur.setLength(0)
    }

    while (i < n) {
      path.charAt(i) match {
        case '\\' if i + 1 < n =>
          cur.append(path.charAt(i + 1)); i += 2
        case '.' =>
          flush(); i += 1
        case '#' if cur.length == 0 && i + 1 < n && path.charAt(i + 1) == '(' =>
          val close = findClosingParen(path, i + 1)
          val q = parseQuery(path.substring(i + 2, close))
          // `#(...)#` = query-all: every matching element, not the first
          val isAll = close + 1 < n && path.charAt(close + 1) == '#'
          curHasQuery = if (isAll) q.copy(all = true) else q
          i = close + (if (isAll) 2 else 1)
        case '#' if cur.length == 0 && (i + 1 == n || path.charAt(i + 1) == '.') =>
          cur.append('#'); i += 1
        case c =>
          cur.append(c); i += 1
      }
    }
    flush()

    val resolved = segs.result().map {
      case Key("#") => Count
      case s => s
    }
    ParsedPath(resolved)
  }

  private def findClosingParen(s: String, open: Int): Int = {
    var depth = 0
    var inStr = false
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens in path: $s")
  }

  private val queryOps = List("==", "!=", "<=", ">=", "<", ">") // longest-first

  private def parseQuery(body: String): Query = {
    // Find the operator outside of quotes.
    var inStr = false
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1 else if (c == '"') inStr = false
      } else if (c == '"') inStr = true
      else {
        queryOps.find(op => body.regionMatches(i, op, 0, op.length)) match {
          case Some(op) =>
            val lhsStr = body.substring(0, i).trim
            var rhsStr = body.substring(i + op.length).trim
            var quoted = false
            if (rhsStr.length >= 2 && rhsStr.head == '"' && rhsStr.last == '"') {
              quoted = true
              rhsStr = unescape(rhsStr.substring(1, rhsStr.length - 1))
            }
            return Query(parse(lhsStr).segs, op, rhsStr, quoted)
          case None =>
        }
      }
      i += 1
    }
    throw new IllegalArgumentException(s"no operator found in query: $body")
  }

  private def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) s
    else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
        else { sb.append(c); i += 1 }
      }
      sb.toString
    }
  }

  // ---------------------------------------------------------------- eval

  /** Evaluate a parsed path against a parsed document. None = "not exists". */
  def eval(root: Js, path: ParsedPath): Option[Js] = evalSegs(root, path.segs)

  private def evalSegs(node: Js, segs: List[Seg]): Option[Js] = segs match {
    case Nil => Some(node)
    case seg :: rest =>
      seg match {
        case Key(k) =>
          node match {
            case o: JsObj => o.get(k).flatMap(evalSegs(_, rest))
            case a: JsArr if k.nonEmpty && k.forall(_.isDigit) =>
              // overflow-safe: an absurdly long digit run is simply not an
              // index that exists (gjson behavior), never a crash
              if (k.length <= 9 && k.toInt < a.items.length) evalSegs(a.items(k.toInt), rest)
              else None
            case _ => None
          }
        case Count =>
          node match {
            // Final `#` → array length (synthetic number node — no source
            // substring to point at).
            case a: JsArr if rest.isEmpty =>
              val lit = a.items.length.toString
              Some(JsNum(lit, 0, lit.length))
            // Mid-path `#` → gjson's per-element projection
            // ("friends.#.first" ⇒ ["Dale","Roger"]): apply the remaining
            // path to every element, skip elements where it doesn't exist,
            // and rebuild a JSON array from the surviving raw slices —
            // exactly how gjson assembles multi-results. The rebuilt text
            // becomes the result's source, so downstream casts/raw
            // extraction see a normal array node.
            case a: JsArr =>
              val parts = a.items.flatMap(item => evalSegs(item, rest)).map(_.raw)
              Js.parse(parts.mkString("[", ",", "]"))
            case _ => None
          }
        case Query(lhs, op, rhs, rhsQuoted, all) =>
          node match {
            case a: JsArr if !all =>
              a.items.find(item => evalSegs(item, lhs).exists(queryMatches(_, op, rhs, rhsQuoted)))
                .flatMap(evalSegs(_, rest))
            case a: JsArr =>
              // query-all: filter, then apply the remaining path per match
              // (skip-on-missing) and rebuild an array from raw slices —
              // the same multi-result assembly as the `#` projection
              val matches = a.items.filter(item =>
                evalSegs(item, lhs).exists(queryMatches(_, op, rhs, rhsQuoted)))
              val parts =
                if (rest.isEmpty) matches.map(_.raw)
                else matches.flatMap(evalSegs(_, rest)).map(_.raw)
              Js.parse(parts.mkString("[", ",", "]"))
            case _ => None
          }
      }
  }

  /** gjson compares using the *value's* own type. */
  private def queryMatches(v: Js, op: String, rhs: String, rhsQuoted: Boolean): Boolean = v match {
    case JsStr(s, _, _, _) => cmpStr(s, op, rhs)
    case n: JsNum =>
      val r = try rhs.toDouble catch { case _: NumberFormatException => return false }
      cmpNum(n.toDouble, op, r)
    case JsBool(b, _, _, _) =>
      val r = rhs == "true"
      op match {
        case "==" => b == r
        case "!=" => b != r
        case _ => false
      }
    case _: JsNull => op == "==" && !rhsQuoted && rhs == "null"
    case _ => false
  }

  private def cmpStr(a: String, op: String, b: String): Boolean = op match {
    case "==" => a == b
    case "!=" => a != b
    case "<" => a < b
    case "<=" => a <= b
    case ">" => a > b
    case ">=" => a >= b
    case _ => false
  }

  private def cmpNum(a: Double, op: String, b: Double): Boolean = op match {
    case "==" => a == b
    case "!=" => a != b
    case "<" => a < b
    case "<=" => a <= b
    case ">" => a > b
    case ">=" => a >= b
    case _ => false
  }

  // ------------------------------------------------- Result conversions
  // Mirrors gjson Result.String()/Int()/Float()/Bool()/Time().

  /** gjson `Result.String()`: Null→"", bools→"true"/"false", numbers keep
    * their literal text, strings unescaped, objects/arrays raw source text.
    */
  def stringOf(v: Js): String = v match {
    case JsStr(s, _, _, _) => s
    case n: JsNum => n.literal
    case JsBool(true, _, _, _) => "true"
    case JsBool(false, _, _, _) => "false"
    case _: JsNull => ""
    case other => other.raw
  }

  /** gjson `Result.Int()`: numbers truncate toward zero; numeric strings
    * parse (integer first, then float); true→1; everything else 0.
    */
  def longOf(v: Js): Long = v match {
    case n: JsNum =>
      val lit = n.literal
      try java.lang.Long.parseLong(lit)
      catch { case _: NumberFormatException => n.toDouble.toLong }
    case JsStr(s, _, _, _) => parseLongLenient(s)
    case JsBool(true, _, _, _) => 1L
    case _ => 0L
  }

  private def parseLongLenient(s: String): Long = {
    try java.lang.Long.parseLong(s)
    catch {
      case _: NumberFormatException =>
        try s.toDouble.toLong catch { case _: NumberFormatException => 0L }
    }
  }

  /** gjson `Result.Float()`. */
  def doubleOf(v: Js): Double = v match {
    case n: JsNum => n.toDouble
    case JsStr(s, _, _, _) =>
      try s.toDouble catch { case _: NumberFormatException => 0.0 }
    case JsBool(true, _, _, _) => 1.0
    case _ => 0.0
  }

  /** gjson `Result.Bool()`: strings go through strconv.ParseBool(lower),
    * numbers are true iff non-zero.
    */
  def boolOf(v: Js): Boolean = v match {
    case JsBool(b, _, _, _) => b
    case JsStr(s, _, _, _) =>
      s.toLowerCase match {
        case "1" | "t" | "true" => true
        case _ => false
      }
    case n: JsNum => n.toDouble != 0.0
    case _ => false
  }

  /** Micros-since-epoch of gjson `Result.Time()` (RFC3339 parse of the
    * string form; parse failure → Go zero time 0001-01-01T00:00:00Z).
    */
  val ZeroTimeMicros: Long = -62135596800000000L

  def timeMicrosOf(v: Js): Long = {
    val s = stringOf(v)
    try {
      val odt = java.time.OffsetDateTime.parse(s, java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME)
      val inst = odt.toInstant
      Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L), inst.getNano / 1000L)
    } catch {
      case _: Exception => ZeroTimeMicros
    }
  }

  /** One-shot convenience: evaluate `path` against JSON text. */
  def get(json: String, path: String): Option[Js] =
    Js.parse(json).flatMap(eval(_, parse(path)))
}
