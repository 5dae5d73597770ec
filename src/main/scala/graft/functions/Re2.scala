package graft.functions

/** RE2 → java.util.regex translation for the spec `regexp` transform.
  *
  * The reference validates/compiles specs' regular expressions with Go's RE2
  * engine (/root/reference/entity/regexp.go:42-66). The dialects overlap on
  * everything the conformance specs use; the one systematic difference is
  * named-group syntax: RE2 `(?P<name>...)` vs Java `(?<name>...)`.
  * Java group names must be alphanumeric, so translated patterns address
  * groups by index (capture-group order is collected separately by
  * [[graft.spec.RegexpSpec.collectGroups]], mirroring entity/regexp.go:69-88).
  */
object Re2 {
  /** Rewrite RE2 named groups into plain capturing groups, preserving order. */
  def toJavaRegex(re2: String): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = re2.length
    while (i < n) {
      if (re2.charAt(i) == '\\' && i + 1 < n) {
        sb.append(re2.charAt(i)).append(re2.charAt(i + 1))
        i += 2
      } else if (re2.regionMatches(i, "(?P<", 0, 4)) {
        val close = re2.indexOf('>', i + 4)
        require(close > 0, s"unterminated named group in: $re2")
        sb.append('(') // plain capturing group; names resolved positionally
        i = close + 1
      } else {
        sb.append(re2.charAt(i))
        i += 1
      }
    }
    sb.toString
  }
}
