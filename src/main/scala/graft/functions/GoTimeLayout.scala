package graft.functions

import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder, TextStyle}
import java.time.temporal.ChronoField
import java.time.{LocalDate, LocalDateTime, LocalTime, OffsetDateTime, ZoneOffset}
import java.util.Locale

/** Go reference-time layout ("2006-01-02 15:04:05") → java.time formatter.
  *
  * The spec `regexp.timeConversion` transform declares its input/output
  * formats as Go layouts (/root/reference/entity/spec.go "TimeConv",
  * applied at /root/reference/entity/transform/transformer.go:383-399).
  * This is a compile-time translation: a spec's layouts are converted once,
  * never per event.
  *
  * Covered tokens are the documented Go set actually usable in specs:
  * 2006/06, 01/1/Jan/January, 02/2/_2, 15/03/3, 04/4, 05/5, PM/pm,
  * fraction .0/.9 runs, and offsets -0700/-07:00/-07/Z0700/Z07:00.
  */
object GoTimeLayout {

  /** Go's RFC3339 output: "2006-01-02T15:04:05Z07:00" — seconds precision,
    * literal 'Z' at UTC. (Go time.Format(RFC3339) truncates fractions.)
    */
  val Rfc3339: DateTimeFormatter =
    new DateTimeFormatterBuilder()
      .appendValue(ChronoField.YEAR, 4).appendLiteral('-')
      .appendValue(ChronoField.MONTH_OF_YEAR, 2).appendLiteral('-')
      .appendValue(ChronoField.DAY_OF_MONTH, 2).appendLiteral('T')
      .appendValue(ChronoField.HOUR_OF_DAY, 2).appendLiteral(':')
      .appendValue(ChronoField.MINUTE_OF_HOUR, 2).appendLiteral(':')
      .appendValue(ChronoField.SECOND_OF_MINUTE, 2)
      .appendOffset("+HH:MM", "Z")
      .toFormatter(Locale.ENGLISH)

  def toFormatter(layout: String): DateTimeFormatter = {
    val b = new DateTimeFormatterBuilder().parseCaseInsensitive()
    var i = 0
    val n = layout.length

    def at(tok: String): Boolean = layout.regionMatches(i, tok, 0, tok.length)

    while (i < n) {
      if (at("2006")) { b.appendValue(ChronoField.YEAR, 4); i += 4 }
      else if (at("January")) { b.appendText(ChronoField.MONTH_OF_YEAR, TextStyle.FULL); i += 7 }
      else if (at("Jan")) { b.appendText(ChronoField.MONTH_OF_YEAR, TextStyle.SHORT); i += 3 }
      else if (at("Monday")) { b.appendText(ChronoField.DAY_OF_WEEK, TextStyle.FULL); i += 6 }
      else if (at("Mon")) { b.appendText(ChronoField.DAY_OF_WEEK, TextStyle.SHORT); i += 3 }
      else if (at("15")) { b.appendValue(ChronoField.HOUR_OF_DAY, 2); i += 2 }
      // Go's 12-hour tokens: the raw value is kept verbatim when no AM/PM
      // marker is present (reference test transformer_test.go:114-121:
      // layout "03" parses "12" → hour 12); with a marker, AM/PM applies.
      // Parsed via CLOCK_HOUR_OF_AMPM and resolved manually below —
      // mapping to HOUR_OF_DAY would make java.time's resolver reject
      // every PM time as a field conflict.
      else if (at("03")) { b.appendValue(ChronoField.CLOCK_HOUR_OF_AMPM, 2); i += 2 }
      else if (at("06")) { b.appendValueReduced(ChronoField.YEAR, 2, 2, 1969); i += 2 }
      else if (at("01")) { b.appendValue(ChronoField.MONTH_OF_YEAR, 2); i += 2 }
      else if (at("02")) { b.appendValue(ChronoField.DAY_OF_MONTH, 2); i += 2 }
      else if (at("04")) { b.appendValue(ChronoField.MINUTE_OF_HOUR, 2); i += 2 }
      else if (at("05")) { b.appendValue(ChronoField.SECOND_OF_MINUTE, 2); i += 2 }
      else if (at("_2")) { b.padNext(2); b.appendValue(ChronoField.DAY_OF_MONTH); i += 2 }
      else if (at("PM")) { b.appendText(ChronoField.AMPM_OF_DAY, TextStyle.FULL); i += 2 }
      else if (at("pm")) { b.appendText(ChronoField.AMPM_OF_DAY, TextStyle.FULL); i += 2 }
      else if (at("Z07:00")) { b.appendOffset("+HH:MM", "Z"); i += 6 }
      else if (at("Z0700")) { b.appendOffset("+HHMM", "Z"); i += 5 }
      else if (at("-07:00")) { b.appendOffset("+HH:MM", "+00:00"); i += 6 }
      else if (at("-0700")) { b.appendOffset("+HHMM", "+0000"); i += 5 }
      else if (at("-07")) { b.appendOffset("+HH", "+00"); i += 3 }
      else if (layout.charAt(i) == '.' && i + 1 < n && (layout.charAt(i + 1) == '0' || layout.charAt(i + 1) == '9')) {
        val c = layout.charAt(i + 1)
        var j = i + 1
        while (j < n && layout.charAt(j) == c) j += 1
        val digits = j - i - 1
        // ".000" = required fraction; ".999" = optional (dot included).
        if (c == '0') b.appendFraction(ChronoField.NANO_OF_SECOND, digits, digits, true)
        else b.appendFraction(ChronoField.NANO_OF_SECOND, 0, digits, true)
        i = j
      }
      else if (at("1")) { b.appendValue(ChronoField.MONTH_OF_YEAR); i += 1 }
      else if (at("2")) { b.appendValue(ChronoField.DAY_OF_MONTH); i += 1 }
      else if (at("3")) { b.appendValue(ChronoField.CLOCK_HOUR_OF_AMPM); i += 1 }
      else if (at("4")) { b.appendValue(ChronoField.MINUTE_OF_HOUR); i += 1 }
      else if (at("5")) { b.appendValue(ChronoField.SECOND_OF_MINUTE); i += 1 }
      else { b.appendLiteral(layout.charAt(i)); i += 1 }
    }
    b.toFormatter(Locale.ENGLISH)
  }

  /** Parse with Go semantics: missing date parts default to the zero date
    * (Go: year 0, Jan 1), missing offset means UTC.
    */
  def parseToOffsetDateTime(formatter: DateTimeFormatter, s: String): OffsetDateTime = {
    // parseUnresolved: we resolve fields ourselves (Go keeps a 12-hour
    // value verbatim when no AM/PM marker exists — java.time's resolver
    // cannot express that and rejects PM times as conflicts).
    val pos = new java.text.ParsePosition(0)
    val parsed = formatter.parseUnresolved(s, pos)
    if (parsed == null || pos.getErrorIndex >= 0 || pos.getIndex < s.length)
      throw new java.time.DateTimeException(s"cannot parse '$s'")
    def getOr(f: ChronoField, d: Int): Int =
      if (parsed.isSupported(f)) Math.toIntExact(parsed.getLong(f)) else d
    val date = LocalDate.of(getOr(ChronoField.YEAR, 0), getOr(ChronoField.MONTH_OF_YEAR, 1),
      getOr(ChronoField.DAY_OF_MONTH, 1))
    var hour = getOr(ChronoField.HOUR_OF_DAY, -1)
    if (hour < 0) hour = getOr(ChronoField.CLOCK_HOUR_OF_AMPM, 0) // Go: literal value when no marker
    if (parsed.isSupported(ChronoField.AMPM_OF_DAY)) {
      val pm = parsed.getLong(ChronoField.AMPM_OF_DAY) == 1L
      if (pm && hour < 12) hour += 12
      else if (!pm && hour == 12) hour = 0
    }
    val nano = if (parsed.isSupported(ChronoField.NANO_OF_SECOND)) Math.toIntExact(parsed.getLong(ChronoField.NANO_OF_SECOND)) else 0
    val time = LocalTime.of(hour, getOr(ChronoField.MINUTE_OF_HOUR, 0),
      getOr(ChronoField.SECOND_OF_MINUTE, 0), nano)
    val offset =
      if (parsed.isSupported(ChronoField.OFFSET_SECONDS))
        ZoneOffset.ofTotalSeconds(Math.toIntExact(parsed.getLong(ChronoField.OFFSET_SECONDS)))
      else ZoneOffset.UTC
    OffsetDateTime.of(LocalDateTime.of(date, time), offset)
  }

  /** The complete timeConv operation (transformer.go:383-399): comma→dot
    * pre-fix, parse with `inputFormat`, format with `outputFormat` (default
    * RFC3339). Returns None on parse failure (the error path).
    */
  def timeConv(input: DateTimeFormatter, output: DateTimeFormatter, date: String): Option[String] = {
    if (date.isEmpty) return None
    val fixed = date.replace(',', '.')
    try Some(parseToOffsetDateTime(input, fixed).format(output))
    catch { case _: Exception => None }
  }
}
