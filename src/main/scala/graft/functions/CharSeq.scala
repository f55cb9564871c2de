package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Charsequence scalar surface (reference charsequence.h §2.6) as pure
  * Catalyst column functions, with the reference's exact conventions:
  * 0-based positions, -1 for absent, non-regex splits that keep empty
  * fields, ASCII-only case mapping (see operators.TextAnalysis), and
  * code-point-oriented length/access.
  */
object CharSeq {

  private def quote(s: String): String = java.util.regex.Pattern.quote(s)

  /** First occurrence, 0-based; -1 when absent (indexOf,
    * charsequence.h:900-988 — reference returns size_t max ≡ "not found";
    * we normalize to -1 as documented in SURVEY §2.6). */
  def indexOf(c: Column, target: String): Column =
    (locate(target, c) - 1).cast("long")

  /** First occurrence at or after code point `from` (the fromPosition
    * overload, charsequence.h:900-938): -1 when absent or when
    * `from >= length` — locate() with a start past the end already
    * returns 0, so the reference's guard falls out for free. */
  def indexOf(c: Column, target: String, from: Int): Column = {
    require(target.nonEmpty, "empty target: reference returns 0 — no search needed")
    (locate(target, c, math.max(from, 0) + 1) - 1).cast("long")
  }

  /** Last occurrence, 0-based; -1 when absent (lastIndexOf). Implemented
    * via the reverse trick — still one codegen'd expression. */
  def lastIndexOf(c: Column, target: String): Column =
    when(locate(target, c) === 0, lit(-1L))
      .otherwise((char_length(c) - locate(target.reverse, reverse(c))
        - lit(target.length) + 1).cast("long"))

  /** Last occurrence STARTING at or before code point `from`
    * (lastIndexOf(target, fromPosition), charsequence.h:940-988). The
    * reference returns -1 outright when `from >= length` (no clamping),
    * otherwise clamps the backward-search start to len-|target| —
    * equivalently, the last match inside the prefix of from+|target|
    * code points. */
  def lastIndexOf(c: Column, target: String, from: Int): Column = {
    require(target.nonEmpty, "empty target: reference returns length — no search needed")
    when(lit(from.toLong) >= char_length(c).cast("long"), lit(-1L))
      .otherwise(lastIndexOf(substring(c, 1, from + target.length), target))
  }

  /** Replace ALL non-overlapping occurrences left-to-right — the
    * reference's bare replace(target, replacement)
    * (charsequence.h:989-1020). Spark's non-regex replace() has the
    * identical scan semantics. */
  def replaceAll(c: Column, target: String, repl: String): Column =
    replace(c, lit(target), lit(repl))

  /** Replace only the first occurrence (replace(maxCount=1),
    * charsequence.h:989-1076): locate + splice, no regex. */
  def replaceFirst(c: Column, target: String, repl: String): Column = {
    val pos = locate(target, c)
    when(pos === 0, c).otherwise(
      concat(substring(c, lit(1), pos - 1), lit(repl),
        substring(c, pos + target.length, lit(Int.MaxValue))))
  }

  /** Non-regex split keeping empty fields, including a trailing empty when
    * the string ends with the delimiter (split, charsequence.h:1172-1198).
    * Spark's limit=-1 keeps trailing empties like the reference. */
  def splitKeepEmpty(c: Column, delim: String): Column =
    split(c, quote(delim), -1)

  /** Code-point count (Charsequence.size; Spark char_length is code points
    * for UTF8 strings). */
  def codePointCount(c: Column): Column = char_length(c).cast("long")

  /** Code points of the first n characters as an array<int>
    * (useSequence-style access, semantic.h:2260-2345), built on the
    * native [[CodePointsExpr]] — real Unicode code points (ascii() would
    * return the first UTF-8 BYTE, wrong for any non-ASCII text) and
    * codegen'd instead of an interpreted transform() lambda. Requires
    * [[GraftFunctions.register]] (or the GraftExtensions SQL extension)
    * on the session. */
  def codePoints(c: Column, n: Int): Column =
    slice(call_function("graft_code_points", c), 1, n)

  /** All code points as array<int> (getPoints, charsequence.h:1264-1281).
    * Same registration requirement as [[codePoints]]. */
  def codePointsAll(c: Column): Column =
    call_function("graft_code_points", c)

  /** Replace the first k occurrences (replace(maxCount), charsequence.h:
    * 989-1076): k splice steps, k a small constant. */
  def replaceFirstK(c: Column, target: String, repl: String, k: Int): Column =
    (1 to k).foldLeft(c)((acc, _) => replaceFirst(acc, target, repl))

  /** Trim the reference's whitespace set " \t\n\r\v\f"
    * (charsequence.h:1105-1118, 1365-1368) — Spark's bare trim() strips
    * spaces only. */
  def asciiTrim(c: Column): Column =
    trim(c, " \t\n\r\u000B\f")

  /** Bytes per code unit for a charset (sequenceLength,
    * charsequence.h:96-121). */
  val sequenceLength: Map[String, Int] = Map(
    "ascii" -> 1, "latin1" -> 1, "utf8" -> 1,
    "utf16le" -> 2, "utf16be" -> 2, "utf32le" -> 4, "utf32be" -> 4)

  /** n-fold repetition (repeat, charsequence.h:812-832). */
  def repeatSeq(c: Column, n: Int): Column = repeat(c, n)

  /** Clamped code-point substring (sub, charsequence.h:786-810): start is
    * 0-based and clamped, overlong lengths truncate — never an error. */
  def subSequence(c: Column, start: Int, len: Int): Column =
    substring(c, start + 1, len)

  /** Charsets shared by the reference (charsequence.h:21-32) and Spark's
    * encode/decode built-ins. utf32le/be (also reference charsets) have no
    * Spark built-in — [[encodeCharset]]/[[decodeCharset]] route them to the
    * native [[Utf32Encode]]/[[Utf32Decode]] expressions instead. */
  val charsets: Map[String, String] = Map(
    "ascii" -> "US-ASCII", "latin1" -> "ISO-8859-1", "utf8" -> "UTF-8",
    "utf16le" -> "UTF-16LE", "utf16be" -> "UTF-16BE", "utf16" -> "UTF-16")

  /** String → bytes in the given reference charset name
    * (encode, charsequence.h:123-263). Invalid/unmappable input follows
    * JVM replacement semantics ('?' for ascii/latin1) like the reference.
    * utf32le/be route to the native [[Utf32Encode]] expression (requires
    * [[GraftFunctions.register]], like [[codePoints]]). */
  def encodeCharset(c: Column, refCharset: String): Column =
    refCharset.toLowerCase match {
      case "utf32le" => call_function("graft_utf32le_encode", c)
      case "utf32be" => call_function("graft_utf32be_encode", c)
      case lc => encode(c, charsets.getOrElse(lc, refCharset))
    }

  /** Bytes → string, invalid sequences → U+FFFD
    * (decode, charsequence.h:265-495). utf32le/be route to the native
    * [[Utf32Decode]] expression (same registration requirement). */
  def decodeCharset(c: Column, refCharset: String): Column =
    refCharset.toLowerCase match {
      case "utf32le" => call_function("graft_utf32le_decode", c)
      case "utf32be" => call_function("graft_utf32be_decode", c)
      case lc => decode(c, charsets.getOrElse(lc, refCharset))
    }

  /** Transcode via decode→encode (convert, charsequence.h:497-544). */
  def convertCharset(c: Column, from: String, to: String): Column =
    encodeCharset(decodeCharset(c, from), to)
}
