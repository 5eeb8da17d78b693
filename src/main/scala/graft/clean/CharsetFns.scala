package graft.clean

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Declared-charset decode — the byte tier in FRONT of
  * [[EncodingFns.repairEncoding]]: a real crawl is full of pages whose
  * BYTES are Windows-1252/Latin-1, declared via the HTTP `Content-Type`
  * header or a `<meta charset>` tag (round-10 verdict #3). Downstream
  * of this stage, text is honest UTF-8 strings; EncodingFns then
  * repairs the pages whose bytes were ALREADY mojibake at the origin.
  *
  * Decode model (cross-engine by construction — the byte → codepoint
  * maps are fixed tables, not library charsets):
  *   - `utf-8` → the platform UTF-8 decode.
  *   - `windows-1252` and ALL Latin-1-family labels → ISO-8859-1's
  *     byte-identity decode followed by the fixed C1 → cp1252 table
  *     below. The HTML5 encoding standard (public) requires labels
  *     `iso-8859-1`/`latin1`/`us-ascii` to decode AS windows-1252 —
  *     real pages labeled latin-1 routinely use the 0x80–0x9F range
  *     with cp1252 meanings. The five bytes cp1252 leaves undefined
  *     (0x81 0x8D 0x8F 0x90 0x9D) keep their C1 identity (what the
  *     JDK's own Cp1252 decoder does); EncodingFns' C1 strip drops
  *     them downstream.
  *   - unknown/undeclared labels → the caller's `default`.
  *
  * Charset RESOLUTION precedence is the crawl convention: the HTTP
  * Content-Type parameter wins, then a `<meta charset>` (sniffed from
  * a byte-identity preview of the page — ASCII-safe in every charset
  * this tier handles), then the default.
  *
  * Shape at scale: one narrow per-row projection over (binary,
  * content_type) — zero exchanges, stream-door capable like every
  * clean/ stage.
  */
object CharsetFns {

  /** The cp1252 0x80–0x9F table (public, the Windows-1252 code page):
    * C1 stand-in (what ISO-8859-1 byte-identity decode yields) → the
    * cp1252 character.
    */
  private[clean] val cp1252: Seq[(Char, Char)] = Seq(
    '\u0080' -> '€', '\u0082' -> '‚', '\u0083' -> 'ƒ', '\u0084' -> '„',
    '\u0085' -> '…', '\u0086' -> '†', '\u0087' -> '‡', '\u0088' -> 'ˆ',
    '\u0089' -> '‰', '\u008a' -> 'Š', '\u008b' -> '‹', '\u008c' -> 'Œ',
    '\u008e' -> 'Ž', '\u0091' -> '\u2018', '\u0092' -> '\u2019',
    '\u0093' -> '“', '\u0094' -> '”', '\u0095' -> '•', '\u0096' -> '–',
    '\u0097' -> '—', '\u0098' -> '˜', '\u0099' -> '™', '\u009a' -> 'š',
    '\u009b' -> '›', '\u009c' -> 'œ', '\u009e' -> 'ž', '\u009f' -> 'Ÿ')

  private val cp1252From = cp1252.map(_._1).mkString
  private val cp1252To = cp1252.map(_._2).mkString

  /** C1 stand-ins → cp1252 characters, over an ISO-8859-1-decoded
    * string. Every mapping is one char to one char, so this is a SINGLE
    * `translate` pass — not 27 chained replace rewrites copying the
    * page once each.
    */
  private def cp1252Fix(c: Column): Column =
    translate(c, cp1252From, cp1252To)

  /** The INVERSE map — cp1252 characters back to their C1 stand-ins, so
    * a fixture can stage genuine cp1252 BYTES through the ISO-8859-1
    * encoder (whose byte-identity covers all of U+0000–U+00FF). Fixture
    * staging only; never part of a decode path.
    */
  private[graft] def cp1252Unfix(c: Column): Column =
    translate(c, cp1252To, cp1252From)

  /** Normalize a charset label to this tier's decode key:
    * 'windows-1252' | 'utf-8' | NULL (unknown/undeclared). The
    * Latin-1 family folds into windows-1252 per the HTML5 encoding
    * standard's label table.
    */
  def normalizeCharset(c: Column): Column = {
    val k = lower(trim(c))
    when(k.isin("utf-8", "utf8"), "utf-8")
      .when(k.isin("windows-1252", "cp1252", "x-cp1252", "cp-1252",
        "iso-8859-1", "iso8859-1", "latin-1", "latin1", "l1",
        "us-ascii", "ascii"), "windows-1252")
  }

  /** Charset sniffed from a `<meta charset=…>` or
    * `<meta http-equiv="Content-Type" content="…charset=…">` tag in a
    * byte-identity preview of the page — BOUNDED to the first 1024
    * bytes, the HTML5 prescan window: a charset token quoted deep in
    * body content must not hijack decoding, and an undeclared multi-MB
    * page must not pay a full-document regex scan. ASCII-safe: in UTF-8
    * and every single-byte charset here, the markup bytes are ASCII, so
    * the ISO-8859-1 preview sees the tag verbatim regardless of the
    * page's real charset.
    */
  def metaCharset(bin: Column): Column = {
    val preview = decode(bin, "ISO-8859-1").substr(lit(1), lit(1024))
    val m = regexp_extract(preview,
      "(?i)<meta[^>]*charset\\s*=\\s*[\"']?([A-Za-z0-9_-]+)", 1)
    when(m =!= "", m)
  }

  /** Resolve the decode key for a page: the Content-Type `charset=`
    * parameter, else the `<meta charset>` sniff, else `default` —
    * each normalized through the label table (an unknown label falls
    * through to the next source).
    */
  def resolveCharset(contentType: Column, bin: Column,
      default: String = "utf-8"): Column = {
    val fromCt = normalizeCharset(
      regexp_extract(coalesce(contentType, lit("")),
        "(?i)charset=[\"']?([A-Za-z0-9_-]+)", 1))
    coalesce(fromCt, normalizeCharset(metaCharset(bin)), lit(default))
  }

  /** Decode page bytes under a RESOLVED charset key (from
    * [[resolveCharset]]): utf-8 directly; windows-1252 (and the folded
    * Latin-1 family) via byte-identity + the cp1252 table.
    */
  def decodeCharset(bin: Column, charset: Column): Column =
    when(charset === "utf-8", decode(bin, "UTF-8"))
      .otherwise(cp1252Fix(decode(bin, "ISO-8859-1")))
}
