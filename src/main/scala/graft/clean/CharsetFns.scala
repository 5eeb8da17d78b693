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

  /** Charset labels this tier RECOGNIZES but has no decode table for
    * (HTML5 encoding-standard names + common aliases: the multi-byte /
    * stateful CJK encodings, the Cyrillic/Greek/Hebrew/Arabic/Thai
    * single-byte code pages, and the non-Latin-1 ISO-8859 parts).
    * DETECTION beats the silent default: a Shift_JIS page decoded as
    * UTF-8 is mojibake [[EncodingFns]] cannot repair, and it would
    * silently score as low-quality noise instead of surfacing the gap.
    */
  private val unsupportedLabels = Seq(
    "shift_jis", "shift-jis", "sjis", "x-sjis", "ms_kanji", "ms932", "windows-31j",
    "gbk", "gb2312", "gb18030", "x-gbk", "big5", "big5-hkscs", "cn-big5",
    "euc-jp", "x-euc-jp", "euc-kr", "ks_c_5601-1987", "korean",
    "iso-2022-jp", "iso-2022-kr", "iso-2022-cn",
    "koi8-r", "koi8-u", "tis-620", "windows-874",
    "windows-1250", "windows-1251", "windows-1253", "windows-1254",
    "windows-1255", "windows-1256", "windows-1257", "windows-1258",
    "iso-8859-2", "iso-8859-3", "iso-8859-4", "iso-8859-5", "iso-8859-6",
    "iso-8859-7", "iso-8859-8", "iso-8859-9", "iso-8859-10", "iso-8859-13",
    "iso-8859-14", "iso-8859-15", "iso-8859-16")

  /** Charset STATUS for a page — the honest resolution:
    * `'utf-8' | 'windows-1252'` (decodable), `'unsupported:<label>'`
    * (a RECOGNIZED label this tier cannot decode — the page must be
    * DROPPED LOUDLY, never decoded as the default), or `default` (no
    * declaration, or an unrecognized garbage label). Precedence is the
    * crawl convention: Content-Type parameter, then `<meta charset>`,
    * then default — and a declared-but-unsupported label is
    * AUTHORITATIVE at its tier (it does not fall through: the page
    * genuinely is Shift_JIS; trying the next source would mojibake it).
    */
  def charsetStatus(contentType: Column, bin: Column,
      default: String = "utf-8"): Column = {
    val ctLabel = lower(trim(regexp_extract(coalesce(contentType, lit("")),
      "(?i)charset=[\"']?([A-Za-z0-9_-]+)", 1)))
    val metaLabel = lower(trim(coalesce(metaCharset(bin), lit(""))))
    def st(l: Column) =
      when(normalizeCharset(l).isNotNull, normalizeCharset(l))
        .when(l.isin(unsupportedLabels: _*), concat(lit("unsupported:"), l))
    coalesce(st(ctLabel), st(metaLabel), lit(default))
  }

  /** True when a [[charsetStatus]] value is decodable by this tier. */
  def charsetSupported(status: Column): Column =
    !status.startsWith("unsupported:")
}
