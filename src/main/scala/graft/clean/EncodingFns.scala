package graft.clean

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic encoding repair (ftfy-lite) — crawl text arrives with
  * UTF-8 bytes that were decoded as Latin-1/cp1252 somewhere upstream
  * ("Ã©" where "é" was meant), stray byte-order marks, and C1 control
  * characters; every downstream text operator assumes clean UTF-8
  * (round-9 verdict #4).
  *
  * The same cross-engine discipline as [[HtmlFns]]: a FIXED, ORDERED
  * rule chain that renders identically in Spark (Java) and DuckDB (RE2) —
  * plain string replaces for the mojibake table (no regex at all), one
  * shared-syntax character-class regex for the C1 strip.
  *
  * Rules, in order:
  *   1. strip U+FEFF (BOM / zero-width no-break space) everywhere — a
  *      concatenation of shards each carrying a BOM scatters them
  *      mid-text, not just at offset 0
  *   2. mojibake table, longest entries first: the COMMON TABLE of
  *      UTF-8-decoded-as-cp1252 renderings — 3-char sequences (curly
  *      quotes, dashes, ellipsis, €, ™, •, and the double-encoded à/í
  *      composites) then 2-char sequences (Latin-1 accents, «», °, ·,
  *      ¿¡, ©®). Double encodings unwind one level per application in
  *      general ("Ãƒ" → "Ã"; apply the chain twice for two levels —
  *      [[graft.api.Corpus.repairEncoding]] documents this), EXCEPT the
  *      à/í composites, which exist because their continuation
  *      renderings are otherwise normalized away (nbsp → space) or
  *      uncovered (soft hyphen): their one-level output feeds the later
  *      single-level rule within the same pass, so those two repair
  *      fully in one application (pinned in EncodingFnsSpec).
  *   3. drop C1 controls (U+0080–U+009F): decode debris with no text
  *      meaning (the cp1252-unmapped bytes that survive step 2)
  *
  * Scope note (why a fixed table, not the full re-encode algorithm):
  * re-encoding cp1252 and re-decoding UTF-8 repairs everything but is
  * not expressible as a shared Spark/DuckDB rule chain, and applied
  * blindly it CORRUPTS legitimate text. The table covers the
  * overwhelmingly common cases and only fires on two/three-codepoint
  * sequences that are near-certain mojibake (a mojibake lead-byte
  * rendering followed by a cp1252 continuation rendering).
  *
  * Shape at scale: one narrow per-row projection, zero exchanges —
  * stream-door capable like every clean/ stage.
  */
object EncodingFns {

  /** The common mojibake table, longest (3-char) entries first. Each
    * key is the cp1252 RENDERING of the UTF-8 bytes of the value;
    * invisible continuation chars (nbsp U+00A0, soft hyphen U+00AD,
    * C1 U+009D, U+0081) are written as escapes.
    */
  private[clean] val mojibake: Seq[(String, String)] = Seq(
    // E2 8x xx — punctuation, 3 rendered chars
    "â€™" -> "’", // â€™ -> ’
    "â€˜" -> "‘", // â€˜ -> ‘
    "â€œ" -> "“", // â€œ -> “
    "â€\u009d" -> "”", // â€(9D) -> ”
    "â€“" -> "–", // â€“ -> –
    "â€”" -> "—", // â€” -> —
    "â€¦" -> "…", // â€¦ -> …
    "â€¢" -> "•", // â€¢ -> •
    "â‚¬" -> "€", // â‚¬ -> €
    "â„¢" -> "™", // â„¢ -> ™
    // C3 83 C2 A0/AD — double-encoded à/í composites, BEFORE the general
    // "Ãƒ" rule: their continuation renderings ("Â"+nbsp, "Â"+shy) are
    // exactly what the single-level rules normalize AWAY ("Â"+nbsp →
    // plain space) or don't cover, so without these two the second pass
    // has nothing left to repair ("déjà" would unwind to "déjÃ ")
    "ÃƒÂ\u00a0" -> "Ã\u00a0", // double-encoded à, one level down
    "ÃƒÂ\u00ad" -> "Ã\u00ad", // double-encoded í, one level down
    // C3 83 — the double-encoding marker: one level per pass
    "Ãƒ" -> "Ã", // Ãƒ -> Ã
    // C3 xx — Latin-1 letters
    "Ã¡" -> "á", // Ã¡ -> á
    "Ã©" -> "é", // Ã© -> é
    "Ã\u00ad" -> "í", // Ã(shy) -> í
    "Ã³" -> "ó", // Ã³ -> ó
    "Ãº" -> "ú", // Ãº -> ú
    "Ã\u00a0" -> "à", // Ã(nbsp) -> à
    "Ã¨" -> "è", // Ã¨ -> è
    "Ã¬" -> "ì", // Ã¬ -> ì
    "Ã²" -> "ò", // Ã² -> ò
    "Ã¹" -> "ù", // Ã¹ -> ù
    "Ã¢" -> "â", // Ã¢ -> â
    "Ãª" -> "ê", // Ãª -> ê
    "Ã®" -> "î", // Ã® -> î
    "Ã´" -> "ô", // Ã´ -> ô
    "Ã»" -> "û", // Ã» -> û
    "Ã¤" -> "ä", // Ã¤ -> ä
    "Ã«" -> "ë", // Ã« -> ë
    "Ã¯" -> "ï", // Ã¯ -> ï
    "Ã¶" -> "ö", // Ã¶ -> ö
    "Ã¼" -> "ü", // Ã¼ -> ü
    "Ã±" -> "ñ", // Ã± -> ñ
    "Ã§" -> "ç", // Ã§ -> ç
    "Ã£" -> "ã", // Ã£ -> ã
    "Ãµ" -> "õ", // Ãµ -> õ
    "Ã¥" -> "å", // Ã¥ -> å
    "Ã¦" -> "æ", // Ã¦ -> æ
    "Ã¸" -> "ø", // Ã¸ -> ø
    "ÃŸ" -> "ß", // ÃŸ -> ß
    "Ã‰" -> "É", // Ã‰ -> É
    "Ã„" -> "Ä", // Ã„ -> Ä
    "Ã–" -> "Ö", // Ã– -> Ö
    "Ãœ" -> "Ü", // Ãœ -> Ü
    "Ã‡" -> "Ç", // Ã‡ -> Ç
    // C2 xx — Latin-1 punctuation ("Â" + continuation)
    "Â«" -> "«", // Â« -> «
    "Â»" -> "»", // Â» -> »
    "Â°" -> "°", // Â° -> °
    "Â·" -> "·", // Â· -> ·
    "Â¿" -> "¿", // Â¿ -> ¿
    "Â¡" -> "¡", // Â¡ -> ¡
    "Â©" -> "©", // Â© -> ©
    "Â®" -> "®", // Â® -> ®
    "Â\u00a0" -> " ")      // Â(nbsp) -> plain space

  private val c1Class = "[\\x{0080}-\\x{009f}]"

  /** Repaired text of a column — the Spark rendering. */
  def repairEncoding(c: Column): Column = {
    var out = replace(c, lit("\ufeff"), lit(""))
    for ((bad, good) <- mojibake) out = replace(out, lit(bad), lit(good))
    regexp_replace(out, c1Class, "")
  }

  /** The identical chain in DuckDB's dialect, for oracles. Non-ASCII
    * table entries are emitted as chr() concatenations so the SQL stays
    * ASCII-clean through the oracle JSON round trip.
    */
  def repairEncodingDuck(e: String): String = {
    var out = s"replace($e, chr(65279), '')"
    for ((bad, good) <- mojibake)
      out = s"replace($out, ${sqlLit(bad)}, ${sqlLit(good)})"
    s"regexp_replace($out, '$c1Class', '', 'g')"
  }

  /** A DuckDB string literal rendered ASCII-clean (non-ASCII and quote
    * chars as chr() concatenations) — survives the oracle JSON round
    * trip byte-exactly. Shared by the chain above and the probes that
    * plant mojibake fixtures.
    */
  def sqlLit(s: String): String = {
    if (s.isEmpty) return "''"
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val run = new StringBuilder
    def flush(): Unit = if (run.nonEmpty) { parts += s"'${run.toString}'"; run.clear() }
    for (ch <- s) {
      if (ch >= ' ' && ch <= '~' && ch != '\'') run.append(ch): Unit
      else { flush(); parts += s"chr(${ch.toInt})" }
    }
    flush()
    parts.mkString(" || ")
  }
}
