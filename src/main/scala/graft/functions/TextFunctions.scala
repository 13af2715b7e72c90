package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-cleaning and text-analysis column functions.
  *
  * Everything here is a pure Catalyst expression tree (codegen'd,
  * pushdown-friendly) — no Scala UDFs — so at 100 TB these run inside
  * WholeStageCodegen directly over the parquet scan.
  *
  * Reference semantics: util/clean_data.py (clean_title, reformat_txt)
  * and the quality/token heuristics a training-data pipeline needs.
  */
object TextFunctions {

  /** Lowercase, collapse whitespace runs, trim. The canonical form used
    * by all dedup operators so near-dup keys are whitespace-insensitive. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** util/clean_data.py:3-9 — keep only [CJK a-zA-Z0-9], truncate to 50
    * chars, fall back to "untitled" when empty. */
  def cleanTitle(c: Column): Column = {
    val stripped = regexp_replace(trim(c), "[^\\u4e00-\\u9fa5a-zA-Z0-9]", "")
    val cut = substring(stripped, 1, 50)
    when(length(cut) === 0, lit("untitled")).otherwise(cut)
  }

  /** util/clean_data.py:11-25 — assemble the embedding input document:
    * [标题]:title\n[时间]:pub_time\n[来源]:source\n\ncontent. */
  def reformatDoc(title: Column, pubTime: Column, source: Column, content: Column): Column =
    concat(
      lit("[标题]:"), coalesce(title, lit("无标题")), lit("\n"),
      lit("[时间]:"), coalesce(pubTime, lit("无时间")), lit("\n"),
      lit("[来源]:"), coalesce(source, lit("无来源")), lit("\n\n"),
      coalesce(content, lit("无内容")))

  /** json_batch_reader.py:75-78 — synthesized file name
    * `{clean_title(title)}_{rownum}.pdf`. */
  def fileName(title: Column, rowNum: Column): Column =
    concat(cleanTitle(title), lit("_"), rowNum.cast("string"), lit(".pdf"))

  /** All matches of `pattern` (regexp_extract_all, group 0). */
  def allMatches(c: Column, pattern: String): Column =
    call_function("regexp_extract_all", c, lit(pattern), lit(0))

  def countMatches(c: Column, pattern: String): Column = size(allMatches(c, pattern))

  /** Alphanumeric word tokens (whitespace/punct boundaries). */
  def wsTokens(c: Column): Column = allMatches(c, "[A-Za-z0-9]+")

  def tokenCount(c: Column): Column = size(wsTokens(c))

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single punct marks. */
  def bpeTokens(c: Column): Column = allMatches(c, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")

  def bpeTokenCount(c: Column): Column = size(bpeTokens(c))

  /** Per-language stopword alternations — the language-ID signal.
    * (Kept as raw regexes so the DuckDB oracle can reuse them verbatim.) */
  val stopwordPatterns: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|that|it)\\b",
    "es" -> "\\b(el|la|de|que|los|las|una|por)\\b",
    "de" -> "\\b(der|die|und|das|ein|mit|von|zu)\\b",
    "fr" -> "\\b(le|la|les|des|une|est|dans|pour)\\b")

  val cjkPattern = "[\\u4e00-\\u9fa5]"

  /** Heuristic language ID: argmax of stopword hits (CJK chars decide
    * zh); deterministic tie-break in declaration order, 'und' when no
    * signal at all. */
  def langId(c: Column): Column = {
    val lc = lower(c)
    val all = stopwordPatterns.map { case (l, p) => l -> countMatches(lc, p) } :+
      ("zh" -> countMatches(c, cjkPattern))
    val best = all.map(_._2).reduce((a, b) => greatest(a, b))
    val cases = all.foldLeft(when(best === 0, lit("und"))) {
      case (acc, (l, s)) => acc.when(s === best, lit(l))
    }
    cases.otherwise(lit("und"))
  }

  /** Quality score as an integer milli-score in [0,10000]: token volume
    * (×4), stopword density (×3), punctuation sanity (×3). All-integer
    * arithmetic (counts, floor division) so every engine computes the
    * identical BIGINT — no float rounding edge cases at any scale. */
  def qualityScore(c: Column): Column = {
    val toks = tokenCount(c).cast("long")
    val stops = countMatches(lower(c), stopwordPatterns.head._2).cast("long")
    val punct = countMatches(c, "[.,;:!?]").cast("long")
    val lenScore = least(toks * lit(10L), lit(1000L))
    val stopScore = least(floor(stops * lit(10000L) / (toks + lit(1L))).cast("long"), lit(1000L))
    val punctScore = lit(1000L) - least(floor(punct * lit(5000L) / (toks + lit(1L))).cast("long"), lit(1000L))
    (lenScore * lit(4L) + stopScore * lit(3L) + punctScore * lit(3L)).cast("long")
  }

  /** md5 content fingerprint over the normalized text. */
  def fingerprintMd5(c: Column): Column = md5(normText(c))

  // ---- training-corpus scrubbing & repetition signals -------------------

  /** Regexes shared verbatim with the DuckDB oracle (RE2-safe: no
    * backreferences/lookaround, so Java and RE2 agree). Order matters:
    * emails before IPs (both contain dots), IPs before phones (an IPv4
    * is digits-and-dots, which the phone pattern would otherwise eat). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val phonePattern = "\\+?\\d[\\d\\s().-]{7,}\\d"

  /** PII scrubbing for training corpora: emails, IPv4 addresses, and
    * phone-like digit runs become typed placeholder tags. A pure
    * codegen'd regexp_replace chain — runs inside the scan projection,
    * no UDF, no shuffle. */
  def redactPii(c: Column): Column = {
    val noEmail = regexp_replace(c, emailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, ipv4Pattern, "<IP>")
    regexp_replace(noIp, phonePattern, "<PHONE>")
  }

  /** The CP1252-as-UTF-8 mojibake table (ftfy's dominant fix class):
    * each pair is (artifact, intended char). Ordered longest-first so
    * 3-byte sequences never get half-eaten by their 2-byte prefixes.
    * Shared verbatim with the DuckDB oracle (SparkEntry generates the
    * oracle's replace chain from this same list). */
  val mojibakeTable: Seq[(String, String)] = Seq(
    "â€™" -> "’", // â€™ -> ’
    "â€˜" -> "‘", // â€˜ -> ‘
    "â€œ" -> "“", // â€œ -> “
    "â€" -> "”", // â€? -> ”
    "â€“" -> "–", // â€“ -> – (en dash)
    "â€”" -> "—", // â€” -> — (em dash)
    "â€¦" -> "…", // â€¦ -> …
    "Ã©" -> "é",       // Ã© -> é
    "Ã¨" -> "è",       // Ã¨ -> è
    "Ã¤" -> "ä",       // Ã¤ -> ä
    "Ã¶" -> "ö",       // Ã¶ -> ö
    "Ã¼" -> "ü",       // Ã¼ -> ü
    "Ã±" -> "ñ",       // Ã± -> ñ
    "Ã§" -> "ç",       // Ã§ -> ç
    "Â " -> " ")       // Â +NBSP -> NBSP

  /** C0/C1 control chars minus \t \n \r — crawl streams carry these
    * from binary-sniffed pages; they are never content. */
  val controlCharPattern =
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\x80-\\x9f]"

  /** Exotic-whitespace runs (NBSP, en/em/thin spaces, zero-width,
    * ideographic) — normalized to one plain space. The class carries
    * LITERAL characters (Scala-source \u escapes resolve at compile
    * time), not \\u regex escapes: Java regex and DuckDB's RE2 both
    * match literal code points, while \\uXXXX is Java-only. */
  val oddWhitespacePattern =
    "[   -​  　]+"

  /** ftfy-lite text repair for crawled corpora: undo the dominant
    * CP1252-as-UTF-8 mojibake sequences ([[mojibakeTable]]), strip
    * control characters, collapse exotic whitespace to plain spaces.
    * A full ftfy detects arbitrary encoding stacks with a model; this
    * is the deterministic, engine-portable transform that covers the
    * overwhelming share of crawl artifacts. Pure codegen'd
    * replace/regexp chain — runs inside the scan projection, no UDF,
    * no shuffle. */
  def fixText(c: Column): Column = {
    // replace(), not regexp_replace: the artifacts are literal strings
    val demojibaked = mojibakeTable.foldLeft(c) {
      case (acc, (bad, good)) => replace(acc, lit(bad), lit(good))
    }
    regexp_replace(
      regexp_replace(demojibaked, controlCharPattern, ""),
      oddWhitespacePattern, " ")
  }

  /** Mean alphanumeric word length, 4 dp (a Gopher-rule quality signal:
    * outlier values flag boilerplate/garbage docs). */
  def meanWordLen(c: Column): Column = {
    val chars = length(regexp_replace(c, "[^A-Za-z0-9]", "")).cast("double")
    round(chars / greatest(tokenCount(c).cast("double"), lit(1.0)), 4)
  }

  /** Fraction of `sep`-separated segments that are duplicates of an
    * earlier segment (Gopher duplicate-line/paragraph fraction). */
  def dupSegmentFrac(c: Column, sepRegex: String): Column = {
    val segs = split(c, sepRegex)
    round((size(segs) - size(array_distinct(segs))).cast("double") /
      greatest(size(segs).cast("double"), lit(1.0)), 4)
  }

  /** Fraction of words that are bare digit runs (Gopher numeric-heavy
    * filter signal). */
  def numericWordFrac(c: Column): Column =
    round(countMatches(c, "\\b[0-9]+\\b").cast("double") /
      greatest(tokenCount(c).cast("double"), lit(1.0)), 4)
}
