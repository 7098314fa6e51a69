package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, versioned tokenizer (spec v1).
  *
  * The reference ingests pre-split tags (/root/reference/src/storage/
  * storage.rs:198); full-text tokenization is this graft's addition, and the
  * per-row invariant from BASELINE.json input_hint ("byte-identical extracted
  * text per url") requires it to be a pure function with no locale / regex
  * engine nondeterminism.
  *
  * Spec v1: split on runs of characters outside [a-zA-Z0-9], drop empty
  * tokens, THEN lowercase each token. Tokens are pure ASCII by
  * construction, so the lowercasing is locale-independent everywhere —
  * splitting *after* a full-string `lower` would instead route non-ASCII
  * input through locale-sensitive case mapping (e.g. Turkish dotted-I) and
  * let the Column and Scala paths diverge across JVMs. Expressed with
  * Catalyst built-ins (`split`/`filter`/`transform`/`lower`) so the hot
  * path stays inside whole-stage codegen; `tokenizeScala` is the
  * executor-side / test-side twin with identical semantics (Java regex on
  * ASCII classes matches RE2 used by the DuckDB oracle for this pattern).
  */
object Tokenize {
  val Version = "v1"
  val SplitPattern = "[^a-zA-Z0-9]+"

  /** Column form — stays in codegen; array of non-empty tokens in order. */
  def col(c: Column): Column =
    transform(filter(split(c, SplitPattern), t => length(t) > 0), t => lower(t))

  private val compiled = java.util.regex.Pattern.compile(SplitPattern)

  /** Reference implementation (regex): kept for the equivalence property
    * test; [[tokenizeScala]] below is the hand-rolled hot-path twin.
    */
  private[graft] def tokenizeRegex(s: String): Array[String] =
    compiled.split(s, -1).filter(_.nonEmpty)
      .map(_.toLowerCase(java.util.Locale.ROOT))

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z')

  /** Pure-Scala twin of [[col]]: identical output for any input.
    *
    * Hand-rolled single-pass scanner, not `Pattern.split` — tokenization is
    * the hottest stage of the whole build (~107 CPU-seconds per 1M docs in
    * the regex form), and the spec is plain ASCII-alnum runs: every
    * non-[A-Za-z0-9] char (including all non-ASCII) is a separator, and
    * lowercasing pure-ASCII tokens is the +32 shift, byte-identical to
    * `toLowerCase(Locale.ROOT)` on this character class (equivalence to the
    * regex form is property-tested in RobustnessSpec).
    */
  def tokenizeScala(s: String): Array[String] = {
    if (s == null || s.isEmpty) return Array.empty
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuffer[String](n / 6 + 1)
    var i = 0
    while (i < n) {
      if (isAlnum(s.charAt(i))) {
        val start = i
        var hasUpper = false
        var c = s.charAt(i)
        while (isAlnum(c)) {
          if (c >= 'A' && c <= 'Z') hasUpper = true
          i += 1
          if (i < n) c = s.charAt(i) else c = ' '
        }
        if (!hasUpper) out += s.substring(start, i)
        else {
          val buf = new Array[Char](i - start)
          var j = start
          while (j < i) {
            val ch = s.charAt(j)
            buf(j - start) = if (ch >= 'A' && ch <= 'Z') (ch + 32).toChar else ch
            j += 1
          }
          out += new String(buf)
        }
      } else i += 1
    }
    out.toArray
  }
}

/** Character-trigram analyzer (spec v1) — the alternate index analyzer
  * behind exact substring search (Searcher.substring), the classic
  * trigram-index design of Google Code Search / Zoekt: index every 3-char
  * window of the RAW text (no case folding, no separator splitting —
  * byte-faithful to the stored text, so "contains substring" is exactly
  * "contains every window of the needle"). Position i of token i is the
  * window's char offset, which would support in-index adjacency
  * verification; the substring path instead verifies candidates against
  * the source text, so trigram indexes are normally built
  * withPositions=false (half the bytes).
  *
  * The reference ingests opaque pre-split tags (/root/reference/src/
  * storage/storage.rs:198) — an analyzer is just a different tag extractor
  * over the same posting machinery, which is precisely how this object is
  * wired (IndexOptions.analyzer).
  */
object Trigram {
  val Version = "v1"
  val N = 3

  /** All 3-char windows of `s` in order; length < 3 -> empty (such strings
    * are findable only by the caller's full-scan fallback).
    */
  def gramsScala(s: String): Array[String] = {
    if (s == null || s.length < N) return Array.empty
    val out = new Array[String](s.length - N + 1)
    var i = 0
    while (i <= s.length - N) { out(i) = s.substring(i, i + N); i += 1 }
    out
  }
}

/** Deterministic html -> text extraction (spec v1).
  *
  * v1 rules, applied in order on the UTF-8 decoded html string:
  *  1. remove `<script>...</script>`, `<style>...</style>`, and the whole
  *     `<head>...</head>` element (case-insensitive, non-greedy);
  *  2. remove all remaining tags `<...>`;
  *  3. decode the fixed entity set &amp; &lt; &gt; &quot; &#39; &nbsp;;
  *  4. collapse whitespace runs to a single space and trim.
  *
  * Pure function of the input bytes — no parser library, no locale. The
  * synthetic corpus builds html *from* text (FIXTURES.md §2), so tests
  * assert `extract(html) == text` byte-identically.
  */
object HtmlText {
  val Version = "v1"

  private val scriptRe = "(?is)<script\\b.*?</script>".r
  private val styleRe = "(?is)<style\\b.*?</style>".r
  private val headRe = "(?is)<head\\b.*?</head>".r
  private val tagRe = "(?s)<[^>]*>".r
  private val wsRe = "[\\s\\u00a0]+".r

  def extract(html: Array[Byte]): String =
    extract(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  def extract(html: String): String = {
    var s = html
    s = scriptRe.replaceAllIn(s, " ")
    s = styleRe.replaceAllIn(s, " ")
    s = headRe.replaceAllIn(s, " ")
    s = tagRe.replaceAllIn(s, "")
    s = s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
    wsRe.replaceAllIn(s, " ").trim
  }

  /** Column form via a deterministic UDF (string in, string out). */
  def extractUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((html: Array[Byte]) => extract(html))
}
