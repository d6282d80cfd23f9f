package graft.extract

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Link discovery + text extraction. Replaces the reference's PhantomJS
  * `genericAnchors` finder and DOM-text extraction (SURVEY.md §2 #3/#4) with
  * Catalyst-planned expressions (BASELINE.json:6 "Catalyst-planned link
  * extraction").
  *
  * Two implementations of ONE spec:
  *   - pure Scala (used by the sequential reference oracle and the fixture
  *     generator, which derives the `text` column from `html` so the
  *     per-row invariant `extractText(html) == text` is byte-identical,
  *     BASELINE.json:15 / SURVEY.md §7.6)
  *   - Column expressions built ONLY from codegen'd Spark built-ins
  *     (regexp_extract_all / regexp_replace) — these stay inside
  *     whole-stage codegen; no UDF in the hot discovery path.
  *
  * The grammar: anchors are double-quoted `<a href="...">`; a redirect page's
  * whole body is the marker `Location: <target>` (FIXTURES.md B1).
  */
object Extract extends Serializable {

  /** Java-regex anchor pattern — IDENTICAL string passed to both the pure
    * Regex and Spark's regexp_extract_all (both JVM regex, same engine
    * semantics).
    */
  val AnchorPattern: String = "<a\\s+href=\"([^\"]*)\""
  private val AnchorRe = AnchorPattern.r

  val RedirectPrefix: String = "Location: "

  val TagPattern: String = "<[^>]*>"
  val WsPattern: String = "\\s+"

  def htmlToString(html: Array[Byte]): String = new String(html, UTF_8)

  def isRedirect(htmlStr: String): Boolean = htmlStr.startsWith(RedirectPrefix)

  /** redirect target (raw, un-canonicalized) or None */
  def redirectTarget(htmlStr: String): Option[String] =
    if (isRedirect(htmlStr)) Some(htmlStr.substring(RedirectPrefix.length).trim)
    else None

  /** hrefs in document order; empty for redirect pages */
  def extractLinks(htmlStr: String): Vector[String] =
    if (isRedirect(htmlStr)) Vector.empty
    else AnchorRe.findAllMatchIn(htmlStr).map(_.group(1)).toVector

  /** html -> text: tags replaced by a space, whitespace runs collapsed to a
    * single space, trimmed; redirect pages extract to "".
    */
  def extractText(htmlStr: String): String =
    if (isRedirect(htmlStr)) ""
    else htmlStr.replaceAll(TagPattern, " ").replaceAll(WsPattern, " ").trim

  // ---- Column-level versions (hot path: codegen'd built-ins only) ----

  /** binary html -> string */
  def htmlStrCol(html: Column): Column = decode(html, "UTF-8")

  def isRedirectCol(htmlStr: Column): Column = htmlStr.startsWith(RedirectPrefix)

  /** Column mirror of java.lang.String.trim — strips ALL chars <= U+0020 at
    * both ends, where Spark's trim() strips only ' '. The pure spec side uses
    * String.trim, so the Column side must match on e.g. "Location: x\n".
    */
  private def javaTrim(c: Column): Column =
    regexp_replace(c, "^[\\x00-\\x20]+|[\\x00-\\x20]+$", "")

  def redirectTargetCol(htmlStr: Column): Column =
    when(isRedirectCol(htmlStr),
      javaTrim(substring(htmlStr, RedirectPrefix.length + 1, Int.MaxValue)))
      .otherwise(lit(null).cast("string"))

  /** array<string> of hrefs in document order (empty for redirects) */
  def linksCol(htmlStr: Column): Column =
    when(isRedirectCol(htmlStr), array().cast("array<string>"))
      .otherwise(regexp_extract_all(htmlStr, lit(AnchorPattern), lit(1)))

  /** Column mirror of [[extractText]] (javaTrim: see redirectTargetCol) */
  def textCol(htmlStr: Column): Column =
    when(isRedirectCol(htmlStr), lit(""))
      .otherwise(javaTrim(regexp_replace(regexp_replace(htmlStr, TagPattern, " "), WsPattern, " ")))

  // ---- sitemap discovery (sitemaps.org protocol) ----

  /** `<loc>` entry bodies; whitespace inside the element is insignificant
    * per the sitemap protocol, so entries trim. Same grammar in the pure
    * and Column forms (and in the DuckDB oracle — the pattern is in the
    * Java/RE2 common subset).
    */
  val SitemapLocPattern: String = "<loc>([^<]*)</loc>"
  private val SitemapLocRe = SitemapLocPattern.r

  /** pure mirror: loc entries in document order, trimmed */
  def sitemapLocs(xml: String): Vector[String] =
    SitemapLocRe.findAllMatchIn(xml).map(_.group(1).trim).toVector

  /** array<string> of trimmed loc entries (codegen built-ins only) */
  def sitemapLocsCol(xml: Column): Column =
    transform(regexp_extract_all(xml, lit(SitemapLocPattern), lit(1)),
      e => javaTrim(e))
}
