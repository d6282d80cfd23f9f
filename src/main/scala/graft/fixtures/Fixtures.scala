package graft.fixtures

import java.sql.Timestamp

import graft.extract.Extract
import graft.model.Page
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic "web" generator (FIXTURES.md B1, seed 42).
  *
  * Every page is a pure function of (seed, host, pageIdx) via a splitmix64
  * mix — NO RNG state, so the same graph materializes identically whether
  * built driver-side (for the sequential oracle) or distributed via
  * spark.range (for the benchmark frontier, FIXTURES.md B5). `text` is
  * derived from `html` through Extract.extractText, making the byte-identical
  * per-row invariant (BASELINE.json:15) true by construction and the
  * extractor testable against it (SURVEY.md §7.6).
  *
  * Host sizes are Zipf-ish (host 0 is the mega-host) to exercise skew
  * handling / salting (SURVEY.md §7.7).
  */
object Fixtures extends Serializable {

  final case class FixtureConfig(
      nHosts: Int = 4,
      maxPagesPerHost: Int = 16,
      linksPerPage: Int = 6,
      pctCrossDomain: Int = 15,
      pctRedirect: Int = 8,
      pctDangling: Int = 8,
      seed: Long = 42L) {
    def pagesPerHost(h: Int): Int = math.max(1, maxPagesPerHost / (h + 1))
    lazy val hostOffsets: Array[Long] = {
      val a = new Array[Long](nHosts + 1)
      var h = 0
      while (h < nHosts) { a(h + 1) = a(h) + pagesPerHost(h); h += 1 }
      a
    }
    def totalPages: Long = hostOffsets(nHosts)
  }

  /** splitmix64 finalizer chained over inputs — stateless determinism */
  def mix(xs: Long*): Long = {
    var z = 0x9E3779B97F4A7C15L
    for (x <- xs) {
      z += x * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
      z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
      z ^= z >>> 27; z *= 0x94D049BB133111EBL
      z ^= z >>> 31
    }
    z
  }
  private def pos(x: Long, mod: Int): Int = ((x % mod + mod) % mod).toInt

  private val Vocab = Array("crawl", "frontier", "spark", "shard", "bloom",
    "fetch", "queue", "robots", "host", "link", "page", "depth", "seed",
    "hash", "join", "scan", "batch", "round", "budget", "retry")
  private val Langs = Array("en", "de", "fr", "ja")

  def hostName(h: Int): String = s"h$h.test"
  def urlOf(h: Int, i: Long): String = s"http://${hostName(h)}/p/$i"

  /** the raw href emitted into the html for link k of page (h,i) — varies
    * over the whole grammar the extractor must handle (FIXTURES.md B1)
    */
  def hrefOf(cfg: FixtureConfig, h: Int, i: Long, k: Int): String = {
    val r = mix(cfg.seed, h.toLong, i, k.toLong)
    val form = pos(mix(r, 1L), 100)
    if (form < 4) "#frag" // fragment-only -> resolves to self, exercises dedup
    else if (form < 8) "mailto:a@b.test" // dropped by scheme filter
    else {
      val cross = pos(mix(r, 2L), 100) < cfg.pctCrossDomain
      val th = if (cross) pos(mix(r, 3L), cfg.nHosts) else h
      val dangling = pos(mix(r, 4L), 100) < cfg.pctDangling
      val nPages = cfg.pagesPerHost(th)
      val tj: Long =
        if (dangling) nPages + pos(mix(r, 5L), 1000).toLong
        else pos(mix(r, 6L), nPages).toLong
      if (cross || form < 30) urlOf(th, tj) // absolute
      else if (form < 50) s"/p/$tj" // rooted
      else if (form < 70) tj.toString // relative (base dir is /p/)
      else if (form < 85) s"//${hostName(th)}/p/$tj" // protocol-relative
      else s"../p/./$tj" // dot-segments, exercises remove_dot_segments
    }
  }

  def isRedirectPage(cfg: FixtureConfig, h: Int, i: Long): Boolean =
    pos(mix(cfg.seed, h.toLong, i, 999L), 100) < cfg.pctRedirect

  def htmlOf(cfg: FixtureConfig, h: Int, i: Long): String =
    if (isRedirectPage(cfg, h, i)) {
      val r = mix(cfg.seed, h.toLong, i, 1000L)
      val th = if (pos(mix(r, 1L), 100) < cfg.pctCrossDomain) pos(mix(r, 2L), cfg.nHosts) else h
      val tj = pos(mix(r, 3L), cfg.pagesPerHost(th)).toLong
      Extract.RedirectPrefix + urlOf(th, tj)
    } else {
      val r = mix(cfg.seed, h.toLong, i, 7L)
      val nWords = 5 + pos(mix(r, 1L), 20)
      val words = (0 until nWords).map(w => Vocab(pos(mix(r, 2L, w.toLong), Vocab.length)))
      val anchors = (0 until cfg.linksPerPage)
        .map(k => s"""<a href="${hrefOf(cfg, h, i, k)}">l$k</a>""").mkString
      s"<html><head><title>h$h p$i</title></head>" +
        s"<body><p>${words.mkString(" ")}</p>$anchors</body></html>"
    }

  def pageOf(cfg: FixtureConfig, h: Int, i: Long): Page = {
    val html = htmlOf(cfg, h, i)
    val ts = new Timestamp(1704067200000L + (pos(mix(cfg.seed, h.toLong, i, 11L), 31536000).toLong * 1000L))
    Page(
      url = urlOf(h, i),
      warc_ts = ts,
      html = html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      text = Extract.extractText(html),
      lang = Langs(pos(mix(cfg.seed, h.toLong, i, 13L), Langs.length)))
  }

  /** driver-side materialization (small graphs: oracle + scenario tests) */
  def generate(cfg: FixtureConfig): Vector[Page] =
    (0 until cfg.nHosts).flatMap { h =>
      (0L until cfg.pagesPerHost(h).toLong).map(i => pageOf(cfg, h, i))
    }.toVector

  /** distributed materialization for benchmark-scale page stores —
    * spark.range + a binary search over host offsets; no driver bottleneck
    */
  def generateDS(spark: SparkSession, cfg: FixtureConfig): Dataset[Page] = {
    import spark.implicits._
    val offsets = cfg.hostOffsets
    spark.range(cfg.totalPages).mapPartitions { it =>
      it.map { idx =>
        var lo = 0; var hi = offsets.length - 1
        while (hi - lo > 1) { val m = (lo + hi) >>> 1; if (offsets(m) <= idx) lo = m else hi = m }
        pageOf(cfg, lo, idx - offsets(lo))
      }
    }
  }

  /** default seed list: page 0 of the first `n` hosts */
  def seeds(cfg: FixtureConfig, n: Int = 1): Seq[String] =
    (0 until math.min(n, cfg.nHosts)).map(h => urlOf(h, 0L))
}
