package graft.ops

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** c44: URL/domain-level corpus gate — the first stage every real
  * crawl pipeline (CCNet, RefinedWeb, C4) runs BEFORE any text
  * operator: canonicalize each document's URL, extract its registered
  * domain, then gate on exact canonical-URL dedup, a per-domain
  * document cap, and a domain blocklist join.
  *
  * Canonical form (the RefinedWeb/CCNet conventions):
  *   - scheme and host lowercased; userinfo (`user:pw@`) stripped;
  *     a leading `www.` stripped; punycode (`xn--`) labels kept as-is
  *     (decoding is not part of the canonical key — two encodings of
  *     the same IDN are distinct crawl targets);
  *   - default ports dropped (http:80, https:443), other ports kept;
  *   - empty path → `/`; a trailing slash dropped except on the root;
  *   - fragment dropped; query parameters with tracking names
  *     (utm_*, fbclid, gclid, ref, mc_cid, mc_eid) dropped and the
  *     survivors SORTED, so param-order permutations collide.
  *
  * Registered domain: last two host labels, or last three when the
  * last two are a public suffix ([[PublicSuffixes]] — the bounded
  * spec-scale stand-in for the full PSL table a production run ships).
  *
  * Scale shape: the parse runs in ONE compiled typed kernel pass
  * (same discipline as c24/c27/c32 — no per-URL regex forest, no
  * UDF); the dedup aggregate is a map-side-combined min per canonical
  * URL (a hot URL crawled a million times combines inside each task
  * before the shuffle) joined back by canonical key (AQE skew-safe);
  * the per-domain cap reuses c40's bounded-heap [[CorpusOps.TopKByKeyAgg]]
  * — the shuffle carries O(domains · cap) rows, never the corpus, so
  * a million-doc domain cannot funnel a window partition (the
  * c15/c32 skew trap); the blocklist is a broadcast join on domain.
  * The narrow parsed table persists across the three branches and the
  * bounded result checkpoints eagerly (the c32 pattern).
  *
  * Oracle discipline: the bench query synthesizes hostile raw URLs as
  * a PURE FUNCTION of doc_id ([[synthUrl]] — mixed-case schemes and
  * hosts, userinfo, default ports, www prefixes, tracking params in
  * permuted order, trailing slashes, fragments, punycode labels), and
  * the DuckDB oracle derives the CANONICAL form analytically from the
  * same doc_id residues — an independent derivation, so the hash
  * match certifies the parser, not a shared implementation. */
object UrlGate {
  /** Max documents kept per registered domain (RefinedWeb-style
    * anti-spam cap). Shared with the SQL oracle. */
  val DomainCap = 25

  /** Default blocked registered domains for the bench query — stands
    * in for the big blocklist table a production run broadcast-joins.
    * Shared with the SQL oracle. */
  val Blocklist: Seq[String] = Seq("site-3.com", "xn--site-1.co.uk")
  def blocklistSqlList: String = Blocklist.map(d => s"'$d'").mkString(", ")

  /** Exact tracking-param names stripped from the canonical query
    * string (plus any name with the `utm_` prefix). */
  val TrackingNames: Set[String] = Set("fbclid", "gclid", "ref", "mc_cid", "mc_eid")

  /** Two-label public suffixes under which the registered domain is
    * three labels. A production deployment swaps in the full public
    * suffix list; the rule (longest-suffix match + 1 label) is the
    * same. */
  val PublicSuffixes: Set[String] = Set(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "com.au", "net.au",
    "co.jp", "com.br", "co.in", "co.nz")

  /** Hostile synthetic URL as a pure function of the doc id — every
    * component keyed off a small residue so the DuckDB oracle rebuilds
    * the identical string with CASE arithmetic. Canonical identity is
    * driven by residues mod {2, 5, 10, 13} (scheme+TLD, host, page,
    * punycode) — lcm 130, so canonical collisions are common at every
    * SF — while residues mod {3, 7, 11} drive canonical-NEUTRAL noise
    * (case, www, default port, userinfo, param order, trailing slash,
    * fragment). */
  def synthUrl(id: Column): Column = {
    val m2 = id % 2; val m3 = id % 3; val m5 = id % 5
    val m7 = id % 7; val m10 = id % 10; val m11 = id % 11; val m13 = id % 13
    val schemeC = when(m2 === 0, "http").otherwise("https")
    val domain = concat(
      when(m13 === 0, "xn--site-").otherwise("site-"),
      m5.cast(StringType),
      when(m2 === 0, ".com").otherwise(".co.uk"))
    val pageS = m10.cast(StringType)
    concat(
      when(m3 === 0, upper(schemeC)).otherwise(schemeC), lit("://"),
      when(m11 === 0, "u:p@").otherwise(""),
      when(m7 === 3, "www.").when(m7 === 4, "WWW.").otherwise(""),
      when(m7 === 2, upper(domain)).otherwise(domain),
      when(m7 === 0, when(m2 === 0, ":80").otherwise(":443")).otherwise(""),
      lit("/p/"), pageS, when(m3 === 2, "/").otherwise(""),
      lit("?"),
      when(m3 === 0, concat(lit("utm_source=tw&a="), pageS, lit("&z=1")))
        .when(m3 === 1, concat(lit("z=1&utm_campaign=x&a="), pageS))
        .otherwise(concat(lit("fbclid=abc&z=1&a="), pageS)),
      when(m11 === 1, "#sec").otherwise(""))
  }

  /** Registered domain of an already-canonical (lowercased) host.
    * IP-literal hosts (IPv4, or bracketed IPv6) have no label
    * hierarchy: the whole host IS the registered domain — grouping
    * unrelated IPv4 hosts by their last two octets would corrupt the
    * per-domain cap and blocklist semantics. */
  private[graft] def registeredDomain(host: String): String = {
    if (host.startsWith("[")) return host // bracketed IPv6 literal
    val labels = host.split('.')
    // all-numeric final label: a named host's TLD is never numeric
    // (RFC 3696 §2), so this is an IPv4 literal
    if (labels.nonEmpty && labels.last.nonEmpty && labels.last.forall(_.isDigit))
      return host
    if (labels.length <= 2) host
    else {
      val last2 = labels(labels.length - 2) + "." + labels(labels.length - 1)
      if (PublicSuffixes.contains(last2))
        labels(labels.length - 3) + "." + last2
      else last2
    }
  }

  /** Parse + canonicalize one raw URL → (canonical url, registered
    * domain); (null, null) for null or scheme-less input (the caller
    * surfaces those rows with NULL derived columns and kept=0). */
  private[graft] def canonicalize(url: String): (String, String) = {
    if (url == null) return (null, null)
    val hashAt = url.indexOf('#')
    val noFrag = if (hashAt >= 0) url.substring(0, hashAt) else url
    val sep = noFrag.indexOf("://")
    if (sep <= 0) return (null, null)
    val scheme = noFrag.substring(0, sep).toLowerCase(Locale.ROOT)
    val rest = noFrag.substring(sep + 3)
    val slashAt = rest.indexOf('/'); val qMark = rest.indexOf('?')
    val authEnd =
      if (slashAt < 0 && qMark < 0) rest.length
      else if (slashAt < 0) qMark
      else if (qMark < 0) slashAt
      else math.min(slashAt, qMark)
    val authority = rest.substring(0, authEnd)
    val pathQuery = rest.substring(authEnd)
    val at = authority.lastIndexOf('@')
    val hostPort = if (at >= 0) authority.substring(at + 1) else authority
    val colon = hostPort.lastIndexOf(':')
    var host = hostPort
    var port = ""
    if (colon >= 0) {
      val p = hostPort.substring(colon + 1)
      if (p.forall(_.isDigit)) { // covers the bare trailing ':' (empty port)
        host = hostPort.substring(0, colon)
        port = p
      }
    }
    host = host.toLowerCase(Locale.ROOT)
    // an FQDN trailing dot names the same host ('site.com.' ≡
    // 'site.com') — strip it before every downstream use, else the
    // dotted form gets its own dedup key AND its own registered
    // domain (the 2-label path returns the host verbatim), letting a
    // blocked domain bypass the blocklist and the per-domain cap
    while (host.endsWith(".")) host = host.dropRight(1)
    if (host.startsWith("www.")) host = host.substring(4)
    if (host.isEmpty) return (null, null)
    // normalize the port NUMERICALLY before the default-port test:
    // 'example.com:080' and 'example.com' are the same crawl target,
    // and a literal-string compare would give them distinct canonical
    // keys (defeating gate 1). Ports beyond Int range fall back to the
    // cleaned digit string (still zero-stripped, still collides).
    val portNum = if (port.isEmpty) "" else {
      val stripped = port.dropWhile(_ == '0')
      if (stripped.isEmpty) "0" else stripped
    }
    val keepPort =
      if (portNum.isEmpty || (scheme == "http" && portNum == "80") ||
        (scheme == "https" && portNum == "443")) ""
      else ":" + portNum
    val qAt = pathQuery.indexOf('?')
    var path = if (qAt >= 0) pathQuery.substring(0, qAt) else pathQuery
    val rawQ = if (qAt >= 0) pathQuery.substring(qAt + 1) else ""
    if (path.isEmpty) path = "/"
    if (path.length > 1 && path.endsWith("/")) path = path.substring(0, path.length - 1)
    val params = rawQ.split("&").iterator.filter(_.nonEmpty).filterNot { p =>
      val eq = p.indexOf('=')
      val name = (if (eq >= 0) p.substring(0, eq) else p).toLowerCase(Locale.ROOT)
      name.startsWith("utm_") || TrackingNames.contains(name)
    }.toArray.sorted
    val canonQ = if (params.isEmpty) "" else "?" + params.mkString("&")
    (scheme + "://" + host + keepPort + path + canonQ, registeredDomain(host))
  }

  /** The compiled parse kernel: (doc_id, url) → one row per doc with
    * the canonical url + registered domain. */
  private[graft] def parsedRows(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast(LongType), col("url")).as[(Long, String)]
      .map { case (id, url) =>
        val (canon, domain) = canonicalize(url)
        (id, url, canon, domain)
      }
      .toDF("doc_id", "url", "url_canon", "domain")
  }

  /** c44: the full gate over a (doc_id, url) frame. Output, one row
    * per doc: url, url_canon, domain, url_keep (first doc_id per
    * canonical URL), blocked (domain on the blocklist), in_domain_cap
    * (among the first [[DomainCap]] surviving docs of its domain, by
    * doc_id), kept (all three gates passed). Unparseable/null URLs
    * carry NULL canonical columns and fail every gate. */
  def urlGate(
      docs: DataFrame,
      blocklist: Seq[String] = Blocklist,
      cap: Int = DomainCap): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val p = parsedRows(docs).persist(lvl)
    try gatePlan(p, blocklist, cap).localCheckpoint(true)
    finally p.unpersist(blocking = false)
  }

  /** The lazy gate pipeline over a (persisted) parsed table — separate
    * so PlanSpec can pin its shape past the public query's eager
    * checkpoint. */
  private[graft] def gatePlan(
      p: DataFrame, blocklist: Seq[String], cap: Int): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    {
      // gate 1 — exact canonical-URL dedup: map-side-combined min per
      // canonical key, joined back (inner join on the non-null keys;
      // null-canon rows re-enter via the left join's miss arm)
      val minPer = p.filter(col("url_canon").isNotNull)
        .groupBy("url_canon").agg(min("doc_id").as("keep_id"))
      // gate 2 — blocklist: broadcast join on registered domain
      val blockDf = blocklist.toDF("domain").withColumn("blk", lit(1))
      val flagged = p
        .join(minPer, Seq("url_canon"), "left")
        .join(broadcast(blockDf), Seq("domain"), "left")
        .withColumn("url_keep",
          (col("keep_id").isNotNull && col("doc_id") === col("keep_id"))
            .cast(IntegerType))
        .withColumn("blocked", coalesce(col("blk"), lit(0)).cast(IntegerType))
      // gate 3 — per-domain cap among gate-1/2 survivors: c40's
      // bounded-heap per-key top-k (constant key ⇒ ties break by
      // doc_id ASC ⇒ the first `cap` docs), shuffle O(domains · cap)
      val agg = new CorpusOps.TopKByKeyAgg(cap)
      val capSet = flagged
        .filter(col("url_keep") === 1 && col("blocked") === 0)
        .select(col("domain"), col("doc_id")).as[(String, Long)]
        .groupByKey(_._1)
        .mapValues { case (_, id) => (id, 0, 0.0) }
        .agg(agg.toColumn.name("top"))
        .flatMap { case (_, top) => top.iterator.map { case (_, id, _) => id } }
        .toDF("doc_id").withColumn("in_cap", lit(1))
      flagged
        .join(capSet, Seq("doc_id"), "left")
        .withColumn("in_domain_cap", coalesce(col("in_cap"), lit(0)).cast(IntegerType))
        .withColumn("kept",
          (col("url_keep") === 1 && col("blocked") === 0 &&
            col("in_domain_cap") === 1).cast(IntegerType))
        .select("doc_id", "url", "url_canon", "domain",
          "url_keep", "blocked", "in_domain_cap", "kept")
    }
  }
}
