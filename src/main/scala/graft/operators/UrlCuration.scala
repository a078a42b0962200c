package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level curation — the FIRST stage of C4/RefinedWeb-style web
  * pipelines, which curate by host before any content-based signal is
  * computed: parse the host out of each document's URL, drop blocklisted
  * domains, and cap each domain's document count so no single host
  * dominates the corpus (RefinedWeb §3.1 "URL filtering"; C4's blocklist
  * pass; Gopher's per-domain caps).
  *
  * Everything here is pure string/integer algebra — engine-portable
  * bit-for-bit, no UDF, no network:
  *
  *  - [[hostOf]] extracts the authority host with one anchored regex
  *    (scheme optional, userinfo stripped, port/path/query/fragment
  *    excluded, lowercased). RFC 3986's authority grammar, restricted to
  *    what a crawl URL column actually contains.
  *  - [[blocklisted]] matches a host against a blocklist at REGISTRABLE
  *    granularity: `host == b` or `host.endsWith("." + b)` — blocking
  *    `blocked.example` also blocks `spam.blocked.example`, the standard
  *    blocklist semantics. The list bakes into the plan as a literal
  *    predicate chain (fine for the usual 10³–10⁴-entry lists; a
  *    million-entry list would broadcast-anti-join a host table instead —
  *    config, not a different algorithm).
  *  - [[domainCap]] rides [[Sampling.quotaSample]]: rank docs per host in
  *    deterministic (md5(id), id) hash-priority order and keep the first
  *    `maxPerDomain`. The `row_number <= k` shape compiles to
  *    WindowGroupLimit — map-side trim before the shuffle, so a 10⁹-doc
  *    spam domain moves O(partitions × k) rows, never its whole mass.
  *
  * Scale shape: host extraction is a narrow map in the scan stage;
  * [[domainCounts]] is one tiny aggregate (key space = distinct hosts);
  * the blocklist filter is narrow; the cap's shuffle is the group-limited
  * host partitioning. Nothing corpus-sized moves except the one capped
  * exchange.
  */
object UrlCuration {

  /** Host of a URL: optional scheme and userinfo stripped, authority cut
    * at the first `/ ? # :` (so ports never leak into the host), result
    * lowercased. An unparseable OR NULL value yields the empty string —
    * never null, so downstream filters cannot silently drop the row. */
  def hostOf(url: Column): Column =
    regexp_extract(lower(coalesce(url, lit(""))),
      "^(?:[a-z][a-z0-9+.-]*://)?(?:[^/?#@]*@)?([^/?#:]+)", 1)

  /** True iff `host` is a blocklisted domain or any subdomain of one. */
  def blocklisted(host: Column, blocklist: Seq[String]): Column =
    blocklist.map(b => host === b || host.endsWith("." + b))
      .reduceOption(_ || _).getOrElse(lit(false))

  /** Per-host document counts (descending) — the curation audit table. */
  def domainCounts(docs: DataFrame, urlCol: String): DataFrame =
    docs.select(hostOf(col(urlCol)).as("host"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"))

  /** Blocklist pass: keep docs whose host matches no blocklist entry.
    * Adds the parsed `host` column. */
  def blocklistFilter(
      docs: DataFrame, urlCol: String, blocklist: Seq[String]): DataFrame =
    docs.withColumn("host", hostOf(col(urlCol)))
      .filter(!blocklisted(col("host"), blocklist))

  /** Per-domain cap: at most `maxPerDomain` docs per host, chosen in the
    * deterministic hash-priority order (layout-independent, engine-exact).
    * Emits `sample_rank` (1-based within host). */
  def domainCap(
      docs: DataFrame, idCol: String, hostCol: String,
      maxPerDomain: Int): DataFrame =
    Sampling.quotaSample(docs, idCol, hostCol, maxPerDomain)

  /** The full first-stage pipeline: parse host → drop blocklisted →
    * cap per domain. */
  def curate(
      docs: DataFrame, idCol: String, urlCol: String,
      blocklist: Seq[String], maxPerDomain: Int): DataFrame =
    domainCap(blocklistFilter(docs, urlCol, blocklist),
      idCol, "host", maxPerDomain)

  /** One micro-batch of STREAMING domain-capped ingestion — [[curate]]
    * driven by foreachBatch with the cap enforced ACROSS batches: a doc is
    * kept iff its host's already-accepted count (all committed batches)
    * plus its within-batch arrival rank stays ≤ `maxPerDomain`. With
    * monotone-id staging the streamed union of kept batches EQUALS the
    * batch-global arrival-order cap (row_number per host by id) — the
    * oracle-provable equivalence.
    *
    * Exactly-once via [[Dedup.incrementalDedupOnce]]'s crash matrix: a
    * committed batchId skips the whole body (sink output is known
    * complete); otherwise kept rows are computed against the PREVIOUS
    * committed per-host counts, handed to an idempotent per-batch sink,
    * and only then the updated counts commit
    * ([[IncrementalAgg.refreshOnceWith]], sum-merge). Every crash point
    * replays against unchanged state and overwrites identically.
    *
    * State is one (host, n_accepted) row per domain — bounded by domain
    * cardinality, not corpus size; the per-batch shuffle is the
    * WindowGroupLimit-style host partitioning of the BATCH only. */
  def domainCapOnce(
      spark: org.apache.spark.sql.SparkSession, statePath: String,
      batch: DataFrame, idCol: String, urlCol: String, batchId: Long,
      sink: DataFrame => Unit, blocklist: Seq[String],
      maxPerDomain: Int): Unit = {
    require(maxPerDomain > 0)
    if (!IncrementalAgg.latestVersion(spark, statePath).forall(_ < batchId))
      return
    val prev = IncrementalAgg.latestVersion(spark, statePath)
      .map(_ => IncrementalAgg.readState(spark, statePath))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col(idCol))
    val ranked = blocklistFilter(batch, urlCol, blocklist)
      .withColumn("__rk", row_number().over(w))
    val withPrev = prev match {
      case Some(st) => ranked
        .join(st.select(col("host"), col("n_accepted").as("__before")),
          Seq("host"), "left")
        .withColumn("__before", coalesce(col("__before"), lit(0L)))
      case None => ranked.withColumn("__before", lit(0L))
    }
    val kept = withPrev
      .filter(col("__before") + col("__rk") <= maxPerDomain)
      .drop("__rk", "__before")
    sink(kept)
    // commit AFTER the sink (crash → replay recomputes identically)
    val delta = kept.groupBy(col("host"))
      .agg(count(lit(1)).as("n_accepted"))
    IncrementalAgg.refreshOnceWith(spark, statePath, delta, batchId,
      (st, dl) => st.unionByName(dl).groupBy(col("host"))
        .agg(sum(col("n_accepted")).as("n_accepted")))
  }

  private val UrlParts =
    "^(?:([a-zA-Z][a-zA-Z0-9+.-]*)://)?(?:([^/?#@]*)@)?" +
      "([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  /** Tracking parameters every crawl pipeline strips before URL identity
    * is decided (C4/CCNet dedup by canonical URL): Google/Facebook click
    * ids and the utm_* campaign family, plus the bare `ref` referrer. */
  private val TrackingParam = "^(utm_[^=]*|fbclid|gclid|ref)(=|$)"

  /** Canonical form of a URL — the identity under which crawl pipelines
    * dedup re-crawls of the same page (CCNet dedups by URL; C4 relies on
    * the crawler's canonicalization). One deterministic string rewrite,
    * pure regexp/array algebra (no UDF, engine-portable bit-for-bit):
    *
    *  - scheme lowercased, defaulting to `http` when absent;
    *  - userinfo and fragment dropped (never part of page identity);
    *  - host lowercased; an explicit default port (`:80` for http,
    *    `:443` for https) dropped, any other port kept;
    *  - trailing slashes trimmed off the path (empty path → `/`);
    *  - query params split on `&`, tracking params ([[TrackingParam]])
    *    and empty fragments dropped, survivors SORTED so param order
    *    never splits identity, re-joined (no survivors → no `?`).
    *
    * An unparseable value canonicalizes to `http://<value>/`-ish via the
    * permissive host group — garbage in, deterministic garbage out. */
  def canonicalizeUrl(url0: Column): Column = {
    // a NULL url canonicalizes like any other unparseable value
    // (deterministic "http:///"), never to a null identity
    val url = coalesce(url0, lit(""))
    def part(i: Int) = regexp_extract(url, UrlParts, i)
    val scheme =
      when(part(1) === "", lit("http")).otherwise(lower(part(1)))
    val host = lower(part(3))
    val port = part(4)
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val trimmedPath = regexp_replace(part(5), "/+$", "")
    val path = when(trimmedPath === "", lit("/")).otherwise(trimmedPath)
    val keptParams = array_sort(filter(split(part(6), "&"),
      p => p =!= "" && !p.rlike(TrackingParam)))
    val queryPart = when(size(keptParams) > 0,
      concat(lit("?"), array_join(keptParams, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, portPart, path, queryPart)
  }

  /** URL-level exact dedup — group docs by [[canonicalizeUrl]] identity
    * and keep the lowest id per canonical URL (the re-crawl winner).
    * Emits one row per canonical URL: `(canon_url, keep_id, n_dups)`.
    * Scale shape: the rewrite is a narrow map in the scan stage; the one
    * shuffle groups by canonical-URL string (bounded by distinct pages,
    * and map-side combine collapses per-partition re-crawls first). */
  def canonicalDedup(
      docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(col(idCol), canonicalizeUrl(col(urlCol)).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
}
