package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL hygiene for web-corpus pipelines (the C4/RefinedWeb front door:
  * crawl rows are keyed by URL before any text is read). Everything here
  * is a MAP-ONLY chain of builtin string/regex expressions — codegen'd,
  * zero shuffle, and replayable token-for-token in SQL — because URL
  * canonicalization runs on every row of a 100 TB crawl and must cost
  * scan speed.
  *
  * Canonical form (the common core of the public canonicalization
  * recipes): lowercase scheme+host, strip default ports (:80/:443),
  * strip the fragment, strip tracking parameters (utm_*, fbclid,
  * gclid, ref), drop an empty trailing `?`, collapse a bare trailing
  * slash on a pathless URL. Deliberately NOT done: IDN/punycode and
  * public-suffix-list registrable domains (both need tables, not
  * regexes — [[registrableDomain]] approximates with last-two-labels
  * and documents the gap). */
object Urls {

  /** Lowercase scheme and host (the case-insensitive parts — path and
    * query keep their case, which is significant). */
  private def lowerSchemeHost(c: Column): Column =
    concat(lower(regexp_extract(c, "^([^:/?#]+://[^/?#]*)", 1)),
      regexp_replace(c, "^[^:/?#]+://[^/?#]*", ""))

  /** Canonical URL — see object doc for the exact rule set. Every
    * pattern stays inside the Java-regex/RE2 SHARED syntax (no
    * lookaround — RE2 has none), so the DuckDB oracle replays the chain
    * verbatim with `\\1`-style backreferences. */
  def canonicalizeUrl(c: Column): Column = {
    val lowered = lowerSchemeHost(c)
    val noFragment = regexp_replace(lowered, "#.*$", "")
    val noPort443 = regexp_replace(noFragment,
      "^(https://[^/?#:]*):443($|[/?#].*)", "$1$2")
    val noPort80 = regexp_replace(noPort443,
      "^(http://[^/?#:]*):80($|[/?#].*)", "$1$2")
    // tracking params: one match swallows a whole RUN of adjacent
    // tracked keys (lookbehind-free: the separator is captured and
    // re-emitted, so "?utm_a=1&utm_b=2&x=3" -> "?x=3" in one pass)
    val noTracking = regexp_replace(noPort80,
      "([?&])(?:(?:utm_[a-z]+|fbclid|gclid|ref)=[^&#]*&?)+", "$1")
    val mended = regexp_replace(noTracking, "[?&]$", "")
    // pathless http://host/ == http://host
    regexp_replace(mended, "^([a-z]+://[^/?#]+)/$", "$1")
  }

  /** Host of a URL (already-lowercased by the canonical form or not —
    * lowers defensively), without port. */
  def urlHost(c: Column): Column =
    lower(regexp_extract(c, "^[^:/?#]+://([^/?#:]*)", 1))

  /** Registrable-domain APPROXIMATION: the last two dot-labels of the
    * host ("a.b.example.com" -> "example.com"). Correct for generic
    * TLDs; two-level public suffixes ("example.co.uk" -> "co.uk") need
    * the public-suffix list, which is a lookup table, not a rule —
    * callers needing exactness join one in. */
  def registrableDomain(c: Column): Column =
    regexp_extract(urlHost(c), "([^.]+\\.[^.]+)$", 1)

  /** URL-keyed keep-first dedup: one row per canonical URL (lowest id
    * survives) — the crawl-side dedup that runs BEFORE text dedup.
    * Same map-side-combined min-struct aggregate as exact text dedup:
    * case/tracking/fragment variants of one page collapse at scan
    * speed, the only exchange is the by-key aggregate. */
  def dedupByUrl(df: org.apache.spark.sql.DataFrame, urlCol: String,
                 idCol: String): org.apache.spark.sql.DataFrame = {
    val keyed = df.select(col(idCol).as("id"), col(urlCol),
      canonicalizeUrl(col(urlCol)).as("__u"))
    keyed.groupBy("__u")
      .agg(min(struct(col("id"), col(urlCol))).as("__w"))
      .select(col("__w.id").as(idCol), col(s"__w.$urlCol"),
        col("__u").as("canonical_url"))
  }

  /** Domain blocklist filter: drop rows whose registrable domain is in
    * `blocked` (broadcast — blocklists are curation-sized). Anti-join on
    * the derived domain; the corpus never reshuffles. */
  def filterBlockedDomains(df: org.apache.spark.sql.DataFrame, urlCol: String,
                           blocked: org.apache.spark.sql.DataFrame,
                           domainCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn("__dom", registrableDomain(col(urlCol)))
      .join(broadcast(blocked.select(lower(col(domainCol)).as("__dom"))),
        Seq("__dom"), "left_anti")
      .drop("__dom")
}
