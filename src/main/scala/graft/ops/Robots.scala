package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robots Exclusion Protocol (RFC 9309) evaluation for crawl curation —
  * the fetch-policy gate next to [[Urls]]' blocklist: given each host's
  * robots.txt body, decide which candidate URLs a compliant pipeline may
  * keep. Scope: the WILDCARD agent group (`User-agent: *`) with literal
  * path-prefix rules — the original REP. RFC 9309's `*`/`$` wildcard
  * patterns inside rule paths are NOT interpreted (a prefix containing
  * `*` simply fails to literal-match); documented, and the common case
  * for corpus filtering where conservative over-drop is acceptable.
  *
  * Scale: parsing is line explode + ONE per-host window (bounded by a
  * robots file's line count — the d10-island accepted window class,
  * never keyless) + a group rollup; rule tables are hosts-sized, tiny
  * next to the URL corpus, so the decision join hash-partitions on host
  * (or broadcasts when the rule table fits) and the per-URL best-rule
  * pick is a map-side-combined max-struct aggregate, not a window over
  * URLs. All arithmetic is integer/string — exact on any engine.
  */
object Robots {

  /** Parse robots.txt bodies into wildcard-group rules:
    * (host, allow: int 0/1, prefix). Group semantics per RFC 9309 §2.2:
    * consecutive `User-agent` lines open ONE group whose rules run until
    * the next `User-agent` line that follows a rule line; a group
    * governs `*` if any of its agent lines is `*`. Empty rule paths
    * (`Disallow:` = allow everything) contribute no rule. Comments
    * (`#...`) and unknown directives are ignored. */
  def parseRules(df: DataFrame, hostCol: String, bodyCol: String): DataFrame = {
    val lines = df.select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\r?\n")).as(Seq("idx", "__raw")))
      .select(col("host"), col("idx"),
        trim(regexp_replace(col("__raw"), "#.*$", "")).as("__line"))
      .select(col("host"), col("idx"),
        lower(trim(regexp_extract(col("__line"),
          "^([A-Za-z-]+)\\s*:", 1))).as("__key"),
        trim(regexp_extract(col("__line"), "^[A-Za-z-]+\\s*:(.*)$", 1))
          .as("__val"))
      .filter(col("__key").isin("user-agent", "allow", "disallow"))
    // group id = running count of user-agent lines that START a group
    // (ua line NOT preceded by another ua line); per-host window,
    // bounded by the robots file's length
    val w = Window.partitionBy("host").orderBy("idx")
    val grouped = lines
      .withColumn("__ua", (col("__key") === "user-agent").cast("int"))
      .withColumn("__newg",
        (col("__ua") === 1 &&
          coalesce(lag("__ua", 1).over(w), lit(0)) === 0).cast("int"))
      .withColumn("__g", sum("__newg").over(w))
    val starGroups = grouped.filter(col("__ua") === 1)
      .groupBy("host", "__g")
      .agg(max((col("__val") === "*").cast("int")).as("__star"))
      .filter(col("__star") === 1).drop("__star")
    grouped.filter(col("__ua") === 0 && col("__val") =!= "")
      .join(starGroups, Seq("host", "__g"))
      .select(col("host"), (col("__key") === "allow").cast("int").as("allow"),
        col("__val").as("prefix"))
      .distinct()
  }

  /** Decide each candidate URL against parsed rules: longest matching
    * prefix wins; on equal length Allow beats Disallow (RFC 9309 §2.4.2);
    * no matching rule (or no rules for the host) means allowed.
    * Returns the input plus (host, path, allowed: boolean).
    *
    * The best-rule pick is ONE max-struct aggregate keyed by URL — the
    * argmax shape, no per-URL window; matching is `startswith` on the
    * rules join, fan-out bounded by the host's rule count. */
  def isAllowed(urls: DataFrame, urlCol: String, rules: DataFrame): DataFrame = {
    val withPath = urls
      .withColumn("host", Urls.urlHost(col(urlCol)))
      .withColumn("path",
        when(regexp_extract(col(urlCol), "^[a-z]+://[^/?#]+(/[^?#]*)", 1) === "",
          lit("/"))
          .otherwise(regexp_extract(col(urlCol), "^[a-z]+://[^/?#]+(/[^?#]*)", 1)))
    val best = withPath.select(col(urlCol), col("host"), col("path"))
      .join(rules, "host")
      .filter(col("path").startsWith(col("prefix")))
      .groupBy(urlCol)
      .agg(max(struct(length(col("prefix")).as("l"), col("allow").as("a")))
        .as("__best"))
      .select(col(urlCol), (col("__best.a") === 1).as("__allowed"))
    withPath.join(best, Seq(urlCol), "left")
      .withColumn("allowed", coalesce(col("__allowed"), lit(true)))
      .drop("__allowed")
  }
}
