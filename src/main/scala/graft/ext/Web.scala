package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus curation primitives (north-star extensions, SURVEY.md §7.5):
  * URL canonicalization — the key under which every web-scale pipeline
  * (Common Crawl dedup, refetch scheduling, domain mixing) collapses
  * crawl variants of the same resource before any content-level dedup
  * runs. Pure built-in-function column algebra: regexp extraction + array
  * HOFs, whole-stage-codegen friendly, no UDF, no network.
  */
object Web {

  /** Canonical form of an absolute http(s) URL:
    *   - scheme and host lowercased; a leading `www.` label dropped;
    *     userinfo (`user:pass@`) dropped (never resource identity, and a
    *     credential must not leak into a dedup key); bracketed IPv6
    *     hosts parse atomically
    *   - default ports stripped (`:443` under https, `:80` under http);
    *     any other explicit port kept
    *   - path kept case-SENSITIVE (paths are), trailing slashes stripped,
    *     empty path rendered as `/`
    *   - query parameters: tracking params (`utm_*`) dropped, empty
    *     fragments dropped, the rest sorted bytewise and re-joined — the
    *     order-insensitive form (`?b=2&a=1` ≡ `?a=1&b=2`)
    *   - the `#fragment` removed (never sent to the server)
    *
    * Bytewise param sort on purpose: Spark's `sort_array` and any SQL
    * engine's binary string order agree, so the canonical form is
    * engine-portable. Non-URL input (no `scheme://`) canonicalizes to
    * NULL rather than garbage — gate upstream.
    */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport0 = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    // userinfo ("user:pass@host") is dropped — it is never part of the
    // resource identity and leaking credentials into a dedup key would be
    // worse than wrong
    val hostport = regexp_replace(hostport0, "^[^@]*@", "")
    // bracketed IPv6 ("[::1]:8080") parses atomically: the host keeps its
    // brackets, the port comes after "]:"; bare colons inside the
    // brackets never reach the port regex
    val bracket = regexp_extract(hostport, "^(\\[[^\\]]*\\])", 1)
    val host = when(bracket =!= "", bracket)
      .otherwise(regexp_replace(regexp_extract(hostport, "^([^:]*)", 1), "^www\\.", ""))
    val port = when(bracket =!= "", regexp_extract(hostport, "^\\[[^\\]]*\\]:([0-9]+)$", 1))
      .otherwise(regexp_extract(hostport, ":([0-9]+)$", 1))
    val keepPort = (port =!= "") &&
      !(scheme === "https" && port === "443") &&
      !(scheme === "http" && port === "80")
    // a port remainder that is not all digits is a malformed authority
    // ("site.com:8a0"): canonicalize to NULL like other non-URL input —
    // silently dropping it would collapse an invalid URL onto a valid
    // one's dedup key
    val malformedPort = when(
      bracket =!= "",
      !hostport.rlike("^\\[[^\\]]*\\](:[0-9]+)?$"))
      .otherwise(hostport.contains(":") && !hostport.rlike("^[^:]*:[0-9]+$"))
    val rawPath = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val stripped = regexp_replace(rawPath, "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    // the query is extracted AFTER the fragment is cut: a '?' that first
    // appears inside the fragment ("…/p#x?y=1") is fragment content, not
    // a query, and must not leak into the canonical form
    val query = regexp_extract(regexp_extract(url, "^[^#]*", 0), "\\?([^#]*)", 1)
    val kept = sort_array(
      filter(split(query, "&"), p => (p =!= "") && !p.rlike("^utm_")))
    val qs = when(size(kept) > 0, concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
    when(
      scheme === "" || host === "" || malformedPort,
      lit(null).cast("string")
    ).otherwise(
      concat(
        scheme,
        lit("://"),
        host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path,
        qs))
  }

  /** Registrable-domain heuristic: the last two host labels
    * (`a.b.site.com` → `site.com`). A deliberate approximation — the real
    * rule needs the Public Suffix List (an external artifact, out of
    * engine scope); two labels is the deterministic engine-side default
    * and callers with a PSL join it as a dimension table instead.
    */
  def domainOf(host: Column): Column = {
    val labels = split(host, "\\.")
    // IP-literal hosts (dotted-quad or bracketed IPv6) have no registrable
    // domain — they come back unchanged, never truncated to "last two
    // octets"
    when(host.rlike("^\\[") || host.rlike("^[0-9.]+$"), host)
      .otherwise(
        when(size(labels) >= 2,
          concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
          .otherwise(host))
  }

  /** PSL-backed registrable domain: for each row's host, the label
    * immediately left of the LONGEST matching public suffix from `psl` —
    * the exact rule the two-label [[domainOf]] heuristic approximates, so
    * `a.b.co.uk` groups under `b.co.uk` instead of the wrong `co.uk`.
    *
    * `psl` is a one-column (`suffix`) dimension table — the Public Suffix
    * List is an external artifact, so it enters the engine the way every
    * external vocabulary does: as data, not code. Wildcard (`*.ck`) and
    * exception (`!www.ck`) records are a preprocessing concern on that
    * table (expand them against the observed TLDs before loading);
    * the engine-side rule is plain longest-suffix match.
    *
    * Per row: hosts equal to a public suffix (nothing registrable) and
    * IP literals come back NULL; hosts whose TLD the list does not know
    * fall back to the two-label heuristic; everything else gets
    * suffix + one label. `idCol` must be a unique row key — the
    * longest-match election groups on it.
    *
    * Scale shape: candidate suffixes explode map-side (bounded by the
    * host's label count, ≤ 127 by hostname syntax, ~4 in practice), the
    * PSL join is a broadcast of a few-thousand-row dimension, and the
    * longest-match election is one partial-agg'd max on the row key —
    * no shuffle wider than the input.
    */
  def registrableDomains(
      df: DataFrame,
      idCol: Column,
      hostCol: Column,
      psl: DataFrame
  ): DataFrame = {
    val base = df
      .select(idCol.as("id"), lower(hostCol).as("host"))
      .withColumn("__ls", split(col("host"), "\\."))
    val cand = base
      .select(
        col("id"),
        posexplode(
          transform(
            sequence(lit(1), size(col("__ls"))),
            i => array_join(slice(col("__ls"), -i, i), "."))))
      .select(col("id"), (col("pos") + 1).as("n_sfx"), col("col").as("cand"))
    val best = cand
      .join(broadcast(psl.select(lower(col("suffix")).as("cand"))), Seq("cand"))
      .groupBy(col("id"))
      .agg(max(col("n_sfx")).as("ns"))
    base
      .join(best, Seq("id"), "left")
      .select(
        col("id"),
        col("host"),
        when(
          col("host").rlike("^\\[") || col("host").rlike("^[0-9.]+$"),
          lit(null).cast("string"))
          .otherwise(
            when(
              col("ns").isNull,
              // TLD unknown to the list: the deterministic two-label
              // heuristic, the documented fallback
              when(
                size(col("__ls")) >= 2,
                concat_ws(".", element_at(col("__ls"), -2), element_at(col("__ls"), -1)))
                .otherwise(col("host")))
              // the host IS a public suffix: nothing is registrable
              .when(size(col("__ls")) <= col("ns"), lit(null).cast("string"))
              .otherwise(
                array_join(slice(col("__ls"), -(col("ns") + 1), col("ns") + 1), ".")))
          .as("domain"))
  }

  /** Per-URL canonicalization + URL-level dedup in one pass: every input
    * row comes back with its canonical URL, registrable domain, and the
    * canonical group's survivor (minimum id) — the "collapse crawl
    * variants" step that precedes content-level dedup.
    *
    * Scale shape: normalization is map-only; the survivor election is one
    * min-window over the canonical-URL key (partial-agg-friendly,
    * AQE-splittable — hot keys are exactly the over-crawled URLs and
    * split fine because the state is one min).
    */
  def urlDedup(df: DataFrame, idCol: Column, urlCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hostport = regexp_replace(
      lower(regexp_extract(urlCol, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
      "^[^@]*@", "")
    val bracket = regexp_extract(hostport, "^(\\[[^\\]]*\\])", 1)
    val host = when(bracket =!= "", bracket)
      .otherwise(regexp_replace(regexp_extract(hostport, "^([^:]*)", 1), "^www\\.", ""))
    df.select(
        idCol.as("id"),
        normalizeUrl(urlCol).as("url_norm"),
        when(host === "", lit(null).cast("string")).otherwise(domainOf(host)).as("domain"))
      .withColumn(
        "canonical_id",
        // NULL url_norm (non-URL input) gets no survivor, not a shared
        // null-group election — the engine-parity rule for null keys
        when(
          col("url_norm").isNotNull,
          min(col("id")).over(Window.partitionBy(col("url_norm")))))
  }
}
