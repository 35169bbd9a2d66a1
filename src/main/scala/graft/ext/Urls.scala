package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL / domain analytics: web-corpus pipelines (CCNet, RefinedWeb,
  * Dolma) key nearly every curation decision on the URL — dedup by
  * normalized URL, quality priors and caps by registered domain,
  * blocklists by host. The corpus tables carry no URL column, so the
  * queries PLANT one as a deterministic function of (source, lang,
  * doc_id) — the oracle predicts every parsed field analytically, so
  * only a correct parse of the constructed string can match
  * (the repo's planted-contract style).
  *
  * Scale shape: parsing is pure column algebra over built-ins
  * (`parse_url`, `regexp_replace`, higher-order `filter`) — map-only,
  * codegen'd, no UDFs. The per-domain aggregation and cap shuffle on
  * the domain key; real web domains are Zipf-distributed, so at
  * 100 TB the cap's window would ride on AQE skew handling (see
  * [[Skew]]) or a two-phase count-then-rank — here domains are
  * uniform by construction and a single hash partitioning suffices.
  */
object Urls {

  /** Planted URL: `https://[www.]{source}-{doc_id%5}.example.com/
    * {lang}[/sub]/{doc_id}[?session=abc]` — www on every 7th id, an
    * extra path segment on every 3rd, a query string on every 5th.
    * Pure column concat (codegen'd). */
  def plantedUrlCol(sourceCol: Column, langCol: Column, idCol: Column): Column =
    concat(
      lit("https://"),
      when(idCol % 7 === 0, lit("www.")).otherwise(lit("")),
      lower(sourceCol), lit("-"), (idCol % 5).cast("string"),
      lit(".example.com/"),
      langCol, lit("/"),
      when(idCol % 3 === 0, lit("sub/")).otherwise(lit("")),
      idCol.cast("string"),
      when(idCol % 5 === 0, lit("?session=abc")).otherwise(lit("")))

  /** Host part of the URL (Spark's native `parse_url`). */
  def hostCol(urlCol: Column): Column = parse_url(urlCol, lit("HOST"))

  /** Registered domain under the simplified public-suffix rule "strip
    * a leading www." — the grouping key for per-domain curation. (A
    * production system swaps in the real PSL table as a broadcast
    * join; the algebra downstream is identical.) */
  def domainCol(urlCol: Column): Column =
    regexp_replace(hostCol(urlCol), "^www\\.", "")

  /** Count of non-empty path segments — `/en/sub/42` → 3. */
  def pathDepthCol(urlCol: Column): Column =
    size(filter(split(parse_url(urlCol, lit("PATH")), "/"),
      x => x =!= ""))

  /** Whether the URL carries a query string. */
  def hasQueryCol(urlCol: Column): Column =
    parse_url(urlCol, lit("QUERY")).isNotNull

  /** Per-document parse of the planted URL — the map-only projection
    * a URL-keyed pipeline starts from. */
  def urlParse(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      plantedUrlCol(col("source"), col("lang"), col("doc_id")).as("url"))
      .select(
        col("doc_id"),
        col("url"),
        domainCol(col("url")).as("domain"),
        pathDepthCol(col("url")).as("path_depth"),
        hasQueryCol(col("url")).as("has_query"))

  /** Domain cap — the RefinedWeb/C4 anti-spam policy: keep at most
    * `k` documents per registered domain, preferring longer documents
    * (rank by `n_chars` DESC, `doc_id` ASC as the deterministic
    * tie-break). One shuffle on the domain key; emits the kept docs
    * with their rank and the domain's total count (so the caller can
    * see how much the cap removed). */
  def domainCap(docs: DataFrame, k: Int): DataFrame = {
    val withDomain = docs.select(
      col("doc_id"), col("n_chars"),
      domainCol(plantedUrlCol(col("source"), col("lang"), col("doc_id")))
        .as("domain"))
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    withDomain
      .withColumn("rk", row_number().over(w))
      .withColumn("domain_docs",
        count(lit(1)).over(Window.partitionBy(col("domain"))))
      .where(col("rk") <= k)
      .select(col("domain"), col("doc_id"),
        col("rk").cast("int").as("rk"),
        col("domain_docs").cast("long").as("domain_docs"))
  }

  // ---- canonicalization ---------------------------------------------
  // Web-corpus URL dedup keys on a CANONICAL form — the same resource
  // reached through case noise, default ports, tracking params,
  // fragments, or trailing slashes must collapse to one key (the
  // RefinedWeb/CCNet "URL dedup" step). The rules here are the common
  // core: lowercase scheme+host, strip the scheme's default port, drop
  // the fragment, drop tracking params (utm_*, fbclid, gclid), sort the
  // surviving params, strip trailing path slashes. Pure column algebra
  // over `parse_url` — map-only, codegen'd.

  private def baseHostCol(sourceCol: Column, idCol: Column): Column =
    concat(
      when(idCol % 7 === 0, lit("www.")).otherwise(lit("")),
      lower(sourceCol), lit("-"), (idCol % 5).cast("string"),
      lit(".example.com"))

  private def basePathCol(langCol: Column, idCol: Column): Column =
    concat(lit("/"), langCol, lit("/"),
      when(idCol % 3 === 0, lit("sub/")).otherwise(lit("")),
      idCol.cast("string"))

  /** Two deterministically-messy spellings of the SAME resource, used
    * by the canonicalization contract: variant 1 mixes case/port/slash/
    * tracking noise by id arithmetic; variant 2 applies a DIFFERENT
    * noise pattern (always-upper host, always :443, always a fragment,
    * reordered params, utm-only query). canonicalizeUrl must collapse
    * both onto one string. */
  def messyUrlCol(variant: Int)(sourceCol: Column, langCol: Column,
                                idCol: Column): Column = {
    val host = baseHostCol(sourceCol, idCol)
    val path = basePathCol(langCol, idCol)
    variant match {
      case 1 => concat(
        when(idCol % 2 === 0, lit("HTTPS")).otherwise(lit("https")),
        lit("://"),
        when(idCol % 4 === 0, upper(host)).otherwise(host),
        when(idCol % 6 === 0, lit(":443")).otherwise(lit("")),
        path,
        when(idCol % 9 === 0, lit("/")).otherwise(lit("")),
        when(idCol % 5 === 0, lit("?utm_source=feed&b=2&a=1"))
          .when(idCol % 5 === 1, lit("?a=1&utm_campaign=x"))
          .otherwise(lit("")),
        when(idCol % 8 === 0, lit("#sec2")).otherwise(lit("")))
      case 2 => concat(
        lit("https://"), upper(host), lit(":443"), path, lit("/"),
        when(idCol % 5 === 0, lit("?b=2&utm_medium=email&a=1"))
          .when(idCol % 5 === 1, lit("?utm_source=x&a=1"))
          .otherwise(lit("?utm_only=1")),
        lit("#frag"))
      case v => throw new IllegalArgumentException(s"variant $v")
    }
  }

  /** Canonical URL form (the dedup key). Non-default ports survive;
    * the root path canonicalizes to empty (https://h/ == https://h). */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    val host = lower(parse_url(url, lit("HOST")))
    val authority = parse_url(url, lit("AUTHORITY"))
    val port = regexp_extract(authority, ":([0-9]+)$", 1)
    val defaultPort =
      when(scheme === "https", lit("443"))
        .when(scheme === "http", lit("80"))
        .otherwise(lit(""))
    val portPart = when(port =!= "" && port =!= defaultPort,
      concat(lit(":"), port)).otherwise(lit(""))
    val path = coalesce(parse_url(url, lit("PATH")), lit(""))
    val pathC = regexp_replace(path, "/+$", "")
    val query = coalesce(parse_url(url, lit("QUERY")), lit(""))
    val params = filter(split(query, "&"), p =>
      p =!= "" &&
        !startswith(p, lit("utm_")) &&
        !startswith(p, lit("fbclid=")) &&
        !startswith(p, lit("gclid=")))
    val qs = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&")))
      .otherwise(lit(""))
    concat(scheme, lit("://"), host, portPart, pathC, qs)
  }

  // ---- domain blocklist (the UT1-style gate) ------------------------
  // RefinedWeb/C4 run a domain blocklist (Université Toulouse 1's UT1
  // list in the published recipes) as the FIRST curation stage: any
  // document whose registrable domain appears on the list is dropped
  // before dedup ever sees it. The list is model-sized, driver-held,
  // and BROADCAST — the probe side never shuffles for it.

  /** Planted blocklist — three registrable domains that exist in the
    * planted URL space at every SF (mirrored verbatim into the
    * oracles; a production system swaps in the real UT1 table). */
  val BlockedDomains: Seq[String] =
    Seq("src0-0.example.com", "src7-3.example.com", "src12-1.example.com")

  /** The blocklist's SQL IN-list, generated from [[BlockedDomains]]
    * so both engines share one source of truth. */
  def blockedDomainsSql: String =
    BlockedDomains.map(d => s"'$d'").mkString("(", ", ", ")")

  /** Blocklist join key of a (possibly messy) URL: lowercase host
    * minus a leading `www.` — messy-case hosts and www/apex spellings
    * of one registrable domain must hit the same list entry. */
  def blockKeyCol(urlCol: Column): Column =
    regexp_replace(lower(hostCol(urlCol)), "^www\\.", "")

  /** The blocklist as a 1-column broadcastable relation. */
  def blocklistDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    BlockedDomains.toDF("bdom")
  }

  /** Per-document blocklist verdict over the planted URL — map-only
    * except the broadcast-hash lookup against the 3-row list. */
  def domainBlock(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    docs.select(col("doc_id"),
        blockKeyCol(plantedUrlCol(col("source"), col("lang"), col("doc_id")))
          .as("domain"))
      .join(broadcast(blocklistDf(spark).withColumn("b", lit(true))),
        col("domain") === col("bdom"), "left")
      .select(col("doc_id"), col("domain"),
        coalesce(col("b"), lit(false)).as("blocked"))
  }

  /** The canonicalization contract query body: both messy spellings of
    * every document's URL must canonicalize to the same string (and the
    * result is predicted analytically by the oracle). */
  def urlCanon(docs: DataFrame): DataFrame = {
    val src = col("source"); val lang = col("lang"); val id = col("doc_id")
    docs.select(
      id.as("doc_id"),
      canonicalizeUrl(messyUrlCol(1)(src, lang, id)).as("url_canon"),
      (canonicalizeUrl(messyUrlCol(1)(src, lang, id)) ===
        canonicalizeUrl(messyUrlCol(2)(src, lang, id))).as("collapse_ok"))
  }
}
