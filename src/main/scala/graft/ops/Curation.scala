package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composite a training-data pipeline
  * runs over raw documents: drop near-duplicate losers (keep the lowest
  * doc_id of each dup pair), enforce a quality floor, attach language, and
  * report per-language corpus stats. Composes the dedup/quality/langid
  * operators; one extra anti-join and one aggregation on top of them. */
object Curation {

  /** At 100 TB set `useLsh = true` (bucket-bounded MinHash candidates) or
    * cap `maxDocFreq` (drop ubiquitous shingles) — the curated output is
    * identical up to LSH's documented false-negative rate because both
    * paths verify candidates with exact Jaccard at the same threshold. */
  def curate(docs: DataFrame, jaccardThreshold: Double = 0.8,
             qualityFloor: Double = 0.46, useLsh: Boolean = false,
             maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val quality = TextAnalysis.quality(docs).select("doc_id", "quality_score")
    val pairs =
      if (useLsh) Dedup.minhashLsh(docs, jaccardThreshold)
      else Dedup.ngramJaccard(docs, jaccardThreshold, maxDocFreq = maxDocFreq)
    val losers = pairs.select(col("id2").as("doc_id")).distinct()
    docs.select("doc_id", "lang")
      .join(quality, "doc_id")
      .join(losers, Seq("doc_id"), "left_anti")
      .filter(col("quality_score") >= qualityFloor)
  }

  /** Per-language stats of the curated corpus (decimal-exact mean). */
  def curationStats(docs: DataFrame): DataFrame =
    curate(docs)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_kept"),
        (sum(col("quality_score").cast("decimal(18,12)")).cast("double") / count(lit(1)))
          .as("mean_quality"),
        min("quality_score").as("min_quality"),
        max("quality_score").as("max_quality"))
      .orderBy("lang")

  /** The full training-corpus pipeline: near-dup removal + quality floor,
    * then the repetition cap, eval-set decontamination, and the
    * reproducible train split — the complete chain a corpus walks from raw
    * documents to train-ready, every stage oracle-checked on its own and
    * here in composition. All stages are per-row filters or key-bounded
    * anti-joins over ids, so the composite inherits each stage's scale
    * shape unchanged.
    *
    * Jaccard dedup and decontamination both consume shingle postings, so
    * the composite builds them ONCE under a shared scoped cache (the
    * `__eval` flag is a pure function of doc_id and is re-derived on the
    * postings) instead of paying two shingling passes — at 100 TB the
    * shingling scan is the dominant cost of both stages. */
  def trainReady(docs: DataFrame, jaccardThreshold: Double = 0.8,
                 qualityFloor: Double = 0.46, repetitionCap: Double = 0.1,
                 contaminationThreshold: Double = 0.5,
                 useLsh: Boolean = false): DataFrame = {
    val quality = TextAnalysis.quality(docs).select("doc_id", "quality_score")
    val rep = TextAnalysis.repetition(docs).select("doc_id", "top_bigram_frac")
    Dedup.withScopedCache(Dedup.postings(docs, n = 3)) { tok =>
      // useLsh swaps the quadratic-within-posting-list exact pair join for
      // banded MinHash candidates + exact verify — same threshold, same
      // shared postings, output identical up to LSH's documented
      // false-negative rate; the 100 TB default. The exact path instead
      // derives BOTH drop verdicts (Jaccard losers + contaminated train
      // docs) from ONE postings self-join — the Jaccard pair stream
      // already contains every train×eval pair, so the decontamination
      // join was a second enumeration of a subset of it
      // (Dedup.trainReadyDropSet; anti-joins only remove rows, so one
      // anti-join against the union set is row-identical to the two
      // sequential anti-joins it replaces).
      val dropped =
        if (useLsh) {
          val pairs = Dedup.minhashFrom(tok, jaccardThreshold)
          val losers = pairs.select(col("id2").as("doc_id")).distinct()
          val contaminated = Dedup.decontaminateFrom(
              tok.withColumn("__eval", Sampling.splitColumn(col("doc_id")) === "eval"),
              contaminationThreshold, Int.MaxValue)
            .select(col("train_id").as("doc_id")).distinct()
          losers.unionByName(contaminated).distinct()
        } else Dedup.trainReadyDropSet(tok, jaccardThreshold, contaminationThreshold)
      docs.select("doc_id", "lang")
        .join(quality, "doc_id")
        .filter(col("quality_score") >= qualityFloor)
        .filter(Sampling.splitColumn(col("doc_id")) === "train")
        // LEFT join: a doc too short to have a bigram (one word) has no
        // repetition row — that's vacuously unrepetitive, not a drop
        .join(rep, Seq("doc_id"), "left")
        .filter(coalesce(col("top_bigram_frac"), lit(0.0)) <= repetitionCap)
        .join(dropped, Seq("doc_id"), "left_anti")
    }
  }

  /** Per-source post-curation token budget: what a training run will
    * actually READ — documents and whitespace tokens surviving the full
    * train-ready chain, per source. The capstone number a data lead asks
    * of a corpus ("how many tokens survive cleaning, and from where") —
    * trainReadyStats censuses quality by language; this prices the
    * budget by source. One join back to the corpus projection + one
    * aggregate past the chain. */
  def tokenBudget(docs: DataFrame): DataFrame =
    trainReady(docs).select("doc_id")
      .join(docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_kept"), sum("n_tokens").as("n_tokens_kept"))

  /** Per-language census of the train-ready corpus. */
  def trainReadyStats(docs: DataFrame): DataFrame =
    trainReady(docs)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("quality_score").cast("decimal(18,12)")).cast("double") / count(lit(1)))
          .as("mean_quality"))
      .orderBy("lang")

  private val UrlTlds = Seq("com", "org", "net", "io", "edu")

  /** Deterministic per-doc URL — the fixture carries no URL column, so
    * the census derives one as a pure function of (doc_id, source):
    * scheme, an id-cycled optional `www.` subdomain, a source+id-bucket
    * registered name, an id-cycled TLD, and an id path. Every digit of
    * the construction is engine-portable string arithmetic, so the
    * DuckDB oracle rebuilds the identical URL and the extraction below
    * is tested against a real (if synthetic) URL string, not against
    * the construction's parts. */
  def docUrl(docId: Column, source: Column): Column =
    // pmod, not %: a negative doc_id must cycle, not drive element_at to
    // index 0/negative at runtime (the gzip/WARC builders' MTIME rule)
    concat(lit("https://"),
      when(pmod(docId, lit(3)) === 0, lit("www.")).otherwise(lit("")),
      source, lit("-"), pmod(docId, lit(100)).cast("string"), lit("."),
      element_at(array(UrlTlds.map(lit): _*), pmod(docId, lit(5)).cast("int") + 1),
      lit("/doc/"), docId.cast("string"))

  /** Host between `://` and the first `/` — the extraction reads the
    * URL STRING, never the construction. */
  private def hostOf(url: Column): Column =
    element_at(split(element_at(split(url, "://"), 2), "/"), 1)

  /** Registered domain: host with a leading `www.` stripped. */
  private def domainOf(host: Column): Column =
    when(host.startsWith("www."), substring(host, 5, Int.MaxValue))
      .otherwise(host)

  private def withDomain(docs: DataFrame): DataFrame =
    docs.withColumn("__domain",
      domainOf(hostOf(docUrl(col("doc_id"), col("source")))))

  /** C4-style URL-hygiene census: per registered domain, the TLD and
    * the document/char volume — the frame a corpus owner reads before
    * writing a blocklist (C4 dropped whole domains off a curated list;
    * the census is the evidence that list is written from). One derive
    * + one aggregate over the corpus scan; domains are unbounded in
    * general but aggregate keys, never driver state. */
  def domainCensus(docs: DataFrame): DataFrame =
    withDomain(docs)
      .select(col("__domain").as("domain"),
        element_at(split(col("__domain"), "\\."), -1).as("tld"),
        col("n_chars"))
      .groupBy("domain", "tld")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("n_chars"))

  /** Domains a training corpus refuses regardless of content quality —
    * the literal-list member every C4-shaped pipeline carries. Spread
    * across sources and TLDs so the gate's census has every branch
    * non-trivial at the tested SFs. */
  val DefaultDomainBlocklist: Seq[String] =
    Seq("src0-7.net", "src1-13.io", "src2-21.org", "src3-34.edu")

  /** Broadcast-blocklist anti-join gate: KEEP documents whose
    * registered domain is not blocklisted, preserving every input
    * column — the output frame feeds [[trainReady]] (or any other
    * stage) unchanged, which is the composition the gate exists for.
    * The blocklist is bounded by construction (a curated list), so the
    * anti-join is a broadcast, never a shuffle. */
  def domainGate(docs: DataFrame,
                 blocklist: Seq[String] = DefaultDomainBlocklist): DataFrame = {
    require(blocklist.nonEmpty, "domainGate: empty blocklist gates nothing")
    val spark = docs.sparkSession
    import spark.implicits._
    withDomain(docs)
      .join(broadcast(blocklist.toDF("__domain")), Seq("__domain"), "left_anti")
      .drop("__domain")
  }

  /** Tokens a training corpus refuses documents for regardless of
    * source — the C4 "badwords" literal-list member beside the domain
    * blocklist. One token live on the fixture corpus (`dup`, ~5% of
    * docs) and two dead, so both gate branches stay non-trivial. */
  val DefaultTokenBlocklist: Seq[String] =
    Seq("dup", "spamword", "badtoken")

  /** C4-style token blocklist gate: KEEP documents containing NO
    * blocklisted token, by exact whitespace-token match (the C4 rule —
    * substring matching over-blocks: a blocked "ass" must not take
    * "class" down with it). The list is a plan-time literal array, so
    * the gate is a pure per-row `arrays_overlap` filter — scan speed,
    * no join, no shuffle, nothing broadcast at runtime. Preserves every
    * input column (the [[domainGate]] composition contract). */
  def tokenGate(docs: DataFrame,
                blocked: Seq[String] = DefaultTokenBlocklist): DataFrame = {
    require(blocked.nonEmpty, "tokenGate: empty blocklist gates nothing")
    docs.filter(col("text").isNotNull &&
      !arrays_overlap(split(col("text"), " "),
        array(blocked.map(lit): _*)))
  }

  /** The token gate's census twin: per source, total vs blocked vs
    * kept document counts (null-text docs count as blocked — they
    * can't certify themselves clean). */
  def tokenGatedStats(docs: DataFrame,
                      blocked: Seq[String] = DefaultTokenBlocklist): DataFrame = {
    require(blocked.nonEmpty, "tokenGatedStats: empty blocklist gates nothing")
    val hit = when(col("text").isNull, lit(true))
      .otherwise(arrays_overlap(split(col("text"), " "),
        array(blocked.map(lit): _*)))
    docs
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(hit, 1L).otherwise(0L)).as("n_blocked"),
        sum(when(hit, 0L).otherwise(1L)).as("n_kept"))
  }

  /** Multi-label public suffixes the naive "last dot label" TLD rule
    * breaks on — the bounded curated-list shape (the real public
    * suffix list is ~9k entries, still broadcast-sized; these are the
    * canonical cases). None is a suffix of another, so match order
    * cannot change a result, but the extraction still sorts longest-
    * first as the PSL algorithm specifies. */
  val DefaultPublicSuffixes: Seq[String] =
    Seq("co.uk", "ac.uk", "gov.uk", "com.au", "co.jp")

  /** PSL-aware registered domain of a host: the label immediately left
    * of the longest matching public suffix, plus the suffix — so
    * `cdn.news.bbc.co.uk` → `bbc.co.uk` where the last-label rule
    * would call the TLD `uk` and [[domainOf]]'s www-strip would keep
    * the whole host. Hosts under a single-label TLD fall back to the
    * last two labels (a bare one-label host maps to itself).
    * Subdomain depth never matters — labels are taken from the RIGHT,
    * so www/cdn/anything drop without a strip list. Plan-time literal
    * suffixes: a pure per-row CASE chain, no join, no shuffle. */
  def registeredDomain(host: Column,
                       suffixes: Seq[String] = DefaultPublicSuffixes): Column = {
    val labels = split(host, "\\.")
    val fallback = when(size(labels) >= 2,
      concat(element_at(labels, -2), lit("."), element_at(labels, -1)))
      .otherwise(host)
    val arms = suffixes.sortBy(s => -s.length).map { sfx =>
      val cut = length(host) - lit(sfx.length + 1)
      when(host.endsWith("." + sfx),
        concat(element_at(split(host.substr(lit(1), cut), "\\."), -1),
          lit("." + sfx)))
    }
    coalesce(arms :+ fallback: _*)
  }

  /** The public suffix the census keys on beside the domain: the
    * longest matching multi-label suffix, else the last label. */
  def publicSuffixOf(host: Column,
                     suffixes: Seq[String] = DefaultPublicSuffixes): Column =
    coalesce(suffixes.sortBy(s => -s.length).map(sfx =>
      when(host.endsWith("." + sfx), lit(sfx))) :+
      element_at(split(host, "\\."), -1): _*)

  /** [[docUrl]]'s PSL sibling: TLD cycle includes multi-label suffixes
    * and an id-cycled extra `cdn.` subdomain, so the suffix-aware
    * extraction has every branch live (www-strip, deep subdomain,
    * multi-label and single-label suffixes). Same engine-portable
    * string arithmetic. */
  private val PslTlds = Seq("com", "co.uk", "org", "com.au", "io")

  def docUrlPsl(docId: Column, source: Column): Column =
    concat(lit("https://"),
      when(pmod(docId, lit(3)) === 0, lit("www.")).otherwise(lit("")),
      when(pmod(docId, lit(7)) === 0, lit("cdn.")).otherwise(lit("")),
      source, lit("-"), pmod(docId, lit(100)).cast("string"), lit("."),
      element_at(array(PslTlds.map(lit): _*), pmod(docId, lit(5)).cast("int") + 1),
      lit("/doc/"), docId.cast("string"))

  /** PSL-aware URL-hygiene census: per (registered domain, public
    * suffix), document/char volume — [[domainCensus]] with the
    * extraction that survives real URLs (`foo.co.uk` is one
    * registrant's domain, not everything under `.uk`). Same shape:
    * one derive + one aggregate, domains are aggregate keys. */
  def domainCensusPsl(docs: DataFrame): DataFrame = {
    val host = hostOf(docUrlPsl(col("doc_id"), col("source")))
    docs
      .select(registeredDomain(host).as("domain"),
        publicSuffixOf(host).as("suffix"), col("n_chars"))
      .groupBy("domain", "suffix")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("long").as("n_chars"))
  }

  /** [[docUrl]] with doc_id-cycled WIRE NOISE layered on — the mess a
    * crawl frontier actually holds for one logical resource, applied
    * to the URL STRING (the extraction discipline, never the
    * construction's parts): class = pmod(doc_id, 6): 0 clean,
    * 1 uppercased scheme+host (case-insensitive per RFC 3986 §6.2.2.1),
    * 2 explicit default port :443, 3 tracking params bracketing a KEPT
    * param (utm_source, ref, utm_campaign — the scrub must be
    * selective, not drop-the-query), 4 a fragment, 5 a trailing slash.
    * Every class is engine-portable string/regex arithmetic. */
  def messyUrl(docId: Column, source: Column): Column = {
    val base = docUrl(docId, source)
    val cls = pmod(docId, lit(6))
    when(cls === 1, concat(
      upper(regexp_extract(base, "^(https://[^/]*)", 1)),
      regexp_replace(base, "^https://[^/]*", "")))
      .when(cls === 2, regexp_replace(base, "^(https://[^/]*)", "$1:443"))
      .when(cls === 3, concat(base,
        lit("?utm_source=feed&ref=r1&utm_campaign=c9")))
      .when(cls === 4, concat(base, lit("#section-5")))
      .when(cls === 5, concat(base, lit("/")))
      .otherwise(base)
  }

  /** Crawl-frontier URL canonicalization — the normalization a fetch
    * queue applies before dedup (RFC 3986 §6 + the tracking-param
    * scrub): strip the fragment, lowercase scheme+host, drop the
    * scheme-default port, remove utm_ / gclid / fbclid params while
    * KEEPING the rest of the query (separators re-tidied), and strip
    * one trailing slash (empty path ≡ root). Pure per-row regex at
    * scan speed; every pattern is RE2-safe (no lookaround, no
    * backreference in the PATTERN) so the DuckDB oracle replays the
    * identical steps. The tracking scrub is ORDER-INDEPENDENT: each
    * match consumes its LEADING separator and ends exactly where the
    * next candidate's separator begins, so one global pass clears a
    * run of ANY length of `&`-led trackers (non-overlapping matches
    * chain); the one tracker a global pass cannot reach — directly
    * after the `?` — is handled by two single-match anchored passes
    * (promote the next kept param, or drop a sole trailing tracker). */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val lowHost = concat(
      lower(regexp_extract(noFrag, "^([A-Za-z]+://[^/?]*)", 1)),
      regexp_replace(noFrag, "^[A-Za-z]+://[^/?]*", ""))
    val noPort = regexp_replace(
      regexp_replace(lowHost, "^(https://[^/?:]*):443([/?]|$)", "$1$2"),
      "^(http://[^/?:]*):80([/?]|$)", "$1$2")
    val trackAmp = "&(utm_[a-z]+|gclid|fbclid)=[^&#]*"
    val trackQMid = "\\?(utm_[a-z]+|gclid|fbclid)=[^&#]*&"
    val trackQEnd = "\\?(utm_[a-z]+|gclid|fbclid)=[^&#]*$"
    val noTrack = regexp_replace(
      regexp_replace(regexp_replace(noPort, trackAmp, ""), trackQMid, "?"),
      trackQEnd, "")
    regexp_replace(noTrack, "([^/])/$", "$1")
  }

  /** The frontier frame: per doc, the CLEAN form and the messy wire
    * form of the same resource, each with its canonicalization — the
    * input a fetch-dedup pass runs on. */
  def urlFrontier(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array(
        docUrl(col("doc_id"), col("source")),
        messyUrl(col("doc_id"), col("source")))).as("url_raw"))
      .withColumn("url_canonical", canonicalUrl(col("url_raw")))

  /** Frontier dedup census: how many wire URLs collapse after
    * canonicalization — fetch volume saved before a byte is
    * downloaded. One aggregate over the canonical key (unbounded in
    * general, aggregate keys only — never driver state). A kept query
    * param is a DIFFERENT resource (class 3 does not collapse):
    * canonicalization must never merge what it cannot prove equal. */
  def urlDedupCensus(frontier: DataFrame): DataFrame =
    frontier
      .groupBy(col("url_canonical"))
      .agg(count(lit(1)).as("n_raw"))
      .agg(
        sum(col("n_raw")).as("n_urls"),
        count(lit(1)).as("n_canonical"),
        sum(col("n_raw") - 1).as("n_merged"))

  /** Cohen's kappa between two curation gates — the REDUNDANCY
    * diagnostic a pipeline owner reads before stacking filters: high
    * agreement beyond chance means the second gate mostly re-rejects
    * what the first already caught. Gate A is the Gopher minimum-length
    * rule (≥ 40 whitespace tokens); gate B is the repetition cap in its
    * EXACT integer form (10 · top bigram count ≤ bigram count — the
    * trainReady 0.1 cap cross-multiplied, so no double ever compares;
    * a doc too short for a bigram passes vacuously, the trainReady
    * rule). kappa = (n·agree − ap·bp − an·bn) / (n² − ap·bp − an·bn):
    * every term an exact integer (decimal(38,0) products so a
    * trillion-doc corpus cannot overflow), ONE double division at the
    * end; a degenerate table (pe = 1: both gates constant) yields null
    * rather than 0/0. One corpus scan + one bigram aggregate + one
    * two-row-safe summary — scan-shaped at any scale. */
  def gateKappa(docs: DataFrame): DataFrame = {
    val ws = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val topBigram = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), posexplode(col("w")).as(Seq("p", "t")))
      .withColumn("nx", lead("t", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("p")))
      .filter(col("nx").isNotNull)
      .groupBy(col("doc_id"), concat_ws(" ", col("t"), col("nx")).as("b"))
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max("c").as("top_bc"), sum("c").as("n_bigrams"))
    val gated = ws.join(topBigram, Seq("doc_id"), "left")
      .select(
        when(col("n_tokens") >= 40L, 1L).otherwise(0L).as("a"),
        when(coalesce(col("top_bc") * 10 <= col("n_bigrams"), lit(true)), 1L)
          .otherwise(0L).as("b"))
    val d38 = "decimal(38,0)"
    gated.agg(
      count(lit(1)).as("n_docs"),
      sum(col("a")).as("a_pos"),
      sum(col("b")).as("b_pos"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"))
      .select(col("n_docs"), col("a_pos"), col("b_pos"), col("n_agree"),
        (col("n_docs").cast(d38) * col("n_agree")
          - col("a_pos").cast(d38) * col("b_pos")
          - (col("n_docs") - col("a_pos")).cast(d38) * (col("n_docs") - col("b_pos")))
          .as("__num"),
        (col("n_docs").cast(d38) * col("n_docs")
          - col("a_pos").cast(d38) * col("b_pos")
          - (col("n_docs") - col("a_pos")).cast(d38) * (col("n_docs") - col("b_pos")))
          .as("__den"))
      .select(col("n_docs"), col("a_pos"), col("b_pos"), col("n_agree"),
        when(col("__den") =!= 0,
          col("__num").cast("double") / col("__den").cast("double"))
          .as("kappa"))
  }

  // ---------------------------------------------------------------------
  // Robots/politeness gate — the crawl frontier's OTHER mandatory
  // filter (RFC 9309), completing canonicalUrl → url_dedup → robots:
  // parse per-domain robots.txt into a rule table (user-agent groups,
  // Allow/Disallow path prefixes), then gate candidate URLs by
  // longest-prefix-wins with Allow breaking ties. Pure string/prefix
  // arithmetic end to end — RE2-safe, engine-portable — so the DuckDB
  // oracle replays parse, grouping, and precedence verbatim.
  // ---------------------------------------------------------------------

  /** Deterministic per-domain robots.txt — the fixture carries no
    * crawl metadata, so the corpus derives one as a pure function of
    * the registered domain (the docUrl discipline): three classes by
    * length(domain) % 3 keep every gate branch live — (0) a
    * bot-specific group that beats the catch-all, with an empty
    * Disallow (matches nothing per RFC) and a comment line; (1) a
    * block-all with a longest-prefix re-allow and a deeper re-block;
    * (2) two user-agent lines SHARING one group (the RFC grouping
    * rule) plus an equal-length Allow/Disallow tie. */
  def robotsTxtOf(domain: Column): Column = {
    val cls = pmod(length(domain), lit(3))
    // the Sitemap directive (the discovery handshake every production
    // crawler reads first) appears top-of-file in class 0 and
    // end-of-file in class 2 — position-independent per the protocol —
    // and is ABSENT in class 1, the convention-fallback branch
    when(cls === 0, concat(lit("Sitemap: https://"), domain,
      lit("/sitemap-index.xml\n" +
        "# catch-all stands down; the bot group rules\n" +
        "User-agent: *\nDisallow:\n\n" +
        "User-agent: graftbot\nDisallow: /doc\nAllow: /doc/1\n" +
        "Crawl-delay: 2\n")))
      .when(cls === 1, lit("User-agent: *\nDisallow: /\n" +
        "Allow: /doc\nDisallow: /doc/13\nCrawl-delay: 1\n"))
      .otherwise(concat(lit("User-agent: graftbot\nUser-agent: otherbot\n" +
        "Allow: /doc/2\nDisallow: /doc/2\nDisallow: /doc/3\n\n" +
        "User-agent: *\nDisallow: /\n" +
        "Sitemap: https://"), domain, lit("/sitemap-index.xml\n")))
  }

  /** One robots.txt row per registered domain in the corpus.
    * Checkpointed EAGERLY: the frame is domain-grain (a bounded
    * dimension) but derives from a corpus scan + distinct, and every
    * consumer fans out into several subtrees (rules + agents + delays
    * + sitemap lines) whose differing projections defeat exchange
    * reuse — without the checkpoint text_robots_crawl_time's plan
    * re-ran the corpus scan 12 times (12 parquet scans / 46 window
    * nodes at sf0.001; 4 scans / 8 windows after). */
  def robotsTable(docs: DataFrame): DataFrame =
    withDomain(docs).select(col("__domain").as("domain")).distinct()
      .withColumn("robots_txt", robotsTxtOf(col("domain")))
      .localCheckpoint()

  /** robots.txt → rule table (domain, agent, rule, prefix, line_no):
    * lines split and comment-stripped; `User-agent:` / `Allow:` /
    * `Disallow:` recognized case-insensitively (RFC 9309 §2.1), values
    * trimmed; CONSECUTIVE user-agent lines share the group they start
    * (the boundary is a ua line whose predecessor is not one — one lag
    * + running sum per domain), and each group's rules fan out to each
    * of its agents. Empty-pattern rules match nothing per the RFC and
    * are dropped at parse. Rules before any user-agent line belong to
    * no group and vanish in the agent join. Windows are per-domain —
    * a robots.txt is a bounded file, never corpus-grain. */
  /** The shared line parse + grouping both rule families read:
    * (domain, grp, line_no, kind, value) with kind one of ua / allow /
    * disallow / delay. Crawl-delay participates in GROUPING (a rule
    * line between user-agent lines ends the header block per RFC 9309
    * section 2.1 -- dropping it from the parse would wrongly merge the
    * surrounding groups) even though [[robotsRules]] does not emit
    * it. */
  /** Comment-stripped trimmed lines, (domain, line_no, ln) — shared by
    * the group parser and the group-independent Sitemap directive. */
  private def robotsLines(robots: DataFrame): DataFrame =
    robots.select(col("domain"),
      posexplode(split(col("robots_txt"), "\n")).as(Seq("line_no", "raw")))
      .select(col("domain"), col("line_no").cast("long").as("line_no"),
        trim(regexp_replace(col("raw"), "#.*", "")).as("ln"))

  private def robotsGrouped(robots: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = robotsLines(robots)
    val typed = lines.select(col("domain"), col("line_no"),
      when(lower(col("ln")).startsWith("user-agent:"), "ua")
        .when(lower(col("ln")).startsWith("allow:"), "allow")
        .when(lower(col("ln")).startsWith("disallow:"), "disallow")
        .when(lower(col("ln")).startsWith("crawl-delay:"), "delay")
        .as("kind"),
      trim(expr("substring(ln, instr(ln, ':') + 1)")).as("value"))
      .filter(col("kind").isNotNull)
    val w = Window.partitionBy("domain").orderBy("line_no")
    typed
      .withColumn("boundary",
        when(col("kind") === "ua" &&
          coalesce(lag("kind", 1).over(w), lit("-")) =!= "ua", 1L)
          .otherwise(0L))
      .withColumn("grp", sum("boundary").over(w))
  }

  /** Per-group agents: the user-agent lines, lowercased. */
  private def robotsAgents(grouped: DataFrame): DataFrame =
    grouped.filter(col("kind") === "ua")
      .select(col("domain"), col("grp"), lower(col("value")).as("agent"))

  def robotsRules(robots: DataFrame): DataFrame = {
    val grouped = robotsGrouped(robots)
    val rules = grouped
      .filter(col("kind").isin("allow", "disallow") && length(col("value")) > 0)
      .select(col("domain"), col("grp"), col("kind").as("rule"),
        col("value").as("prefix"), col("line_no"))
    // rules-per-domain is file-bounded; every gate consumer reads the
    // frame at least twice (exact-agent filter + the star/anti pair),
    // so materialize the tiny table once instead of re-parsing
    robotsAgents(grouped).join(rules, Seq("domain", "grp"))
      .select("domain", "agent", "rule", "prefix", "line_no")
      .localCheckpoint()
  }

  /** The politeness half the path rules don't carry: per (domain,
    * agent) the Crawl-delay seconds -- not in RFC 9309 but honored by
    * every production crawler, and the number that actually prices a
    * fetch plan. Non-numeric values are dropped (the real-crawler
    * behavior); a group with several delay lines serves the MINIMUM
    * (conservative, deterministic). */
  def robotsDelays(robots: DataFrame): DataFrame = {
    val grouped = robotsGrouped(robots)
    val delays = grouped
      .filter(col("kind") === "delay" && col("value").rlike("^[0-9]+$"))
      .select(col("domain"), col("grp"),
        col("value").cast("long").as("delay_s"))
    // (domain, agent)-grain dimension read twice by every delay
    // coalesce (exact-agent + star branches) — materialize once
    robotsAgents(grouped).join(delays, Seq("domain", "grp"))
      .groupBy("domain", "agent")
      .agg(min("delay_s").as("delay_s"))
      .localCheckpoint()
  }

  /** The `Sitemap:` directives a robots.txt advertises — the discovery
    * handshake a production crawler reads FIRST: group-INDEPENDENT per
    * the protocol (a sitemap line neither joins nor terminates a
    * user-agent group — it is untyped to the group parser), position-
    * independent (the fixture plants one top-of-file and one
    * end-of-file), field name case-insensitive, value trimmed, empty
    * values dropped. (domain, line_no, sitemap_url). */
  def robotsSitemaps(robots: DataFrame): DataFrame =
    robotsLines(robots)
      .filter(lower(col("ln")).startsWith("sitemap:"))
      .select(col("domain"), col("line_no"),
        trim(expr("substring(ln, instr(ln, ':') + 1)")).as("sitemap_url"))
      .filter(length(col("sitemap_url")) > 0)

  /** The robots → sitemap discovery handshake, per domain: how many
    * Sitemap directives the domain's robots.txt advertises, how many
    * RESOLVE against the sitemap index actually serving the domain
    * (exact URL match on the conventional `/sitemap-index.xml`
    * location the index table publishes), and how many chunk files
    * the resolved index fans out to — zero directives is the
    * convention-fallback branch a crawler must also survive. Bounded
    * dimensions end to end: directives and index rows are
    * domain-grain. */
  def robotsSitemapCensus(docs: DataFrame, cap: Int = 50000): DataFrame =
    // the index table serves two readers (URL resolution + chunk
    // count) — one scoped-cached build
    Dedup.withScopedCache(sitemapIndexTable(docs, cap)) { it =>
      robotsSitemapCensusFrom(it, docs)
    }

  private def robotsSitemapCensusFrom(indexTable: DataFrame,
                                      docs: DataFrame): DataFrame = {
    val dirs = robotsSitemaps(robotsTable(docs))
    val idx = indexTable
      .select(col("domain"),
        concat(lit("https://"), col("domain"), lit("/sitemap-index.xml"))
          .as("index_url"))
    val chunks = sitemapIndexEntries(indexTable)
      .groupBy("domain").agg(count(lit(1)).as("n_chunks"))
    withDomain(docs).select(col("__domain").as("domain")).distinct()
      .join(dirs.join(idx, Seq("domain"), "left")
        .groupBy("domain")
        .agg(count(lit(1)).as("n_directives"),
          sum(when(col("sitemap_url") === col("index_url"), 1L)
            .otherwise(0L)).as("n_resolved")),
        Seq("domain"), "left")
      .join(chunks, Seq("domain"), "left")
      .select(col("domain"),
        coalesce(col("n_directives"), lit(0L)).as("n_directives"),
        coalesce(col("n_resolved"), lit(0L)).as("n_resolved"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"))
  }

  /** The fetch-time budget a POLITE serial crawler pays per domain:
    * allowed-URL count (from [[robotsGate]]) x the effective delay for
    * the agent (exact-agent group's delay if one exists, else the `*`
    * group's, else the 1-second default every polite crawler ships) --
    * the number that decides how many crawler slots a domain needs.
    * Delay tables are (domain, agent)-bounded dimensions -> broadcast
    * joins; the census stays at domain grain (aggregate keys). */
  def robotsCrawlTime(docs: DataFrame, agent: String = "graftbot"): DataFrame =
    withEffectiveDelay(
      robotsGate(docs, agent)
        .groupBy("domain")
        .agg(sum(when(col("allowed"), 1L).otherwise(0L)).as("n_allowed")),
      docs, agent)
      .select(col("domain"), col("n_allowed"), col("delay_s"))
      .withColumn("est_serial_s", col("n_allowed") * col("delay_s"))

  /** Append the effective Crawl-delay to a domain-keyed frame: the
    * exact-agent group's delay if one exists, else the `*` group's,
    * else the 1-second polite default — the coalesce
    * [[robotsCrawlTime]] and [[sitemapFrontier]] share. Delay tables
    * are (domain, agent)-bounded dimensions → broadcast joins. */
  private def withEffectiveDelay(perDomain: DataFrame, docs: DataFrame,
                                 agent: String): DataFrame = {
    val delays = robotsDelays(robotsTable(docs))
    val agentD = delays.filter(col("agent") === lit(agent.toLowerCase))
      .select(col("domain"), col("delay_s").as("__d_agent"))
    val starD = delays.filter(col("agent") === "*")
      .select(col("domain"), col("delay_s").as("__d_star"))
    perDomain
      .join(broadcast(agentD), Seq("domain"), "left")
      .join(broadcast(starD), Seq("domain"), "left")
      .withColumn("delay_s",
        coalesce(col("__d_agent"), col("__d_star"), lit(1L)))
      .drop("__d_agent", "__d_star")
  }

  /** The candidate frame the gate runs on: per doc its canonical URL,
    * registered domain, and path (empty path reads as "/", RFC 9309's
    * normalization). */
  private def robotsCandidates(docs: DataFrame): DataFrame =
    withDomain(docs).select(col("doc_id"), col("__domain").as("domain"),
      docUrl(col("doc_id"), col("source")).as("url"))
      .withColumn("path", {
        val p = regexp_replace(col("url"), "^[A-Za-z]+://[^/?]*", "")
        when(length(p) === 0, lit("/")).otherwise(p)
      })

  /** RFC 9309 verdicts, one row per doc: the group is the EXACT agent
    * match when the domain defines one, else the `*` group (most-
    * specific user-agent wins); among matching rules the LONGEST
    * prefix wins and Allow beats Disallow on a length tie ('allow' <
    * 'disallow' makes the rule-ascending sort exactly that tie rule);
    * no matching rule means allowed. Emits (doc_id, domain, path,
    * rule, prefix, allowed). Plan shape: the rule table is
    * domain-keyed and bounded per domain, so the candidate×rule join
    * is an equi-join with bounded fan-out; the verdict pick is a
    * window at doc grain (partitioned); unmatched docs come back via
    * one left join. */
  def robotsGate(docs: DataFrame, agent: String = "graftbot"): DataFrame =
    // the doc-grain candidate frame (domain extraction + URL + path
    // normalization per doc) feeds both the verdict join and the
    // totality left join with different projections, so the scan was
    // re-run per consumer — scope-cache the one derivation
    Dedup.withScopedCache(robotsCandidates(docs)) { urls =>
      val best = gateVerdict(urls, robotsRules(robotsTable(docs)), agent,
        keyCols = Seq("doc_id"))
      urls.join(best, Seq("doc_id"), "left")
        .select(col("doc_id"), col("domain"), col("path"),
          col("rule"), col("prefix"),
          (col("rule").isNull || col("rule") === "allow").as("allowed"))
    }

  /** The RFC 9309 precedence engine behind [[robotsGate]] (the
    * frontier census fuses the same precedence into its one-pass left
    * join — same window, same tie order): for a candidate frame carrying
    * (`keyCols`…, domain, path), the winning rule per key — exact-agent
    * group beats `*`, longest prefix wins, Allow beats Disallow on
    * equal length (the rule-ascending sort), line order last. Emits
    * (keyCols…, rule, prefix); keys with no matching rule are absent
    * (the caller's left join reads that as allowed). The rule table is
    * domain-keyed and bounded per domain (a robots.txt is a file), so
    * the candidate×rule join has bounded fan-out and the verdict
    * window is partitioned at key grain — never corpus-global. */
  private def gateVerdict(cands: DataFrame, rules: DataFrame,
                          agent: String, keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agentRules = rules.filter(col("agent") === lit(agent.toLowerCase))
    val applicable = agentRules.unionByName(
      rules.filter(col("agent") === "*")
        .join(agentRules.select("domain").distinct(), Seq("domain"), "left_anti"))
    cands.join(applicable, Seq("domain"))
      .filter(expr("substring(path, 1, length(prefix)) = prefix"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(length(col("prefix")).desc, col("rule"), col("line_no"))))
      .filter(col("rk") === 1)
      .select(keyCols.map(col) :+ col("rule") :+ col("prefix"): _*)
  }

  /** The gate's census twin, composing with the curation chain the
    * [[domainGate]] way: per source, how many documents (and
    * whitespace tokens) the politeness gate would actually let a
    * crawler fetch — the budget a corpus owner reads before pointing
    * the fleet at a frontier. One gate + one join back to the corpus
    * projection + one aggregate. */
  def robotsBudget(docs: DataFrame, agent: String = "graftbot"): DataFrame =
    robotsGate(docs, agent)
      .join(docs.select(col("doc_id"), col("source"),
        coalesce(size(split(col("text"), " ")).cast("long"), lit(0L))
          .as("n_tokens")), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("allowed"), 1L).otherwise(0L)).as("n_allowed"),
        sum(when(col("allowed"), col("n_tokens")).otherwise(0L))
          .as("n_tokens_allowed"))

  // ---------------------------------------------------------------------
  // Sitemap seam — the crawl frontier's DISCOVERY channel (the
  // sitemaps.org protocol), completing robots' may-I-fetch with
  // sitemap's what-is-there: build per-domain TWO-LEVEL sitemaps (a
  // sitemapindex over urlset chunks, each capped at the protocol's
  // 50,000-URL file bound), parse them back by string arithmetic both
  // engines share, and census the frontier a polite crawler would
  // actually fetch. The protocol cap is what makes the per-file
  // aggregation scale-safe: a chunk's collect is ≤cap rows BY
  // CONSTRUCTION, never corpus-grain, and a 10M-URL domain is 200
  // bounded files, not one unbounded one.
  // ---------------------------------------------------------------------

  private val SitemapUrlsetHeader =
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"
  private val SitemapIndexHeader =
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"

  /** The URL list a domain's sitemap advertises: every corpus URL of
    * the domain (ordered by doc_id — the deterministic listing order)
    * plus two DISCOVERED-ONLY URLs per domain the corpus does not
    * contain (sort keys −1/−2, so they land in chunk 0 under any cap),
    * keeping the frontier census's new-URL branch live — a real
    * sitemap's whole point is listing pages the crawler has not seen.
    * `/doc/new-1` and `/private/new-2` split across the robots fixture
    * classes (class 0 blocks the first and allows the second; class 1
    * the reverse; class 2 allows both), so gate×discovery composition
    * is exercised in every branch. */
  private def sitemapUrls(docs: DataFrame): DataFrame = {
    val corpus = withDomain(docs).select(
      col("__domain").as("domain"),
      col("doc_id").as("ord"),
      docUrl(col("doc_id"), col("source")).as("loc"))
    val extras = withDomain(docs).select(col("__domain").as("domain"))
      .distinct()
      .select(col("domain"), explode(array(
        struct(lit(-1L).as("ord"),
          concat(lit("https://"), col("domain"), lit("/doc/new-1")).as("loc")),
        struct(lit(-2L).as("ord"),
          concat(lit("https://"), col("domain"), lit("/private/new-2")).as("loc"))))
        .as("e"))
      .select(col("domain"), col("e.ord").as("ord"), col("e.loc").as("loc"))
    corpus.unionByName(extras)
  }

  /** One `<url>` element: loc always; lastmod (a date cycled off the
    * sort key) omitted when ord ≡ 0 (mod 4) and priority (one decimal
    * digit, built as a STRING so both engines parse the identical
    * literal) omitted when ord ≡ 1 (mod 4) — both optional per the
    * protocol, and the omission branches keep the parser's null paths
    * live. pmod, not %: the discovered rows carry negative sort keys. */
  private def sitemapUrlBlock(ord: Column, loc: Column): Column =
    concat(lit("<url><loc>"), loc, lit("</loc>"),
      when(pmod(ord, lit(4)) === 0, lit(""))
        .otherwise(concat(lit("<lastmod>"),
          date_format(date_add(to_date(lit("2020-01-01")),
            pmod(ord, lit(365)).cast("int")), "yyyy-MM-dd"),
          lit("</lastmod>"))),
      when(pmod(ord, lit(4)) === 1, lit(""))
        .otherwise(concat(lit("<priority>0."),
          pmod(ord, lit(10)).cast("string"), lit("</priority>"))),
      lit("</url>"))

  /** The urlset chunk files, (domain, chunk_no, xml): URLs in listing
    * order, `cap` per file (the protocol bound — `require`d, because
    * the bound is exactly what makes the per-chunk collect safe), each
    * chunk one well-formed urlset document. The sort inside each chunk
    * is by the ≤cap-element collected array, not a corpus sort. */
  def sitemapChunks(docs: DataFrame, cap: Int = 50000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cap >= 1 && cap <= 50000,
      s"sitemapChunks: cap must be within the protocol's 1..50000 file bound, got $cap")
    val w = Window.partitionBy("domain").orderBy("ord")
    sitemapUrls(docs)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("chunk_no", expr(s"CAST((rn - 1) DIV $cap AS BIGINT)"))
      .withColumn("blk", sitemapUrlBlock(col("ord"), col("loc")))
      .groupBy("domain", "chunk_no")
      .agg(concat(lit(SitemapUrlsetHeader),
        array_join(expr("transform(array_sort(collect_list(struct(ord, blk))), x -> x.blk)"), ""),
        lit("</urlset>")).as("xml"))
  }

  /** The sitemapindex file, (domain, xml): one `<sitemap><loc>` per
    * chunk at the conventional `/sitemap-<n>.xml` location. The
    * per-domain collect is the CHUNK list — corpus URLs ÷ cap, bounded
    * small by construction. */
  def sitemapIndexTable(docs: DataFrame, cap: Int = 50000): DataFrame =
    indexFromChunks(sitemapChunks(docs, cap))

  /** The index derived from an already-built chunk table — shared so
    * [[sitemapEntries]] can build the chunk XML ONCE behind a scoped
    * cache and serve both the index and the chunk fetch from it. */
  private def indexFromChunks(chunks: DataFrame): DataFrame =
    chunks
      .groupBy("domain")
      .agg(sort_array(collect_list(col("chunk_no"))).as("__chunks"))
      .select(col("domain"), concat(lit(SitemapIndexHeader),
        array_join(transform(col("__chunks"), c =>
          concat(lit("<sitemap><loc>https://"), col("domain"),
            lit("/sitemap-"), c.cast("string"),
            lit(".xml</loc></sitemap>"))), ""),
        lit("</sitemapindex>")).as("xml"))

  /** Parse a sitemapindex: (domain, chunk_loc, chunk_no) from each
    * `<sitemap>` block. The parse reads the XML STRING (non-greedy
    * block regexes, RE2-safe in both engines), never the
    * construction. */
  def sitemapIndexEntries(index: DataFrame): DataFrame =
    index.select(col("domain"),
      // `(?:\s[^>]*)?` tolerates attributed tags from third-party
      // builders while never matching the <sitemapindex> wrapper
      explode(expr(
        "regexp_extract_all(xml, '(?s)<sitemap(?:\\\\s[^>]*)?>(.*?)</sitemap>', 1)"))
        .as("blk"))
      .select(col("domain"),
        regexp_extract(col("blk"), "<loc>([^<]*)</loc>", 1).as("chunk_loc"))
      .withColumn("chunk_no",
        regexp_extract(col("chunk_loc"), "sitemap-([0-9]+)\\.xml$", 1)
          .cast("long"))

  /** Walk index → chunks → entries: the index's chunk locs resolve
    * against the chunk table (the equi-join IS the fetch — in
    * production the join target is the fetched file body, here the
    * builder's table stands in, the robotsTable discipline), then each
    * urlset parses to (domain, chunk_no, loc, lastmod, priority) with
    * the optional fields NULL when absent. Entry grain ≈ corpus grain;
    * every step is an equi-join or a per-row regex. */
  def sitemapEntriesFrom(index: DataFrame, chunks: DataFrame): DataFrame = {
    def opt(c: Column): Column = when(length(c) === 0, lit(null)).otherwise(c)
    sitemapIndexEntries(index)
      .join(chunks, Seq("domain", "chunk_no"))
      .select(col("domain"), col("chunk_no"),
        // attribute-tolerant, and `<url` + `(?:\s…)?` never matches the
        // <urlset> wrapper (its next char is neither \s nor >)
        explode(expr(
          "regexp_extract_all(xml, '(?s)<url(?:\\\\s[^>]*)?>(.*?)</url>', 1)"))
          .as("blk"))
      .select(col("domain"), col("chunk_no"),
        regexp_extract(col("blk"), "<loc>([^<]*)</loc>", 1).as("loc"),
        opt(regexp_extract(col("blk"), "<lastmod>([^<]*)</lastmod>", 1))
          .as("lastmod"),
        opt(regexp_extract(col("blk"), "<priority>([^<]*)</priority>", 1))
          .cast("double").as("priority"))
  }

  /** Build + walk composed over the corpus fixture — the registered
    * face. The chunk table (per-domain collect + window) is scoped-
    * cached so the index and the chunk fetch read ONE build instead of
    * re-running the XML assembly per reference. */
  def sitemapEntries(docs: DataFrame, cap: Int = 50000): DataFrame =
    Dedup.withScopedCache(sitemapChunks(docs, cap)) { c =>
      sitemapEntriesFrom(indexFromChunks(c), c)
    }

  /** The frontier seed census, per domain: how much the sitemap
    * advertises (n_listed), how much the crawler already has
    * (n_in_corpus, by exact canonical-URL match), how much is NEW, how
    * much of the new a POLITE crawler may actually fetch (n_fetchable
    * = new ∧ robots-allowed, the [[gateVerdict]] precedence on the
    * listed URL's path), and what fetching it costs serially
    * (n_fetchable × the effective Crawl-delay). This is the number a
    * crawl scheduler reads per domain before assigning fleet slots —
    * discovery, dedup, politeness, and budget in ONE domain-grain
    * frame. Plan shape: entry-grain equi-joins (corpus-URL match,
    * rule verdict), one aggregate at domain grain, two broadcast delay
    * joins. */
  def sitemapFrontier(docs: DataFrame, agent: String = "graftbot",
                      cap: Int = 50000): DataFrame =
    // the census reads the entry frame twice (verdict candidates + the
    // corpus/new join); both references parse from the ONE chunk cache
    // inside sitemapEntries — measured faster than also caching the
    // corpus-grain entry frame itself (the extra materialization costs
    // more than the duplicated per-row regex parse it saves)
    sitemapFrontierFrom(sitemapEntries(docs, cap), docs, agent)

  private def sitemapFrontierFrom(entries: DataFrame, docs: DataFrame,
                                  agent: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rules = robotsRules(robotsTable(docs))
    val agentRules = rules.filter(col("agent") === lit(agent.toLowerCase))
    val applicable = agentRules.unionByName(
      rules.filter(col("agent") === "*")
        .join(agentRules.select("domain").distinct(), Seq("domain"), "left_anti"))
    // ONE pass over the entry frame: the prefix match rides the LEFT
    // join condition (unmatched entries keep exactly one null-rule row
    // = allowed, so no separate verdict frame and no re-join), the
    // best rule is the same (longest prefix, Allow on ties, line
    // order) window at (domain, loc) grain
    val cands = entries.withColumn("path", {
      val p = regexp_replace(col("loc"), "^[A-Za-z]+://[^/?]*", "")
      when(length(p) === 0, lit("/")).otherwise(p)
    })
    val corpusUrls = withDomain(docs)
      .select(col("__domain").as("domain"),
        docUrl(col("doc_id"), col("source")).as("loc"))
      .distinct()
      .withColumn("__have", lit(1L))
    val census = cands
      .join(applicable,
        cands("domain") === applicable("domain") &&
          expr("substring(path, 1, length(prefix)) = prefix"), "left")
      .drop(applicable("domain"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("domain", "loc")
          .orderBy(length(col("prefix")).desc_nulls_last,
            col("rule").asc_nulls_last, col("line_no").asc_nulls_last)))
      .filter(col("rk") === 1)
      .join(corpusUrls, Seq("domain", "loc"), "left")
      .withColumn("__new", when(col("__have").isNull, 1L).otherwise(0L))
      .withColumn("__ok",
        when(col("rule").isNull || col("rule") === "allow", 1L).otherwise(0L))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_listed"),
        sum(lit(1L) - col("__new")).as("n_in_corpus"),
        sum(col("__new")).as("n_new"),
        sum(col("__new") * col("__ok")).as("n_fetchable"))
    withEffectiveDelay(census, docs, agent)
      .select(col("domain"), col("n_listed"), col("n_in_corpus"),
        col("n_new"), col("n_fetchable"), col("delay_s"),
        (col("n_fetchable") * col("delay_s")).as("est_fetch_s"))
  }

  /** The gate's census twin: per source, total vs blocked vs kept
    * document counts — the number a data lead checks before accepting
    * a blocklist's cost. Same derive, one broadcast left join, one
    * aggregate. */
  def domainGatedStats(docs: DataFrame,
                       blocklist: Seq[String] = DefaultDomainBlocklist): DataFrame = {
    require(blocklist.nonEmpty, "domainGatedStats: empty blocklist gates nothing")
    val spark = docs.sparkSession
    import spark.implicits._
    // distinct: a caller-supplied list with a repeated domain must not
    // fan the left join out and inflate the census (left_anti is immune,
    // a plain left join is not)
    val bl = broadcast(blocklist.distinct.toDF("__domain")
      .withColumn("__blocked", lit(1L)))
    withDomain(docs)
      .join(bl, Seq("__domain"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("__blocked"), lit(0L))).as("n_blocked"),
        (count(lit(1)) - sum(coalesce(col("__blocked"), lit(0L)))).as("n_kept"))
  }
}
