package graft.ml

import graft.GQuery
import graft.functions.NfcNormalizeExpr.nfcNative
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-cleaning operators for the ingestion edge of a training-data
  * pipeline: cross-document line deduplication (the CCNet/RefinedWeb
  * boilerplate pass), HTML stripping, URL/domain extraction with a
  * blocklist, and Unicode NFC canonicalization. The scan-side pieces are
  * pure codegen'd expression chains; the one genuinely distributed op
  * (line dedup) is an aggregate + anti-join shaped so the shuffled rows
  * are 8-byte hashes, not text.
  *
  * The synthetic corpus is clean single-line text, so — exactly like
  * q_redact — each gate plants the dirt it cleans as a pure function of
  * (doc_id, source), rebuilt identically in the DuckDB oracle, and
  * asserts the full pipeline end to end.
  */
object CleanOps {

  // ---- cross-document line dedup -----------------------------------------
  // Remove every line that appears in >= minDf distinct documents (CCNet's
  // paragraph-hash dedup: navigation chrome, cookie banners, footers
  // repeat across a crawl; body text doesn't). Plan shape at 100 TB:
  //   1. explode lines, hash each to 8 bytes (xxhash64) — map-side only;
  //   2. groupBy hash with countDistinct(doc) — partial aggregation means
  //      a boilerplate line repeated 1e9 times ships one row per input
  //      partition, not 1e9 rows, so heavy-hitter skew never reaches the
  //      shuffle;
  //   3. the df >= minDf survivors form the BOILERPLATE CATALOG — small by
  //      construction (it's the set of distinct repeated lines), so the
  //      left_anti join against it is AQE-broadcastable; unique lines
  //      never ship anywhere;
  //   4. regroup kept lines per doc (one shuffle on doc_id, the same key
  //      the scan is usually already bucketed by) and reassemble in
  //      original order via array_sort over (idx, line) structs.
  // Hashing trades an astronomically small false-drop probability (64-bit
  // collision between a unique line and a boilerplate line) for never
  // shuffling line text; the exact variant groups the string itself.
  def lineDedup(lines: DataFrame, minDf: Long): DataFrame = {
    val withH = lines.withColumn("h", xxhash64(col("line")))
    val boiler = withH.groupBy("h")
      .agg(countDistinct("doc_id").as("line_df"))
      .filter(col("line_df") >= minDf)
      .select("h")
    withH.join(boiler, Seq("h"), "left_anti")
  }

  private val qLineDedup = GQuery(
    "q_line_dedup",
    (s, d) => {
      val docs = documents(s, d)
      // three lines per doc: body text (may repeat — the corpus has exact
      // dups), a per-source footer (repeats across the source's docs), a
      // per-doc note (never repeats)
      val synth = concat_ws("\n",
        col("text"),
        concat(lit("subscribe to "), col("source"), lit(" newsletter")),
        concat(lit("unique note "), col("doc_id")))
      val lines = docs
        .select(col("doc_id"), posexplode(split(synth, "\n")).as(Seq("idx", "line")))
      val kept = lineDedup(lines, minDf = 2L)
      val rebuilt = kept.groupBy("doc_id")
        .agg(
          concat_ws("\n",
            transform(array_sort(collect_list(struct(col("idx"), col("line")))),
              x => x.getField("line"))).as("clean_text"),
          count(lit(1)).as("n_kept"))
      docs.select("doc_id").join(rebuilt, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          coalesce(col("clean_text"), lit("")).as("clean_text"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (lit(3L) - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
    },
    Some("""WITH src AS (
              SELECT doc_id,
                     string_split(text || chr(10) ||
                                  'subscribe to ' || source || ' newsletter' || chr(10) ||
                                  'unique note ' || doc_id, chr(10)) AS ls
              FROM documents),
            lines AS (
              SELECT doc_id, generate_subscripts(ls, 1) AS idx, unnest(ls) AS line
              FROM src),
            boiler AS (
              SELECT line FROM lines GROUP BY line
              HAVING count(DISTINCT doc_id) >= 2),
            kept AS (
              SELECT l.doc_id, l.idx, l.line FROM lines l
              WHERE l.line NOT IN (SELECT line FROM boiler)),
            reb AS (
              SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS clean_text,
                     count(*) AS n_kept
              FROM kept GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(reb.clean_text, '') AS clean_text,
                   CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
                   CAST(3 - coalesce(reb.n_kept, 0) AS BIGINT) AS n_dropped
            FROM documents d LEFT JOIN reb USING (doc_id)"""))

  // ---- HTML boilerplate stripping ----------------------------------------
  // Strip script/style blocks, then tags, then unescape the core entities
  // (lt/gt first, amp LAST so '&amp;lt;' can't double-unescape), then
  // collapse whitespace. Pure regexp_replace chain — scan-speed inside
  // WholeStageCodegen at 100 TB, no shuffle.

  // Quote-aware tag body (r13 verdict #4): an attribute value may contain
  // '>' inside single or double quotes (onclick handlers, data-attrs,
  // query-string hrefs — real crawls hit this constantly); a bare [^>]+
  // truncates the tag match at that '>' and leaks the tag tail into the
  // cleaned corpus. Inside a tag, consume quoted runs whole. Both regex
  // dialects (Java here, RE2 in the DuckDB oracle) support the form.
  // Residual: an UNCLOSED quote inside a tag now fails the tag match and
  // leaves the '<...' text in place (the old regex ate to the first '>') —
  // the conservative direction for malformed markup.
  private val tagBody = """(?:[^>"']|"[^"]*"|'[^']*')"""
  private[graft] val tagRe = s"<$tagBody+>"
  private[graft] val scriptRe = s"(?is)<script$tagBody*>.*?</script>"
  private[graft] val styleRe = s"(?is)<style$tagBody*>.*?</style>"
  // the same patterns as DuckDB string literals (quotes doubled) — the
  // oracles interpolate THESE, so the two engines cannot drift
  private def sqlLit(re: String): String = re.replace("'", "''")
  private val sqlTagRe = sqlLit(tagRe)
  private val sqlScriptRe = sqlLit(scriptRe)
  private val sqlStyleRe = sqlLit(styleRe)

  /** Native byte-scan pipeline ([[graft.functions.TextCleanExprs]]), each
    * stage value-identical to the regexp_replace it replaces —
    * TextCleanExprsSpec pins every stage against java.util.regex on the
    * exact `scriptRe`/`styleRe`/`tagRe` patterns, and [[stripHtmlColumns]]
    * keeps the full regexp chain as the parity reference. The entity
    * unescapes are LITERAL patterns, so they become the (native) `replace`
    * builtin. Same composition, same residual semantics (unclosed quote
    * in a tag leaves the '<…' text in place), no regex engine and no
    * per-row UTF-16 decode at 100 TB.
    */
  def stripHtml(c: Column): Column = {
    import graft.functions.TextCleanExprs._
    // (?is) blocks first: real HTML has uppercase tags and multi-line
    // script bodies; stripping tags first would LEAK the JS/CSS body text
    val noBlocks = stripStyle(stripScript(c))
    // comments and CDATA are BLOCK strips too (r12 verdict): the tag pass
    // alone eats `<!--` only up to its first `>`, leaking the comment
    // body (nav boilerplate, conditional-IE markup) into the corpus
    val noMeta = stripCdata(stripComment(noBlocks))
    val noTags = stripTags(noMeta)
    // lt/gt first, amp LAST so '&amp;lt;' can't double-unescape
    val unesc = replace(
      replace(
        replace(noTags, lit("&lt;"), lit("<")),
        lit("&gt;"), lit(">")),
      lit("&amp;"), lit("&"))
    trim(wsCollapse(unesc))
  }

  /** The regexp_replace reference formulation of [[stripHtml]] (parity
    * pinned in TextCleanExprsSpec; the DuckDB oracles interpolate the same
    * pattern strings).
    */
  private[graft] def stripHtmlColumns(c: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(c, lit(scriptRe), lit("")),
      lit(styleRe), lit(""))
    val noMeta = regexp_replace(
      regexp_replace(noBlocks, lit("(?s)<!--.*?-->"), lit("")),
      lit("(?is)<!\\[CDATA\\[.*?\\]\\]>"), lit(""))
    val noTags = regexp_replace(noMeta, lit(tagRe), lit(" "))
    val unesc = regexp_replace(
      regexp_replace(
        regexp_replace(noTags, lit("&lt;"), lit("<")),
        lit("&gt;"), lit(">")),
      lit("&amp;"), lit("&"))
    trim(regexp_replace(unesc, lit("\\s+"), lit(" ")))
  }

  private val qHtmlStrip = GQuery(
    "q_html_strip",
    (s, d) => {
      // the <a> plants the quoted-attr dirt: '>' inside a double-quoted
      // title AND a single-quoted href — the tag must strip whole, keeping
      // only its "ref" text
      val synth = concat(
        lit("<html><head><style>p{color:red}</style><!-- nav: home | about | doc "),
        col("doc_id"),
        lit(" --></head><body><h1>Doc "),
        col("doc_id"),
        lit("</h1><a title=\"notes > ok\" href='/p?a=1&b=2'>ref</a>" +
          "<![CDATA[raw <markup> & bytes]]><p>"), col("text"),
        lit(" &amp; more &lt;tags&gt;</p><script>var x=1;</script></body></html>"))
      documents(s, d).select(
        col("doc_id"),
        stripHtml(synth).as("stripped"),
        graft.functions.TextCleanExprs.tagCount(synth).as("n_tags"))
    },
    Some(s"""SELECT doc_id,
                   trim(regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(
                             regexp_replace(
                               regexp_replace(
                                 regexp_replace(
                                   regexp_replace(synth, '$sqlScriptRe', '', 'g'),
                                   '$sqlStyleRe', '', 'g'),
                                 '(?s)<!--.*?-->', '', 'g'),
                               '(?is)<!\\[CDATA\\[.*?\\]\\]>', '', 'g'),
                             '$sqlTagRe', ' ', 'g'),
                           '&lt;', '<', 'g'),
                         '&gt;', '>', 'g'),
                       '&amp;', '&', 'g'),
                     '\\s+', ' ', 'g')) AS stripped,
                   CAST(len(regexp_extract_all(synth, '$sqlTagRe')) AS BIGINT) AS n_tags
            FROM (SELECT doc_id,
                         '<html><head><style>p{color:red}</style><!-- nav: home | about | doc ' ||
                         doc_id || ' --></head><body><h1>Doc ' ||
                         doc_id || '</h1><a title="notes > ok" href=''/p?a=1&b=2''>ref</a>' ||
                         '<![CDATA[raw <markup> & bytes]]><p>' || text ||
                         ' &amp; more &lt;tags&gt;</p><script>var x=1;</script></body></html>'
                           AS synth
                  FROM documents)"""))

  // ---- URL/domain extraction + blocklist ---------------------------------
  // Host via Spark's native parse_url, registered domain as the last two
  // labels, per-domain doc counts with a blocklist flag — the shape of
  // crawl-level domain filtering. One partial-aggregated shuffle on a key
  // whose cardinality is the number of registered domains (~1e7 for the
  // full web), trivially fine at 100 TB.
  private val blockedDomains = Seq("spamco.com", "spamco.org", "spamco.net")

  private val qUrlDomain = GQuery(
    "q_url_domain",
    (s, d) => {
      val sub = element_at(array(lit("www"), lit("api"), lit("cdn")),
        (col("doc_id") % 3 + 1).cast("int"))
      val name = element_at(array(lit("alpha"), lit("beta"), lit("gamma"), lit("spamco")),
        (col("doc_id") % 4 + 1).cast("int"))
      val tld = element_at(array(lit("com"), lit("org"), lit("net")),
        (col("doc_id") % 5 % 3 + 1).cast("int"))
      val url = concat(lit("https://"), sub, lit("."), name, lit("."), tld,
        lit("/p/"), col("doc_id"), lit("?ref=1"))
      documents(s, d)
        .select(col("doc_id"), parse_url(url, lit("HOST")).as("host"))
        .select(col("doc_id"),
          substring_index(col("host"), ".", -2).as("domain"),
          substring_index(col("host"), ".", -1).as("tld"))
        .groupBy("domain", "tld")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("blocked", col("domain").isin(blockedDomains: _*))
    },
    Some(s"""WITH u AS (
              SELECT doc_id,
                     'https://' ||
                     (['www','api','cdn'])[CAST(doc_id % 3 + 1 AS INT)] || '.' ||
                     (['alpha','beta','gamma','spamco'])[CAST(doc_id % 4 + 1 AS INT)] || '.' ||
                     (['com','org','net'])[CAST(doc_id % 5 % 3 + 1 AS INT)] ||
                     '/p/' || doc_id || '?ref=1' AS url
              FROM documents),
            h AS (
              SELECT doc_id, regexp_extract(url, 'https?://([^/]+)', 1) AS host
              FROM u),
            dom AS (
              SELECT doc_id,
                     regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain,
                     regexp_extract(host, '([^.]+)$$', 1) AS tld
              FROM h)
            SELECT domain, tld, count(*) AS n_docs,
                   domain IN (${blockedDomains.map("'" + _ + "'").mkString(", ")}) AS blocked
            FROM dom GROUP BY domain, tld"""))

  // ---- Unicode NFC canonicalization --------------------------------------
  // Mixed normalization forms silently fragment every downstream equality
  // (exact-dup hashes, line-dedup joins, vocab lookups). nfcNative is a
  // native codegen expression with an isNormalized fast path — pure ASCII
  // (most of a web corpus) returns the input UTF8String untouched. The
  // gate plants NFD sequences (combining acute/tilde/ring) and checks the
  // canonicalized string plus the codepoint-count contraction against
  // DuckDB's nfc_normalize.
  private val qUnicodeNorm = GQuery(
    "q_unicode_norm",
    (s, d) => {
      val synth = concat(col("text"),
        lit(" cafe\u0301 nin\u0303o A\u030A"))
      documents(s, d).select(
        col("doc_id"),
        nfcNative(synth).as("norm"),
        length(synth).cast("long").as("len_nfd"),
        length(nfcNative(synth)).cast("long").as("len_nfc"))
    },
    Some("""SELECT doc_id,
                   nfc_normalize(synth) AS norm,
                   CAST(length(synth) AS BIGINT) AS len_nfd,
                   CAST(length(nfc_normalize(synth)) AS BIGINT) AS len_nfc
            FROM (SELECT doc_id,
                         text || ' cafe' || chr(769) || ' nin' || chr(771) ||
                         'o A' || chr(778) AS synth
                  FROM documents)"""))

  // ---- span-level exact substring dedup ----------------------------------
  // The Lee et al. "Deduplicating Training Data Makes Language Models
  // Better" operator, in its fixed-window form: any k-token span that
  // occurs more than once ANYWHERE in the corpus is removed from every
  // occurrence except one canonical survivor (lexicographic min of
  // (doc_id, pos)). The suffix array of the paper is replaced by what a
  // cluster is actually good at: a hash-partitioned positional span
  // table.
  //
  // Plan shape at 100 TB:
  //   1. one-pass native tokenize+shingle per doc (ShinglesExpr) — spans
  //      leave the scan as (doc_id, pos, 8-byte hash), never span text;
  //   2. survivor per hash = min(struct(doc_id,pos)) — partial-aggregated
  //      groupBy on the hash, so a span repeated 1e9 times combines
  //      map-side;
  //   3. non-survivor occurrences explode to dropped token positions
  //      (bounded: k per occurrence);
  //   4. token stream anti-joins dropped positions on (doc_id, pos) and
  //      reassembles in order — both joins on narrow keys, and the
  //      doc_id regroup is the same key the scan is bucketed by.
  // Docs shorter than k tokens collapse to ONE whole-doc span (the
  // ShinglesExpr contract), so short exact-dup docs dedup whole-doc.
  // Grouping 8-byte hashes instead of span text trades an astronomically
  // small false-drop for never shuffling text (same trade as lineDedup).
  def spanDedup(docs: DataFrame, k: Int): DataFrame = {
    // NO expression downstream of the explode may reference tokens(text):
    // CollapseProject inlines a single-use tokenize into the post-Generate
    // projection, re-splitting the whole document once per SPAN row (the
    // q_repetition/ShinglesExpr bug class — measured 300+ CPU-min at sf10
    // before this structure). The span's own width (= min(k, doc tokens))
    // is recovered from the span STRING instead: spans are single-space
    // token joins, so size(split(span, " ")) is exact and O(k).
    val spans = docs
      .select(col("doc_id"),
        posexplode(graft.functions.TextExprs.shinglesTextNative(col("text"), k))
          .as(Seq("pos", "span")))
      .select(col("doc_id"), col("pos"),
        size(split(col("span"), " ")).as("w"),
        xxhash64(col("span")).as("h"))
    val survivors = spans.groupBy("h")
      .agg(min(struct(col("doc_id"), col("pos"))).as("surv"),
        count(lit(1)).as("occ"))
      .filter(col("occ") > 1)
    val dropped = spans.join(survivors, "h")
      .filter(!(col("doc_id") === col("surv.doc_id") && col("pos") === col("surv.pos")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + col("w") - 1)).as("pos"))
      .distinct()
    val tokenStream = docs.select(col("doc_id"),
      posexplode(graft.functions.tokens(col("text"))).as(Seq("pos", "tok")))
    val kept = tokenStream.join(dropped, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok"))).as("kept_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col("doc_id"), size(graft.functions.tokens(col("text"))).as("n_total"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("kept_text"), lit("")).as("kept_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        col("n_total").cast("long").as("n_total"))
  }

  private val spanK = 8

  /** The span-dedup oracle, parameterized on a CTE named `docs` yielding
    * (doc_id, text) — shared verbatim by q_span_dedup and q_clean_pipeline
    * so the two renderings of the drop+reassembly semantics cannot drift.
    */
  private def spanDedupSql(docsCte: String): String =
    s"""WITH $docsCte,
            t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                                 x -> len(x) > 0) AS toks
              FROM docs),
            spans AS (
              SELECT doc_id, i - 1 AS pos,
                     array_to_string(toks[i:i+least($spanK, len(toks))-1], ' ') AS span,
                     least($spanK, len(toks)) AS w
              FROM t,
                   unnest(CASE WHEN len(toks) <= $spanK THEN [1]
                               ELSE range(1, len(toks) - $spanK + 2) END) AS u(i)),
            ranked AS (
              SELECT doc_id, pos, w,
                     row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn,
                     count(*) OVER (PARTITION BY span) AS occ
              FROM spans),
            dropped AS (
              SELECT DISTINCT doc_id, unnest(range(pos, pos + w)) AS pos
              FROM ranked WHERE occ > 1 AND rn > 1),
            tok_stream AS (
              SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS tok
              FROM t),
            kept AS (
              SELECT ts.doc_id,
                     string_agg(ts.tok, ' ' ORDER BY ts.pos) AS kept_text,
                     count(*) AS n_kept
              FROM tok_stream ts
              WHERE NOT EXISTS (SELECT 1 FROM dropped dr
                                WHERE dr.doc_id = ts.doc_id AND dr.pos = ts.pos)
              GROUP BY ts.doc_id)
            SELECT t.doc_id,
                   coalesce(kept.kept_text, '') AS kept_text,
                   CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_kept,
                   CAST(len(t.toks) AS BIGINT) AS n_total
            FROM t LEFT JOIN kept USING (doc_id)"""

  private val qSpanDedup = GQuery(
    "q_span_dedup",
    (s, d) => spanDedup(documents(s, d), spanK),
    Some(spanDedupSql("docs AS (SELECT doc_id, text FROM documents)")),
    headline = true)

  // ---- composed cleaning pipeline -----------------------------------------
  // The full ingestion pass as ONE plan: HTML strip → NFC canonicalize →
  // PII redact → whitespace/case normalize → span-level dedup. Each stage
  // is individually gated above; this gate proves they COMPOSE — the
  // scalar stages fuse into the scan projection (still one pass per row,
  // still codegen), and the span-dedup shuffles see already-clean text.
  // The planted dirt exercises every stage: HTML wrapper + entities, an
  // NFD suffix, an email/URL/id triple — all pure functions of doc_id,
  // rebuilt identically in the oracle.
  def cleanChain(raw: Column): Column =
    TextOps.normalizeText(TextOps.redactPii(nfcNative(stripHtml(raw))))

  private val qCleanPipeline = GQuery(
    "q_clean_pipeline",
    (s, d) => {
      val synth = concat(
        lit("<html><body><!-- boiler: nav/footer --><![CDATA[c&d]]>" +
          "<div data-x='1 > 2' class=\"big\">hdr</div><p>"), col("text"),
        lit(" café contact user"), col("doc_id"),
        lit("@mail.example.com or https://ex.org/d/"), col("doc_id"),
        lit(" &amp; id "), (col("doc_id") * 9000077L + 5000000L).cast("long"),
        lit("</p><script>x()</script></body></html>"))
      val cleaned = documents(s, d)
        .select(col("doc_id"), cleanChain(synth).as("text"))
      spanDedup(cleaned, spanK)
    },
    Some(spanDedupSql(s"""cleaned AS (
              SELECT doc_id,
                     lower(trim(regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(
                             nfc_normalize(
                               trim(regexp_replace(
                                 regexp_replace(
                                   regexp_replace(
                                     regexp_replace(
                                       regexp_replace(
                                         regexp_replace(
                                           regexp_replace(
                                             regexp_replace(
                                               regexp_replace(synth, '$sqlScriptRe', '', 'g'),
                                               '$sqlStyleRe', '', 'g'),
                                             '(?s)<!--.*?-->', '', 'g'),
                                           '(?is)<!\\[CDATA\\[.*?\\]\\]>', '', 'g'),
                                         '$sqlTagRe', ' ', 'g'),
                                       '&lt;', '<', 'g'),
                                     '&gt;', '>', 'g'),
                                   '&amp;', '&', 'g'),
                                 '\\s+', ' ', 'g'))),
                             'https?://[^\\s]+', '<URL>', 'g'),
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                         '\\b\\d{6,}\\b', '<NUM>', 'g'),
                       '\\s+', ' ', 'g'))) AS text
              FROM (SELECT doc_id,
                           '<html><body><!-- boiler: nav/footer --><![CDATA[c&d]]>' ||
                           '<div data-x=''1 > 2'' class="big">hdr</div><p>' || text ||
                           ' cafe' || chr(769) || ' contact user' || doc_id ||
                           '@mail.example.com or https://ex.org/d/' || doc_id ||
                           ' &amp; id ' || CAST(doc_id * 9000077 + 5000000 AS BIGINT) ||
                           '</p><script>x()</script></body></html>' AS synth
                    FROM documents)),
            docs AS (SELECT doc_id, text FROM cleaned)""")),
    headline = true)

  val queries: Seq[GQuery] =
    Seq(qLineDedup, qHtmlStrip, qUrlDomain, qUnicodeNorm, qSpanDedup,
      qCleanPipeline)
}
