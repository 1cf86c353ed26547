package graft.ml

import graft.GQuery
import graft.functions._
import graft.functions.stableRound
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * per-row expressions (no shuffle, no UDF) — at 100 TB these run at scan
  * speed inside WholeStageCodegen.
  */
object TextOps {

  /** Stopword WORD SETS per language for the n-gram/stopword language-ID
    * heuristic; zh scores by CJK codepoint count instead of words.
    */
  private[graft] val langWordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "for", "with", "was"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "las", "una", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour", "que", "qui"))

  /** The regex renderings of the markers (word-boundary anchored), used by
    * the DuckDB oracles and as the parity reference for the native counts.
    * \x{...} escapes: understood by both Java regex and DuckDB's RE2
    * (RE2 has no \uXXXX form).
    */
  val langMarkers: Seq[(String, String)] =
    langWordSets.map { case (l, ws) => l -> s"\\b(${ws.mkString("|")})\\b" } :+
      ("zh" -> "[\\x{4e00}-\\x{9fff}]")

  /** The regex formulation of a marker count — the oracle-shaped parity
    * reference for the native byte-scan counts (CountExprsSpec).
    */
  private[graft] def markerCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(lower(text), lit(pattern), lit(0))).cast("long")

  /** One marker score, native: whole-word membership counts for the word
    * languages, CJK codepoint-range count for zh — value-identical to
    * [[markerCount]] over the corresponding [[langMarkers]] pattern under
    * RE2's ASCII `\b` (the DuckDB oracle's semantics, which the driver
    * hash-matches). Java regex's Unicode-aware `\b` differs on stopwords
    * abutting non-ASCII letters — see
    * [[graft.functions.WordSetCountExpr]] for the pinned divergence.
    */
  private def markerScore(text: Column, lang: String): Column = lang match {
    case "zh" => graft.functions.CountExprs
        .codepointRangeCount(lower(text), 0x4e00, 0x9fff)
    case l => graft.functions.CountExprs
        .wordSetCount(lower(text), langWordSets.toMap.apply(l))
  }

  /** Argmax over marker counts, tie broken by list order (en first). */
  def langIdCol(text: Column): Column = {
    val scores = langMarkers.map { case (l, _) => (l, markerScore(text, l)) }
    scores.tail.foldLeft(
      (when(lit(true), lit(scores.head._1)), scores.head._2)) {
      case ((bestLang, bestScore), (l, sc)) =>
        (when(sc > bestScore, lit(l)).otherwise(bestLang),
          when(sc > bestScore, sc).otherwise(bestScore))
    }._1
  }

  private val qLangId = GQuery(
    "q_lang_id",
    (s, d) =>
      documents(s, d).select(
        col("doc_id"),
        langIdCol(col("text")).as("pred_lang"),
        col("lang").as("true_lang")),
    Some {
      // Same argmax with the same tie-break, written as nested CASEs.
      // DuckDB single-quoted strings pass backslashes through verbatim, so
      // the Java-regex pattern text embeds as-is.
      val scoreExprs = langMarkers.map { case (l, p) =>
        s"CAST(len(regexp_extract_all(lower(text), '$p')) AS BIGINT) AS s_$l"
      }.mkString(", ")
      val langs = langMarkers.map(_._1)
      // pick first lang whose score is strictly greater than current best —
      // fold left like the Spark side.
      val pick = langs.tail.foldLeft(("'" + langs.head + "'", "s_" + langs.head)) {
        case ((bl, bs), l) =>
          (s"CASE WHEN s_$l > $bs THEN '$l' ELSE $bl END",
            s"CASE WHEN s_$l > $bs THEN s_$l ELSE $bs END")
      }._1
      s"""SELECT doc_id, $pick AS pred_lang, lang AS true_lang
          FROM (SELECT doc_id, lang, $scoreExprs FROM documents)"""
    })

  private val qTokens = GQuery(
    "q_tokens",
    (s, d) =>
      documents(s, d).select(
        col("doc_id"),
        graft.functions.CountExprs.wordRunCount(col("text")).as("n_words"),
        bpeishTokenCount(col("text")).as("n_bpeish"),
        length(col("text")).cast("long").as("len_chars")),
    Some("""SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_words,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
                     AS n_bpeish,
                   CAST(length(text) AS BIGINT) AS len_chars
            FROM documents"""),
    headline = true)

  /** The C4-ish quality stopword set shared by the quality/filter/budget
    * gates (regex form: `\b(the|a|an|…)\b` over lowercased text).
    */
  private[ml] val qualityStops =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

  // Native scan-column counts shared by the quality-feature gates —
  // value-identical to the size(regexp_extract_all(…)) formulations the
  // oracles keep (CountExprsSpec pins parity; the regex path materialized
  // every match just to count it).
  private def wordCountD(text: Column): Column =
    graft.functions.CountExprs.wordRunCount(text).cast("double")
  private def stopCountD(text: Column): Column =
    graft.functions.CountExprs.wordSetCount(lower(text), qualityStops).cast("double")
  private def punctCountD(text: Column): Column =
    graft.functions.CountExprs.charSetCount(text, ".,!?;:").cast("double")

  // Quality score: stopword ratio, punctuation ratio, mean word length —
  // the length/punct/stopword heuristics of C4-style corpus filtering.
  private val qQuality = GQuery(
    "q_quality",
    (s, d) => {
      val words = wordCountD(col("text"))
      val stops = stopCountD(col("text"))
      val punct = punctCountD(col("text"))
      val chars = length(col("text")).cast("double")
      documents(s, d).select(
        col("doc_id"),
        stableRound(when(words === 0, 0.0).otherwise(stops / words), 4).as("stop_ratio"),
        stableRound(when(chars === 0, 0.0).otherwise(punct / chars), 4).as("punct_ratio"),
        stableRound(when(words === 0, 0.0).otherwise(chars / words), 4).as("chars_per_word"))
    },
    Some("""SELECT doc_id,
                   floor((CASE WHEN words = 0 THEN 0.0 ELSE stops / words END) * 10000 + 0.5) / 10000 AS stop_ratio,
                   floor((CASE WHEN chars = 0 THEN 0.0 ELSE punct / chars END) * 10000 + 0.5) / 10000 AS punct_ratio,
                   floor((CASE WHEN words = 0 THEN 0.0 ELSE chars / words END) * 10000 + 0.5) / 10000 AS chars_per_word
            FROM (SELECT doc_id,
                         CAST(len(regexp_extract_all(text, '\w+')) AS DOUBLE) AS words,
                         CAST(len(regexp_extract_all(lower(text),
                              '\b(the|a|an|and|of|to|in|is|it|for)\b')) AS DOUBLE) AS stops,
                         CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) AS punct,
                         CAST(length(text) AS DOUBLE) AS chars
                  FROM documents)"""))

  // Content-defined fingerprint: md5 of whitespace-normalized lowercase text
  // (oracle-checkable), plus an order-sensitive polynomial rolling hash
  // (oracled via the pure-SQL XXH64 in SimhashOracle).
  private val qFingerprint = GQuery(
    "q_fingerprint",
    (s, d) =>
      documents(s, d).select(
        col("doc_id"),
        md5(lower(graft.functions.TextCleanExprs.wsCollapse(trim(col("text")))))
          .as("fp")),
    Some("""SELECT doc_id,
                   md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
            FROM documents"""))

  private val qRollingFp = GQuery(
    "q_rolling_fingerprint",
    (s, d) =>
      documents(s, d).select(
        col("doc_id"),
        rollingHash(tokens(col("text"))).as("rfp")),
    Some(SimhashOracle.rollingFpSql))

  /** PII redaction: URLs, then emails, then long digit runs (ids/phones)
    * replace with typed placeholder tokens; URL first so an address inside
    * a URL can't partially survive. Native byte-scan passes
    * ([[graft.functions.TextCleanExprs]], value-identical to the
    * java.util.regex chain — TextCleanExprsSpec pins parity against the
    * regex engine); [[redactPiiColumns]] keeps the regexp formulation as
    * the parity reference. Scan-speed at 100 TB without the regex engine
    * or the per-row UTF-16 decode.
    */
  def redactPii(c: Column): Column = {
    import graft.functions.TextCleanExprs._
    numRedact(emailRedact(urlRedact(c, "<URL>"), "<EMAIL>"), "<NUM>")
  }

  /** The regexp_replace reference formulation of [[redactPii]] (parity
    * pinned in TextCleanExprsSpec; the DuckDB oracles interpolate the same
    * patterns).
    */
  private[graft] def redactPiiColumns(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit("https?://[^\\s]+"), lit("<URL>")),
        lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("<EMAIL>")),
      lit("\\b\\d{6,}\\b"), lit("<NUM>"))

  /** Whitespace/case normalization: collapse runs, trim, lowercase. The
    * `\s+` collapse is the native [[graft.functions.TextCleanExprs
    * .wsCollapse]] byte scan; trim/lower stay the (already native)
    * builtins.
    */
  def normalizeText(c: Column): Column =
    lower(trim(graft.functions.TextCleanExprs.wsCollapse(c)))

  /** The regexp_replace reference formulation of [[normalizeText]]. */
  private[graft] def normalizeTextColumns(c: Column): Column =
    lower(trim(regexp_replace(c, lit("\\s+"), lit(" "))))

  // The synthetic corpus carries no PII, so the gate query plants a
  // deterministic email/URL/id per row (pure function of doc_id, rebuilt
  // identically in the oracle) and asserts the full redact+normalize chain.
  private val qRedact = GQuery(
    "q_redact",
    (s, d) => {
      val synth = concat(col("text"),
        lit(" Contact user"), col("doc_id"),
        lit("@mail.example.com via https://ex.org/d/"), col("doc_id"),
        lit(" ref "), (col("doc_id") * 1000003L + 7000000L).cast("long"))
      documents(s, d).select(
        col("doc_id"),
        normalizeText(redactPii(synth)).as("clean"),
        graft.functions.TextCleanExprs.emailCount(synth).as("n_emails"),
        graft.functions.TextCleanExprs.urlCount(synth).as("n_urls"),
        graft.functions.TextCleanExprs.numCount(synth).as("n_nums"))
    },
    Some("""SELECT doc_id,
                   lower(trim(regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(synth, 'https?://[^\s]+', '<URL>', 'g'),
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b\d{6,}\b', '<NUM>', 'g'),
                     '\s+', ' ', 'g'))) AS clean,
                   CAST(len(regexp_extract_all(synth, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(synth, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
                   CAST(len(regexp_extract_all(synth, '\b\d{6,}\b')) AS BIGINT) AS n_nums
            FROM (SELECT doc_id,
                         text || ' Contact user' || doc_id ||
                         '@mail.example.com via https://ex.org/d/' || doc_id ||
                         ' ref ' || CAST(doc_id * 1000003 + 7000000 AS BIGINT) AS synth
                  FROM documents)"""))

  // Vocabulary with document frequency + idf — the wordcount shape:
  // explode is map-side, the groupBy partial-aggregates before the one
  // shuffle on word, top-k under a total order (df desc, word) so the cut
  // is deterministic. The idf's corpus total rides IN the plan as a 1-row
  // broadcast stats frame (the q_bm25 pattern) instead of a separate
  // driver count() job — one job per run, no extra scan.
  private val qVocab = GQuery(
    "q_vocab",
    (s, d) => {
      val docs = documents(s, d)
      val totalRow = docs.agg(count(lit(1)).cast("double").as("_total"))
      docs.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
        .groupBy("word")
        .agg(countDistinct("doc_id").cast("long").as("df"),
          count(lit(1)).as("tf"))
        .crossJoin(broadcast(totalRow))
        .withColumn("idf", stableRound(log(col("_total") / col("df")), 4))
        .drop("_total")
        .orderBy(col("df").desc, col("word").asc)
        .limit(50)
    },
    Some("""WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                            x -> len(x) > 0)) AS word
              FROM documents),
            v AS (SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
                         count(*) AS tf
                  FROM toks GROUP BY word)
            SELECT word, df, tf,
                   floor(ln((SELECT CAST(count(*) AS DOUBLE) FROM documents) / df) * 10000 + 0.5) / 10000 AS idf
            FROM v ORDER BY df DESC, word LIMIT 50"""))

  // Distribution stats per language: exact interpolated quantiles of doc
  // length. Spark's percentile() and DuckDB's quantile_cont share the
  // interpolation definition, so the oracle hash-matches; at 100 TB the
  // exact percentile still groups+sorts only within each language
  // partition (approx_percentile is the knob if even that is too much).
  private val qQuantiles = GQuery(
    "q_quantiles",
    (s, d) =>
      documents(s, d)
        .groupBy("lang")
        .agg(
          stableRound(expr("percentile(n_chars, 0.5)"), 2).as("p50"),
          stableRound(expr("percentile(n_chars, 0.9)"), 2).as("p90"),
          max("n_chars").cast("long").as("mx")),
    Some("""SELECT lang,
                   floor(quantile_cont(n_chars, 0.5) * 100 + 0.5) / 100 AS p50,
                   floor(quantile_cont(n_chars, 0.9) * 100 + 0.5) / 100 AS p90,
                   CAST(max(n_chars) AS BIGINT) AS mx
            FROM documents GROUP BY lang"""))

  /** C4-style corpus cleaning: length + stopword + punctuation gates as a
    * reusable DataFrame stage (composes with dedup stages downstream).
    */
  def filterCorpus(docs: org.apache.spark.sql.DataFrame, minWords: Long = 10,
      maxCharsPerWord: Double = 12.0, minStopRatio: Double = 0.0): org.apache.spark.sql.DataFrame = {
    val words = wordCountD(col("text"))
    val stops = stopCountD(col("text"))
    val chars = length(col("text")).cast("double")
    docs.filter(words >= minWords &&
      (chars / words) <= maxCharsPerWord &&
      (stops / words) >= minStopRatio)
  }

  private val qCorpusFilter = GQuery(
    "q_corpus_filter",
    (s, d) =>
      filterCorpus(documents(s, d), minWords = 12, maxCharsPerWord = 6.0)
        .select("doc_id", "lang", "n_chars"),
    Some("""SELECT doc_id, lang, n_chars
            FROM (SELECT *,
                         CAST(len(regexp_extract_all(text, '\w+')) AS DOUBLE) AS words,
                         CAST(length(text) AS DOUBLE) AS chars
                  FROM documents)
            WHERE words >= 12 AND chars / words <= 6.0"""))

  // whole-corpus summary: the one-row health check of a pipeline stage
  private val qCorpusStats = GQuery(
    "q_corpus_stats",
    (s, d) =>
      documents(s, d).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).cast("long").as("n_unique"),
        sum(graft.functions.CountExprs.wordRunCount(col("text")))
          .cast("long").as("n_tokens"),
        countDistinct(col("lang")).cast("long").as("n_langs"),
        max(length(col("text"))).cast("long").as("max_chars")),
    Some("""SELECT count(*) AS n_docs,
                   CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
                   CAST(sum(len(regexp_extract_all(text, '\w+'))) AS BIGINT) AS n_tokens,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                   CAST(max(length(text)) AS BIGINT) AS max_chars
            FROM documents"""))

  /** Gopher-style intra-document repetition filters: most-common-word
    * fraction and duplicate bigram/trigram fractions, all computed in-row
    * with higher-order array functions — no explode, no shuffle, scan
    * speed at 100 TB. The per-doc cost is O(words × distinct words),
    * bounded by document length, not corpus size.
    */
  def repetitionWords(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => length(w) > 0)

  /** Word n-grams as space-joined strings (empty array when the doc is
    * shorter than n).
    */
  def wordNgrams(ws: Column, n: Int): Column =
    when(size(ws) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + lit(j))): _*)))

  /** 1 - distinct/total over an n-gram array (0 for empty docs). */
  def dupFrac(grams: Column): Column =
    when(size(grams) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams))

  /** max word frequency / total words (0 for empty docs). */
  def topWordFrac(ws: Column): Column =
    when(size(ws) === 0, lit(0.0)).otherwise(
      array_max(transform(array_distinct(ws),
        d => size(filter(ws, x => x === d)))).cast("double") / size(ws))

  // Model-based quality scoring: a fixed-weight logistic model over the
  // heuristic features (the shape of a fasttext/classifier quality filter,
  // with honest literal weights instead of a learned artifact this
  // zero-egress environment can't ship). Pure per-row arithmetic — the
  // whole "model" runs inside WholeStageCodegen at scan speed; swapping in
  // learned weights is a literal change. keep compares the ROUNDED score
  // so both engines agree at the boundary.
  private val qQualityModel = GQuery(
    "q_quality_model",
    (s, d) => {
      val words = wordCountD(col("text"))
      val stops = stopCountD(col("text"))
      val punct = punctCountD(col("text"))
      val chars = length(col("text")).cast("double")
      val stopR = when(words === 0, 0.0).otherwise(stops / words)
      val punctR = when(chars === 0, 0.0).otherwise(punct / chars)
      val cpw = when(words === 0, 0.0).otherwise(chars / words)
      val z = lit(-1.5) + lit(8.0) * stopR - lit(20.0) * punctR +
        lit(0.25) * cpw + lit(0.002) * chars
      val score = stableRound(lit(1.0) / (lit(1.0) + exp(-z)), 4)
      documents(s, d).select(col("doc_id"), score.as("score"),
        (score >= 0.5).as("keep"))
    },
    Some("""WITH f AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '\w+')) AS DOUBLE) AS words,
                     CAST(len(regexp_extract_all(lower(text),
                          '\b(the|a|an|and|of|to|in|is|it|for)\b')) AS DOUBLE) AS stops,
                     CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) AS punct,
                     CAST(length(text) AS DOUBLE) AS chars
              FROM documents),
            z AS (
              SELECT doc_id,
                     -1.5 + 8.0 * (CASE WHEN words = 0 THEN 0.0 ELSE stops / words END)
                          - 20.0 * (CASE WHEN chars = 0 THEN 0.0 ELSE punct / chars END)
                          + 0.25 * (CASE WHEN words = 0 THEN 0.0 ELSE chars / words END)
                          + 0.002 * chars AS z
              FROM f)
            SELECT doc_id,
                   floor((1.0 / (1.0 + exp(-z))) * 10000 + 0.5) / 10000 AS score,
                   floor((1.0 / (1.0 + exp(-z))) * 10000 + 0.5) / 10000 >= 0.5 AS keep
            FROM z"""))

  private val qRepetition = GQuery(
    "q_repetition",
    (s, d) => {
      // ws MUST be materialized as a projected column before the
      // higher-order ops: a lambda body that references the raw
      // split-expression tree re-splits the text once per element when
      // interpreted (the ShinglesExpr bug class — measured 162 CPU-min
      // for this gate at sf10). As an attribute it evaluates once per
      // row; CollapseProject keeps the projection because a non-cheap
      // expression referenced many times is never inlined.
      val base = documents(s, d).select(col("doc_id"),
        repetitionWords(col("text")).as("ws"))
      val ws = col("ws")
      val twf = stableRound(topWordFrac(ws), 4)
      val dbf = stableRound(dupFrac(wordNgrams(ws, 2)), 4)
      base.select(
        col("doc_id"),
        size(ws).cast("long").as("n_words"),
        twf.as("top_word_frac"),
        dbf.as("dup_bigram_frac"),
        stableRound(dupFrac(wordNgrams(ws, 3)), 4).as("dup_trigram_frac"),
        (twf <= 0.125 && dbf <= 0.05).as("keep"))
    },
    Some("""WITH base AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS ws
              FROM documents),
            wc AS (
              SELECT doc_id, count(*) AS c
              FROM (SELECT doc_id, unnest(ws) AS w FROM base)
              GROUP BY doc_id, w),
            top AS (
              SELECT doc_id, max(c) AS maxc, sum(c) AS n
              FROM wc GROUP BY doc_id),
            gr AS (
              SELECT doc_id, len(ws) AS n_words,
                     list_transform(range(1, len(ws)),
                       i -> ws[i] || ' ' || ws[i+1]) AS bgs,
                     list_transform(range(1, len(ws)-1),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS tgs
              FROM base),
            m AS (
              SELECT g.doc_id,
                     CAST(g.n_words AS BIGINT) AS n_words,
                     floor((CASE WHEN coalesce(t.n, 0) = 0 THEN 0.0
                            ELSE CAST(t.maxc AS DOUBLE) / t.n END) * 10000 + 0.5) / 10000
                       AS top_word_frac,
                     floor((CASE WHEN len(g.bgs) = 0 THEN 0.0
                            ELSE 1.0 - CAST(len(list_distinct(g.bgs)) AS DOUBLE) / len(g.bgs) END)
                           * 10000 + 0.5) / 10000 AS dup_bigram_frac,
                     floor((CASE WHEN len(g.tgs) = 0 THEN 0.0
                            ELSE 1.0 - CAST(len(list_distinct(g.tgs)) AS DOUBLE) / len(g.tgs) END)
                           * 10000 + 0.5) / 10000 AS dup_trigram_frac
              FROM gr g LEFT JOIN top t USING (doc_id))
            SELECT doc_id, n_words, top_word_frac, dup_bigram_frac,
                   dup_trigram_frac,
                   top_word_frac <= 0.125 AND dup_bigram_frac <= 0.05 AS keep
            FROM m"""))

  // CCNet-style perplexity filtering with an in-corpus unigram LM:
  // train token log-probs over the whole corpus (one wordcount shuffle,
  // add-one smoothing), then score each document by mean negative log
  // likelihood; ppl = exp(nll). Scale shape: token stream joins the
  // (vocabulary-sized) prob table — a broadcast hash join for any real
  // vocabulary — then one partial-aggregated groupBy(doc). Unseen-token
  // handling is exercised for real because the LM here trains on the
  // same corpus it scores (every token is seen); the smoothing term
  // still decides the probabilities.
  private val qPerplexity = GQuery(
    "q_perplexity",
    (s, d) => {
      val toks = documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      val counts = toks.groupBy("w").agg(count(lit(1)).as("c"))
      val totals = counts.agg(sum("c").as("n"), count(lit(1)).as("v")).head()
      val (n, v) = (totals.getLong(0), totals.getLong(1))
      val scored = toks.join(broadcast(counts), Seq("w"))
        .withColumn("_lp", log((col("c") + 1.0) / lit((n + v).toDouble)))
        .groupBy("doc_id")
        .agg((-avg(col("_lp"))).as("nll"), count(lit(1)).as("n_tokens"))
      scored.select(col("doc_id"),
        stableRound(col("nll"), 4).as("nll"),
        stableRound(exp(col("nll")), 2).as("ppl"),
        col("n_tokens"))
    },
    Some("""WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                                        x -> x <> '')) AS w
              FROM documents),
            counts AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
            tot AS (SELECT sum(c) AS n, count(*) AS v FROM counts),
            scored AS (
              SELECT t.doc_id,
                     -avg(ln((c + 1.0) / (tot.n + tot.v))) AS nll,
                     count(*) AS n_tokens
              FROM toks t JOIN counts USING (w) CROSS JOIN tot
              GROUP BY t.doc_id)
            SELECT doc_id,
                   floor(nll * 10000 + 0.5) / 10000 AS nll,
                   floor(exp(nll) * 100 + 0.5) / 100 AS ppl,
                   n_tokens
            FROM scored"""))

  /** Overlapping character windows (size `win`, stride `stride`) — the
    * chunking step of RAG / long-document pretraining prep. In-row array
    * construction (no shuffle): chunk starts are a `sequence`, substrings
    * come from one `transform`. A final short chunk is kept (standard
    * chunker behavior); exploding happens post-scan so the full text
    * never shuffles.
    */
  def chunkText(text: Column, win: Int, stride: Int): Column = {
    require(win > 0 && stride > 0, "chunkText: win and stride must be positive")
    val n = length(text)
    val starts = when(n <= win, array(lit(1))).otherwise(
      sequence(lit(1), n - win + lit(stride), lit(stride)))
    transform(starts, st => substring(text, st, lit(win)))
  }

  private val qChunk = GQuery(
    "q_chunk",
    (s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          posexplode(chunkText(col("text"), 200, 150)).as(Seq("i", "chunk")))
        .select(col("doc_id"), (col("i") + 1).cast("long").as("chunk_idx"),
          col("chunk"), length(col("chunk")).cast("long").as("n_chars")),
    Some("""WITH c AS (
              SELECT doc_id,
                     CASE WHEN length(text) <= 200 THEN [1]
                          ELSE generate_series(1, length(text) - 200 + 150, 150)
                     END AS starts, text
              FROM documents)
            SELECT doc_id,
                   CAST(generate_subscripts(starts, 1) AS BIGINT) AS chunk_idx,
                   substr(text, unnest(starts), 200) AS chunk,
                   CAST(length(substr(text, unnest(starts), 200)) AS BIGINT)
                     AS n_chars
            FROM c"""))

  // ---- BM25 scored retrieval ---------------------------------------------
  // Lexical top-k retrieval (Okapi BM25, k1=1.2, b=0.75) for a fixed query
  // term set — the keyword complement to the ANN stack. Corpus statistics
  // (N, avgdl, per-term df) reduce to ONE broadcastable row; scoring is
  // scan-side — per-doc term frequencies come from the tokenized array
  // in-row (`filter(toks, _ == term)`, no explode), so the corpus never
  // shuffles and the global top-20 is a TakeOrderedAndProject. Every input
  // to the scoring formula is an exactly-representable integer (tf, dl, df,
  // N; the dl-sum behind avgdl stays under 2^53), and the per-doc score is
  // a FIXED-ORDER chain of IEEE ops, so the DuckDB oracle hash-matches
  // bit-for-bit. At 100 TB: partial-agg stats pass + one scan.
  private val bm25Terms = Seq("query", "join", "stream")
  private val qBm25 = GQuery(
    "q_bm25",
    (s, d) => {
      val docs = documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("dl", size(col("toks")).cast("double"))
      val statCols =
        (sum(col("dl")) / count(lit(1))).as("avgdl") +:
          bm25Terms.map(t => sum(when(array_contains(col("toks"), t), 1L)
            .otherwise(0L)).cast("double").as(s"df_$t"))
      val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"), statCols: _*)
      val scored = docs.crossJoin(broadcast(stats))
      val contribs = bm25Terms.map { t =>
        val tf = size(filter(col("toks"), x => x === lit(t))).cast("double")
        val df = col(s"df_$t")
        val idf = log((col("n_docs") - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
        idf * tf * lit(2.2) /
          (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
      }
      scored
        .select(col("doc_id"),
          stableRound(contribs.reduce(_ + _), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(20)
    },
    Some {
      val contribs = bm25Terms.map { t =>
        s"""(ln((s.n_docs - s.df_$t + 0.5) / (s.df_$t + 0.5) + 1.0)
           | * len(list_filter(d.toks, x -> x = '$t')) * 2.2
           | / (len(list_filter(d.toks, x -> x = '$t'))
           |    + 1.2 * (0.25 + 0.75 * len(d.toks) / s.avgdl)))""".stripMargin
      }
      s"""WITH d AS (
         |  SELECT doc_id,
         |         list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
         |                     x -> len(x) > 0) AS toks
         |  FROM documents),
         |s AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |         CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl,
         |         ${bm25Terms.map(t =>
              s"CAST(count(*) FILTER (WHERE list_contains(toks, '$t')) AS DOUBLE) AS df_$t")
              .mkString(", ")}
         |  FROM d)
         |SELECT doc_id,
         |       floor((${contribs.mkString(" + ")}) * 10000 + 0.5) / 10000 AS score
         |FROM d, s
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
    })

  // ---- token-budget corpus selection -------------------------------------
  // "Fill N tokens per source with the best-quality documents first" — the
  // curation step between scoring and training. Per-source windowed
  // cumulative token sum over quality-ranked docs, keep while under
  // budget: ONE shuffle on source (a partitioned window, never a global
  // one), integer token counts so the running sum is exact, rank ties
  // broken by doc_id so the cut line is deterministic. Output is bounded
  // by budget × sources regardless of corpus size.
  //
  // Oracle note: the windowed sum MUST be wrapped in CAST(... AS BIGINT).
  // DuckDB widens windowed sum(BIGINT) to HUGEINT, which pandas renders
  // as float64, so the driver's hasher saw "811.0" against Spark's int64
  // "811" — three rounds of hash-red from a dtype artifact, zero
  // differing cells. (No SQL "--" comments here: the oracle dump
  // collapses newlines, so a line comment would eat the rest of the SQL.)
  private val qBudgetSelect = GQuery(
    "q_budget_select",
    (s, d) => {
      val words = wordCountD(col("text"))
      val stops = stopCountD(col("text"))
      // sr is carried as the ×10000 integer scale (not /10000 back to a
      // double): every column in the gate is then integral, so no hasher,
      // formatter, or float-printing library on either side of the oracle
      // compare has a representation choice to disagree over.
      val scored = documents(s, d).select(
        col("doc_id"), col("source"),
        graft.functions.CountExprs.tokenCount(col("text")).as("tok"),
        floor(when(words === 0, 0.0).otherwise(stops / words) * 10000 + 0.5)
          .cast("long").as("sr"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("sr").desc, col("doc_id").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      scored.withColumn("cum", sum("tok").over(w))
        .filter(col("cum") <= 20000L)
        .select("doc_id", "source", "tok", "sr", "cum")
        .orderBy("source", "cum", "doc_id")
    },
    Some("""WITH scored AS (
              SELECT doc_id, source,
                     CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                              x -> len(x) > 0)) AS BIGINT) AS tok,
                     CAST(floor((CASE WHEN len(regexp_extract_all(text, '\w+')) = 0 THEN 0.0
                            ELSE CAST(len(regexp_extract_all(lower(text),
                                   '\b(the|a|an|and|of|to|in|is|it|for)\b')) AS DOUBLE)
                                 / len(regexp_extract_all(text, '\w+')) END)
                           * 10000 + 0.5) AS BIGINT) AS sr
              FROM documents),
            c AS (SELECT doc_id, source, tok, sr,
                         CAST(sum(tok) OVER (PARTITION BY source
                           ORDER BY sr DESC, doc_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                  FROM scored)
            SELECT doc_id, source, tok, sr, cum FROM c WHERE cum <= 20000
            ORDER BY source, cum, doc_id"""))

  val queries: Seq[GQuery] = Seq(qLangId, qTokens, qQuality, qFingerprint,
    qRollingFp, qCorpusFilter, qCorpusStats, qRedact, qVocab, qQuantiles,
    qRepetition, qQualityModel, qPerplexity, qChunk, qBm25, qBudgetSelect)
}
