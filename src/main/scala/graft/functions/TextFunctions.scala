package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Everything here is built from `org.apache.spark.sql.functions` (codegen'd
  * or JVM higher-order functions) — no Python, no driver-side work — so the
  * operators run scan-local with zero shuffles and survive a 100 TB corpus:
  * each is a narrow map over the documents scan.
  */
object TextFunctions {

  /** Whitespace tokenizer. Single definition shared by every operator so the
    * token semantics (and the DuckDB oracles) agree everywhere. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def uniqueTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** A BPE-ish token estimate: whitespace pieces plus an extra token per
    * ~4 chars of long words (the rule-of-thumb subword density). */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, w) => acc + greatest(lit(1L), ceil(length(w) / lit(4.0)).cast("long")))

  /** Average token length, derived arithmetically from char count so it is
    * exact and engine-portable: (chars - spaces) / tokens. */
  def avgTokenLength(text: Column): Column = {
    val n = tokenCount(text)
    ((length(text) - (n - lit(1))).cast("double") / n.cast("double"))
  }

  // --- quality scoring (length / punctuation / stopword ratios) -----------

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), w => w.isin(stopwords.map(s => s: Any): _*)))

  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") / tokenCount(text).cast("double")

  /** Punctuation chars per char of text. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double") /
      length(text).cast("double")

  /** Composite quality score in [0,1]: reward mid-length docs, presence of
    * stopwords (fluent prose), and low punctuation density. Weights are
    * fixed constants so the score is deterministic and portable. */
  def qualityScore(text: Column, nChars: Column): Column = {
    val lengthScore = least(nChars.cast("double") / lit(500.0), lit(1.0))
    val stopScore   = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    val punctScore  = lit(1.0) - least(punctRatio(text) * lit(10.0), lit(1.0))
    round(lengthScore * lit(0.4) + stopScore * lit(0.4) + punctScore * lit(0.2), 6)
  }

  // --- language identification (marker-word heuristic) ---------------------

  /** Tiny per-language marker lexicons (function-word n-gram heuristic).
    * Deliberately small and public-knowledge; language ID at corpus scale is
    * a scan-local scoring pass, which is the property we are building. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "es" -> Seq("el", "la", "los", "las", "es", "que", "por", "una"),
    "fr" -> Seq("le", "la", "les", "est", "que", "pour", "avec", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(markers.map(s => s: Any): _*)))

  /** Predicted language: argmax over marker-hit counts; ties resolve in
    * `langMarkers` declaration order; all-zero → "und". */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, ms) => lang -> langScore(text, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  // --- document fingerprinting (rolling hash) ------------------------------

  /** Polynomial rolling hash of the full text (Rabin-Karp style, base 31,
    * mod 1_000_000_007), built from aggregate() over the char array so it
    * runs inside the JVM row pipeline. The modulus keeps every intermediate
    * below 2^35, so the fold is safe under Spark 4's default ANSI mode (the
    * previous wrapping-mod-2^64 form threw [ARITHMETIC_OVERFLOW]) and the
    * same fold is expressible in any engine for oracle checks. Equal
    * strings hash equal; used as a cheap content fingerprint. */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * lit(31L) + c, lit(1000000007L)))

  /** Shingle fingerprints: rolling window of `n` tokens (space-joined) —
    * the input units for MinHash. Empty when the document has fewer than
    * `n` tokens.
    *
    * Built as n−1 zip_with passes over shifted copies of the token array
    * (shingle i = ts[i] ⧺ ts[i+1] ⧺ … ⧺ ts[i+n−1]), which is O(n·len)
    * per document; the naive `slice`-inside-`transform` form is O(len²)
    * because each window re-slices the array — at ~55 tokens/doc that
    * rewrite alone was worth ~3× on the dedup bench queries (higher-order
    * functions run interpreted, so constant factors matter). Tail entries
    * where the window runs off the end become null via `concat` and are
    * sliced away. */
  def tokenShingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    val joined = (1 until n).foldLeft(ts) { (acc, o) =>
      zip_with(acc, slice(ts, lit(o + 1), size(ts)),
        (a, b) => concat(a, lit(" "), b))
    }
    when(size(ts) >= n, slice(joined, lit(1), size(ts) - lit(n - 1)))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct xxhash64 shingle hashes — the input units for MinHash, n-gram
    * Jaccard, and decontamination. Computed by the native codegen'd
    * [[graft.functions.expressions.ShingleHashes]] expression (one pass over
    * the raw bytes, zero string materialization); bit-identical to
    * `array_distinct(transform(tokenShingles(text, n), xxhash64))`, which
    * TextFunctionsSpec asserts. */
  def shingleHashes(text: Column, n: Int): Column =
    array_distinct(
      graft.functions.expressions.TextExpressions.shingleHashesNative(text, n))

  /** All shingle hashes WITH multiplicity (one per window position) — the
    * input for frequency-style repetition signals, where duplicate shingles
    * are the point. */
  def shingleHashesAll(text: Column, n: Int): Column =
    graft.functions.expressions.TextExpressions.shingleHashesNative(text, n)

  // --- PII detection / redaction (regex, scan-local) ------------------------

  /** Conservative public-pattern regexes, RE2-compatible (no lookaround,
    * no backreferences) so the SAME pattern strings run under Spark's Java
    * regex and DuckDB's RE2 in the oracle. Redaction at corpus scale is a
    * narrow scan-local map — the property these preserve. */
  val emailPattern: String = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val phonePattern: String = """\b555-[0-9]{4}\b"""
  val urlPattern: String = """https?://[^ ]+"""

  def countMatches(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("int")

  /** Replace URLs, then emails, then phones with typed sentinels. URL runs
    * first so an address-looking path segment can't leak a partial match;
    * the sentinels contain no pattern characters, so passes compose. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlPattern, "<URL>"),
        emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** CONSISTENT pseudonymization of email addresses: every occurrence of
    * an address — in this document and every other — becomes the same
    * `user_<md5-prefix>` surrogate. Unlike [[redactPii]]'s type sentinels
    * (which erase identity), surrogates stay JOINABLE: cross-document
    * per-entity analysis (activity counts, dedup keys, graph edges)
    * survives the privacy pass. The surrogate derives from md5 of the
    * matched address only, so two engines — or two pipeline runs — agree
    * without shared state or a mapping table; nothing sensitive persists.
    *
    * Implemented as a fold of literal `replace` over the document's OWN
    * match list — a per-row HOF bounded by the handful of addresses a
    * document contains, not a bulk per-token path (the hot-path HOF rule
    * doesn't bite: cost is O(matches), and matches are rare). */
  def pseudonymizeEmails(text: Column): Column =
    aggregate(
      regexp_extract_all(text, lit(emailPattern), lit(0)),
      text,
      (acc, m) => call_function("replace", acc, m,
        concat(lit("user_"), substring(md5(m), 1, 8))))

  /** All URL occurrences (full matches). */
  def urls(text: Column): Column = regexp_extract_all(text, lit(urlPattern), lit(0))

  /** Host part of one URL. */
  def urlDomain(url: Column): Column =
    regexp_extract(url, """https?://([^/ ]+)""", 1)

  // --- repetition signals (Gopher/C4-style quality filters) -----------------

  /** Fraction of tokens that are repeats of an earlier token:
    * 1 − |distinct| / |tokens|. High values flag keyword-stuffed or
    * looping generations. Scan-local, codegen'd (no HOFs). */
  def dupTokenFrac(text: Column): Column = {
    val n = tokenCount(text)
    when(n > 0,
      lit(1.0) - uniqueTokenCount(text).cast("double") / n.cast("double"))
      .otherwise(lit(0.0))
  }
}
