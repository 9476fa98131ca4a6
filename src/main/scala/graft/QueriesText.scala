package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.CdcEnvelope
import graft.operators.{Batching, Enrichment, Filters, PartitionKeys}
import graft.functions.{Dedup, Multimodal, Similarity, TextFunctions => TF}

/** Text analysis over the documents table.
  *
  * One slice of the [[Queries]] catalog — registrations run at
  * trait initialization, in the linearization order [[Queries]]
  * declares, so the catalog order is identical to the pre-split
  * single file. */
private[graft] trait QueriesText { this: QueryDomain =>

  // ==========================================================================
  // Text analysis (documents)
  // ==========================================================================

  register("text_frequent_tokens", Some(
    """SELECT token, n_occurrences, n_docs FROM (
      |  SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences,
      |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |    row_number() OVER (ORDER BY count(*) DESC, token) AS rnk
      |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS token
      |        FROM documents)
      |  GROUP BY token) WHERE rnk <= 20""".stripMargin)) { (s, dir) =>
    // Exact global heavy hitters (stopword / boilerplate-token discovery):
    // explode → one aggregation keyed by token (partial map-side — the
    // shuffle carries one row per distinct token per partition, never the
    // token stream), then top-k over the |vocabulary|-sized result as a
    // TakeOrdered with a total order (token breaks count ties). At 100 TB
    // the vocabulary, not the corpus, bounds the second stage.
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(20)
  }

  register("text_bpe_pairs", Some(
    """WITH wf AS (
      |  SELECT w, count(*) AS f FROM (
      |    SELECT lower(unnest(str_split(text, ' '))) AS w FROM documents)
      |  WHERE length(w) >= 2 GROUP BY w)
      |SELECT pair, CAST(SUM(f) AS BIGINT) AS freq FROM (
      |  SELECT unnest(list_transform(range(1, length(w)),
      |    i -> substring(w, CAST(i AS INT), 2))) AS pair, f
      |  FROM wf)
      |GROUP BY pair ORDER BY freq DESC, pair LIMIT 50""".stripMargin)) { (s, dir) =>
    // One BPE merge-learning step at corpus scale (Sennrich et al. 2016:
    // learn merges from the WORD-FREQUENCY table, not the token stream).
    // Stage 1 compresses the corpus to its vocabulary — one token-keyed
    // aggregation whose shuffle carries one row per distinct word per
    // partition (map-side partial counts), the same compression every BPE
    // trainer does first. Stage 2 explodes adjacent symbol pairs over that
    // VOCABULARY-sized table and weights each pair by word frequency — at
    // 100 TB the pair stage costs O(|vocab| * avg word length), orders of
    // magnitude below the corpus scan that feeds it. The interpreted
    // transform() HOF is fine HERE because it runs on the compressed
    // domain; the corpus-sized stage 1 is pure codegen (split + explode +
    // hash agg). Top-50 pairs = TakeOrdered with a total order (pair
    // string breaks frequency ties identically in both engines).
    val wf = Tables.documents(s, dir)
      .select(explode(TF.tokens(col("text"))).as("t"))
      .select(lower(col("t")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("f"))
    wf.select(col("f"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("f")).as("freq"))
      .orderBy(col("freq").desc, col("pair"))
      .limit(50)
  }

  register("corpus_quality_cutoff", Some(
    """WITH t AS (
      |  SELECT doc_id, source, length(text) AS n,
      |    len(str_split(text, ' ')) AS n_tokens,
      |    len(list_filter(str_split(text, ' '),
      |      x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS stop_ct,
      |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_ct,
      |    n_chars
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, source,
      |    least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4
      |      + least(CAST(stop_ct AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.4
      |      + (1.0 - least(CAST(punct_ct AS DOUBLE) / CAST(n AS DOUBLE) * 10.0, 1.0)) * 0.2
      |      AS quality
      |  FROM t)
      |SELECT doc_id, source, quality FROM (
      |  SELECT doc_id, source, round(quality, 6) AS quality,
      |    percent_rank() OVER (PARTITION BY source
      |      ORDER BY round(quality, 6), doc_id) AS pr,
      |    count(*) OVER (PARTITION BY source) AS n_src
      |  FROM q) WHERE n_src = 1 OR pr >= 0.1""".stripMargin)) { (s, dir) =>
    // Adaptive per-source quality floor: drop each source's bottom decile
    // rather than a fixed global threshold (sources differ in baseline
    // quality — a fixed cutoff over-prunes clean sources and under-prunes
    // noisy ones). The cutoff is RANK-based (percent_rank = (rank−1)/(n−1),
    // exact integer arithmetic identical in both engines) instead of
    // comparing against an interpolated percentile value, whose last-ulp
    // differences could flip boundary docs. BOTH engines rank the
    // 6-dp-rounded score (TF.qualityScore rounds; an unrounded oracle
    // could order two sub-ulp-apart docs differently and keep different
    // sets). Single-doc sources are exempt — percent_rank of a lone row
    // is 0 in both engines, and "drop the bottom decile" must not mean
    // "erase every tail source". One shuffle keyed by source.
    val docs = Tables.documents(s, dir)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality"), col("doc_id"))
    val wn = Window.partitionBy(col("source"))
    docs.select(col("doc_id"), col("source"),
        TF.qualityScore(col("text"), col("n_chars")).as("quality"))
      .withColumn("__pr", percent_rank().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      .filter(col("__n") === 1 || col("__pr") >= 0.1)
      .drop("__pr", "__n")
  }

  register("text_entropy", Some(
    """WITH toks AS (
      |  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
      |c AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
      |n AS (SELECT doc_id, term, c, sum(c) OVER (PARTITION BY doc_id) AS n
      |      FROM c),
      |h AS (SELECT doc_id,
      |  CAST(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)
      |    / 0.6931471805599453 AS DECIMAL(38,9)) AS h_term,
      |  c FROM n)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |  count(*) AS n_distinct,
      |  round(CAST(sum(h_term) AS DOUBLE), 6) AS entropy_bits
      |FROM h GROUP BY 1""".stripMargin)) { (s, dir) =>
    // Token-distribution Shannon entropy per document (bits) — the
    // gibberish/boilerplate quality axis the ratio heuristics miss: a
    // keyboard-mash doc maxes char diversity but its TOKEN entropy
    // collapses once mashing repeats; a template doc sits far below the
    // corpus norm. Same determinism discipline as text_unigram_logprob:
    // each term's −p·log2(p) is quantized to DECIMAL(38,9) before the
    // order-free sum (ln() is not correctly-rounded cross-engine; the
    // quantum absorbs the ulp at 1000× finer than the output round), and
    // log2 divides by a LITERAL ln 2 so neither engine evaluates ln(2)
    // itself. One keyed count + one doc-partition window — two keyed
    // shuffles, no joins.
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
    val counts = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("c"))
    val withN = counts.withColumn("n",
      sum(col("c")).over(Window.partitionBy(col("doc_id"))))
    val p = col("c").cast("double") / col("n")
    withN
      .withColumn("h_term",
        (-p * log(p) / lit(0.6931471805599453)).cast("decimal(38,9)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(sum(col("h_term")).cast("double"), 6).as("entropy_bits"))
  }

  register("text_stats", Some(
    """SELECT doc_id, length(text) AS n_chars_calc,
      |  len(str_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(str_split(text, ' '))) AS n_uniq_tokens,
      |  CAST(length(text) - (len(str_split(text, ' ')) - 1) AS DOUBLE)
      |    / CAST(len(str_split(text, ' ')) AS DOUBLE) AS avg_token_len
      |FROM documents""".stripMargin)) { (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars_calc"),
      TF.tokenCount(col("text")).as("n_tokens"),
      TF.uniqueTokenCount(col("text")).as("n_uniq_tokens"),
      TF.avgTokenLength(col("text")).as("avg_token_len"))
  }

  register("text_quality", Some(
    """WITH t AS (
      |  SELECT doc_id, n_chars, length(text) AS n,
      |    len(str_split(text, ' ')) AS n_tokens,
      |    len(list_filter(str_split(text, ' '),
      |      x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS stop_ct,
      |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_ct
      |  FROM documents)
      |SELECT doc_id, stop_ct,
      |  CAST(stop_ct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
      |  CAST(punct_ct AS DOUBLE) / CAST(n AS DOUBLE) AS punct_ratio,
      |  least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4
      |    + least(CAST(stop_ct AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.4
      |    + (1.0 - least(CAST(punct_ct AS DOUBLE) / CAST(n AS DOUBLE) * 10.0, 1.0)) * 0.2
      |    AS quality
      |FROM t""".stripMargin)) { (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"),
      TF.stopwordCount(col("text")).as("stop_ct"),
      TF.stopwordRatio(col("text")).as("stop_ratio"),
      TF.punctRatio(col("text")).as("punct_ratio"),
      TF.qualityScore(col("text"), col("n_chars")).as("quality"))
  }

  register("text_langid", Some {
    val scores = TF.langMarkers.map { case (lang, ms) =>
      val inList = ms.map(m => s"'$m'").mkString(",")
      s"len(list_filter(str_split(text, ' '), x -> x IN ($inList))) AS s_$lang"
    }.mkString(",\n    ")
    val langs = TF.langMarkers.map(_._1)
    val best = s"greatest(${langs.map("s_" + _).mkString(",")})"
    val cases = langs.map(l => s"WHEN s_$l = m AND m > 0 THEN '$l'").mkString(" ")
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    $scores
       |  FROM documents),
       |m AS (SELECT *, $best AS m FROM t)
       |SELECT doc_id, lang, CASE $cases ELSE 'und' END AS pred_lang FROM m""".stripMargin
  }) { (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"), col("lang"), TF.langId(col("text")).as("pred_lang"))
  }

  register("text_fingerprint", Some(
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(str_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      |    (a, c) -> (a * 31 + c) % 1000000007) AS fingerprint,
      |  CAST(list_sum(list_transform(str_split(text, ' '),
      |    w -> greatest(CAST(1 AS BIGINT), CAST(ceil(length(w) / 4.0) AS BIGINT)))) AS BIGINT)
      |    AS bpe_tokens
      |FROM documents""".stripMargin)) { (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"),
      TF.fingerprint(col("text")).as("fingerprint"),
      TF.bpeTokenEstimate(col("text")).as("bpe_tokens"))
  }

  register("text_repetition", Some(
    """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
      |b AS (SELECT doc_id,
      |  unnest(list_transform(range(1, len(toks)),
      |    i -> toks[i] || ' ' || toks[i+1])) AS g FROM t),
      |bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2),
      |tb AS (SELECT doc_id,
      |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac
      |  FROM bc GROUP BY 1)
      |SELECT t.doc_id, len(toks) AS n_tokens,
      |  1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
      |    / CAST(len(toks) AS DOUBLE) AS dup_token_frac,
      |  coalesce(tb.top_bigram_frac, 0.0) AS top_bigram_frac
      |FROM t LEFT JOIN tb USING (doc_id)""".stripMargin)) { (s, dir) =>
    // Gopher/C4-style repetition signals: the standard filters a training
    // corpus applies before dedup. ENTIRELY scan-local: dup_token_frac is
    // codegen'd set arithmetic, and top_bigram_frac is the codegen'd
    // max-multiplicity fraction of the row's own bigram-hash array (same
    // grouping as the string bigram, collisions negligible) — zero
    // exchanges, zero joins (the earlier explode+groupBy form spent two
    // shuffles plus a doc_id join on the same signal; TextFunctionsSpec
    // proves the expression equals that form).
    Tables.documents(s, dir).select(col("doc_id"),
      TF.tokenCount(col("text")).as("n_tokens"),
      TF.dupTokenFrac(col("text")).as("dup_token_frac"),
      graft.functions.expressions.TextExpressions
        .topFreqFracNative(TF.shingleHashesAll(col("text"), 2))
        .as("top_bigram_frac"))
  }

  register("text_pseudonymize", Some(
    """WITH e AS (
      |  SELECT doc_id,
      |    text || ' from user' || CAST(doc_id % 50 AS VARCHAR) ||
      |      '@example.com to user' || CAST(doc_id % 7 AS VARCHAR) ||
      |      '@mail.org end' AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
      |    AS n_emails,
      |  md5(list_reduce(
      |    list_prepend(t, regexp_extract_all(t,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')),
      |    (acc, m) -> replace(acc, m, 'user_' || substr(md5(m), 1, 8))))
      |    AS pseudo_md5
      |FROM e""".stripMargin)) { (s, dir) =>
    // CONSISTENT pseudonymization — the privacy pass that keeps entities
    // JOINABLE: the same address maps to the same user_<md5-8> surrogate
    // in every document (doc_id%50 / doc_id%7 plant deliberate
    // cross-document collisions, like text_pii_redact plants addresses),
    // so per-entity analytics survive where <EMAIL> sentinels erase them.
    // Surrogates derive from the matched text alone — no mapping table,
    // no state, two engines agree by construction (the oracle folds the
    // identical replace over the identical match list via list_reduce).
    // Scan-local narrow pass; the fold is bounded by a doc's match count.
    val planted = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("text"),
        lit(" from user"), (col("doc_id") % 50).cast("string"),
        lit("@example.com to user"), (col("doc_id") % 7).cast("string"),
        lit("@mail.org end")).as("t"))
    planted.select(col("doc_id"),
      TF.countMatches(col("t"), TF.emailPattern).as("n_emails"),
      md5(TF.pseudonymizeEmails(col("t"))).as("pseudo_md5"))
  }

  register("text_pii_redact", Some(
    """WITH e AS (
      |  SELECT doc_id,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |      '@example.com or x' || CAST(doc_id AS VARCHAR) ||
      |      '@mail.example.org phone 555-' ||
      |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      |      ' see https://host' || CAST(doc_id % 7 AS VARCHAR) ||
      |      '.example.com/p/' || CAST(doc_id AS VARCHAR) || ' end' AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
      |  CAST(len(regexp_extract_all(t, '\b555-[0-9]{4}\b')) AS INT) AS n_phones,
      |  CAST(len(regexp_extract_all(t, 'https?://[^ ]+')) AS INT) AS n_urls,
      |  md5(regexp_replace(regexp_replace(regexp_replace(t,
      |    'https?://[^ ]+', '<URL>', 'g'),
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\b555-[0-9]{4}\b', '<PHONE>', 'g')) AS redacted_md5
      |FROM e""".stripMargin)) { (s, dir) =>
    // PII detection + redaction (emails / phones / URLs). The fixture text
    // carries no PII, so the query PLANTS deterministic addresses from
    // doc_id — the oracle replays the identical construction — and the
    // regex machinery (RE2-compatible patterns, global replace, typed
    // sentinels) sits under the hash compare via md5(redacted). Scan-local
    // narrow map: at 100 TB this is a zero-shuffle pass over the corpus.
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or x"), col("doc_id").cast("string"),
      lit("@mail.example.org phone 555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" see https://host"), (col("doc_id") % 7).cast("string"),
      lit(".example.com/p/"), col("doc_id").cast("string"), lit(" end"))
    Tables.documents(s, dir)
      .select(col("doc_id"), planted.as("t"))
      .select(col("doc_id"),
        TF.countMatches(col("t"), TF.emailPattern).as("n_emails"),
        TF.countMatches(col("t"), TF.phonePattern).as("n_phones"),
        TF.countMatches(col("t"), TF.urlPattern).as("n_urls"),
        md5(TF.redactPii(col("t"))).as("redacted_md5"))
  }

  register("text_url_domains", Some(
    """WITH e AS (
      |  SELECT doc_id,
      |    'see https://host' || CAST(doc_id % 7 AS VARCHAR) ||
      |      '.example.com/p/' || CAST(doc_id AS VARCHAR) ||
      |      ' and https://cdn' || CAST(doc_id % 3 AS VARCHAR) ||
      |      '.example.net/x end' AS t
      |  FROM documents),
      |u AS (SELECT doc_id, unnest(regexp_extract_all(t, 'https?://[^ ]+')) AS url
      |      FROM e)
      |SELECT regexp_extract(url, 'https?://([^/ ]+)', 1) AS domain,
      |  count(*) AS n_urls, count(DISTINCT doc_id) AS n_docs
      |FROM u GROUP BY 1""".stripMargin)) { (s, dir) =>
    // URL extraction + per-domain frequency — the link-graph slice of a
    // crawl pipeline (domain blocklists, per-site caps). Extraction is
    // scan-local; the only shuffle carries (domain, doc_id) pairs, i.e.
    // |urls| rows, partial-aggregated map-side. URLs are planted from
    // doc_id (the fixture has none) with the oracle replaying the same
    // construction.
    val planted = concat(
      lit("see https://host"), (col("doc_id") % 7).cast("string"),
      lit(".example.com/p/"), col("doc_id").cast("string"),
      lit(" and https://cdn"), (col("doc_id") % 3).cast("string"),
      lit(".example.net/x end"))
    Tables.documents(s, dir)
      .select(col("doc_id"), planted.as("t"))
      .select(col("doc_id"), explode(TF.urls(col("t"))).as("url"))
      .groupBy(TF.urlDomain(col("url")).as("domain"))
      .agg(count(lit(1)).as("n_urls"), countDistinct(col("doc_id")).as("n_docs"))
  }
}
