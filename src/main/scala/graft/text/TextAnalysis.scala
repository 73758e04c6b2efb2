package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality / language / token operators for training-data pipelines.
  * Deliberately expressed with arithmetic on `length`/`replace`/`split`
  * built-ins (codegen'd, and reproducible as plain ANSI SQL for the DuckDB
  * oracle) rather than opaque UDFs.
  */
object TextAnalysis {

  /** Whitespace token count: split on single spaces, keeping empties —
    * semantics match DuckDB `len(string_split(text, ' '))`. */
  def tokenCount(text: Column): Column = size(split(text, " ", -1))

  /** GPT-2-shaped BPE pre-tokenizer pattern, restricted to constructs that
    * behave identically under Java regex and RE2 (no lookahead — RE2 lacks
    * it), so Spark and the DuckDB oracle count the same tokens: contraction
    * suffixes, space-prefixed letter runs, digit runs, symbol runs,
    * residual whitespace. */
  val BpeTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-style token count — a closer proxy for LLM token budgets than
    * whitespace splitting (digits and punctuation tokenize separately).
    * Pure `regexp_extract_all` column arithmetic: codegen, no UDF. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Occurrences of a literal substring, via length arithmetic (SQL-safe). */
  def countOccurrences(text: Column, sub: String): Column = countLit(text, sub)

  private def countLit(text: Column, sub: String): Column =
    ((length(text) - length(replaceLit(text, sub))) / lit(sub.length)).cast("long")

  // round-6 note: swapping this for plain StringReplace was TRIED and
  // reverted. Output is identical for a literal needle, and in theory the
  // regex engine per needle per row is pure overhead — but a same-window
  // A/B of the bench query phase measured d9 (whose pushed-down filter
  // inlines ~90 of these) at 1.62 s with regexp_replace vs 2.91 s with
  // StringReplace on its cold first run, with warm runs and d2/d3
  // identical under both. The cost difference is in the one-time
  // codegen/compile of the giant inlined tree, not per-row work — keep
  // the variant the measurement favors.
  private def replaceLit(text: Column, sub: String): Column =
    regexp_replace(text, java.util.regex.Pattern.quote(sub), "")

  /** Heuristic quality features + score (length, punctuation density,
    * stopword ratio, mean word length). Score ∈ [0,1]; higher = better. */
  def qualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokenCount(t)
    // stopwords counted over the same space-padded text langId uses, so a
    // document's FIRST and LAST words participate — unpadded, "Of mice and
    // men" counted 1 stopword instead of 2 and near-threshold docs fell on
    // the wrong side of cleanCorpus's quality gate
    val padded = concat(lit(" "), lower(t), lit(" "))
    docs
      .withColumn("n_chars", length(t).cast("long"))
      .withColumn("n_tokens", toks.cast("long"))
      .withColumn("mean_word_len",
        (length(t) - (toks - lit(1))).cast("double") / toks.cast("double"))
      .withColumn("punct_count",
        (countLit(t, ".") + countLit(t, ",") + countLit(t, "!") + countLit(t, "?")).cast("long"))
      .withColumn("stopword_count",
        (countLit(padded, " the ") + countLit(padded, " a ") +
          countLit(padded, " and ") + countLit(padded, " of ")).cast("long"))
      .withColumn("punct_ratio", col("punct_count").cast("double") / col("n_tokens"))
      .withColumn("stopword_ratio", col("stopword_count").cast("double") / col("n_tokens"))
      .withColumn("quality_score",
        least(lit(1.0),
          (least(col("n_tokens").cast("double") / lit(20.0), lit(1.0)) * lit(0.4)) +
            (least(col("stopword_ratio") * lit(8.0), lit(1.0)) * lit(0.4)) +
            (when(col("mean_word_len").between(3.0, 9.0), lit(0.2)).otherwise(lit(0.0)))))
  }

  /** N-gram-heuristic language ID over a fixed stopword inventory: counts
    * per-language marker words, argmax with 'und' (undetermined) when no
    * marker hits. Expressible in plain SQL (the oracle reproduces it). */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = concat(lit(" "), lower(col(textCol)), lit(" "))
    // coalesce: null text null-propagates through every count, and a null
    // score slides past ALL the when() conditions below (null is not
    // matched) straight into the otherwise branch — classifying every
    // null-text document as 'fr'; with scores pinned to 0 it is 'und'
    def score(words: Seq[String]): Column =
      coalesce(words.map(w => countLit(t, s" $w ")).reduce(_ + _), lit(0L))
    docs
      .withColumn("score_en", score(Seq("the", "and", "of", "is", "with")))
      .withColumn("score_de", score(Seq("der", "die", "und", "ist", "mit")))
      .withColumn("score_fr", score(Seq("le", "la", "et", "est", "avec")))
      .withColumn("lang_pred",
        when(greatest(col("score_en"), col("score_de"), col("score_fr")) === 0, lit("und"))
          .when(col("score_en") >= col("score_de") && col("score_en") >= col("score_fr"), lit("en"))
          .when(col("score_de") >= col("score_fr"), lit("de"))
          .otherwise(lit("fr")))
  }

  /** The composed training-data cleaning pass a 100-TB corpus run executes:
    * exact dedup (keep the canonical copy of each distinct text), language
    * filter, token-count bounds, quality threshold — in one plan: a single
    * md5 fingerprint shuffle for dedup, then purely narrow per-row feature
    * arithmetic and filters (all codegen, no UDFs). Every stage is one of
    * the oracle-checked operators above, so the COMPOSITION is
    * oracle-checked too (d9_clean_corpus).
    *
    * @return (doc_id, lang_pred, n_tokens, quality_score) for survivors
    */
  def cleanCorpus(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      lang: String = "en", minTokens: Long = 3, maxTokens: Long = 5000,
      minQuality: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val canonical = docs
      .withColumn("_canon", min(col(idCol)).over(Window.partitionBy(md5(col(textCol)))))
      .where(col(idCol) === col("_canon")).drop("_canon")
    langId(qualityFeatures(canonical, textCol), textCol)
      .where(col("lang_pred") === lang &&
        col("n_tokens").between(minTokens, maxTokens) &&
        col("quality_score") >= minQuality)
      .select(col(idCol), col("lang_pred"), col("n_tokens"), col("quality_score"))
  }

  /** Repetition signals for corpus-quality filtering (the Gopher/C4-family
    * heuristics: heavily self-repeating documents are boilerplate or spam):
    *
    *   - `n_3grams` / `n_distinct_3grams`: duplicate word-3-gram fraction is
    *     `1 - distinct/total` (0 when fewer than 3 words);
    *   - `top_word_count` / `n_words`: most-frequent-word dominance.
    *
    * Emits integer COUNTS, not fractions — callers derive ratios, and
    * integers keep the DuckDB oracle hash-exact (d10). All pure
    * higher-order-function column arithmetic: codegen, per-row narrow, no
    * shuffle — the 100-TB shape. The top-word scan is distinct×filter,
    * O(cap²) per row, so it runs over the first `topWordCap` words — an
    * explicit, parameterized bound, not a silent one. */
  def repetitionSignals(docs: DataFrame, textCol: String = "text",
      topWordCap: Int = 500): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("_w", filter(split(lower(t), " ", -1), x => length(x) > lit(0)))
      .withColumn("n_words", size(col("_w")).cast("long"))
      .withColumn("_g", when(col("n_words") >= 3,
        transform(sequence(lit(1), (col("n_words") - 2).cast("int")),
          i => concat_ws(" ", element_at(col("_w"), i),
            element_at(col("_w"), i + 1), element_at(col("_w"), i + 2))))
        .otherwise(lit(Array.empty[String])))
      .withColumn("n_3grams", size(col("_g")).cast("long"))
      .withColumn("n_distinct_3grams", size(array_distinct(col("_g"))).cast("long"))
      .withColumn("_wc", slice(col("_w"), 1, topWordCap))
      // round-6: max word frequency as the longest equal-run in the SORTED
      // window — O(cap log cap) + one linear fold instead of the old
      // distinct×filter O(cap²) rescan per row (same value: equal words
      // are adjacent after sorting, so the longest run IS the top count;
      // value-identical, d10 stays oracle-green). At 100 TB this is a
      // per-row narrow op on every document — the quadratic scan was the
      // single most expensive expression in the text family.
      .withColumn("top_word_count",
        aggregate(array_sort(col("_wc")),
          struct(lit(null).cast("string").as("prev"), lit(0).as("run"), lit(0).as("best")),
          (acc, w) => {
            val run = when(acc.getField("prev") <=> w, acc.getField("run") + 1).otherwise(lit(1))
            struct(w.as("prev"), run.as("run"),
              greatest(acc.getField("best"), run).as("best"))
          },
          acc => acc.getField("best")).cast("long"))
      .drop("_w", "_g", "_wc")
  }

  /** Email pattern — lookahead-free and `\b`-free where it matters, so Java
    * regex (Spark) and RE2 (DuckDB oracle) match identically. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic: no octet-range check — PII scrubbing
    * over-matches by design; RE2-compatible). */
  val Ipv4Pattern: String = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII detection + redaction — the scrubbing pass of a corpus pipeline
    * (C4/CCNet-style): counts emails and IPv4 literals per document and
    * rewrites them to `<EMAIL>` / `<IP>` placeholders. Pure
    * `regexp_extract_all` / `regexp_replace` column arithmetic (codegen,
    * narrow, no shuffle); both patterns are RE2-compatible so the DuckDB
    * oracle (d11) reproduces counts AND the redacted text byte-for-byte. */
  def piiRedact(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_emails", size(regexp_extract_all(t, lit(EmailPattern), lit(0))).cast("long"))
      .withColumn("n_ips", size(regexp_extract_all(t, lit(Ipv4Pattern), lit(0))).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(t, EmailPattern, "<EMAIL>"), Ipv4Pattern, "<IP>"))
  }

  /** Document fingerprint: md5 of normalized text (lowercased, trimmed,
    * runs of whitespace collapsed) + a 16-hex-char prefix as a compact
    * join key. */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      // collapse BEFORE trimming: trim() strips only ASCII spaces, so a
      // leading/trailing tab or newline survived trim-first and became an
      // edge space after the collapse — texts differing only in edge
      // whitespace got different fingerprints, defeating the dedup key
      .withColumn("norm_text", trim(regexp_replace(lower(col(textCol)), "\\s+", " ")))
      .withColumn("fingerprint", md5(col("norm_text")))
      .withColumn("fingerprint16", substring(col("fingerprint"), 1, 16))
      .drop("norm_text")
}
