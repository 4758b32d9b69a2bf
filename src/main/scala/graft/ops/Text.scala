package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis for large-scale training-data pipelines: token counting,
  * quality scoring, language-ID, fingerprinting. All pure column
  * expressions (map-only, whole-stage codegen, no UDFs) — at 100 TB these
  * run at parquet-scan speed with no shuffle.
  */
object Text {

  /** Whitespace token array. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, 0).otherwise(size(tokens(c))).cast(LongType)

  /** BPE-ish token count: ASCII word runs + single non-space symbols —
    * the classic pre-tokenizer regex, ASCII-scoped so every engine's
    * regex agrees. */
  val BpeTokenPattern = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeTokenPattern), lit(0))).cast(LongType)

  /** Quality-score components (length, punctuation ratio, stopword ratio,
    * mean word length) and a composite in [0,1] — the heuristics quality
    * filters (C4-style) use. */
  val EnStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this", "are")

  def punctRatio(c: Column): Column = {
    val n = length(c)
    when(n === 0, 0.0).otherwise(
      (n - length(regexp_replace(c, "[^A-Za-z0-9\\s]", ""))).cast(DoubleType) / n)
  }

  def stopwordRatio(c: Column): Column = {
    val toks = tokens(lower(c))
    // native count_in: occurrence count against the stopword set in one
    // codegen loop (a filter() lambda runs interpreted per token)
    val hits = call_function("count_in", toks, typedlit(EnStopwords))
    when(size(toks) === 0, 0.0).otherwise(hits.cast(DoubleType) / size(toks))
  }

  def meanWordLen(c: Column): Column = {
    val toks = tokens(c)
    // sum of token lengths == length of the separator-free join — a
    // plain builtin chain, no per-element aggregate lambda
    when(size(toks) === 0, 0.0).otherwise(
      length(concat_ws("", toks)).cast(DoubleType) / size(toks))
  }

  /** Composite quality score in [0,1]: rewards mid-range length, modest
    * punctuation, presence of stopwords, word lengths near natural prose. */
  def qualityScore(c: Column, minChars: Int = 50, maxChars: Int = 100000): Column = {
    val lenOk = (length(c) >= minChars && length(c) <= maxChars).cast(DoubleType)
    val punctOk = (punctRatio(c) <= 0.2).cast(DoubleType)
    val stopOk = (stopwordRatio(c) >= 0.01).cast(DoubleType)
    val wordOk = (meanWordLen(c).between(2.0, 12.0)).cast(DoubleType)
    (lenOk + punctOk + stopOk + wordOk) / 4.0
  }

  /** Flesch reading-ease score from regex-countable proxies: words =
    * alphanumeric runs, sentences = terminal-punct-before-space runs
    * + 1 (the trailing segment), syllables = vowel-group runs (the
    * standard programmatic approximation). Map-only — three
    * regexp_extract_all counts and fixed arithmetic, so the doubles
    * replay exactly on any engine that counts the same runs. Higher =
    * easier; natural English prose sits roughly 60-80. */
  def fleschScore(c: Column): Column = {
    val words = size(regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0)))
      .cast(DoubleType)
    val sentences = (size(regexp_extract_all(c, lit("[.!?]\\s"), lit(0))) + 1)
      .cast(DoubleType)
    val syllables = size(regexp_extract_all(lower(c), lit("[aeiouy]+"), lit(0)))
      .cast(DoubleType)
    when(words === 0, lit(null).cast(DoubleType)).otherwise(
      lit(206.835) - lit(1.015) * (words / sentences) -
        lit(84.6) * (syllables / words))
  }

  /** The full Gopher document-quality rule set (Rae et al. 2021 §A1.1)
    * as one MAP-ONLY pass — per doc, every rule's statistic plus the
    * conjunction verdict. All statistics are builtin codegen column
    * arithmetic (counts via length deltas and multiline regex counts —
    * no higher-order lambdas), so the filter runs at scan speed on
    * 100 TB and replays exactly in SQL:
    *
    *  - `word_count` in [50, 100k]
    *  - `mean_word_len` in [3, 10]
    *  - `symbol_ratio` (# and ... occurrences per word) < 0.1
    *  - `bullet_frac` (lines starting with -, *) < 0.9
    *  - `ellipsis_frac` (lines ending with ...) < 0.3
    *  - `alpha_frac` (words containing a letter) > 0.8
    *  - `stop_hits` (occurrences of core stopwords) >= 2
    */
  def gopherRules(c: Column): Column = {
    val wc = tokenCount(c)
    val wcD = wc.cast(DoubleType)
    val mwl = round(when(wc === 0, 0.0).otherwise(
      length(regexp_replace(trim(c), "\\s+", "")).cast(DoubleType) / wcD), 6)
    val hashCnt = (length(c) - length(regexp_replace(c, "#", ""))).cast(DoubleType)
    val ellCnt = (length(c) - length(regexp_replace(c, "\\.\\.\\.", ""))).cast(DoubleType) / 3.0
    val symbolRatio = round(when(wc === 0, 0.0)
      .otherwise((hashCnt + ellCnt) / wcD), 6)
    val nLines = size(split(c, "\n")).cast(DoubleType)
    val bulletFrac = round(
      size(regexp_extract_all(c, lit("(?m)^\\s*[-*]"), lit(0))).cast(DoubleType) / nLines, 6)
    val ellipsisFrac = round(
      size(regexp_extract_all(c, lit("(?m)\\.\\.\\.$"), lit(0))).cast(DoubleType) / nLines, 6)
    val alphaWords = size(regexp_extract_all(c,
      lit("(?:^|\\s)[^\\s]*[A-Za-z][^\\s]*"), lit(0))).cast(DoubleType)
    val alphaFrac = round(when(wc === 0, 0.0).otherwise(alphaWords / wcD), 6)
    val stopHits = call_function("count_in", tokens(lower(c)),
      typedlit(Seq("the", "be", "to", "of", "and", "that", "have", "with")))
    val passes = wc.between(50L, 100000L) && mwl.between(3.0, 10.0) &&
      symbolRatio < 0.1 && bulletFrac < 0.9 && ellipsisFrac < 0.3 &&
      alphaFrac > 0.8 && stopHits >= 2L
    struct(wc.as("word_count"), mwl.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
      stopHits.as("stop_hits"), passes.as("passes"))
  }

  /** Language-ID by function-word voting: count token hits against each
    * language's closed-class word list, pick the max (ties alphabetical).
    * An n-gram-free heuristic that is exactly reproducible in SQL; for
    * production accuracy swap in char-trigram profiles behind the same
    * column contract. */
  val StopwordsByLang: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"),
    "en" -> Seq("the", "a", "and", "is", "of", "to", "in", "it", "that", "for"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "no", "un", "una", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "ne", "un", "une", "que", "pour"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "ni", "ta", "men", "zhe", "na"))

  def langScores(c: Column): Seq[(String, Column)] = {
    val toks = tokens(lower(c))
    StopwordsByLang.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> call_function("count_in", toks, typedlit(words)).cast(LongType)
    }
  }

  /** Winning language (max hits, ties alphabetical since langScores is
    * alphabetical and greatest-first comparison is strict). */
  def langId(c: Column): Column = {
    val scores = langScores(c)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Polynomial rolling-hash fingerprint of the raw text:
    * fold(acc*31 + codepoint) mod 1e9+7 — deterministic, engine-agnostic
    * (DuckDB: list_reduce with a prepended 0 accumulator). Native
    * codegen kernel ([[graft.functions.Fingerprint64]]) — the
    * higher-order form materialized a per-character array and ran the
    * lambda interpreted per element. */
  val FingerprintMod = 1000000007L
  def fingerprint(c: Column): Column =
    call_function("fingerprint64", c.cast(StringType))

  /** Unicode text normalization ("ftfy-lite") — the front door of a
    * cleaning pipeline: NFC canonical composition (native `nfc_normalize`
    * expression — decomposed accents from OCR/web sources make
    * identical-looking strings hash differently, silently defeating exact
    * dedup), curly quotes / en-em dashes / NBSP unified to ASCII,
    * control/format characters to spaces, whitespace collapsed, trimmed.
    * Map-only codegen chain; every step has the same semantics in DuckDB
    * (`nfc_normalize` + `translate` + RE2 `\p{Cc}\p{Cf}`), so the oracle
    * is exact. */
  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep lines
    * with >= `minWords` words and (optionally) a terminal-punctuation
    * ending — nav menus and cookie banners die line-by-line, prose
    * survives. Native `clean_lines` expression: one row-local codegen
    * loop, map-only. */
  def cleanLines(c: Column, minWords: Int = 3,
                 requireTerminal: Boolean = true): Column =
    call_function("clean_lines", c.cast(StringType), lit(minWords),
      lit(requireTerminal))

  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        translate(call_function("nfc_normalize", c.cast(StringType)),
          "\u2018\u2019\u201C\u201D\u2013\u2014\u00A0", "''\"\"-- "),
        "[\\p{Cc}\\p{Cf}]", " "),
      "\\s+", " "))

  /** PII scrubbing for training text: regex redaction of emails, IPv4
    * addresses, and phone-shaped numbers — map-only codegen'd
    * `regexp_replace` chain (IP before phone: an IP's dotted groups must
    * not half-match the phone pattern). Patterns stay inside the syntax
    * Java regex and RE2 share, so the oracle is expressible. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c,
          EmailRe, "<EMAIL>"),
        IpRe, "<IP>"),
      PhoneRe, "<PHONE>")

  private[ops] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[ops] val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[ops] val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** HTML -> text extraction — the step between a WARC response body and
    * a `documents` row (what trafilatura/jusText do structurally, minus
    * ML boilerplate scoring, which [[graft.ops.Dedup.removeBoilerplateLines]]
    * handles CROSS-document instead): drop script/style/comment blocks
    * wholesale, turn block-level closers into newlines, strip remaining
    * tags, decode the common entities, normalize whitespace. One
    * map-only codegen'd regexp chain in the Java/RE2 SHARED syntax
    * (case-insensitive + dot-all inline flags, lazy quantifiers — no
    * lookaround), so the oracle replays it verbatim and it runs on a
    * streaming DataFrame unchanged. */
  def htmlToText(c: Column): Column = {
    // no pattern backreferences (RE2 has none): script and style blocks
    // drop via alternation
    val noScript = regexp_replace(c,
      "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", "")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", "")
    val breaks = regexp_replace(noComment,
      "(?i)<(br|/p|/div|/h[1-6]|/li|/tr)[^>]*>", "\n")
    val noTags = regexp_replace(breaks, "(?s)<[^>]*>", "")
    val entities = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&") // amp LAST
    val decoded = entities.foldLeft(noTags) { case (acc, (e, r)) =>
      regexp_replace(acc, e, r)
    }
    // spaces collapse; newline runs keep PARAGRAPH structure (>= 2
    // newlines stay a blank-line break for splitParagraphs downstream);
    // edge trim is regex (builtin trim strips SPACES only, not \n)
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(decoded,
      "[ \\t]+", " "), " ?\\n ?", "\n"), "\\n{3,}", "\n\n"),
      "^\\s+|\\s+$", "")
  }

  /** Unicode SCRIPT ranges for [[scriptCounts]] — explicit code-point
    * ranges (not `\p{script=...}` classes, whose tables shift with the
    * engine's Unicode version) in the Java/RE2 shared `\x{...}` syntax,
    * so both engines classify identically forever. Coverage: the major
    * blocks of each script (Latin incl. the 00C0-024F extended letters;
    * CJK = Han unified + kana + hangul syllables) — a SIGNAL for routing
    * and filtering, not an exhaustive Unicode census (documented). */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z\\x{00C0}-\\x{024F}",
    "cyrillic" -> "\\x{0400}-\\x{04FF}",
    "greek" -> "\\x{0370}-\\x{03FF}",
    "arabic" -> "\\x{0600}-\\x{06FF}",
    "devanagari" -> "\\x{0900}-\\x{097F}",
    "cjk" -> "\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}")

  /** Per-script character counts — the pre-langid routing signal (a
    * Cyrillic page should never reach a Latin-alphabet classifier, and
    * mixed-script runs flag mojibake/spam). One map-only `regexp_count`
    * per script, all codegen'd. */
  def scriptCounts(c: Column): Seq[(String, Column)] =
    ScriptRanges.map { case (name, r) =>
      s"n_$name" -> regexp_count(c, lit(s"[$r]"))
    }

  /** Dominant script by count; ties keep the EARLIER [[ScriptRanges]]
    * entry (strict-greater fold — deterministic, oracle-replayable as a
    * CASE chain). Rows with zero script characters report "none". */
  def dominantScript(c: Column): Column = {
    val counts = scriptCounts(c)
    val seed = (lit("none"), lit(0L))
    val (name, _) = counts.foldLeft(seed) { case ((bn, bc), (n, cc)) =>
      val cnt = cc.cast(LongType)
      (when(cnt > bc, lit(n.stripPrefix("n_"))).otherwise(bn),
        when(cnt > bc, cnt).otherwise(bc))
    }
    name
  }

  /** PII AUDIT counts — the measurement twin of [[redactPii]]: per-row
    * match counts for each pattern (email, IPv4, phone), so a source can
    * be scored for PII density BEFORE deciding to redact or drop.
    * Map-only (`regexp_count`, same patterns as the redactor — counts
    * and redactions can't disagree). Counted on the raw text in the
    * redactor's cascade order semantics: an IP inside an email would be
    * seen by both counters, exactly like running each regex alone. */
  def piiStats(c: Column): Seq[(String, Column)] = Seq(
    "n_email" -> regexp_count(c, lit(EmailRe)),
    "n_ip" -> regexp_count(c, lit(IpRe)),
    "n_phone" -> regexp_count(c, lit(PhoneRe)))
}
