package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM-data pipelines (SURVEY.md §2
  * #29-32). All are pure narrow `Column` expressions built from
  * `org.apache.spark.sql.functions` higher-order functions — codegen'd,
  * null-safe, no shuffle, no UDFs — so they stay inside whole-stage
  * codegen and scale linearly with the scan.
  */
object TextFunctions {

  /** Whitespace tokens (single-space split; input corpora are
    * pre-normalized single-spaced lowercase). */
  def tokens(text: Column): Column = split(text, " ")

  /** Greedy maximum-match tokenization against a fixed vocabulary
    * (native expression — see [[graft.functions.expr.MaxMatchTokens]]):
    * longest vocab prefix wins within each space-delimited word,
    * unmatched characters emit `<unk>`. */
  def maxMatchTokens(text: Column, vocab: Seq[String]): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.expr.MaxMatchTokens(
        org.apache.spark.sql.GraftBridge.expression(text), vocab))

  /** Distinct n-word shingles (native expression — see
    * [[graft.functions.expr.WordShingles]]). Documents shorter than `n`
    * tokens collapse to one whole-text shingle. */
  def wordShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.expr.WordShingles(
        org.apache.spark.sql.GraftBridge.expression(text), n))

  /** Unicode normalization (native expression — see
    * [[graft.functions.expr.NormalizeText]]): accent strip (NFD −
    * marks), NFC recompose, ROOT-locale lowercase, control chars and
    * whitespace runs collapsed to single spaces, trimmed. Run FIRST in
    * a dedup pipeline so near-identical spellings shingle identically. */
  def normalizeText(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.expr.NormalizeText(
        org.apache.spark.sql.GraftBridge.expression(text)))

  /** Base 32-bit integer hash per shingle (md5-hex prefix → int): ONE
    * cryptographic hash per shingle, engine-portable. Materialize this
    * as a column before building signatures so the k minhash functions
    * reuse it instead of re-hashing strings k times. */
  def shingleBaseHashes(shingles: Column): Column =
    transform(shingles, s => conv(substring(md5(s), 1, 8), 16, 10).cast("long"))

  private val MinhashPrime = 1000000007L

  /** MinHash signature from base hashes: k universal-hash functions
    * h_i(x) = ((2i+3)·x + 7919·i) mod p, each minimized over the set —
    * the same (a·x + b) mod p family spark.ml's MinHashLSH uses, but
    * with fixed deterministic coefficients so the DuckDB oracle can
    * replay it exactly. Arithmetic stays < 2^38, safe in any engine's
    * signed 64-bit.
    *
    * Folded as ONE aggregate carrying the k running minima, so the base
    * array (and its md5s) is evaluated once per row no matter how the
    * optimizer collapses projections. */
  def minhashFromBase(baseHashes: Column, k: Int): Column =
    aggregate(baseHashes,
      array_repeat(lit(MinhashPrime), k), // p > every h_i value ⇒ +∞ seed
      (acc, h) => zip_with(acc, sequence(lit(0), lit(k - 1)),
        (m, i) => least(m, pmod((i * 2 + 3) * h + i * lit(7919L), lit(MinhashPrime)))))

  /** MinHash signature of a shingle set: one md5 per shingle, then the
    * k-function universal-hash fold — as a single native pass
    * ([[graft.functions.expr.MinHashSignature]]; bit-identical to
    * `minhashFromBase(shingleBaseHashes(shingles), k)`). */
  def minhashSignature(shingles: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.expr.MinHashSignature(
        org.apache.spark.sql.GraftBridge.expression(shingles), k))

  /** LSH band keys over a minhash signature: `bands` keys, each the
    * joined text of `rowsPerBand` consecutive signature entries. Two
    * docs sharing any band key become a candidate pair. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat_ws("|",
        transform(slice(signature, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)),
          x => x.cast("string"))))

  /** Packed NUMERIC LSH band keys: same banding as [[lshBandKeys]] but
    * each band key is two longs instead of a "v1|v2|v3|v4" string —
    * INJECTIVE (signature entries are universal-hash values < p ≈ 2³⁰,
    * so `v1·p + v2 < p² < 2⁶³` packs two per long losslessly; absent
    * slots pad with −1, below every packed value), so two docs share a
    * packed key iff they share the string key — identical candidate
    * buckets, identical downstream pairs. What it buys at the wide
    * step: the (band, key) exchange, rank window and bucket self-join
    * compare 17 bytes of fixed-width ints instead of variable-length
    * strings, and no per-row string assembly runs in the banding
    * projection. Returns array<struct<k1,k2>>; `rowsPerBand ≤ 4`
    * (every graft call site uses 16/4 = 4). */
  def lshBandKeysPacked(signature: Column, bands: Int, rowsPerBand: Int): Column = {
    require(rowsPerBand >= 1 && rowsPerBand <= 4,
      s"lshBandKeysPacked packs at most 4 rows per band, got $rowsPerBand")
    val p = lit(MinhashPrime)
    transform(sequence(lit(0), lit(bands - 1)), b => {
      def at(j: Int): Column =
        element_at(signature, (b * lit(rowsPerBand) + lit(j)).cast("int"))
      def pack(j1: Int): Column =
        if (rowsPerBand >= j1 + 1) at(j1) * p + at(j1 + 1)
        else if (rowsPerBand >= j1) at(j1)
        else lit(-1L)
      struct(pack(1).as("k1"), pack(3).as("k2"))
    })
  }

  /** Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  // --- language ID (#29) -------------------------------------------------

  /** Marker stopwords per language — the classic closed-class-word
    * heuristic (function words are the highest-frequency, most
    * language-distinctive tokens). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that"),
    "es" -> Seq("el", "la", "de", "que", "los", "un", "una", "y", "en"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "des", "du", "est"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "nicht", "ist"),
  )

  /** Occurrence count of `markers` tokens in `text`. */
  def markerScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(markers)))

  /** Per-language marker counts + CJK flag in ONE text pass
    * ([[graft.functions.expr.LangMarkerCounts]]): `[s_en, s_es, s_fr,
    * s_de, cjk]`. Materialize as its own column before branching on the
    * scores so the argmax when-chain reads array elements instead of
    * re-scanning the text. */
  def langMarkerStats(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.expr.LangMarkerCounts(
        org.apache.spark.sql.GraftBridge.expression(text)))

  /** argmax(scores) with first-wins tie-break; all-zero → 'und',
    * cjk → 'zh'. Shared by the native and composed langId forms. */
  private def langIdDecide(cjk: Column, scores: Seq[(String, Column)]): Column = {
    def argmax(rem: Seq[(String, Column)]): Column = rem match {
      case (l, s) +: tail if tail.nonEmpty =>
        when(tail.map { case (_, s2) => s >= s2 }.reduce(_ && _), lit(l)).otherwise(argmax(tail))
      case Seq((l, _)) => lit(l)
    }
    val total = scores.map(_._2).reduce(_ + _)
    when(cjk, lit("zh")).when(total === 0, lit("und")).otherwise(argmax(scores))
  }

  /** Language ID from a [[langMarkerStats]] array — cheap element_at
    * reads, no text re-scan. */
  def langIdFromStats(stats: Column): Column =
    langIdDecide(element_at(stats, LangMarkers.size + 1) === 1L,
      LangMarkers.zipWithIndex.map { case ((l, _), i) => l -> element_at(stats, i + 1) })

  /** Heuristic language ID: CJK characters → zh; otherwise argmax of
    * marker-token occurrence counts in the fixed order en/es/fr/de
    * (deterministic tie-break); all-zero → 'und'. Single native pass. */
  def langId(text: Column): Column = langIdFromStats(langMarkerStats(text))

  /** Composed-HOF reference form of [[langId]] — kept for the
    * equivalence spec (the oracle SQL mirrors this formulation). */
  def langIdComposed(text: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", "")) > 0
    langIdDecide(cjk, LangMarkers.map { case (l, m) => l -> markerScore(text, m) })
  }

  // --- quality scoring (#30) ---------------------------------------------

  def nTokens(text: Column): Column = size(tokens(text))

  /** Ratio of [a-z] characters. */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^a-z]", "")).cast("double") / length(text)

  /** Ratio of punctuation characters. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"-]", "")).cast("double") / length(text)

  /** Ratio of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column =
    markerScore(text, LangMarkers.head._2).cast("double") / nTokens(text)

  def meanTokenLen(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t)).cast("double") / nTokens(text)

  /** Composite [0,1] quality score: length saturation + stopword signal
    * + alphabetic cleanliness (Gopher-rules-style shape). */
  def qualityScore(text: Column): Column =
    least(nTokens(text).cast("double") / 100.0, lit(1.0)) * 0.4 +
      least(stopwordRatio(text) * 4.0, lit(1.0)) * 0.3 +
      alphaRatio(text) * 0.3

  // --- readability (#30w) ------------------------------------------------

  /** Syllable estimate: vowel-group count over the text (the standard
    * corpus-scale Flesch proxy — exact syllabification needs a
    * dictionary; vowel groups are the deterministic approximation).
    * Spaces break groups, so counting over the whole text equals the
    * per-word sum. */
  def nSyllables(text: Column): Column =
    size(regexp_extract_all(text, lit("[aeiouy]+"), lit(0))).cast("long")

  /** Sentence count: non-empty segments between [.!?], floored at 1 so
    * fragment-only docs don't divide by zero. */
  def nSentences(text: Column): Column =
    greatest(size(filter(split(text, "[.!?]"),
      s => length(trim(s)) > 0)), lit(1)).cast("long")

  // --- repetition signals (#30b) -----------------------------------------

  /** Raw repetition counts in ONE text pass
    * ([[graft.functions.expr.RepetitionStats]]): `[n_tokens,
    * n_distinct_tokens, top_token_count, n_bigrams, n_distinct_bigrams,
    * top_bigram_count]`. Derive the Gopher-style fractions from these
    * integers so any engine reproduces them exactly. */
  def repetitionStats(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.expr.RepetitionStats(
        org.apache.spark.sql.GraftBridge.expression(text)))

  /** First-occurrence-distinct k-token segments, one native pass
    * ([[graft.functions.expr.SegmentsDistinct]]). */
  def segmentsDistinct(text: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.expr.SegmentsDistinct(
        org.apache.spark.sql.GraftBridge.expression(text), k))

  // --- PII masking (#30c) ------------------------------------------------

  /** Conservative PII patterns (shared with the SQL oracle — keep to
    * the regex subset Java and RE2 agree on). */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\+[0-9]+-[0-9]+-[0-9]+"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Replace emails, then phones, then IPv4 addresses with typed mask
    * tokens (order matters: the email pattern would otherwise eat into
    * already-masked hosts). Narrow, codegen'd regexp_replace chain. */
  def maskPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  // --- token counting (#31) ----------------------------------------------

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = nTokens(text)

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric marks each count as one token. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** chars/4 rule-of-thumb token estimate. */
  def tokenCountEstimate(text: Column): Column = ceil(length(text).cast("double") / 4.0)

  // --- fingerprinting (#32) ----------------------------------------------

  /** Document fingerprint: the minimum md5 over the doc's distinct
    * `n`-gram shingles (a 1-hash MinHash — equal fingerprints ⇒ the docs
    * share their rarest shingle; stable under row order). */
  def docFingerprint(text: Column, n: Int = 5): Column =
    array_min(transform(wordShingles(text, n), s => md5(s)))

  // --- SimHash (#23) -----------------------------------------------------

  /** 64-bit SimHash of the token multiset: bit j of xxhash64(token)
    * votes ±1; result bit j is 1 iff the vote sum is positive. One
    * xxhash64 per token, then a single codegen'd voting pass
    * ([[graft.functions.expr.SimHash64]]). */
  def simhash64(text: Column): Column = {
    val hashes = transform(tokens(text), t => xxhash64(t))
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.expr.SimHash64(
        org.apache.spark.sql.GraftBridge.expression(hashes)))
  }

  /** Engine-portable 64-bit SimHash: token hash = first 8 md5 digest
    * bytes ([[graft.functions.expr.Md5Prefix64]]), so a SQL oracle can
    * replay signatures exactly via
    * `('0x'||substr(md5(t),1,16))::UBIGINT`. Slightly more per-token
    * work than [[simhash64]] (cryptographic hash) — use the xxhash64
    * variant when portability doesn't matter. */
  def simhash64Portable(text: Column): Column = {
    val hashes = transform(tokens(text), t =>
      org.apache.spark.sql.GraftBridge.column(
        graft.functions.expr.Md5Prefix64(
          org.apache.spark.sql.GraftBridge.expression(t))))
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.expr.SimHash64(
        org.apache.spark.sql.GraftBridge.expression(hashes)))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** `bands` equal bit-slices of a 64-bit simhash — pigeonhole: two
    * signatures within hamming distance < bands share at least one
    * exact band. */
  def simhashBands(sig: Column, bands: Int): Column = {
    val width = 64 / bands
    val mask = (1L << width) - 1
    array((0 until bands).map(b =>
      struct(lit(b).as("band"), shiftright(sig, b * width).bitwiseAND(mask).as("key"))): _*)
  }
}
