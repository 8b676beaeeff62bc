package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reusable text-analysis Column builders for the training-data-pipeline
  * operators (tokenization, quality signals, fingerprints, shingles,
  * MinHash). Everything composes `org.apache.spark.sql.functions` only —
  * codegen-friendly, no UDFs — so filters and projections stay inside
  * whole-stage codegen and push down to the scan.
  *
  * Hash choice: md5 (hex string) rather than Spark's murmur3 `hash()`
  * because the DuckDB oracle must reproduce the identical value; the
  * lexicographic MIN over md5 hex strings is a uniform MinHash.
  */
object TextFns {

  /** Whitespace tokenizer (leading/trailing trimmed so Spark and DuckDB
    * agree on empty-token handling).
    */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** BPE-ish byte-pair-encoding surrogate: letter runs, single digits,
    * single punctuation marks.
    */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(c, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))

  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to")

  def stopCount(toks: Column): Column =
    size(filter(toks, t => t.isin(stopwords: _*)))

  /** Count of non-alphanumeric, non-space characters. */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[^A-Za-z0-9\\s]", ""))

  /** Canonical normalization for fingerprinting: lowercase, strip
    * non-alphanumerics, collapse whitespace.
    */
  def normalize(c: Column): Column =
    regexp_replace(
      regexp_replace(lower(trim(c)), "[^a-z0-9\\s]", ""), "\\s+", " ")

  /** MD5 hex digest via the native [[graft.expressions.FastMd5]] — same
    * output as `functions.md5` but without its per-row
    * `MessageDigest.getInstance` (~10 µs/call); use this for every
    * per-token/per-shingle hash.
    */
  def fastMd5(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.expressions.FastMd5(
        org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** Document fingerprint: md5 of the normalized text. */
  def fingerprint(c: Column): Column = fastMd5(normalize(c))

  /** All overlapping word trigrams of the whitespace-normalized text, in
    * order with duplicates, via a zero-width lookahead regex (`(?<![^ ])`
    * anchors each match at a word start). One narrow codegen'd pass — the
    * per-element [[shingles3]] lambda evaluates interpreted and was ~6×
    * slower. Texts with fewer than 3 words yield an empty array (callers
    * add the whole-text shingle; see DedupOps.shingleRows).
    */
  def overlappingTrigrams(c: Column): Column =
    regexp_extract_all(
      regexp_replace(trim(c), "\\s+", " "),
      lit("(?<![^ ])(?=([^ ]+ [^ ]+ [^ ]+))"), lit(1))

  /** All overlapping word n-grams — the general form of
    * [[overlappingTrigrams]]'s lookahead regex. Texts with fewer than
    * `n` words yield an empty array (callers add a whole-text shingle
    * for short docs, mirroring the oracle's slice rule).
    */
  def overlappingNgrams(c: Column, n: Int): Column =
    regexp_extract_all(
      regexp_replace(trim(c), "\\s+", " "),
      lit(s"(?<![^ ])(?=([^ ]+(?: [^ ]+){${n - 1}}))"), lit(1))

  /** All overlapping word bigrams, in order with duplicates — same
    * lookahead-regex shape as [[overlappingTrigrams]]. Texts with fewer
    * than 2 words yield an empty array.
    */
  def overlappingBigrams(c: Column): Column =
    regexp_extract_all(
      regexp_replace(trim(c), "\\s+", " "),
      lit("(?<![^ ])(?=([^ ]+ [^ ]+))"), lit(1))

  /** The whitespace-normalized text cut into consecutive `n`-token
    * segments (last one shorter): one greedy regex pass, no array
    * lambdas. The RE2-compatible pattern lets the DuckDB oracle chunk
    * identically. Segments carry a trailing space — trim before use.
    */
  def tokenSegments(c: Column, n: Int): Column =
    regexp_extract_all(
      regexp_replace(trim(c), "\\s+", " "),
      lit(s"(?:[^ ]+ ?){1,$n}"), lit(0))

  /** Distinct word 3-gram shingles. Short docs (<3 words) yield their
    * whole text as one shingle.
    */
  def shingles3(c: Column): Column = {
    val words = tokens(c)
    array_distinct(transform(
      sequence(lit(0), greatest(size(words) - 3, lit(0))),
      i => concat_ws(" ", slice(words, i + lit(1), lit(3)))))
  }

  /** Dot product of two numeric-array columns, computed in double with a
    * deterministic left-fold (index order) so the oracle reproduces it
    * bit-for-bit before rounding. Backed by the native codegen'd
    * [[graft.expressions.DotProduct]] — the equivalent
    * `aggregate(zip_with(...))` lambdas evaluate interpreted per element.
    */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.expressions.DotProduct(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  def l2norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity. For pairwise scans, precompute [[l2norm]] per
    * vector BEFORE the join — array lambdas evaluate interpreted, and
    * three 64-element folds per pair is ~3× the cost of one.
    */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2norm(a) * l2norm(b))
}
