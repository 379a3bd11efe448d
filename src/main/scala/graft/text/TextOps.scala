package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All are
  * narrow (per-row) column expressions built from codegen'd built-ins — no
  * UDFs, no shuffles — so they stream through whole-stage codegen and scale
  * linearly with input splits at 100 TB.
  */
object TextOps {

  /** Whitespace tokens. The testdata corpus is single-space separated; for
    * arbitrary text use `tokensLoose`.
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Tokens on arbitrary whitespace runs (leading/trailing trimmed). */
  def tokensLoose(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Mean token length in characters (separator chars excluded), as DOUBLE.
    * Exact across engines: integer sums below 2^53, one final division.
    */
  def avgTokenLength(text: Column): Column = {
    val n = size(tokens(text))
    (length(text) - (n - lit(1))).cast("double") / n.cast("double")
  }

  /** How many tokens fall in `words` (multiset count, not distinct). */
  def wordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(words.map(x => x: Any): _*)))

  /** Stopword lists for the language-ID heuristic. Tiny on purpose: they are
    * broadcast into the generated code as literals.
    */
  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val EsStop: Seq[String] = Seq("el", "la", "de", "que", "y", "en")
  val DeStop: Seq[String] = Seq("der", "die", "das", "und", "ist")
  val FrStop: Seq[String] = Seq("le", "la", "de", "et", "les")

  /** N-gram-free language ID: argmax of per-language stopword hit counts
    * with fixed precedence en > es > de > fr, `und` (undetermined) when no
    * list matches. Deterministic by construction.
    */
  def langId(text: Column): Column = {
    val en = wordHits(text, EnStop)
    val es = wordHits(text, EsStop)
    val de = wordHits(text, DeStop)
    val fr = wordHits(text, FrStop)
    when(en > 0 && en >= es && en >= de && en >= fr, "en")
      .when(es > 0 && es >= de && es >= fr, "es")
      .when(de > 0 && de >= fr, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Quality score in [0,1]: weighted mix of length, stopword ratio and
    * token-length sanity — the standard cheap pre-filter in front of LLM
    * training pipelines. Deterministic per-row double arithmetic.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val stopRatio = wordHits(text, EnStop).cast("double") / nTok
    val lenScore = least(nTok / lit(64.0), lit(1.0))
    val awl = avgTokenLength(text)
    val wordScore = when(awl >= 3.0 && awl <= 10.0, 1.0).otherwise(0.0)
    lit(0.4) * lenScore + lit(0.3) * least(stopRatio * 5.0, lit(1.0)) +
      lit(0.3) * wordScore
  }

  /** Document fingerprint: polynomial rolling hash over the character
    * stream, mod 1e9+7. Every step stays exact in Long (acc < 1e9+7, so
    * acc*31 + 127 < 2^35) and uses only integer ops, so it is portable
    * across engines. 8-byte keys shuffle far cheaper than 32-byte hex
    * strings — this is the scale path; [[fingerprintMd5]] is the
    * content-hash alternative.
    */
  def fingerprintRolling(text: Column): Column = {
    val p = lit(1000000007L)
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch)) % p)
  }

  /** Content fingerprint via md5 over canonicalized text (lowercase,
    * collapsed whitespace) — portable across engines byte-for-byte.
    */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))
}
