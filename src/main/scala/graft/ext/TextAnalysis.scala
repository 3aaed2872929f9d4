package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.roundStable

/** Text-analysis operators for corpus curation: token counting, quality
  * scoring, language identification, fingerprinting.
  *
  * All pure narrow projections — they run at parquet-scan speed and never
  * shuffle, which is the property that matters when the corpus is 100 TB.
  * Stopword/profile counting uses the native [[graft.functions.TokensInSet]]
  * expression (compiled loop + UTF8String set) instead of
  * `size(filter(...))` HOFs, which evaluate interpreted per element.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-boundary token count: letter runs, digit runs, and
    * individual punctuation each count as one token (a cheap proxy for the
    * GPT-2-family pre-tokenizer split). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  private val stopEn = Seq("the", "a", "and", "of", "to", "is", "in")

  /** Quality metrics per document: length, token stats, punctuation ratio,
    * stopword ratio, and a composite [0,1] score. Mirrors the usual
    * C4/Gopher-style length+symbol heuristics. */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    df.withColumn("toks", tokens(col(textCol)))
      .withColumn("n_chars", length(col(textCol)).cast("double"))
      .withColumn("n_tokens", size(col("toks")).cast("double"))
      .withColumn("avg_token_len",
        roundStable(length(regexp_replace(col(textCol), "\\s+", "")) / col("n_tokens"), 4))
      .withColumn("punct_ratio",
        roundStable((col("n_chars") - length(regexp_replace(col(textCol), "[^A-Za-z0-9\\s]", ""))) / col("n_chars"), 4))
      .withColumn("stopword_ratio",
        roundStable(graft.functions.TokensInSet(col("toks"), stopEn).cast("double") / col("n_tokens"), 4))
      .withColumn("quality_score",
        roundStable(least(col("n_tokens") / 100.0, lit(1.0)) * (lit(1.0) - col("punct_ratio"))
          * (lit(0.5) + lit(0.5) * least(col("stopword_ratio") * 5.0, lit(1.0))), 4))
      .drop("toks")
  }

  private val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "que", "una", "las"))

  /** Language-ID heuristic: CJK codepoints → zh; otherwise argmax of
    * stopword-profile hits with fixed precedence (en > de > fr > es) and
    * 'und' when no profile matches. Deterministic, engine-portable. */
  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    val scored = profiles.foldLeft(
      df.withColumn("toks", tokens(lower(col(textCol))))) { case (acc, (lang, words)) =>
        acc.withColumn(s"s_$lang", graft.functions.TokensInSet(col("toks"), words))
    }
    val Seq(en, de, fr, es) = profiles.map { case (l, _) => col(s"s_$l") }
    scored
      .withColumn("pred_lang",
        when(col(textCol).rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
          .when(en === 0 && de === 0 && fr === 0 && es === 0, "und")
          .when(en >= de && en >= fr && en >= es, "en")
          .when(de >= fr && de >= es, "de")
          .when(fr >= es, "fr")
          .otherwise("es"))
      .drop("toks")
  }

  /** Content-defined fingerprint: md5 over normalized text (whole-doc), plus
    * a prefix fingerprint over the first `prefixTokens` tokens — cheap
    * near-boilerplate detector. */
  def withFingerprints(df: DataFrame, textCol: String, prefixTokens: Int = 16): DataFrame =
    df.withColumn("norm", normText(col(textCol)))
      .withColumn("fp_full", md5(col("norm")))
      .withColumn("fp_prefix",
        md5(concat_ws(" ", slice(tokens(col("norm")), 1, prefixTokens))))
      .drop("norm")
}
