package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristic, document
  * fingerprinting. Everything is built from codegen'd built-ins (no
  * UDFs), so the scan stays in whole-stage codegen and parallelizes
  * trivially — each document is independent (embarrassingly parallel
  * at 100 TB; no shuffle except user-requested aggregation).
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), " ")

  /** Word-count via whitespace and a word/punct regex count
    * (the "BPE-ish" proxy: word pieces + punctuation marks).
    */
  def withTokenCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_tokens", size(tokens(col(textCol))))
      .withColumn("n_regex_tokens",
        regexp_count(col(textCol), lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]")))

  /** Occurrences of whole tokens from `words` in the text — a
    * codegen'd regexp_count over space-padded text (lookaround keeps
    * adjacent matches) instead of a higher-order filter lambda, which
    * would drop the scan out of whole-stage codegen (~3× slower
    * measured at sf0.1). Token-equality semantics are identical to
    * filtering split(lower(trim(text)), " ").
    */
  private def tokenOccurrences(text: Column, words: Seq[String]): Column =
    regexp_count(
      concat(lit(" "), lower(trim(text)), lit(" ")),
      lit(words.map(w => s"\\Q$w\\E").mkString("(?<= )(", "|", ")(?= )")))

  /** Quality features + a composite score in [0,1]:
    * length saturation, lexical diversity, stopword pressure.
    * Deterministic closed-form arithmetic (oracle-reproducible).
    */
  def withQuality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val ts = tokens(col(textCol))
    val nTok = size(ts).cast("double")
    val distinctRatio = size(array_distinct(ts)).cast("double") / nTok
    val stopRatio =
      tokenOccurrences(col(textCol), Seq("the", "a", "of", "and")).cast("double") / nTok
    val meanLen = (length(col(textCol)).cast("double") - (nTok - 1)) / nTok
    df.withColumn("n_tokens", nTok.cast("long"))
      .withColumn("distinct_ratio", round(distinctRatio, 6))
      .withColumn("stopword_ratio", round(stopRatio, 6))
      .withColumn("mean_token_len", round(meanLen, 6))
      .withColumn("quality",
        round(least(nTok / 100.0, lit(1.0)) * 0.3
          + distinctRatio * 0.4
          + (lit(1.0) - stopRatio) * 0.3, 6))
  }

  /** Stopword-profile language ID (n-gram-free heuristic): score each
    * language by profile-token hits; argmax with deterministic
    * tie-break (profile order), 'und' when nothing matches.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame = {
    // score columns are materialized as attributes so the argmax
    // references each score once (a folded when-chain would duplicate
    // every score subtree)
    val scored = langProfiles.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"__s_$lang", tokenOccurrences(col(textCol), words))
    }
    val scores = langProfiles.map { case (lang, _) => lang -> col(s"__s_$lang") }
    val maxScore = greatest(scores.map(_._2): _*)
    val pred = scores.foldLeft(when(maxScore <= 0, lit("und"))) {
      case (acc, (lang, sc)) => acc.when(sc === maxScore, lit(lang))
    }
    scored.withColumn("lang_pred", pred)
      .drop(langProfiles.map(p => s"__s_${p._1}"): _*)
  }

  /** Content fingerprint: hash of the sorted distinct token set —
    * stable under token reordering (bag-of-words identity). md5 keeps
    * it reproducible in any SQL engine.
    */
  def withFingerprint(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("fingerprint",
      md5(concat_ws(" ", array_sort(array_distinct(tokens(col(textCol)))))))
}
