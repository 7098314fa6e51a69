package graft.ops

import graft.text.Tokenize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality / profiling operators for training-data pipelines.
  * Everything here is built from Catalyst built-ins (codegen'd; no UDFs in
  * the hot path) and is deterministic, so each has an exact SQL oracle.
  */
object TextAnalysis {

  /** Per-language marker-word profiles for the heuristic language id.
    * Deterministic argmax with fixed language priority on ties; all-zero
    * scores -> "und". (A real system would use character n-gram profiles;
    * the marker-set form keeps the heuristic exactly SQL-expressible so the
    * oracle can gate it.)
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "una"),
    "ru" -> Seq("i", "v", "ne", "na", "eto"))

  private def toks(c: Column) = Tokenize.col(c)

  /** (n_tokens, n_terms, avg_token_len) per row. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    df.select(col(idCol),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_terms"),
      round(
        coalesce(
          aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") /
            nullif(size(t).cast("double"), lit(0.0)),
          lit(0.0)), 4).as("avg_token_len"))
  }

  /** Quality metrics: stopword ratio, alphabetic-char ratio, and a boolean
    * keep flag (length window + stopword ceiling) — the usual cheap quality
    * gate before expensive pipeline stages.
    */
  def quality(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = Seq("the", "a", "and", "of", "to"),
      minTokens: Int = 5, maxTokens: Int = 100000,
      maxStopRatio: Double = 0.9): DataFrame = {
    val t = toks(col(textCol))
    val nTok = size(t).cast("double")
    val nStop = aggregate(t, lit(0L),
      (acc, x) => acc + when(x.isin(stopwords: _*), 1L).otherwise(0L)).cast("double")
    val alpha = length(regexp_replace(col(textCol), "[^a-zA-Z]", "")).cast("double")
    val total = length(col(textCol)).cast("double")
    df.select(col(idCol),
      size(t).cast("long").as("n_tokens"),
      round(coalesce(nStop / nullif(nTok, lit(0.0)), lit(0.0)), 4).as("stop_ratio"),
      round(coalesce(alpha / nullif(total, lit(0.0)), lit(0.0)), 4).as("alpha_ratio"),
      (size(t) >= minTokens && size(t) <= maxTokens &&
        coalesce(nStop / nullif(nTok, lit(0.0)), lit(0.0)) <= maxStopRatio)
        .as("keep"))
  }

  /** Heuristic language id from marker-word counts (see [[langMarkers]]). */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val scores = langMarkers.map { case (lang, ms) =>
      lang -> aggregate(t, lit(0L),
        (acc, x) => acc + when(x.isin(ms: _*), 1L).otherwise(0L))
    }
    // deterministic argmax in declaration order (strict > keeps priority)
    val best = scores.tail.foldLeft(
      struct(scores.head._2.as("s"), lit(scores.head._1).as("l"))) {
      case (acc, (lang, s)) =>
        when(s > acc.getField("s"), struct(s.as("s"), lit(lang).as("l")))
          .otherwise(acc)
    }
    df.select(col(idCol),
      when(best.getField("s") > 0, best.getField("l"))
        .otherwise(lit("und")).as("lang_pred"))
  }

  /** Canonical document fingerprint: md5 of the space-joined token stream
    * (normalization-stable: case/punctuation-insensitive identity).
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      md5(concat_ws(" ", toks(col(textCol)))).as("fp"))
}
