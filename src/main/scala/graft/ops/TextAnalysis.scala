package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Text-analysis operators for LLM training-data pipelines, over the
  * `documents` table: tokenization stats, quality scoring, n-gram
  * language ID, and document fingerprinting.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * expressions — no UDFs — so at 100 TB these run inside whole-stage
  * codegen directly over the parquet scan, with only the columns used
  * (`text`, `doc_id`) read from disk.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text (empty-token-free). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), tk => length(tk) > 0)

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Stopword-profile hit count: word-boundary regex, one pass. */
  def profileHits(text: Column, words: Seq[String]): Column =
    regexp_count(text, lit("\\b(" + words.mkString("|") + ")\\b")).cast("long")

  /** Language profiles for the n-gram-heuristic language ID. Tiny on
    * purpose: real pipelines plug in larger profiles; the operator shape
    * (k parallel regex counts + deterministic argmax) is what scales.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "is", "of", "and", "to", "in", "a"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "una"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "fr" -> Seq("le", "les", "et", "dans", "est", "une"))

  /** Deterministic argmax over profile scores (first profile wins ties,
    * 'und' = undetermined when no profile hits).
    */
  def langId(text: Column): Column = {
    val scores = langProfiles.map { case (l, ws) => l -> profileHits(text, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((l, sc), els) =>
      when(sc === best && best > 0, lit(l)).otherwise(els)
    }
  }

  /** Normalized-text MD5 fingerprint (case-folded, whitespace-collapsed)
    * — the exact-dedup key that survives formatting noise.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  // ---- queries ----

  def taTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", tokenCount($"text").as("n_tokens"),
        length($"text").cast("long").as("n_chars_calc"))
      .orderBy("doc_id")
  }

  def taQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nTok = tokenCount($"text")
    val nonAlpha = length(regexp_replace($"text", "[a-z0-9 ]", "")).cast("long")
    val stop = profileHits($"text", langProfiles.head._2)
    t(s, dir, "documents")
      .select($"doc_id",
        nTok.as("n_tokens"),
        (stop.cast("double") / nTok).as("stopword_ratio"),
        (nonAlpha.cast("double") / greatest(length($"text").cast("long"), lit(1L))).as("nonalpha_ratio"),
        (length(regexp_replace($"text", " ", "")).cast("double") / nTok).as("avg_token_len"),
        (nTok >= 5L && nTok <= 10000L && (nonAlpha.cast("double") / greatest(length($"text").cast("long"), lit(1L))) < 0.3)
          .as("quality_ok"))
      .orderBy("doc_id")
  }

  def taLangId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", langId($"text").as("lang_pred"))
      .orderBy("doc_id")
  }

  def taFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", fingerprint($"text").as("fp"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_tokens" -> taTokens,
    "ta_quality" -> taQuality,
    "ta_langid" -> taLangId,
    "ta_fingerprint" -> taFingerprint)

  private val enPat = "\\b(" + langProfiles.head._2.mkString("|") + ")\\b"
  private def hitsSql(pat: String) =
    s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    "ta_tokens" -> """
      SELECT doc_id,
        CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens,
        CAST(length(text) AS BIGINT) AS n_chars_calc
      FROM documents ORDER BY doc_id""",
    "ta_quality" -> s"""
      WITH base AS (
        SELECT doc_id, text,
          CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens,
          CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS BIGINT) AS nonalpha,
          ${hitsSql(enPat)} AS stop_hits
        FROM documents)
      SELECT doc_id, n_tokens,
        CAST(stop_hits AS DOUBLE) / n_tokens AS stopword_ratio,
        CAST(nonalpha AS DOUBLE) / GREATEST(CAST(length(text) AS BIGINT), 1) AS nonalpha_ratio,
        CAST(length(replace(text, ' ', '')) AS DOUBLE) / n_tokens AS avg_token_len,
        (n_tokens >= 5 AND n_tokens <= 10000
          AND CAST(nonalpha AS DOUBLE) / GREATEST(CAST(length(text) AS BIGINT), 1) < 0.3) AS quality_ok
      FROM base ORDER BY doc_id""",
    "ta_langid" -> {
      val scores = langProfiles.map { case (l, ws) =>
        l -> hitsSql("\\b(" + ws.mkString("|") + ")\\b")
      }
      val scoreSel = scores.map { case (l, e) => s"$e AS s_$l" }.mkString(", ")
      val best = "GREATEST(" + scores.map(x => "s_" + x._1).mkString(", ") + ")"
      val cases = scores.map { case (l, _) =>
        s"WHEN s_$l = best AND best > 0 THEN '$l'"
      }.mkString(" ")
      s"""
      WITH sc AS (SELECT doc_id, $scoreSel FROM documents),
      mx AS (SELECT *, $best AS best FROM sc)
      SELECT doc_id, CASE $cases ELSE 'und' END AS lang_pred
      FROM mx ORDER BY doc_id"""
    },
    "ta_fingerprint" -> """
      SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
      FROM documents ORDER BY doc_id""")
}
