package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TextAnalysis
import graft.tables.Tables

/** Training-data-pipeline operators (text analysis, dedup, similarity
  * search) as concrete query instances over the `documents` /
  * `embeddings` testdata tables, each paired with a DuckDB oracle.
  *
  * Naming convention: `ta_*` text analysis, `dd_*` deduplication,
  * `ss_*` similarity search, `mm_*` multimodal.
  *
  * Oracle-parity ground rules used throughout:
  *  - doubles are emitted UNrounded and built from the identical
  *    left-associative expression on both engines → bit-identical;
  *  - all hashing is md5 hex STRINGS (lexicographically comparable,
  *    identical in every engine) — never engine-native numeric hashes;
  *  - every query orders by a unique key (doc_id / vec_id / pair).
  */
object PipelineQueries {
  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting — whitespace tokens, distinct tokens, mean length.
    "ta_token_stats" -> ((s, d) => TextAnalysis.tokenStats(docs(s, d))),
    // Quality scoring — length / stopword / vocabulary-diversity signals.
    "ta_quality" -> ((s, d) => TextAnalysis.qualityScore(docs(s, d))),
    // Language-ID n-gram heuristic — argmax of char-bigram profiles.
    "ta_lang_id" -> ((s, d) => TextAnalysis.langId(docs(s, d))),
    // Document fingerprinting — full / prefix / winnowing-min hashes.
    "ta_fingerprints" -> ((s, d) => TextAnalysis.fingerprints(docs(s, d)))
  )

  private val T = "string_split(text, ' ')"

  val oracle: Map[String, String] = Map(
    "ta_token_stats" ->
      s"""SELECT doc_id,
         |  CAST(len($T) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct($T)) AS BIGINT) AS n_distinct_tokens,
         |  CAST(n_chars - len($T) + 1 AS DOUBLE) / len($T) AS avg_token_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    "ta_quality" ->
      s"""SELECT doc_id,
         |  least(CAST(n_chars AS DOUBLE) / 400.0, CAST(1.0 AS DOUBLE)) AS len_score,
         |  CAST(len(list_filter($T, t -> t IN ('the', 'a'))) AS DOUBLE) / len($T) AS stopword_ratio,
         |  CAST(len(list_distinct($T)) AS DOUBLE) / len($T) AS distinct_ratio,
         |  least(CAST(n_chars AS DOUBLE) / 400.0, CAST(1.0 AS DOUBLE)) * 0.4
         |    + (CAST(1.0 AS DOUBLE) - CAST(len(list_filter($T, t -> t IN ('the', 'a'))) AS DOUBLE) / len($T)) * 0.3
         |    + CAST(len(list_distinct($T)) AS DOUBLE) / len($T) * 0.3 AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "ta_lang_id" -> {
      def bg(b: String) =
        s"(length(text) - length(replace(text, '$b', ''))) / 2"
      val (sEn, sDe, sFr) =
        (s"${bg("th")} + ${bg("he")}", s"${bg("er")} + ${bg("in")}", s"${bg("le")} + ${bg("ta")}")
      s"""SELECT doc_id, lang,
         |  $sEn AS score_en, $sDe AS score_de, $sFr AS score_fr,
         |  CASE WHEN $sEn >= $sDe AND $sEn >= $sFr THEN 'en'
         |       WHEN $sDe >= $sFr THEN 'de' ELSE 'fr' END AS predicted_lang
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "ta_fingerprints" ->
      s"""SELECT doc_id,
         |  md5(text) AS fp_full,
         |  md5(array_to_string(list_slice($T, 1, 8), ' ')) AS fp_prefix,
         |  list_min(list_transform(generate_series(1, greatest(length(text) - 4, 1)),
         |                          i -> md5(substr(text, i, 5)))) AS fp_winnow
         |FROM documents ORDER BY doc_id""".stripMargin
  )
}
