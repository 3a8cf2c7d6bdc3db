package graft

import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over the `documents` /
  * `embeddings` tables: dedup, similarity search, text analysis,
  * multimodal plumbing. SQL-expressible pieces carry DuckDB oracles;
  * sketch/hash-based ones are deterministic rows-only entries.
  */
object PipelineQueries {
  import Queries._

  private val textAnalysis: Seq[Entry] = Seq(
    // Exact deduplication by normalized text (hash group-by — one shuffle
    // on the dedup key; at 100 TB use sha2(text) as the shuffle key so the
    // exchange carries 32-byte digests, not documents).
    sql("q_dedup_exact",
      "SELECT CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS n_copies " +
        "FROM documents GROUP BY lower(trim(text)) ORDER BY keep_id"),

    // Token counting + document length stats.
    sql2("q_text_tokens",
      "SELECT doc_id, CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens, " +
        "CAST(length(text) AS BIGINT) AS n_chars_c FROM documents ORDER BY doc_id",
      "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, " +
        "CAST(length(text) AS BIGINT) AS n_chars_c FROM documents ORDER BY doc_id"),

    // Quality scoring: stopword ratio + mean token length (pure
    // expressions — codegen'd, no UDFs).
    sql2("q_text_quality",
      "SELECT doc_id, round(CAST(size(filter(split(text, ' '), w -> w = 'the' OR w = 'a')) AS DOUBLE) " +
        "/ size(split(text, ' ')), 6) AS stop_ratio, " +
        "round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / size(split(text, ' ')), 6) AS mean_tok_len " +
        "FROM documents ORDER BY doc_id",
      "SELECT doc_id, round(CAST(len(list_filter(string_split(text, ' '), w -> w = 'the' OR w = 'a')) AS DOUBLE) " +
        "/ len(string_split(text, ' ')), 6) AS stop_ratio, " +
        "round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')), 6) AS mean_tok_len " +
        "FROM documents ORDER BY doc_id"),
  )

  def entries: Seq[Entry] = textAnalysis
}
