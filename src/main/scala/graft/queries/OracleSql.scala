package graft.queries

/** DuckDB oracle-SQL fragments shared across query files. ONE copy on
  * purpose: the shingle definition must stay in lockstep with
  * [[graft.operators.Dedup.withShingles]] on the Spark side AND
  * between every oracle that shingles — a fix applied to one
  * duplicated copy would surface only as a cross-engine hash mismatch
  * in whichever queries still used the other. */
private[queries] object OracleSql {
  /** Whitespace tokenization — the twin of `split(col("text"), " ")`. */
  val T = "string_split(text, ' ')"

  /** DuckDB twin of Dedup.withShingles: distinct word n-gram shingles
    * (short docs clamp to one truncated gram via `greatest(..., 1)`). */
  def shingles(n: Int): String =
    s"list_distinct(list_transform(generate_series(1, greatest(len($T) - ${n - 1}, 1)), " +
      s"i -> array_to_string(list_slice($T, i, i + ${n - 1}), ' ')))"
}
