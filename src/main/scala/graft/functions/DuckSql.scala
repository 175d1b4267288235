package graft.functions

/** Shared DuckDB-oracle SQL fragments. Oracle-side only — the engine
  * itself never runs these; they exist so every query family derives its
  * hash buckets from one definition (a drifted copy would silently split
  * the corpus differently on the two sides of the correctness gate).
  */
object DuckSql {

  /** BIGINT value of the leading `n` hex chars of an md5-hex expression
    * (mirror of the native HexPrefix expression in graft.plans). */
  def hexToLong(h: String, n: Int = 8): String =
    (0 until n).map { p =>
      s"(strpos('0123456789abcdef', substring($h, ${p + 1}, 1)) - 1) * CAST(${1L << (4 * (n - 1 - p))} AS BIGINT)"
    }.mkString("(", " + ", ")")

  /** Deterministic 0..99 document bucket (the split convention shared by
    * docs_split_sample, text_contamination and dedup_incremental). */
  def docBucket: String = s"${hexToLong("md5(CAST(doc_id AS VARCHAR))")} % 100"

  /** words CTE body: whitespace-split, empties dropped (mirror of
    * TextFunctions.words). */
  def wordsOf(textCol: String): String =
    s"list_filter(string_split_regex($textCol, '\\s+'), x -> LEN(x) > 0)"

  /** 2-gram list over a words column (mirror of
    * TextFunctions.shingles(_, 2); whole text if shorter). */
  def bigramsOf(w: String): String =
    s"""CASE WHEN LEN($w) >= 2
       |    THEN list_transform(generate_series(1, LEN($w) - 1), i -> $w[i] || ' ' || $w[i+1])
       |    ELSE [array_to_string($w, ' ')] END""".stripMargin

  /** 3-gram shingle list over a words column (mirror of
    * TextFunctions.shingles; whole text if shorter). */
  def shinglesOf(w: String): String = ngramsOf(w, 3)

  /** Word n-gram shingles for any n — mirrors TextFunctions.shingles(_, n)
    * including the whole-text fallback for short docs. */
  def ngramsOf(w: String, n: Int): String =
    s"""CASE WHEN LEN($w) >= $n
       |    THEN list_transform(generate_series(1, LEN($w) - ${n - 1}),
       |         i -> ${(0 until n).map(k => if (k == 0) s"$w[i]" else s"$w[i+$k]").mkString(" || ' ' || ")})
       |    ELSE [array_to_string($w, ' ')] END""".stripMargin
}
