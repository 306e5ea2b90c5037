package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Priority-cascade classification (reference: refine.py:258-364).
  *
  * The reference assigns a transaction-type enum with a first-match-wins
  * if/elif cascade where every step guards on "not yet classified". A chained
  * `when().when()...otherwise()` Column has exactly those semantics and stays
  * fully inside whole-stage codegen — Catalyst folds the entire ladder into
  * one projection over the scan, so classification is shuffle-free at any
  * scale.
  *
  * Keyword lists compile to one case-insensitive alternation regex
  * (refine.py:268: `'|'.join(keywords)` with `case=False`); empty lists
  * compile to the never-matching `(?!)` (refine.py:270).
  */
object Classify {

  /** First-match-wins ladder: (condition, label) pairs in priority order. */
  def cascade(steps: Seq[(Column, String)], default: String): Column =
    steps.foldRight(lit(default): Column) { case ((cond, label), acc) =>
      when(cond, lit(label)).otherwise(acc)
    }

  /** OR-joined case-insensitive keyword regex; empty list never matches. */
  def keywordRegex(keywords: Seq[String]): String =
    if (keywords.isEmpty) "(?!)"
    else "(?i)" + keywords.mkString("|")

  /** Case-insensitive substring match against a keyword list, pandas
    * `str.contains(pat, case=False)` semantics (null → no match).
    */
  def matchesAny(c: Column, keywords: Seq[String]): Column =
    coalesce(c, lit("")).rlike(keywordRegex(keywords))
}
