package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rule-table application semantics.
  *
  * The reference applies small user-editable rule tables to the fact table
  * under three distinct disciplines (easily conflated — see SURVEY.md §7.4.3):
  *
  *   1. first-match-wins, priority-desc — third-party payment tagging
  *      (refine.py:184-202, guarded by `Mobile_Payment == ''`) and merchant
  *      regex fallback (db_to_RFManalysis.py:127-130);
  *   2. last-match-wins, file order — card mapping (refine.py:114-174),
  *      where later rules overwrite earlier on overlap;
  *   3. sequential rewrite fold — merchant normalization (refine.py:228-245):
  *      each rule tests against the *current* value (which earlier rules may
  *      already have replaced) and on match overwrites the whole cell.
  *
  * All three compile to pure Column `when` chains / folds over a driver-side
  * rule list: the rules live in the plan (constant-folded, codegen'd), the
  * fact table never shuffles, and nothing is collected. This is the Spark
  * analog of the reference's broadcast-lookup loops — at 100 TB the rule
  * "join" costs zero network because the rules ride inside the serialized
  * plan to every executor.
  */
object RuleEngine {

  /** A match rule: java-regex pattern → replacement value. */
  final case class Rule(pattern: String, value: String, priority: Int = 0)

  /** Discipline 1: first matching rule (in the given order) supplies the
    * value; non-matching rows keep `otherwise`. Callers pre-sort by
    * priority desc, mirroring refine.py:97.
    */
  def firstMatchWins(input: Column, rules: Seq[Rule],
                     otherwise: Column): Column =
    rules.foldRight(otherwise) { (r, acc) =>
      when(input.rlike(r.pattern), lit(r.value)).otherwise(acc)
    }

  /** Discipline 2: last matching rule wins (file order, refine.py:139-170).
    * Identical to first-match-wins over the reversed list.
    */
  def lastMatchWins(input: Column, rules: Seq[Rule],
                    otherwise: Column): Column =
    firstMatchWins(input, rules.reverse, otherwise)

  /** Discipline 3: sequential whole-cell rewrite (refine.py:233-244). Each
    * rule is applied to the running value, so a later rule can match an
    * earlier rule's replacement.
    *
    * Linearized: until some rule matches, the running value IS the original
    * input, so the first matching rule is the first whose pattern matches
    * the input; from there the value is a known constant and the remaining
    * rules fold on the DRIVER (regex over constants). The naive
    * `when(acc.rlike).otherwise(acc)` fold duplicates the accumulator per
    * level — exponential plan size; this emits one flat `when` chain.
    */
  def sequentialRewrite(input: Column, rules: Seq[Rule]): Column = {
    val continued = rules.indices.map { i =>
      var v = rules(i).value
      var j = i + 1
      while (j < rules.size) {
        if (java.util.regex.Pattern.compile(rules(j).pattern)
            .matcher(v).find()) v = rules(j).value
        j += 1
      }
      v
    }
    rules.zip(continued).foldRight(input) { case ((r, fin), acc) =>
      when(input.rlike(r.pattern), lit(fin)).otherwise(acc)
    }
  }

  /** Longest-prefix strip (db_to_RFManalysis.py:44-46,114-119): prefixes are
    * tried longest-first; the first (= longest) literal prefix found is
    * removed once, then the result trimmed. Pure Column chain.
    */
  def stripLongestPrefix(input: Column, prefixes: Seq[String]): Column = {
    val ordered = prefixes.filter(_.nonEmpty).sortBy(-_.length)
    trim(ordered.foldRight(input) { (p, acc) =>
      when(input.startsWith(p), substring_index_like(input, p)).otherwise(acc)
    })
  }

  // substring after a known literal prefix
  private def substring_index_like(input: Column, prefix: String): Column =
    input.substr(lit(prefix.length + 1), length(input))
}
