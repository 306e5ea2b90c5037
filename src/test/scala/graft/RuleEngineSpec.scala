package graft

import org.apache.spark.sql.functions._

import graft.operators.RuleEngine
import graft.operators.RuleEngine.Rule

/** The three rule-application disciplines (SURVEY §7.4.3) — easy to
  * conflate, so each is pinned by a test where the disciplines disagree.
  */
class RuleEngineSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(Rule("foo", "A"), Rule("bar", "B"), Rule("foo.*bar", "C"))

  test("first-match-wins picks the earliest matching rule") {
    val df = Seq("foo only", "has bar", "foo and bar", "nothing").toDF("s")
    val got = df.select(
      RuleEngine.firstMatchWins(col("s"), rules, lit("-")).as("r"))
      .as[String].collect().toSeq
    assert(got == Seq("A", "B", "A", "-"))
  }

  test("last-match-wins picks the latest matching rule") {
    val df = Seq("foo only", "has bar", "foo and bar", "nothing").toDF("s")
    val got = df.select(
      RuleEngine.lastMatchWins(col("s"), rules, lit("-")).as("r"))
      .as[String].collect().toSeq
    assert(got == Seq("A", "B", "C", "-"))
  }

  test("sequential rewrite lets later rules see earlier replacements") {
    // reference refine.py:233-244: whole-cell overwrite, chained effects
    val chain = Seq(Rule("ECONOMY", "budget"), Rule("budget", "value"),
      Rule("PROMO", "promo"))
    val df = Seq("ECONOMY PLATED", "PROMO BURNISHED", "STANDARD").toDF("s")
    val got = df.select(
      RuleEngine.sequentialRewrite(col("s"), chain).as("r"))
      .as[String].collect().toSeq
    // ECONOMY → budget → value (rule 2 sees rule 1's output)
    assert(got == Seq("value", "promo", "STANDARD"))
  }

  test("longest prefix is stripped first, then trimmed") {
    val df = Seq("ab-xx rest", "ab rest", "zz rest").toDF("s")
    val got = df.select(
      RuleEngine.stripLongestPrefix(col("s"), Seq("ab", "ab-xx")).as("r"))
      .as[String].collect().toSeq
    assert(got == Seq("rest", "rest", "zz rest"))
  }
}
