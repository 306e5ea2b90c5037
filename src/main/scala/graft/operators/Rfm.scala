package graft.operators

import java.sql.Date

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.OracleSafe.dsum
import graft.functions.PandasRank

/** RFM (recency / frequency / monetary) analytics.
  *
  * Semantics from the reference pipeline, re-keyed for arbitrary tables:
  *   - aggregation: db_to_RFManalysis.py:136-156 (merchant),
  *     db_to_card_RFM.py:26-53 (card) — recency = days between analysis date
  *     and max(date); frequency = distinct txn ids; monetary = sum(amount);
  *   - ranks: pandas pct-rank, r descending / f,m ascending
  *     (db_to_RFManalysis.py:153-155);
  *   - dual-window left join + fills (db_to_RFManalysis.py:245-255):
  *     short-window misses get frequency/monetary/ranks 0, recency 9999;
  *   - segment ladders: db_to_RFManalysis.py:258-268 (merchant: m_rank 0.8,
  *     short activity), db_to_card_RFM.py:55-74 (card: 180-day dormancy,
  *     0.5 rank thresholds).
  *
  * Scale notes: the groupBy is a standard two-phase hash aggregate (partial
  * map-side combine → final), so the shuffle carries group cardinality, not
  * fact rows. Ranks run *after* aggregation over the (small) group table —
  * a single window sort over |groups| rows. `countDistinct` plans as
  * expand + two-phase agg; fine here because the distinct key is co-grouped.
  */
object Rfm {

  /** `analysis_date = max(dateCol) + 1 day` — one driver round-trip, exactly
    * like the reference's `.max()` (db_to_RFManalysis.py:236). The action is
    * a column-pruned scan + max; cheap even at 100 TB (parquet stats help).
    */
  def analysisDate(df: DataFrame, dateCol: String): Date = {
    val row = df.agg(max(to_date(col(dateCol))).as("d")).head()
    Date.valueOf(row.getDate(0).toLocalDate.plusDays(1))
  }

  /** One RFM aggregate with pandas-pct ranks, columns named
    * `{prefix}recency_days/frequency/monetary/r_rank/f_rank/m_rank`.
    *
    * Ranks use `PandasRank.pctRankScalableAll` — the adaptive strategy:
    * group tables at or under the 2^17-row threshold take the windowed
    * form (a counted, provably bounded sort — milliseconds, no extra
    * jobs); larger ones take range-partitioned prefix-sum lookup tables
    * with ZERO single-partition windows. The group key here is
    * cards/merchants — hundreds of millions at 100 TB, far past the
    * threshold — so at scale the global window sort this used to plan
    * never happens. Both strategies are bit-identical (same integer rank
    * arithmetic and fp division order, oracle-proven via q05/q06/q07).
    */
  def aggregate(df: DataFrame, keys: Seq[String], dateCol: String,
                idCol: String, amountCol: String, analysisDate: Date,
                prefix: String = ""): DataFrame = {
    val agg = df.groupBy(keys.map(col): _*).agg(
      datediff(lit(analysisDate), max(to_date(col(dateCol))))
        .as(s"${prefix}recency_days"),
      countDistinct(col(idCol)).as(s"${prefix}frequency"),
      dsum(col(amountCol)).as(s"${prefix}monetary"))
    PandasRank.pctRankScalableAll(agg, Seq(
      (s"${prefix}recency_days", s"${prefix}r_rank", false),
      (s"${prefix}frequency", s"${prefix}f_rank", true),
      (s"${prefix}monetary", s"${prefix}m_rank", true)))
  }

  /** Lifetime + short-window RFM, left-joined on the group keys with the
    * reference's fill discipline. The join inputs are post-aggregation group
    * tables — at cluster scale Catalyst broadcast-joins the short side
    * (always <= lifetime side).
    */
  def dualWindow(df: DataFrame, keys: Seq[String], dateCol: String,
                 idCol: String, amountCol: String, analysisDate: Date,
                 shortDays: Int = 365): DataFrame = {
    val life = aggregate(df, keys, dateCol, idCol, amountCol,
      analysisDate, "life_")
    val cutoff = Date.valueOf(analysisDate.toLocalDate.minusDays(shortDays))
    val short = aggregate(
      df.filter(to_date(col(dateCol)) >= lit(cutoff)),
      keys, dateCol, idCol, amountCol, analysisDate, "short_")
    life.join(short, keys, "left")
      .na.fill(0, Seq("short_frequency", "short_monetary",
        "short_r_rank", "short_f_rank", "short_m_rank"))
      .na.fill(9999, Seq("short_recency_days"))
  }

  /** Merchant-style segment ladder (db_to_RFManalysis.py:258-268), English
    * labels. First-match-wins `when` chain == the reference's if/elif ladder.
    */
  def merchantSegment: Column = {
    val highValue = col("life_m_rank") >= 0.8
    val active = col("short_frequency") > 0
    when(highValue && active, "Core")
      .when(highValue && !active, "Churned VIP")
      .when(!highValue && active && col("short_m_rank") >= 0.8, "Rising Star")
      .when(active, "Active")
      .otherwise("Dormant")
  }

  /** Card-style segment ladder (db_to_card_RFM.py:55-74). */
  def cardSegment: Column = {
    val highFreq = col("f_rank") >= 0.5
    val highMoney = col("m_rank") >= 0.5
    when(col("recency_days") > 180, "Dormant")
      .when(highFreq && highMoney, "Main Driver")
      .when(!highFreq && highMoney, "Sniper")
      .when(highFreq && !highMoney, "Utility")
      .otherwise("Inefficient")
  }

  /** `avg_ticket = int(monetary / frequency)` — truncation toward zero via
    * int cast, matching pandas `.astype(int)` (db_to_card_RFM.py:146).
    */
  def avgTicket: Column =
    (col("monetary") / col("frequency")).cast("long")
}
