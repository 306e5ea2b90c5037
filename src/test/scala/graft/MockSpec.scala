package graft

import org.apache.spark.sql.functions._

import graft.etl.{Mock, Schema}

/** Mock-generation semantics (O5/O6): stratified sampling, gap-preserving
  * date shift, integer-preserving noise, card masking.
  */
class MockSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("2024-03-01", "LinePay－超商", "1111", 100.0),
    ("2024-03-05", "NETFLIX.COM", "1111", 390.0),
    ("2024-03-08", "Steam Games", "2222", 1250.5),
    ("2024-03-10", "加油站", "2222", 800.0),
    ("2024-03-15", "網路銀行繳款", null, -5000.0)
  ).toDF(Schema.TxnDate, Schema.Merchant, Schema.CardNo, Schema.PayAmount)

  test("smart sample keeps keyword hits and dedups") {
    val s = Mock.smartSample(df, n = 4, seed = 1L)
    val merchants = s.select(Schema.Merchant).as[String].collect().toSet
    assert(merchants.contains("NETFLIX.COM")) // keyword hit always kept
    assert(merchants.contains("Steam Games"))
    assert(s.count() == s.dropDuplicates().count())
  }

  test("date shift lands max on target and preserves gaps") {
    val shifted = Mock.shiftDates(df, "2023-12-25")
    val dates = shifted.select(to_date(col(Schema.TxnDate)))
      .as[java.sql.Date].collect().map(_.toLocalDate).sortBy(_.toEpochDay)
    assert(dates.last.toString == "2023-12-25")
    // 2024-03-01 .. 2024-03-15 is a 14-day span — preserved
    assert(dates.last.toEpochDay - dates.head.toEpochDay == 14)
  }

  test("amount noise stays within ±5% and keeps integer columns integral") {
    val noisy = Mock.perturbAmounts(df, seed = 7L,
      cols = Seq(Schema.PayAmount))
    val pairs = df.select(Schema.PayAmount).as[Double].collect()
      .zip(noisy.select(Schema.PayAmount).as[Double].collect())
    pairs.filter(_._1 != 0).foreach { case (orig, per) =>
      assert(math.abs(per / orig - 1.0) <= 0.0501, s"$orig -> $per")
    }
    // column has non-integer 1250.5 → 2-decimal rounding, not truncation
    assert(pairs.forall { case (_, p) => (p * 100).round / 100.0 == p })
  }

  test("config sanitization remaps card rules through the fake map") {
    val rules = Seq(
      graft.etl.EtlConfigs.CardRule("卡A", "1111", "", "", ""),
      graft.etl.EtlConfigs.CardRule("卡B", "1111/2222", "", "", "9999"),
      graft.etl.EtlConfigs.CardRule("卡C", "0000", "", "", "")) // unseen
    val fakeMap = Map(
      "1111" -> "****-****-****-4444",
      "2222" -> "****-****-****-5555")
    val got = Mock.sanitizeCardRules(rules, fakeMap)
    assert(got.map(_.cardNo) == Seq("4444", "4444/5555")) // 0000 dropped
    assert(got.head.cardType == "卡A") // other fields untouched
  }

  test("readme comparison table renders the raw-vs-refined markdown " +
    "preview") {
    val raw = Seq(
      ("LinePay－全家便利商店超長店名", "旅遊", 120.0),
      ("NETFLIX.COM AMSTERDAM", "訂閱", 390.0)
    ).toDF(Schema.Merchant, Schema.TxnType, Schema.PayAmount)
    val refined = Seq(
      ("全家便利商店", "超商", 120.0),
      ("NETFLIX", "訂閱", 390.0)
    ).toDF(Schema.Merchant, Schema.TxnType, Schema.PayAmount)
    val md = Mock.readmeComparisonTable(raw, refined, n = 5)
    val lines = md.split("\n").toSeq
    // generate_mock.py:342-343 header + alignment row
    assert(lines.head == "| 原始商家 (Raw) | 清洗後 (Refined) | 交易類型 | 金額 |")
    assert(lines(1) == "| :--- | :--- | :--- | ---: |")
    assert(lines.size == 4)
    // raw merchant truncated to 15 chars + "..."; refined fields verbatim
    assert(lines(2).startsWith(
      s"| `${"LinePay－全家便利商店超長店名".take(15)}...` | `全家便利商店` | 超商 | "))
    assert(lines(3).contains("`NETFLIX`") && lines(3).contains("390"))
  }

  test("card masking is total, format-shaped, and reports its map") {
    val (masked, fakeMap) = Mock.maskCards(df,
      customMap = Map("1111" -> "4444"))
    assert(fakeMap("1111") == "****-****-****-4444")
    assert(fakeMap.keySet == Set("1111", "2222"))
    val cards = masked.select(Schema.CardNo).collect().map(_.getString(0))
    assert(cards.count(_ == null) == 1) // null card untouched
    assert(cards.filter(_ != null)
      .forall(_.matches("\\*{4}-\\*{4}-\\*{4}-\\d{4}")))
  }
}
