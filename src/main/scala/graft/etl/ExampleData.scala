package graft.etl

import java.nio.charset.Charset
import java.nio.file.{Files, Paths}

/** Reference-shaped example statements + configs (FIXTURES.md §1-§2) —
  * the shippable demo corpus (mirrors the reference's examples/ dir),
  * written to a temp dir: esun CSV with preamble junk / master rows /
  * foreign splits / e.Point (ROC filename), cube CSV with combined
  * location-currency and dual card numbers, ctbc CSV in Big5, hncb HTML
  * with multiple tables and starred master rows.
  */
object ExampleData {

  def write(dir: String): Unit = {
    Files.createDirectories(Paths.get(s"$dir/data"))
    Files.createDirectories(Paths.get(s"$dir/configs"))

    def put(path: String, content: String, enc: String = "UTF-8"): Unit =
      Files.write(Paths.get(path), content.getBytes(Charset.forName(enc)))

    // ---- esun: utf-8 CSV, ROC filename 113年1月 → base 2024, bill month 1
    put(s"$dir/data/玉山113年1月帳單.csv",
      """帳單說明：這是前言垃圾行
        |會員資訊,,,,,
        |交易日期,入帳日期,卡號末四碼,交易說明,外幣金額,臺幣金額
        |01/05,01/06,,卡號：1111-2222-3333-4444（玉山Unicard－正卡）,,
        |01/05,01/06,,全聯福利中心,,500
        |12/28,12/29,,STEAMGAMES.COM  JPN TOKYO  12/28,35.5,680
        |01/10,01/11,,網路銀行繳款,,-5000
        |01/15,01/16,,"使用e point 1,000 點折現金 100 元",,
        |垃圾行沒有日期,,,,,
        |""".stripMargin)

    // ---- cube: utf-8 CSV, western filename 202401
    put(s"$dir/data/國泰202401帳單.csv",
      """國泰世華信用卡電子帳單
        |信用卡號,交易日,入帳日,卡號末四碼,交易說明,臺幣金額,消費地/幣別
        |CUBE卡,01/03,01/04,1111/2222,百貨公司,2000,TW / TWD
        |CUBE卡,01/04,01/05,1111/2222,AMAZON MARKETPLACE,1200,JPN CHIYODA-KU / JPY
        |CUBE卡,01/06,01/07,3333/4444,新商店,300,TW / TWD
        |""".stripMargin)

    // ---- ctbc: Big5 CSV
    put(s"$dir/data/中信202401.csv",
      """消費日期,入帳日期,卡號末四碼,商店名稱,臺幣金額,外幣金額,幣別
        |2024/01/05,2024/01/06,5678,LINE PAY－好食餐廳忠孝店,800,,
        |01/07,01/08,5678,加油站,600,,
        |""".stripMargin, "Big5")

    // ---- hncb: Big5 HTML, decoy table first, newline inside a header cell
    put(s"$dir/data/華南202401.html",
      """<html><body>
        |<table><tr><td>廣告</td><td>無關表格</td></tr></table>
        |<table border="1">
        |<tr><th>交易日期</th><th>入帳
        |日期</th><th>卡號末四碼</th><th>摘要</th><th>金額</th></tr>
        |<tr><td>01/08</td><td>01/09</td><td></td><td>華南經典卡************9876</td><td></td></tr>
        |<tr><td>01/08</td><td>01/09</td><td></td><td>咖啡店</td><td>150</td></tr>
        |<tr><td>01/09</td><td>01/10</td><td></td><td>自動扣繳轉帳繳款</td><td>-2000</td></tr>
        |</table>
        |</body></html>
        |""".stripMargin, "Big5")

    // ---- sinopac: real .xlsx (S5) — date-styled serial cells, shared
    // strings, numeric amounts; exercises the ZIP+OOXML reader end-to-end
    // (the reference routes 永豐/DAWAY → sinopac_bank, etl.py:458, and its
    // excel path is the generic pd.read_excel, etl.py:311-315)
    Xlsx.writeSheets(s"$dir/data/永豐202401帳單.xlsx", Seq(
      "明細" -> Seq(
        Seq("交易日期", "入帳日期", "卡號末四碼", "交易摘要", "臺幣金額"),
        Seq(java.time.LocalDate.of(2024, 1, 12),
          java.time.LocalDate.of(2024, 1, 13), "7777", "永豐超市", 350),
        Seq(java.time.LocalDate.of(2024, 1, 20),
          java.time.LocalDate.of(2024, 1, 21), "7777", "書店", 420))))

    // ---- configs (reference layout)
    put(s"$dir/configs/banks_config.yaml",
      """esun_bank:
        |  bank_name: "玉山銀行"
        |  file_type: "csv"
        |  encoding: "utf-8"
        |  header_keyword: "交易日期"
        |  columns_mapping:
        |    交易日期: Transaction_Date
        |    入帳日期: Posting_Date
        |    卡號末四碼: Card_No
        |    交易說明: Merchant
        |    外幣金額: Currency_Amount
        |    臺幣金額: Amount
        |cube_bank:
        |  bank_name: "國泰世華"
        |  file_type: "csv"
        |  encoding: "utf-8"
        |  header_keyword: "信用卡號"
        |  columns_mapping:
        |    交易日: Transaction_Date
        |    入帳日: Posting_Date
        |    卡號末四碼: Card_No
        |    交易說明: Merchant
        |    臺幣金額: Amount
        |    消費地/幣別: Raw_Country_Currency
        |ctbc_bank:
        |  bank_name: "中國信託"
        |  file_type: "csv"
        |  encoding: "cp950"
        |  header_keyword: "消費日期"
        |  columns_mapping:
        |    消費日期: Transaction_Date
        |    入帳日期: Posting_Date
        |    卡號末四碼: Card_No
        |    商店名稱: Merchant
        |    臺幣金額: Amount
        |    外幣金額: Currency_Amount
        |    幣別: Currency_Type
        |hncb_bank:
        |  bank_name: "華南銀行"
        |  file_type: "html"
        |  encoding: "Big5"
        |  header_keyword: "交易日期"
        |  columns_mapping:
        |    交易日期: Transaction_Date
        |    入帳日期: Posting_Date
        |    卡號末四碼: Card_No
        |    摘要: Merchant
        |    金額: Amount
        |sinopac_bank:
        |  bank_name: "永豐銀行"
        |  file_type: "excel"
        |  encoding: "utf-8"
        |  header_keyword: "交易日期"
        |  columns_mapping:
        |    交易日期: Transaction_Date
        |    入帳日期: Posting_Date
        |    卡號末四碼: Card_No
        |    交易摘要: Merchant
        |    臺幣金額: Amount
        |""".stripMargin)

    put(s"$dir/configs/cards.csv",
      """對應卡片,卡號,行動支付標籤,加在消費明細摘要前方,卡號代換
        |玉山Unicard,4444,,,
        |國泰CUBE,1111/2222,,,9999
        |華南經典,9876,,,
        |""".stripMargin)

    put(s"$dir/configs/payment_gateway.csv",
      """Pattern,Category,Prefix_Label,Priority
        |(?i)(?:連加|連支|LINE.*PAY|LPEPI),Line Pay,LinePay－,25
        |(?i)(?:街口|JKOPAY),JKOPay,JKOPAY－,25
        |(?i).*(?:ECPay|綠界).*,綠界科技,綠界－,15
        |""".stripMargin)

    put(s"$dir/configs/merchants.csv",
      """Pattern,Replacement,Priority,Category,Sub_Category,RFM_Exclusion
        |好食餐廳,好食餐廳,50,Food,Restaurant,False
        |全聯,全聯福利中心,60,Grocery,Supermarket,False
        |STEAMGAMES,Steam,40,Entertainment,Games,False
        |咖啡,神祕咖啡店,45,Food,Cafe,False
        |百貨公司,百貨公司,30,Retail,Department,True
        |""".stripMargin)

    put(s"$dir/configs/transaction_types.yaml",
      """payment_keywords:
        |  - '網路銀行繳款'
        |  - '自動扣繳'
        |  - '轉帳繳款'
        |credit_keywords:
        |  - 'e point'
        |  - '回饋'
        |  - '調整'
        |fee_keywords:
        |  - '手續費'
        |  - '年費'
        |  - '調整'
        |""".stripMargin)
  }
}
