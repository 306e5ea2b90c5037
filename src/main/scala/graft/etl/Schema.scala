package graft.etl

import org.apache.spark.sql.types._

/** Canonical transaction schema — the pipeline's contract.
  *
  * Column names follow the reference's unified constants (etl.py:13-29),
  * output order etl.py:487-492 / refine.py:422-429, types refine.py:34-50,
  * snake_case database names load_to_db.py:81-97.
  *
  * Null discipline (refine.py:388-397): from the refine stage onward string
  * columns model "unset" as EMPTY STRING (classification guards compare
  * `== ''`), numeric columns as SQL NULL, dates as DateType-null.
  */
object Schema {

  // unified column names (etl.py:13-29)
  val TxnDate = "Transaction_Date"
  val PostDate = "Posting_Date"
  val ConvDate = "Conversion_Date"
  val Merchant = "Merchant"
  val Location = "Merchant_Location"
  val ConsumptionPlace = "Consumption_Place"
  val Currency = "Currency_Type"
  val Amount = "Amount" // intermediate: raw TWD amount (etl.py:20)
  val CurrAmount = "Currency_Amount"
  val PayAmount = "Payment_Amount"
  val PayCurrency = "Payment_Currency"
  val CardNo = "Card_No"
  val CardType = "Card_Type"
  val TxnType = "Transaction_Type"
  val MobilePay = "Mobile_Payment"
  val BankName = "Bank_Name"
  val RawCountryCurr = "Raw_Country_Currency" // intermediate: cube (etl.py:29)
  val PaymentPrefix = "payment_prefix" // intermediate: refine (refine.py:132)

  /** Extract-stage output order (etl.py:487-492). */
  val extractOrder: Seq[String] = Seq(
    TxnDate, PostDate, Merchant, Location, ConsumptionPlace,
    Currency, ConvDate, Amount, CurrAmount,
    PayAmount, PayCurrency,
    TxnType, MobilePay, CardType, CardNo, BankName)

  /** Refine-stage output order (refine.py:422-429). */
  val refineOrder: Seq[String] = Seq(
    TxnDate, PostDate,
    BankName, CardType, CardNo,
    Merchant, Location, ConsumptionPlace, ConvDate,
    TxnType, MobilePay,
    Currency, CurrAmount,
    PayCurrency, PayAmount)

  /** String columns under the empty-string null discipline
    * (refine.py:34-50 minus the float columns).
    */
  val stringCols: Seq[String] = Seq(
    TxnDate, PostDate, ConvDate, CardNo, BankName, CardType, Merchant,
    Location, ConsumptionPlace, Currency, PayCurrency, TxnType, MobilePay)

  /** Float columns (refine.py:34-36). */
  val floatCols: Seq[String] = Seq(CurrAmount, PayAmount)

  /** Production money mode (§1.3): the reference keeps money as float64 and
    * the default pipeline preserves that for bit-level oracle fidelity, but
    * a finance engine really wants exact fixed-point — additions never
    * drift, comparisons are exact, and parquet stores it as a compact
    * fixed-width value. 18,2 covers ±10^16 TWD cents, far beyond any card
    * statement. Enabled via `spark.graft.money=decimal`
    * ([[Pipeline.moneyType]]); strictly additive — no default output or
    * oracle hash changes.
    */
  val MoneyDecimal: DecimalType = DecimalType(18, 2)

  /** Refined-stage schema: dates kept as DateType (SURVEY §7.4.7), money in
    * the caller-selected representation, everything else string.
    */
  def refinedWith(money: DataType): StructType =
    StructType(refineOrder.map {
      case c @ (TxnDate | PostDate | ConvDate) => StructField(c, DateType)
      case c @ (CurrAmount | PayAmount) => StructField(c, money)
      case c => StructField(c, StringType)
    })

  /** Default refined schema: money as DoubleType for reference fidelity. */
  val refined: StructType = refinedWith(DoubleType)

  /** unified → snake_case rename (load_to_db.py:81-97). Note Card_Type →
    * card_name and Merchant → merchant_name.
    */
  val snakeCaseRename: Seq[(String, String)] = Seq(
    TxnDate -> "transaction_date",
    PostDate -> "posting_date",
    ConvDate -> "conversion_date",
    BankName -> "bank_name",
    CardType -> "card_name",
    CardNo -> "card_no",
    Merchant -> "merchant_name",
    Location -> "merchant_location",
    ConsumptionPlace -> "consumption_place",
    TxnType -> "transaction_type",
    MobilePay -> "mobile_payment",
    CurrAmount -> "currency_amount",
    PayAmount -> "payment_amount",
    Currency -> "currency_type",
    PayCurrency -> "payment_currency")

  /** Transaction-type enum (refine.py:258-364; SURVEY §2.6). */
  object TxnTypes {
    val Payment = "繳款"
    val Credit = "折抵"
    val Refund = "退刷"
    val Fee = "各項費用"
    val ZeroCheck = "驗證/零元"
    val Generic = "交易"
    val Foreign = "一般國外交易"
    val TwdCrossBorder = "台幣跨境交易"
    val DualCurrency = "一般雙幣交易"
  }
}
