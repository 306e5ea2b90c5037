package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, NumericType}

import graft.etl.EtlConfigs._
import graft.etl.Schema._
import graft.operators.RuleEngine

/** Refine stage (refine.py EP2): unified transactions → classified,
  * rule-normalized transactions.
  *
  * The whole stage is one narrow Column pipeline — rule tables live inside
  * the plan (broadcast-free lookup semantics), the fact table never
  * shuffles, Catalyst collapses the dozens of `when`s into one projection
  * (SURVEY §3 EP2).
  *
  * Rule-application disciplines (SURVEY §7.4.3 — each encoded explicitly):
  *   - card mapping (J2): FILE order, last match wins, match keys are
  *     SNAPSHOTS of the input columns (refine.py:139-140 cleans once,
  *     before the loop);
  *   - payment tagging (J3): priority desc, first match wins via the
  *     `Mobile_Payment == ''` guard on the INITIAL value;
  *   - merchant rewrite: priority desc sequential fold where later rules
  *     see earlier replacements (RuleEngine.sequentialRewrite).
  */
object Refine {

  /** Type coercion + empty-string null canonicalization (refine.py:388-400):
    * string cols → coalesce('') + trim + literal 'nan' → ''; float cols →
    * tolerant numeric parse. Input columns may be raw strings (CSV) or
    * already typed (extract output) — both coerce identically.
    */
  def canonicalize(df: DataFrame,
                   moneyType: DataType = DoubleType): DataFrame = {
    val withCols = (stringCols ++ floatCols ++ Seq(PaymentPrefix))
      .foldLeft(df) { (d, c) =>
        if (d.columns.contains(c)) d
        else d.withColumn(c, lit(null).cast("string"))
      }
    val strings = (stringCols :+ PaymentPrefix).foldLeft(withCols) { (d, c) =>
      val t = trim(coalesce(col(c).cast("string"), lit("")))
      d.withColumn(c, when(lower(t) === "nan", lit("")).otherwise(t))
    }
    floatCols.foldLeft(strings) { (d, c) =>
      d.withColumn(c, col(c).cast("string").try_cast(moneyType.catalogString))
    }
  }

  // ------------------------------------------------------------ J2 + C7
  /** Card-account mapping (refine.py:114-174). For each cards.csv row, in
    * file order: match on space-stripped Card_No (dual-number keys like
    * '1111/2222' match the combined field; a mobile tag adds an equality
    * guard on Mobile_Payment), then overwrite Card_Type / Mobile_Payment /
    * payment_prefix / Card_No — later rules overwrite earlier ones.
    *
    * Match keys snapshot the INPUT columns, so one rule's assignment never
    * changes which later rules match (pandas cleans df_card_clean /
    * df_mobile_clean before its loop). Last-match-wins per column compiles
    * to a first-match `when` chain over the REVERSED rule list — flat, no
    * nested accumulators.
    */
  def applyCardMapping(df: DataFrame, rules: Seq[CardRule]): DataFrame = {
    val cardClean = regexp_replace(col(CardNo), " ", "")
    val mobileClean = col(MobilePay) // already trimmed by canonicalize
    def cond(r: CardRule): Column = {
      val key = r.cardNo.replace(" ", "")
      if (r.cardNo.contains("/")) cardClean === key
      else if (r.mobileTag.nonEmpty)
        cardClean === key && mobileClean === r.mobileTag
      else cardClean === key
    }
    def overwrite(orig: Column, pick: CardRule => String): Column =
      rules.reverse.collect {
        case r if pick(r).nonEmpty => (cond(r), pick(r))
      }.foldRight(orig) { case ((c, v), acc) => when(c, lit(v)).otherwise(acc) }
    df.withColumn(PaymentPrefix,
        if (df.columns.contains(PaymentPrefix)) col(PaymentPrefix)
        else lit("")) // refine.py:132 inits ''
      .withColumn(CardType, overwrite(col(CardType), _.cardType))
      .withColumn(MobilePay, overwrite(col(MobilePay), _.mobileTag))
      .withColumn(PaymentPrefix, overwrite(col(PaymentPrefix), _.prefix))
      .withColumn(CardNo, overwrite(col(CardNo), _.replaceCardNo))
  }

  /** C7: unmapped Cathay dual-number repair (refine.py:176-182) — take the
    * text before '/'.
    */
  def cleanupCathayRemaining(df: DataFrame): DataFrame =
    df.withColumn(CardNo,
      when(col(BankName) === "cube_bank" && col(CardNo).contains("/"),
        trim(split(col(CardNo), "/", 2).getItem(0)))
        .otherwise(col(CardNo)))

  // ------------------------------------------------------------ J3
  /** Third-party payment tagging (refine.py:184-202): rules priority-desc;
    * a row takes the FIRST rule whose pattern matches its Merchant —
    * profiting from the `Mobile_Payment == ''` guard, which freezes the
    * choice at the first assignment. Rows with a pre-set Mobile_Payment are
    * untouched.
    */
  def identifyThirdPartyPayment(df: DataFrame,
                                rules: Seq[PaymentRule]): DataFrame = {
    val untagged = col(MobilePay) === ""
    def chain(orig: Column, pick: PaymentRule => String): Column =
      rules.foldRight(orig) { (r, acc) =>
        when(untagged && col(Merchant).rlike(r.pattern), lit(pick(r)))
          .otherwise(acc)
      }
    df.withColumn(PaymentPrefix, chain(col(PaymentPrefix), _.prefixLabel))
      .withColumn(MobilePay, chain(col(MobilePay), _.category))
  }

  // ------------------------------------------------------------ X15
  /** esun e.Point backfill (refine.py:208-226): rows whose Merchant carries
    * `使用e point N 點折現金 M 元` get Payment_Amount = −M, Payment_Currency
    * TWD.
    */
  def processEsunEpoint(df: DataFrame): DataFrame = {
    val pat = "使用e point\\s*([\\d,]+)\\s*點折現金\\s*([\\d,]+)\\s*元"
    val isEsun = col(BankName) === "esun_bank"
    val hasKw = lower(col(Merchant)).contains("使用e point")
    val amount = regexp_replace(regexp_extract(col(Merchant), pat, 2), ",", "")
    val valid = isEsun && hasKw && amount =!= ""
    // backfilled value follows the column's money representation (double by
    // default, DecimalType under spark.graft.money=decimal) so the branch
    // types unify without widening the column
    val moneyT = (if (df.columns.contains(PayAmount))
                    df.schema(PayAmount).dataType
                  else DoubleType) match {
      case n: NumericType => n
      case _ => DoubleType // pre-canonicalize (string) input
    }
    df.withColumn(PayAmount,
        when(valid, -amount.cast(moneyT)).otherwise(col(PayAmount)))
      .withColumn(PayCurrency,
        when(valid, lit("TWD")).otherwise(col(PayCurrency)))
  }

  /** Merchant whole-cell rewrite (refine.py:228-245): priority-desc
    * sequential fold; rules with empty Replacement are skipped.
    */
  def cleanMerchantByRegex(df: DataFrame,
                           rules: Seq[MerchantRule]): DataFrame =
    df.withColumn(Merchant,
      RuleEngine.sequentialRewrite(col(Merchant),
        rules.filter(_.replacement.nonEmpty)
          .map(r => RuleEngine.Rule(r.pattern, r.replacement))))

  // ------------------------------------------------------------ §2.6
  /** Transaction-type classification cascade (refine.py:258-364) with the
    * C8 amount sync and C9 field clears. First-match-wins `when` chain ==
    * the reference's sequential masked assignments, because every reference
    * mask guards on `Transaction_Type == ''`.
    */
  def classifyTransactionType(df: DataFrame,
                              kw: TxnTypeKeywords): DataFrame = {
    import TxnTypes._
    val m = col(Merchant)
    def ci(p: String) = "(?i)" + p // pandas case=False
    val wasEmpty = col(TxnType) === ""
    val payMatch = m.rlike(ci(kw.paymentPat)) &&
      !m.rlike(ci("代收|手續費|運費"))
    val creditMatch = m.rlike(ci(kw.creditPat))
    val feeMatch = m.rlike(ci(kw.feePat))
    val pay = col(PayAmount)
    val foreign = col(Location) =!= "TW"
    val sameCurr = col(Currency) === col(PayCurrency)

    val newType =
      when(!wasEmpty, col(TxnType))
        .when(payMatch, Payment)
        .when(creditMatch, Credit)
        .when(pay < 0, Refund)
        .when(feeMatch, Fee)
        .when(pay === 0, ZeroCheck)
        .when(pay > 0 && foreign && !sameCurr, Foreign)
        .when(pay > 0 && foreign && sameCurr && col(Currency) === "TWD",
          TwdCrossBorder)
        .when(pay > 0 && foreign && sameCurr, DualCurrency)
        .when(pay > 0, Generic)
        .otherwise(col(TxnType))

    val typed = df.withColumn("_new_type", newType)
    val newly = wasEmpty
    val t = col("_new_type")
    typed
      // C8: TWD cross-border → sync consumption amount to payment amount
      .withColumn(CurrAmount,
        when(newly && t === TwdCrossBorder, col(PayAmount))
          .otherwise(col(CurrAmount)))
      // C9: classification clears (refine.py:280-283, 290-292, 305-307)
      .withColumn(CardType,
        when(newly && t === Payment, lit("")).otherwise(col(CardType)))
      .withColumn(ConsumptionPlace,
        when(newly && t === Payment, lit(""))
          .otherwise(col(ConsumptionPlace)))
      .withColumn(MobilePay,
        when(newly && t.isin(Payment, Credit, Fee), lit(""))
          .otherwise(col(MobilePay)))
      .withColumn(PaymentPrefix,
        when(newly && t.isin(Payment, Credit, Fee), lit(""))
          .otherwise(col(PaymentPrefix)))
      .withColumn(TxnType, t)
      .drop("_new_type")
  }

  // ------------------------------------------------------------ C10
  /** Prefix merge (refine.py:247-256): `Merchant = prefix + Merchant` for
    * rows with a non-empty payment_prefix; drop the intermediate.
    */
  def applyFinalPrefixes(df: DataFrame): DataFrame =
    df.withColumn(Merchant,
        when(col(PaymentPrefix) =!= "",
          concat(col(PaymentPrefix), col(Merchant)))
          .otherwise(col(Merchant)))
      .drop(PaymentPrefix)

  /** Full refine stage (refine.py:370-433). */
  def refine(df: DataFrame,
             cardRules: Seq[CardRule],
             paymentRules: Seq[PaymentRule],
             merchantRules: Seq[MerchantRule],
             keywords: TxnTypeKeywords,
             moneyType: DataType = DoubleType): DataFrame = {
    val canon = canonicalize(df, moneyType)
    val step1 = cleanupCathayRemaining(applyCardMapping(canon, cardRules))
    val step2 = identifyThirdPartyPayment(step1, paymentRules)
    val step3 = cleanMerchantByRegex(processEsunEpoint(step2), merchantRules)
    val step4 = classifyTransactionType(step3, keywords)
    val step5 = applyFinalPrefixes(step4)
    step5.select(refineOrder.map(col): _*)
  }
}
