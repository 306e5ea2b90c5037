package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end pipeline orchestrator — the Spark equivalent of running
  * `etl.py && refine.py && load_to_db.py && db_to_*.py` in sequence.
  *
  * Stage boundaries that the reference materializes as CSV/SQLite files
  * stay LAZY here (one Catalyst plan from statement file to RFM output)
  * unless the caller asks for the intermediate artifacts.
  */
object Pipeline {

  final case class Configs(
      banks: Map[String, EtlConfigs.BankConfig],
      cards: Seq[EtlConfigs.CardRule],
      payments: Seq[EtlConfigs.PaymentRule],
      merchants: Seq[EtlConfigs.MerchantRule],
      keywords: EtlConfigs.TxnTypeKeywords)

  /** Load every config/rule table from a reference-layout config dir
    * (banks_config.yaml, cards.csv, payment_gateway.csv, merchants.csv,
    * transaction_types.yaml). Missing rule files degrade to empty rule
    * lists, mirroring the reference's defensive fallbacks (refine.py:62-91).
    */
  def loadConfigs(spark: SparkSession, configDir: String): Configs = {
    def p(f: String) = s"$configDir/$f"
    Configs(
      banks =
        if (new java.io.File(p("banks_config.yaml")).exists())
          EtlConfigs.loadBankConfigs(p("banks_config.yaml"))
        else EtlConfigs.loadBankConfigs(p("banks_configs_example.yaml")),
      cards = EtlConfigs.loadCardRules(spark, p("cards.csv")),
      payments = EtlConfigs.loadPaymentRules(spark, p("payment_gateway.csv")),
      merchants = EtlConfigs.loadMerchantRules(spark, p("merchants.csv")),
      keywords = EtlConfigs.loadTxnTypeKeywords(p("transaction_types.yaml")))
  }

  /** Extract + refine: statement files → refined transactions (EP1 + EP2,
    * one lazy plan).
    */
  def extractRefine(spark: SparkSession, dataDir: String,
                    cfg: Configs): DataFrame =
    Refine.refine(
      Extract.extractAll(spark, dataDir, cfg.banks),
      cfg.cards, cfg.payments, cfg.merchants, cfg.keywords)

  /** Full run: extract → refine → load `all_transactions` → the three RFM
    * analyses, written under `outDir` as parquet. Returns the loaded row
    * count (K4).
    */
  def run(spark: SparkSession, dataDir: String, configDir: String,
          outDir: String): Long = {
    val cfg = loadConfigs(spark, configDir)
    val refined = extractRefine(spark, dataDir, cfg)
    val shaped = Load.toWarehouseShape(refined).cache()
    shaped.write.mode("overwrite").parquet(s"$outDir/all_transactions")
    val txns = spark.read.parquet(s"$outDir/all_transactions")
    Analyze.merchantRfm(txns, cfg.merchants, cfg.payments)
      .write.mode("overwrite").parquet(s"$outDir/rfm_merchant")
    Analyze.paymentRfm(txns, cfg.payments)
      .write.mode("overwrite").parquet(s"$outDir/rfm_payment")
    Analyze.cardRfm(txns)
      .write.mode("overwrite").parquet(s"$outDir/rfm_card")
    txns.count()
  }
}
