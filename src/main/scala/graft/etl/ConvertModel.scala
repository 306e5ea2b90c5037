package graft.etl

import java.nio.file.{Files, Paths}

/** Config-master exporter (convert_model.py): read the Excel model
  * workbook and emit one CSV per known sheet into `configs/`.
  *
  * Mirrors the reference's behavior: prefer the real workbook over the
  * published example template (convert_model.py:8-11,25-36), create the
  * output dir, skip missing sheets with a warning, write utf-8-sig CSVs
  * after dropping all-empty rows/columns. Driver-side by design — the
  * model workbook is a KB-sized rule table, not data.
  *
  * Usage: `runMain graft.etl.ConvertModel [workDir]` (defaults to cwd).
  */
object ConvertModel {

  /** Sheet → output CSV (convert_model.py:15-23). */
  val SheetMapping: Seq[(String, String)] = Seq(
    "卡號對照表(mapping table)" -> "card_mapping.csv",
    "支付前綴關鍵字表(Regex)" -> "payment_regex_rules.csv",
    "消費明細關鍵字表(Regex)" -> "merchant_regex_rules.csv",
    "一般消費判斷和消費明細標籤(維度表)" -> "merchant_categories.csv",
    "信用卡權益回饋紀錄(維度表)" -> "reward_rates.csv",
    "信用卡權益通路認列(橋接表)" -> "reward_bridges.csv",
    "外幣匯率紀錄(維度表)" -> "exchange_rates.csv")

  val RealSourceFile = "信用卡消費資料模型.xlsx"
  val ExampleSourceFile = "configs/信用卡消費資料模型_範本.xlsx"

  /** Real workbook wins over the example template; None when neither
    * exists (convert_model.py:25-36).
    */
  def sourceFile(workDir: String): Option[String] =
    Seq(s"$workDir/$RealSourceFile", s"$workDir/$ExampleSourceFile")
      .find(p => Files.exists(Paths.get(p)))

  /** Run the export; returns (csvName, dataRows) per exported sheet. */
  def run(workDir: String): Seq[(String, Int)] = {
    val src = sourceFile(workDir).getOrElse(
      throw new IllegalArgumentException(
        s"no $RealSourceFile or $ExampleSourceFile under $workDir"))
    val exported =
      Xlsx.exportConfigCsvs(src, s"$workDir/configs", SheetMapping)
    val done = exported.map(_._1).toSet // export reports CSV names
    val missing = SheetMapping.collect {
      case (sheet, out) if !done(out) => sheet
    }
    missing.foreach(s => System.err.println(s"[convert-model] skip: $s"))
    exported
  }

  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse(".")
    run(workDir).foreach { case (name, n) =>
      println(s"[convert-model] $name: $n rows")
    }
  }
}
