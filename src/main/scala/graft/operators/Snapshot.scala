package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot maintenance: merge a delta batch into a previous snapshot
  * keeping the latest version per key (SCD-1 upsert), and the generic
  * keep-latest dedup behind it.
  *
  * The reference's load stage is full-overwrite (`load_to_db.py:119`,
  * `if_exists='replace'`); this is the incremental form a 100 TB
  * deployment needs: one shuffle on the key, no driver-side state.
  * At scale the union's merge window is the standard pattern behind
  * Delta/Iceberg MERGE when only plain parquet is available — pair it
  * with partition-overwrite (`partitionBy` + dynamic overwrite) so only
  * partitions containing delta keys rewrite.
  */
object Snapshot {

  /** Keep the highest-`versionCol` row per `keys` combination. Ties are
    * broken by the remaining sort stability of `row_number` — pass a
    * total-ordering version column for deterministic output.
    */
  def keepLatest(df: DataFrame, keys: Seq[String], versionCol: String)
      : DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Merge `delta` into `prev`: rows in both keep the delta version;
    * rows in only one side pass through. Both inputs must carry
    * `versionCol`, with every delta version greater than every prev
    * version for classic upsert semantics.
    */
  def mergeSnapshot(prev: DataFrame, delta: DataFrame, keys: Seq[String],
                    versionCol: String): DataFrame =
    keepLatest(prev.unionByName(delta), keys, versionCol)
}
