package graft.silver

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame-algebra rewrites of the reference's Iceberg MERGE INTO
  * statements (reference: `dags/2_bronze_to_silver.py:266-293`). No Iceberg
  * in this environment, so MERGE becomes pure relational algebra — which is
  * also what Iceberg's copy-on-write MERGE lowers to internally.
  *
  * Scale notes: both rewrites are a single equi-join on the merge keys —
  * Spark shuffles both sides by key (or broadcasts the smaller, typically
  * the staging batch, under AQE). No driver-side collection; output
  * partitioning follows the join keys so a downstream write by the same
  * keys avoids a second shuffle.
  */
object Merge {

  /** `MERGE … WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
    * (J6, `dags/2_bronze_to_silver.py:278-293`): staging wins on key match,
    * unmatched target rows survive. Implemented as
    * `staging ∪ (target ⟕anti staging)`. */
  def upsert(target: DataFrame, staging: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = target.columns.toSeq
    staging.select(cols.map(col): _*)
      .unionByName(target.join(staging.select(keys.map(col): _*), keys, "left_anti"))
  }

  /** `MERGE … WHEN NOT MATCHED THEN INSERT *` (J7, insert-only merge for
    * immutable dims, `dags/2_bronze_to_silver.py:266-276`): existing target
    * rows are never touched; only staging rows with unseen keys append. */
  def insertOnly(target: DataFrame, staging: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = target.columns.toSeq
    target.unionByName(
      staging.select(cols.map(col): _*).join(target.select(keys.map(col): _*), keys, "left_anti"))
  }
}
