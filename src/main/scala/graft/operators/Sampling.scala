package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data curation.
  *
  * Everything keys off md5 of the row id, never rand(): results are identical
  * across runs, retries, partitionings and engines (md5 of the decimal string
  * form of the id is engine-portable, which is what makes these operators
  * DuckDB-oracle-able). hashSplit is pure map-side; stratifiedTake costs one
  * shuffle on the group key, same as any windowed aggregation.
  */
object Sampling {

  /** Add a `split` column ('train'/'val'/'test') by the first two hex chars
    * of md5(id): prefix < trainHexUpper -> train, < valHexUpper -> val, else
    * test. Defaults give ~80/10/10 (204/26/26 of 256 buckets). Rows keep
    * their split forever — adding data never reassigns existing rows.
    */
  def hashSplit(df: DataFrame, idCol: String,
      trainHexUpper: String = "cc", valHexUpper: String = "e6"): DataFrame = {
    // md5() emits lowercase hex; normalize and validate the thresholds so an
    // uppercase "CC" can't lexically sort below every digest and send all
    // rows to 'test'.
    val train = trainHexUpper.toLowerCase
    val value = valHexUpper.toLowerCase
    // ASCII range check, not isDigit: Unicode digits (e.g. U+0663) would pass
    // isDigit yet sort above every hex digest, re-creating the mis-split
    def hex(c: Char) = ('0' to '9').contains(c) || ('a' to 'f').contains(c)
    require(train.length == 2 && train.forall(hex),
      s"train threshold must be two hex chars, got '$trainHexUpper'")
    require(value.length == 2 && value.forall(hex),
      s"val threshold must be two hex chars, got '$valHexUpper'")
    require(train < value, "train threshold must sort below val threshold")
    val prefix = substring(md5(col(idCol).cast("string")), 1, 2)
    df.withColumn("split",
      when(prefix < train, "train")
        .when(prefix < value, "val")
        .otherwise("test"))
  }

  /** Deterministic stratified take: at most k rows per group, chosen by
    * md5(id) order — a reproducible "reservoir" any engine replays
    * identically. Balances skewed groups (languages, sources, labels)
    * without a global sort.
    */
  def stratifiedTake(df: DataFrame, groupCols: Seq[String], idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }
}
