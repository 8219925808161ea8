package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right row
  * with `right.time < left.time` (strict), per key. Spark has no native
  * as-of join; the classic sort-merge formulation is expressed as
  * union + last(ignoreNulls) over a (key, time)-ordered window —
  * ONE shuffle on the key, no range cross-join blowup, skew-safe as long
  * as keys are. (DuckDB's native ASOF JOIN is the oracle.)
  *
  * Semantics notes:
  *  - all right value columns are carried as ONE struct, so the matched
  *    values always come from the SAME right row (no cross-row stitching
  *    when some value columns are NULL);
  *  - NULL keys never match (join semantics): right rows with NULL keys
  *    are dropped, left rows with NULL keys come through with NULL values.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry (prefixed `asof_`). */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String]): DataFrame = {

    val lCols = left.columns
    val packed = struct(valueCols.map(col): _*)
    val packedType = right.select(packed).schema.head.dataType

    val l = left
      .select(Seq(col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(packedType).as("__v")) ++ lCols.map(col): _*)
    val r = right
      .filter(col(key).isNotNull)
      .select(Seq(col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
        packed.as("__v")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // STRICT match (right.time < left.time): at equal time the LEFT row
    // (side 1) sorts FIRST (side desc), so its preceding-rows frame excludes
    // same-time right rows. The whole value struct breaks remaining ties
    // deterministically and travels atomically.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").desc, col("__v").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)

    l.unionByName(r)
      .withColumn("__asof", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(col) ++
        valueCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
