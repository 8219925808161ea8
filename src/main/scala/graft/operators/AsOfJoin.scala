package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right row
  * with `right.time < left.time` (strict), per key. Spark has no native
  * as-of join; the classic sort-merge formulation is expressed as
  * union + last_value(ignoreNulls) over a (key, time)-ordered window —
  * ONE shuffle on the key, no range cross-join blowup, skew-safe as long
  * as keys are. (DuckDB's native ASOF JOIN is the oracle.)
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
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col(key).as("__k"), col("__t"), col("__side")) ++
        lCols.map(c => col(c)) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col(key).as("__k"), col("__t"), col("__side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)

    // STRICT match (right.time < left.time): at equal time the LEFT row
    // (side 1) sorts FIRST (side desc), so its preceding-rows frame excludes
    // same-time right rows. Among right rows tied on (key, time), the first
    // value column breaks the tie deterministically.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").desc,
        col(s"__v_${valueCols.head}").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)
    val joined = l.unionByName(r)
      .select(col("*") +: valueCols.map(c =>
        last(col(s"__v_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
    joined.filter(col("__side") === 1)
      .select(lCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }
}
