package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.WeightedMean
import org.apache.spark.sql.functions._

/** Custom UDF/UDAF surface (SURVEY §2.J). Kept deliberately small: UDFs are
  * optimization barriers, so only genuinely-custom logic lives here.
  */
object UdfQueries extends QueryModule {

  /** D10/J3: weighted mean as a typed Aggregator — avg price weighted by
    * quantity per return flag. Oracle: sum(p*q)/sum(q).
    */
  private val weightedMean = QueryDef(
    "q_agg_weighted_mean",
    (spark, sfDir) => {
      val wm = udaf(WeightedMean)
      Tables.lineitem(spark, sfDir)
        .groupBy("l_returnflag")
        .agg(
          Ql.r(wm(col("l_extendedprice"), col("l_quantity"))).as("wavg_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      SELECT l_returnflag,
             ${Ql.R("sum(l_extendedprice * l_quantity) / sum(l_quantity)")} AS wavg_price,
             count(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY 1
    """))

  override def defs: Seq[QueryDef] = Seq(weightedMean)
}
