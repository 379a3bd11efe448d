package graft.serving

import graft.QueryDef
import graft.functions.GraftFunctions

import org.apache.spark.sql.SparkSession

/** Catalog bootstrap for pure-SQL sessions: registers every testdata table
  * as a temp view plus graft's custom functions, so a user can drive the
  * whole engine through `spark.sql` (E3 serving contract).
  */
object GraftCatalog {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def registerTestdata(spark: SparkSession, sfDir: String): Unit = {
    TableNames.foreach { t =>
      QueryDef.t(spark, sfDir, t).createOrReplaceTempView(t)
    }
    GraftFunctions.register(spark)
  }
}
