package graft.spark

import graft.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.FunctionBridge

/** Registers graft's native Catalyst expressions for `spark.sql(...)`
  * users (SQL-surface parity, SURVEY.md §4.3). Idempotent. */
object SqlFunctions {
  def register(spark: SparkSession): Unit = {
    FunctionBridge.registerTempFunction(spark, "shadow_extract",
      es => ShadowExtractExpr(es(0), es(1)))
    FunctionBridge.registerTempFunction(spark, "graft_fingerprint64",
      es => Fingerprint64(es.head))
    FunctionBridge.registerTempFunction(spark, "graft_lang_id",
      es => LangIdExpr(es.head))
    FunctionBridge.registerTempFunction(spark, "graft_simhash64",
      es => SimHash64(es.head))
    FunctionBridge.registerTempFunction(spark, "graft_html_unescape",
      es => HtmlUnescapeExpr(es.head))
    FunctionBridge.registerTempFunction(spark, "graft_canonical_url",
      es => UrlCanonicalizeExpr(es.head))
    FunctionBridge.registerTempFunction(spark, "graft_registered_domain",
      es => UrlRegisteredDomainExpr(es.head))
    FunctionBridge.registerTempFunction(spark, "graft_robots_allowed",
      es => RobotsAllowedExpr(es(0), es(1), es(2)))
  }
}
