package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import scala.jdk.CollectionConverters._

/** Dataset registration + lineage (SURVEY.md §2.1 S5).
  *
  * The reference registers every source/sink as an "external dataset" under
  * a validated referenceName and reports lineage per run
  * (`ReferenceStreamingSource.java:43-44`, `MapRStreamingSource.java:71`).
  * Spark-native equivalents:
  *   - the catalog entry is a temp view under the same name;
  *   - run-level lineage comes from a [[QueryExecutionListener]] on the
  *     session's listener bus, which records which registered datasets each
  *     completed query actually scanned (resolved from the logical plan's
  *     relation leaves — no user-code bookkeeping).
  */
object Lineage {

  private def sessionKey(s: SparkSession): String =
    System.identityHashCode(s).toString

  // reference IdUtils.validateId: alphanumeric, _, - (no spaces/dots)
  private val IdPattern = "^[A-Za-z0-9_-]+$".r

  def isValidReferenceName(name: String): Boolean =
    IdPattern.matches(name)

  /** datasets registered per session (sessionUUID → name → source path) */
  private val registry =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, String]]()
  /** lineage events: (referenceName, action, rowsScannedOrWritten) */
  private val events =
    new ConcurrentHashMap[String, java.util.List[(String, String)]]()

  /** Register a DataFrame as a named external dataset: catalog temp view +
    * registry entry. Mirrors createDataset + registerLineage. */
  def register(df: DataFrame, referenceName: String): Unit = {
    require(isValidReferenceName(referenceName),
      s"invalid referenceName '$referenceName' (letters, digits, _, -)")
    df.createOrReplaceTempView(referenceName)
    registry
      .computeIfAbsent(sessionKey(df.sparkSession), _ => new ConcurrentHashMap())
      .put(referenceName, df.queryExecution.analyzed.collectLeaves()
        .map(_.nodeName).mkString(","))
  }

  def registered(spark: SparkSession): Map[String, String] =
    Option(registry.get(sessionKey(spark)))
      .map(_.asScala.toMap).getOrElse(Map.empty)

  // sessions that already carry the lineage listener — re-installing
  // would double-log every event into the same shared list
  private val installed = ConcurrentHashMap.newKeySet[String]()

  /** Install the lineage listener (idempotent per session); returns the
    * sink list the caller can inspect. Each completed action records
    * which registered datasets the query read — matched by EXACT
    * SubqueryAlias identifier, not substring (a view named `parts` must
    * not produce lineage for `part`). */
  def installListener(spark: SparkSession): java.util.List[(String, String)] = {
    val log = events.computeIfAbsent(sessionKey(spark),
      _ => java.util.Collections.synchronizedList(new java.util.ArrayList()))
    if (!installed.add(sessionKey(spark))) return log
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val names = Option(registry.get(sessionKey(qe.sparkSession)))
          .map(_.keySet().asScala.toSet).getOrElse(Set.empty)
        val referenced = qe.analyzed.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias
              if names.contains(a.alias) => a.alias
        }.toSet
        referenced.foreach(n => log.add(n -> funcName))
      }
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    })
    log
  }
}
