package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
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

  // ------------------------------------------------------- column lineage

  /** COLUMN-level provenance (SURVEY.md §2.1 S5, the metadata half a
    * pipeline platform needs beyond dataset-level lineage): for each
    * output column of `df`, the set of (sourceDataset, sourceColumn)
    * pairs it derives from — computed by walking the RESOLVED logical
    * plan's expression references, so it needs no user bookkeeping and
    * survives renames, aggregates, windows and multiway joins. Driver-side
    * plan analysis only: nothing here touches data or executors. */
  def columnLineage(df: DataFrame): Map[String, Set[(String, String)]] =
    columnLineageOfPlan(df.queryExecution.analyzed)

  /** [[columnLineage]] over an already-analyzed plan — the entry the
    * STREAMING capture path uses (a micro-batch's analyzed plan arrives
    * via [[QueryExecutionListener]], not wrapped in a DataFrame). Write
    * commands (batch `df.write`, streaming `WriteToMicroBatchDataSource`)
    * output no attributes; provenance is reported for the written QUERY,
    * so the descent below unwraps to the first output-bearing node. */
  def columnLineageOfPlan(plan: LogicalPlan): Map[String, Set[(String, String)]] = {
    def reportable(p: LogicalPlan): LogicalPlan =
      if (p.output.nonEmpty || p.children.isEmpty) p
      else reportable(p.children.find(_.output.nonEmpty).getOrElse(p.children.head))
    val target = reportable(plan)
    val m = walk(target)
    target.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty)).toMap
  }

  /** Column lineage for STREAMING drains (SURVEY.md §2.1 S5, the
    * streaming half): every completed micro-batch notifies the session's
    * [[QueryExecutionListener]] bus with its analyzed plan; this capture
    * walks that plan with the same machinery as the batch path, so a CDC
    * drain reports per-output-column provenance to the source table's
    * columns (`graft-doc:<path>` leaves keep their table identity in the
    * micro-batch plan — DSv2 streaming relations survive into
    * IncrementalExecution). Listener delivery is ASYNC (Spark's listener
    * bus): call [[ColumnLineageCapture.await]] after
    * `processAllAvailable` rather than reading `results` immediately. */
  final class ColumnLineageCapture extends QueryExecutionListener {
    private val captured = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Map[String, Set[(String, String)]]]())
    def results: Seq[Map[String, Set[(String, String)]]] = captured.asScala.toList
    /** Poll until at least `n` lineage maps arrived (listener bus is
      * async); returns them or what arrived inside the timeout. */
    def await(n: Int, timeoutMs: Long = 20000L): Seq[Map[String, Set[(String, String)]]] = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (captured.size() < n && System.nanoTime() < deadline)
        Thread.sleep(50)
      results
    }
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = {
      val m = columnLineageOfPlan(qe.analyzed)
      if (m.nonEmpty) captured.add(m)
    }
    override def onFailure(funcName: String, qe: QueryExecution,
        ex: Exception): Unit = ()
  }

  /** Register a [[ColumnLineageCapture]] on the session and return it.
    * NOT idempotent by design — each caller owns its capture; unregister
    * with `spark.listenerManager.unregister` when done. */
  def captureColumnLineage(spark: SparkSession): ColumnLineageCapture = {
    val c = new ColumnLineageCapture
    spark.listenerManager.register(c)
    c
  }

  /** Human name for a relation leaf: table name for DSv2, file/dir
    * basename (extension stripped) for file relations. */
  private def leafName(p: LogicalPlan): String = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        val base = fs.location.rootPaths.headOption
          .map(_.getName).getOrElse("file")
        base.replaceAll("\\.[A-Za-z0-9]+$", "")
      case r => r.toString
    }
    case d: DataSourceV2Relation => d.table.name()
    // streaming leaves: pre-start plans carry StreamingRelationV2; the
    // per-micro-batch analyzed plan (IncrementalExecution) carries the
    // DSv2 scan relation — both still know their table
    case s: org.apache.spark.sql.execution.datasources.v2.StreamingDataSourceV2ScanRelation =>
      s.relation.table.name()
    case s: org.apache.spark.sql.execution.datasources.v2.StreamingDataSourceV2Relation =>
      s.table.name()
    case s: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2 =>
      s.table.name()
    case _: LocalRelation => "local"
    case other => other.nodeName
  }

  /** exprId → source columns, bottom-up over the resolved plan. Nodes
    * that only re-arrange rows (Filter/Sort/Join/Limit/...) pass their
    * children's map through; nodes that DEFINE attributes (Project/
    * Aggregate/Window/Generate) map each new attribute to the union of
    * its expression's references' lineage. Unknown nodes fall back to
    * that same conservative rule for any attribute their children didn't
    * define. */
  private def walk(plan: LogicalPlan): Map[ExprId, Set[(String, String)]] = {
    def refsOf(e: Expression, cm: Map[ExprId, Set[(String, String)]]) =
      e.references.toSeq.flatMap(r => cm.getOrElse(r.exprId, Set.empty)).toSet
    def define(named: Seq[NamedExpression],
        cm: Map[ExprId, Set[(String, String)]]) =
      cm ++ named.map(ne => ne.toAttribute.exprId -> refsOf(ne, cm))
    plan match {
      case l: LeafNode =>
        val n = leafName(l)
        l.output.map(a => a.exprId -> Set(n -> a.name)).toMap
      case SubqueryAlias(id, child) =>
        val cm = walk(child)
        // a registered view / .as(...) DIRECTLY over a leaf (temp views
        // wrap it in a View node) rebrands the source name; an alias over
        // a computed subtree keeps the real per-leaf provenance
        // (rebranding it would hide multi-source views behind one name)
        def leafish(p: LogicalPlan): Boolean = p match {
          case _: LeafNode => true
          case v: View => leafish(v.child)
          case _ => false
        }
        if (leafish(child))
          cm.map { case (k, v) => k -> v.map { case (_, c) => id.name -> c } }
        else cm
      case v: View => walk(v.child)
      case p: Project => define(p.projectList, walk(p.child))
      case a: Aggregate => define(a.aggregateExpressions, walk(a.child))
      // define() already carries the child map through, so windowed
      // plans stay one walk per node (a second walk here would double
      // per Window level — exponential on deeply-windowed plans)
      case w: Window => define(w.windowExpressions, walk(w.child))
      case g: Generate =>
        val cm = walk(g.child)
        cm ++ g.generatorOutput.map(a => a.exprId -> refsOf(g.generator, cm))
      case u: Union =>
        val cms = u.children.map(walk)
        val merged = cms.foldLeft(Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
        merged ++ u.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> u.children.zip(cms).flatMap { case (c, m) =>
            m.getOrElse(c.output(i).exprId, Set.empty)
          }.toSet
        }
      case other =>
        val cm = other.children.map(walk)
          .foldLeft(Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
        // attributes minted by nodes with no dedicated case (Expand's
        // grouping id, object operators, ...): conservatively derive from
        // everything the node references
        lazy val nodeRefs = other.expressions.flatMap(e => refsOf(e, cm)).toSet
        cm ++ other.output.filterNot(a => cm.contains(a.exprId))
          .map(a => a.exprId -> nodeRefs)
    }
  }
}
