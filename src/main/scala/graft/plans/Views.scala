package graft.plans

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.sources.MetaIO
import graft.sources.v2.VersionedCatalog

/** SQL VIEWS over versioned-catalog tables — the Iceberg-view-spec shape
  * (a named, versioned SQL definition stored in the catalog, resolved at
  * read) built the way this engine builds all its SQL surface: OSS Spark
  * ships the `ViewCatalog` API but no analyzer/exec wiring for it
  * (Iceberg supplies its own via extension rules), so graft intercepts
  * at the SAME parse seam MERGE INTO uses ([[GraftSqlParser.lower]]):
  *
  *  - `CREATE [OR REPLACE] VIEW cat.ns.v [(col,…)] AS <query>` persists
  *    the definition TEXT under `<warehouse>/<ns>/_views/<v>` — one
  *    atomic file write, validated by analyzing the expanded definition
  *    at create time so a broken view fails its CREATE, not its reads.
  *  - Any read of `cat.ns.v` expands in place to the parsed definition
  *    (`SubqueryAlias` over the stored SQL, column aliases applied via
  *    `UnresolvedSubqueryColumnAliases` — the lazy-substitution
  *    semantics SQL views require: each read re-resolves against the
  *    CURRENT table state and schema). Views nest; expansion depth is
  *    capped at 10 so definition cycles fail loudly instead of
  *    overflowing the parser stack.
  *  - `DROP VIEW [IF EXISTS] cat.ns.v` deletes the definition file.
  *
  * Name resolution accepts the fully-qualified `cat.ns….v` form and
  * names relative to a current versioned catalog. A view never shadows
  * a table: CREATE refuses a name whose table root exists, and table
  * resolution is untouched (the expansion only fires when the
  * `_views/<name>` definition file exists — one metadata stat per
  * unresolved relation per parse, the same cost class as the catalog's
  * own table lookup). Scope notes: `spark.table()` reads resolve views
  * too via [[ViewResolutionRule]] (an injected analyzer rule applying
  * the same expansion); `readStream` does not (a streaming relation
  * over a view has no incremental semantics to offer); views are not
  * INSERT/DML targets (expansion yields a subquery, which analysis
  * rejects as a write target — the standard behavior). */
object Views {

  private val MaxDepth = 10
  private val depth = new scala.util.DynamicVariable[Int](0)

  private def enc(s: String): String = URLEncoder.encode(s, StandardCharsets.UTF_8)
  private def dec(s: String): String = URLDecoder.decode(s, StandardCharsets.UTF_8)

  /** (warehouse, namespace path, view name) when `parts` addresses a
    * registered versioned catalog — explicitly or relative to the
    * session's current catalog. */
  private def target(spark: SparkSession, parts: Seq[String])
      : Option[(String, Seq[String], String)] = {
    if (parts.isEmpty) None
    else VersionedCatalog.warehouseOf(parts.head) match {
      case Some(wh) if parts.length >= 3 =>
        Some((wh, parts.drop(1).dropRight(1), parts.last))
      case _ =>
        val cm = spark.sessionState.catalogManager
        VersionedCatalog.warehouseOf(cm.currentCatalog.name()).map { wh =>
          val ns =
            if (parts.length >= 2) parts.dropRight(1) else cm.currentNamespace.toSeq
          (wh, ns, parts.last)
        }
    }
  }

  private def path(wh: String, ns: Seq[String], name: String): String =
    (Seq(wh) ++ ns ++ Seq("_views", name)).mkString("/")

  /** True iff a stored view definition exists under this warehouse —
    * shared with the catalog's table-shadow guard so the storage layout
    * has exactly one owner. */
  def definitionFileExists(wh: String, ns: Seq[String], name: String): Boolean =
    MetaIO.exists(path(wh, ns, name))

  /** The stored definition (sql, column aliases) of `parts`, when it
    * names a view of a registered versioned catalog. */
  private def definitionOf(spark: SparkSession, parts: Seq[String])
      : Option[(String, Seq[String], String)] =
    target(spark, parts).flatMap { case (wh, ns, n) =>
      val p = path(wh, ns, n)
      if (!MetaIO.exists(p)) None
      else {
        val kv = MetaIO.readString(p).linesIterator
          .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
        Some((dec(kv.getOrElse("sql",
            throw new IllegalStateException(s"view file $p has no sql"))),
          kv.get("cols").toSeq.flatMap(_.split(',').filter(_.nonEmpty).map(dec)),
          n))
      }
    }

  /** True iff this CREATE/DROP VIEW statement addresses a versioned
    * catalog (other targets pass through to Spark's own handling). */
  private[plans] def handles(spark: SparkSession, child: LogicalPlan): Boolean =
    nameOf(child).exists(target(spark, _).isDefined)

  /** True iff `child` names an EXISTING view definition of a versioned
    * catalog (ALTER VIEW / SHOW CREATE TABLE interception — anything
    * else, including catalog TABLES, keeps Spark's own handling). */
  private[plans] def handlesExisting(spark: SparkSession, child: LogicalPlan): Boolean =
    nameOf(child).exists(definitionOf(spark, _).isDefined)

  /** Name parts of the unresolved identifier/view/table-or-view nodes the
    * view statements carry. */
  private[plans] def nameOf(child: LogicalPlan): Option[Seq[String]] =
    child match {
      case id: UnresolvedIdentifier => Some(id.nameParts)
      case v: org.apache.spark.sql.catalyst.analysis.UnresolvedView =>
        Some(v.multipartIdentifier)
      case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
        Some(t.multipartIdentifier)
      case _ => None
    }

  /** Expand view references in a freshly parsed plan. Applied inside
    * [[GraftSqlParser.lower]]; nested views re-enter through the parser,
    * the thread-scoped depth making definition cycles fail loudly. */
  private[plans] def expand(plan: LogicalPlan): LogicalPlan =
    SparkSession.getActiveSession match {
      case None => plan
      case Some(spark) => plan.transformUp {
        case u: UnresolvedRelation if !u.isStreaming =>
          definitionOf(spark, u.multipartIdentifier) match {
            case None => u
            case Some((sql, cols, name)) =>
              require(depth.value < MaxDepth,
                s"view ${u.multipartIdentifier.mkString(".")}: expansion " +
                  s"exceeded depth $MaxDepth — view definitions form a cycle " +
                  "or nest absurdly deep")
              val inner = depth.withValue(depth.value + 1) {
                GraftSqlParser.lower(spark.sessionState.sqlParser.parsePlan(sql))
              }
              SubqueryAlias(name,
                if (cols.isEmpty) inner
                else UnresolvedSubqueryColumnAliases(cols, inner))
          }
      }
    }

  def create(spark: SparkSession, parts: Seq[String], sqlText: String,
             cols: Seq[String], replace: Boolean, allowExisting: Boolean): Unit = {
    val (wh, ns, n) = target(spark, parts).getOrElse(
      throw new IllegalArgumentException(
        s"CREATE VIEW ${parts.mkString(".")}: not a versioned-catalog name"))
    require(VersionedCatalog.readMeta((Seq(wh) ++ ns :+ n).mkString("/")).isEmpty,
      s"cannot CREATE VIEW ${parts.mkString(".")}: a table of that name exists")
    val p = path(wh, ns, n)
    if (MetaIO.exists(p) && !replace) {
      if (allowExisting) return
      throw new IllegalArgumentException(
        s"view ${parts.mkString(".")} already exists (use OR REPLACE)")
    }
    // validate NOW: parse, expand, and fully analyze the definition so a
    // broken view fails its CREATE, not its first read
    val analyzed = org.apache.spark.sql.GraftColumnBridge.ofRows(spark,
      GraftSqlParser.lower(spark.sessionState.sqlParser.parsePlan(sqlText)))
    require(cols.isEmpty || cols.length == analyzed.schema.length,
      s"view ${parts.mkString(".")}: ${cols.length} column aliases for a " +
        s"${analyzed.schema.length}-column query")
    MetaIO.writeAtomic(p, (Seq("sql=" + enc(sqlText)) ++
      (if (cols.nonEmpty) Seq("cols=" + cols.map(enc).mkString(",")) else Nil))
      .mkString("\n"))
  }

  /** `ALTER VIEW … AS <query>`: replace an EXISTING view's definition,
    * re-validating exactly like CREATE (a broken replacement fails the
    * ALTER, not the next read). The new query defines the columns —
    * stored aliases from the original CREATE drop, Spark's own ALTER
    * VIEW AS semantics. */
  def alterAs(spark: SparkSession, parts: Seq[String], sqlText: String): Unit = {
    val (wh, ns, n) = target(spark, parts).getOrElse(
      throw new IllegalArgumentException(
        s"ALTER VIEW ${parts.mkString(".")}: not a versioned-catalog name"))
    val p = path(wh, ns, n)
    require(MetaIO.exists(p),
      s"view ${parts.mkString(".")} does not exist" +
        (if (VersionedCatalog.readMeta((Seq(wh) ++ ns :+ n).mkString("/")).nonEmpty)
          " (a TABLE of that name does — ALTER VIEW alters only views)" else ""))
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark,
      GraftSqlParser.lower(spark.sessionState.sqlParser.parsePlan(sqlText)))
    MetaIO.writeAtomic(p, "sql=" + enc(sqlText))
  }

  /** `SHOW CREATE TABLE` on a view: reconstruct the CREATE statement
    * from the stored definition (the Iceberg-view `SHOW CREATE` shape). */
  def showCreate(spark: SparkSession, parts: Seq[String]): String = {
    val (sql, cols, _) = definitionOf(spark, parts).getOrElse(
      throw new IllegalArgumentException(
        s"${parts.mkString(".")} is not a view of a versioned catalog"))
    val colList = if (cols.isEmpty) "" else cols.mkString(" (", ", ", ")")
    s"CREATE VIEW ${parts.mkString(".")}$colList AS\n$sql"
  }

  /** True iff `nsParts` addresses a namespace of a registered versioned
    * catalog (for SHOW VIEWS interception). */
  private[plans] def handlesNamespace(spark: SparkSession,
                                      nsParts: Seq[String]): Boolean =
    nsTarget(spark, nsParts).isDefined

  private def nsTarget(spark: SparkSession, nsParts: Seq[String])
      : Option[(String, Seq[String])] =
    nsParts.headOption.flatMap(VersionedCatalog.warehouseOf) match {
      case Some(wh) => Some((wh, nsParts.drop(1)))
      case None =>
        val cm = spark.sessionState.catalogManager
        VersionedCatalog.warehouseOf(cm.currentCatalog.name())
          .map(wh => (wh, if (nsParts.nonEmpty) nsParts else cm.currentNamespace.toSeq))
    }

  /** Names of the views under a namespace, SQL-pattern filtered
    * (`*` wildcard, `|` alternation — SHOW VIEWS semantics). */
  def list(spark: SparkSession, nsParts: Seq[String],
           pattern: Option[String]): Seq[(String, String)] = {
    val (wh, ns) = nsTarget(spark, nsParts).getOrElse(
      throw new IllegalArgumentException(
        s"SHOW VIEWS: ${nsParts.mkString(".")} is not a versioned-catalog namespace"))
    val dir = (Seq(wh) ++ ns :+ "_views").mkString("/")
    val names =
      if (!MetaIO.exists(dir)) Nil
      else MetaIO.listStatus(dir).map(_.getPath.getName).sorted.toSeq
    val kept = pattern.fold(names) { p =>
      // only `*` is a wildcard — quote every other character so regex
      // metacharacters in a pattern ('.', '+', '(' …) match literally
      // instead of rewriting the match or throwing PatternSyntaxException
      // (Spark's StringUtils.filterPattern discipline)
      val res = p.trim.split("\\|").map { x =>
        ("(?i)" + x.split("\\*", -1).map(seg =>
          if (seg.isEmpty) "" else java.util.regex.Pattern.quote(seg))
          .mkString(".*")).r
      }
      names.filter(n => res.exists(_.pattern.matcher(n).matches()))
    }
    kept.map(n => (ns.mkString("."), n))
  }

  def drop(spark: SparkSession, parts: Seq[String], ifExists: Boolean): Unit = {
    val (wh, ns, n) = target(spark, parts).getOrElse(
      throw new IllegalArgumentException(
        s"DROP VIEW ${parts.mkString(".")}: not a versioned-catalog name"))
    val p = path(wh, ns, n)
    if (MetaIO.exists(p)) MetaIO.delete(p)
    else if (!ifExists) throw new IllegalArgumentException(
      s"view ${parts.mkString(".")} does not exist")
  }
}

/** Analyzer rule ([[graft.GraftExtensions]]): view expansion for reads
  * that never pass through the SQL parser (`spark.table("cat.ns.v")`).
  * Batch only — a streaming relation over a view has no incremental
  * semantics to offer, so it stays unresolved and fails analysis with
  * Spark's own table-not-found error. */
object ViewResolutionRule
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = Views.expand(plan)
}

case class GraftCreateViewCommand(cv: CreateView) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val parts = cv.child.asInstanceOf[UnresolvedIdentifier].nameParts
    val sql = cv.originalText.getOrElse(throw new IllegalArgumentException(
      s"CREATE VIEW ${parts.mkString(".")}: no query text"))
    Views.create(spark, parts, sql, cv.userSpecifiedColumns.map(_._1),
      cv.replace, cv.allowExisting)
    Nil
  }
}

case class GraftDropViewCommand(dv: DropView) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    Views.drop(spark, dv.child.asInstanceOf[UnresolvedIdentifier].nameParts,
      dv.ifExists)
    Nil
  }
}

case class GraftAlterViewAsCommand(
    av: org.apache.spark.sql.catalyst.plans.logical.AlterViewAs)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    Views.alterAs(spark, Views.nameOf(av.child).get, av.originalText)
    Nil
  }
}

case class GraftShowCreateViewCommand(
    sc: org.apache.spark.sql.catalyst.plans.logical.ShowCreateTable)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = sc.output
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(Views.showCreate(spark, Views.nameOf(sc.child).get)))
}

case class GraftShowViewsCommand(sv: org.apache.spark.sql.catalyst.plans.logical.ShowViews)
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = sv.output
  override def run(spark: SparkSession): Seq[Row] = {
    val ns = sv.namespace
      .asInstanceOf[org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace]
      .multipartIdentifier
    Views.list(spark, ns, sv.pattern).map { case (n, v) => Row(n, v, false) }
  }
}
