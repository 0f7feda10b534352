package graft.streaming

import scala.collection.mutable

import graft.core.DdlParser

/**
 * `dmctl binlog-schema` — the OperateSchema surface
 * (dm/syncer/schema.go:43-234 + the worker guard
 * dm/worker/subtask.go:700-710):
 *
 *  - the worker REFUSES every op except list-migrate-targets while the
 *    continuous validator is Running (ErrWorkerValidatorNotPaused — the
 *    [[ValidatorLifecycle]] stage is the gate);
 *  - GetSchema reads the checkpoint's table info; a miss falls back to
 *    the DOWNSTREAM create statement with the target table name swapped
 *    back to the source name (first occurrence, backquoted), both legs
 *    rendered one-row (conn.CreateTableSQLToOneRow — newline strip plus
 *    a SINGLE double-space pass, dm/pkg/conn/db.go:447-452);
 *  - SetSchema resolves the text (--from-source / --from-target fetch,
 *    target taken AFTER source when both), requires a parseable CREATE
 *    TABLE, FORCES the request's schema/table names onto it, clears IF
 *    NOT EXISTS, re-renders, flushes it into the checkpoint (--flush is
 *    overwritten to true), and under --sync puts an ignore-conflict
 *    optimistic info — ONLY in optimistic shard mode (the flag is
 *    silently ignored otherwise, schema.go:155-170);
 *  - RemoveSchema is a documented no-op (the checkpoint image simply
 *    takes over, :172-175);
 *  - the list ops render Go-JSON: schema list, per-schema table list,
 *    and list-migrate-targets' regex-filtered (source → routed target)
 *    pairs (:178-233, openapi.TaskMigrateTarget's snake_case tags).
 */
object SchemaOps {

  // pb.SchemaOp (dm/pb/dmworker.pb.go:223-229)
  val InvalidSchemaOp = 0
  val GetSchema = 1
  val SetSchema = 2
  val RemoveSchema = 3
  val ListSchema = 4
  val ListTable = 5
  val ListMigrateTargets = 6

  /** conn.CreateTableSQLToOneRow: newline strip + ONE non-overlapping
    * double-space replacement pass (NOT a full collapse). */
  def createTableSqlToOneRow(sql: String): String =
    sql.replace("\n", "").replace("  ", " ")

  /** Go json.Marshal string escaping for the identifier charset that can
    * reach these fields (quotes and backslashes). */
  private def jsonEsc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def jsonStrings(xs: Seq[String]): String =
    xs.map(s => "\"" + jsonEsc(s) + "\"").mkString("[", ",", "]")

  final case class Request(op: Int, database: String, table: String,
      schema: String = "", fromSource: Boolean = false,
      fromTarget: Boolean = false, flush: Boolean = false,
      sync: Boolean = false)
}

/**
 * One sync unit's schema-operation state: the tracker universe (schema →
 * tables), the checkpoint's table-info images (as CREATE TABLE text),
 * the router, and the shard mode. Upstream/downstream fetches are
 * explicit lookups so every leg is deterministic.
 */
final class SchemaOps(
    trackerSchemas: Seq[String],
    trackerTables: Map[String, Seq[String]],
    route: (String, String) => (String, String),
    shardMode: String,
    sourceSql: ((String, String)) => Option[String] = _ => None,
    targetSql: ((String, String)) => Option[String] = _ => None) {
  import SchemaOps._

  /** checkpoint table-info images, keyed (schema, table). */
  val checkpoint = mutable.LinkedHashMap.empty[(String, String), String]
  /** optimistic infos put by --sync (observable). */
  val syncedInfos = mutable.ArrayBuffer.empty[(String, String, String, String)]

  /**
   * SubTask.OperateSchema's guard + Syncer.OperateSchema's dispatch.
   * Returns Left(error identifier) or Right(message).
   */
  def operate(req: Request, validatorStage: Int): Either[String, String] = {
    if (validatorStage == ValidatorLifecycle.Running &&
      req.op != ListMigrateTargets)
      return Left("ErrWorkerValidatorNotPaused")
    req.op match {
      case ListSchema => Right(jsonStrings(trackerSchemas))
      case ListTable =>
        trackerTables.get(req.database)
          .toRight("ErrSchemaTrackerUnSchemaNotExist")
          .map(jsonStrings)
      case ListMigrateTargets => listMigrateTargets(req)
      case GetSchema => getSchema(req)
      case SetSchema => setSchema(req)
      case RemoveSchema => Right("") // checkpoint image takes over
      case _ => Right("")
    }
  }

  private def getSchema(req: Request): Either[String, String] =
    checkpoint.get((req.database, req.table)) match {
      case Some(sql) => Right(createTableSqlToOneRow(sql))
      case None =>
        val (ts, tt) = route(req.database, req.table)
        targetSql((ts, tt))
          .toRight("ErrDBExecuteFailed")
          .map { sql =>
            // swap the downstream name back to the source's (schema.go:83)
            val swapped = sql.replaceFirst(
              java.util.regex.Pattern.quote(s"CREATE TABLE `$tt`"),
              java.util.regex.Matcher
                .quoteReplacement(s"CREATE TABLE `${req.table}`"))
            createTableSqlToOneRow(swapped)
          }
    }

  private def setSchema(req: Request): Either[String, String] = {
    var text = req.schema
    if (req.fromSource)
      sourceSql((req.database, req.table)) match {
        case Some(s) => text = s
        case None => return Left("ErrDBExecuteFailed")
      }
    if (req.fromTarget) { // AFTER fromSource: target wins when both
      val (ts, tt) = route(req.database, req.table)
      targetSql((ts, tt)) match {
        case Some(s) => text = s
        case None => return Left("ErrDBExecuteFailed")
      }
    }
    val stmts =
      try DdlParser.parse(text, req.database)
      catch { case _: DdlParser.ParseError =>
        return Left("ErrSchemaTrackerInvalidCreateTableStmt") }
    stmts match {
      case Seq(ct: DdlParser.CreateTable) =>
        // force the REQUEST's names onto the statement (schema.go:126-128)
        val forced = ct.copy(schema = req.database, table = req.table)
        val rendered = DdlParser.toSql(forced)
        checkpoint((req.database, req.table)) = rendered
        // --flush is overwritten to true (schema.go:141-143): the write
        // above IS the flush. --sync only under optimistic shard mode.
        if (req.sync && shardMode == "optimistic") {
          val (ts, tt) = route(req.database, req.table)
          syncedInfos += ((req.database, req.table, ts, tt))
        }
        Right("")
      case _ => Left("ErrSchemaTrackerInvalidCreateTableStmt")
    }
  }

  private def listMigrateTargets(req: Request): Either[String, String] = {
    // the schema-name REGEX rides the request's Schema field (schema.go
    // :181 regexp.Compile(req.Schema); openapi_view.go fills it) — the
    // Database field is unused for this op
    val schemas =
      if (req.schema.isEmpty) trackerSchemas
      else {
        val r = try req.schema.r
          catch { case _: Exception => return Left("ErrInvalidRegex") }
        trackerSchemas.filter(s => r.findFirstIn(s).isDefined)
      }
    val targets = mutable.ArrayBuffer.empty[String]
    for (schema <- schemas) {
      val tables = trackerTables.getOrElse(schema, Seq.empty)
      val selected =
        if (req.table.isEmpty) tables
        else {
          val r = try req.table.r
            catch { case _: Exception => return Left("ErrInvalidRegex") }
          tables.filter(t => r.findFirstIn(t).isDefined)
        }
      selected.foreach { t =>
        val (ts, tt) = route(schema, t)
        targets += ("{\"source_schema\":\"" + jsonEsc(schema) +
          "\",\"source_table\":\"" + jsonEsc(t) +
          "\",\"target_schema\":\"" + jsonEsc(ts) +
          "\",\"target_table\":\"" + jsonEsc(tt) + "\"}")
      }
    }
    // json.Marshal of the NIL targets slice renders "null", not "[]"
    // (schema.go:179 `var targets []openapi.TaskMigrateTarget`)
    if (targets.isEmpty) Right("null")
    else Right(targets.mkString("[", ",", "]"))
  }
}
