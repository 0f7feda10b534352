package graft.streaming

/**
 * The optimistic shard-DDL lock's COORDINATION algebra (SURVEY §2 G3
 * depth): how DM decides, per upstream DDL, whether the schema change
 * executes downstream now, waits for the other shards, or is a real
 * conflict. Reference: dm/pkg/shardddl/optimism/lock.go —
 * trySyncForOneDDL (:829-929): the idempotent-replay detection, the
 * normal-DDL leg with its three-way schema-changed disjunction
 * (joined changed / CREATE-TABLE-like post==old-joined / prev≤post),
 * the conflict leg (revert the table, record the conflict image, error
 * out only when the CONFLICT DDLs disagree among themselves, resolve
 * when every shard has announced), the smaller/larger lattice proofs
 * (allTableSmaller :976-1015 — the old column name is gone from the
 * join; allTableLarger :1017-1054 — the new column name is present in
 * every judged table), noConflictWithOneNormalTable (:1084-1116),
 * noConflictForConflictTables/FinalTables (:1119-1146), and the
 * resolve/redirect bookkeeping (:1176-1206: every OTHER conflict table
 * gets a ConflictResolved redirect op; the caller's own DDL returns).
 *
 * The lattice here is the repo's shard-schema lattice
 * ([[graft.core.SchemaRegistry.joinSchemas]]' semantics over
 * (column, type) sets): join = field union failing on a type clash,
 * compare = subset order. Documented delta: schemacmp also orders some
 * type WIDENINGS (int ≤ bigint); this lattice treats any type change
 * as incomparable, which routes widening through the same conflict
 * path as MODIFY COLUMN — the coordination decisions (wait vs execute
 * vs error) come out the same, shard-by-shard.
 */
object OptimisticLock {

  /** A table image: ordered (column, type) pairs. */
  type Tbl = Seq[(String, String)]

  /** ConflictStage (dm/pkg/shardddl/optimism/operation.go). */
  object Stage {
    val None = "none"
    val Detected = "detected"
    val SkipWaitRedirect = "skip_wait_redirect"
  }

  /** Lattice join: field union, Left on a type clash; field order =
    * first-seen (the repo's joinSchemas order). */
  def join(a: Tbl, b: Tbl): Either[String, Tbl] = {
    val am = a.toMap
    for ((c, t) <- b; at <- am.get(c); if at != t)
      return Left(s"type clash on $c: $at vs $t")
    Right(a ++ b.filterNot(f => am.contains(f._1)))
  }

  /** Lattice compare: 0 equal, -1 when a ⊂ b, +1 when a ⊃ b, Left when
    * incomparable (type clash or crossing field sets). */
  def compare(a: Tbl, b: Tbl): Either[String, Int] = {
    val am = a.toMap; val bm = b.toMap
    for ((c, t) <- a; bt <- bm.get(c); if bt != t)
      return Left(s"type clash on $c")
    val aInB = a.forall(f => bm.contains(f._1))
    val bInA = b.forall(f => am.contains(f._1))
    (aInB, bInA) match {
      case (true, true) => Right(0)
      case (true, false) => Right(-1)
      case (false, true) => Right(1)
      case _ => Left("crossing field sets")
    }
  }

  /** One trySync outcome: whether the DDL executes downstream, the
    * conflict stage, and the (source, schema, table) keys that received
    * a ConflictResolved redirect. */
  final case class Outcome(schemaChanged: Boolean, stage: String,
                           redirected: Seq[(String, String, String)])

  /** DropColumnStage (lock.go:40-50): the life of a partially dropped
    * column — NotDone until the shard's op lands, PartiallyDone when a
    * shard confirmed without the downstream drop, Done once the drop
    * executed downstream. */
  object DropStage {
    val NotDone = 0; val PartiallyDone = 1; val Done = 2
  }

  val ErrAddNotFullyDropped = "ErrShardDDLOptimismAddNotFullyDroppedColumn"

  final class Lock(val id: String) {
    type Key = (String, String, String)
    private val tables = scala.collection.mutable.SortedMap.empty[Key, Tbl]
    private val conflictTables =
      scala.collection.mutable.SortedMap.empty[Key, Tbl]
    private val finalTables =
      scala.collection.mutable.SortedMap.empty[Key, Tbl]
    // col -> (source, schema, table) -> DropStage (lock.go l.columns)
    private val columns = scala.collection.mutable.SortedMap
      .empty[String, scala.collection.mutable.SortedMap[Key, Int]]

    def addTable(key: Key, tbl: Tbl): Unit =
      if (!tables.contains(key)) {
        tables(key) = tbl; finalTables(key) = tbl
      }
    def table(key: Key): Option[Tbl] = tables.get(key)
    def conflicts: Seq[Key] = conflictTables.keys.toSeq

    private def joinAll(m: scala.collection.Map[Key, Tbl])
        : Either[String, Tbl] = {
      var joined: Option[Tbl] = None
      m.values.foreach { t =>
        joined match {
          case None => joined = Some(t)
          case Some(j) => join(j, t) match {
            case Left(e) => return Left(e)
            case Right(nj) => joined = Some(nj)
          }
        }
      }
      Right(joined.getOrElse(Seq.empty))
    }

    /** allTableSmaller (:976-1015): over the chosen join, every conflict
      * table's PREV image must be incomparable — the renamed-away
      * column is gone from the join. */
    private def allSmaller(useConflictJoin: Boolean): Boolean = {
      val joined = joinAll(
        if (useConflictJoin) conflictTables else finalTables) match {
        case Left(_) => return false
        case Right(j) => j
      }
      conflictTables.keys.forall(k => compare(joined, tables(k)).isLeft)
    }

    /** allTableLarger (:1017-1054): every judged table, joined with each
      * conflict table's PREV, must reach at least the conflict image —
      * the new column is present everywhere. */
    private def allLarger(useConflictJudge: Boolean): Boolean = {
      val judge = if (useConflictJudge) conflictTables else finalTables
      conflictTables.forall { case (k, conflictTi) =>
        val prev = tables(k)
        judge.values.forall { finalTi =>
          val joined = join(prev, finalTi).getOrElse(finalTi) // modify col
          compare(joined, conflictTi).exists(_ >= 0)
        }
      }
    }

    private def noConflictForConflictTables: Boolean =
      joinAll(conflictTables).isRight && allSmaller(useConflictJoin = true) &&
        allLarger(useConflictJudge = true)

    private def noConflictForFinalTables: Boolean =
      joinAll(finalTables).isRight && allSmaller(useConflictJoin = false) &&
        allLarger(useConflictJudge = false)

    /** noConflictWithOneNormalTable (:1084-1116): some OTHER shard
      * already looks post-DDL — join cleanly, prev-incomparable
      * (smaller) and post-reaching (larger). */
    private def noConflictWithOneNormal(caller: Key, prev: Tbl,
                                        post: Tbl): Boolean =
      tables.exists { case (k, ti) =>
        k != caller && {
          join(post, ti) match {
            case Left(_) => false
            case Right(joined) =>
              compare(joined, prev).isLeft && {
                val j2 = join(prev, ti).getOrElse(ti)
                compare(j2, post).exists(_ >= 0)
              }
          }
        }
      }

    private def resolveTables(): Unit = {
      conflictTables.clear()
      finalTables.foreach { case (k, t) => tables(k) = t }
    }

    private def redirectOthers(caller: Key): Seq[Key] = {
      val out = conflictTables.keys.filter(_ != caller).toSeq
      out // the reference puts a ConflictResolved op per table (:1190)
    }

    // ---- partially-dropped-column tracking (:601-724, :778-827) ---------

    /** IsDroppedColumn (:601-615). */
    def isDroppedColumn(key: Key, col: String): Boolean =
      columns.get(col).exists(_.contains(key))

    /** AddDroppedColumns (:618-648): register NotDone for the cols this
      * shard has not dropped yet; returns the newly registered ones. */
    def addDroppedColumns(key: Key, cols: Seq[String]): Seq[String] = {
      val fresh = cols.filterNot(isDroppedColumn(key, _))
      fresh.foreach { c =>
        columns.getOrElseUpdate(c,
          scala.collection.mutable.SortedMap.empty[Key, Int])(key) =
          DropStage.NotDone
      }
      fresh
    }

    /** Current stage of a column on a shard (-1 = untracked). */
    def dropStage(key: Key, col: String): Int =
      columns.get(col).flatMap(_.get(key)).getOrElse(-1)

    /** DeleteColumnsByOp (:654-724): the shard's confirmed op marks each
      * of its cols PartiallyDone — or Done when the op's DDLs include
      * the downstream DROP COLUMN — and a column leaves the map only
      * once NO shard is NotDone and at least one is Done. Returns the
      * fully removed columns. */
    def deleteColumnsByOp(key: Key, opCols: Seq[String],
                          doneDropCols: Set[String]): Seq[String] = {
      val removed = scala.collection.mutable.ArrayBuffer.empty[String]
      opCols.foreach { col =>
        if (isDroppedColumn(key, col)) {
          columns(col)(key) =
            if (doneDropCols.contains(col)) DropStage.Done
            else DropStage.PartiallyDone
        }
        columns.get(col).foreach { m =>
          val allDone = m.values.forall(_ != DropStage.NotDone)
          val dropDone = m.values.exists(_ == DropStage.Done)
          if (allDone && dropDone) { columns.remove(col); removed += col }
        }
      }
      removed.toSeq
    }

    /**
     * checkAddDropColumn (:778-827) with the ADD/DROP column name passed
     * by the caller (the reference extracts it from the DDL text with
     * the TiDB parser — [[graft.core.DdlParser]] territory, not this
     * kernel's). Left = the add-not-fully-dropped error; Right(Some) =
     * the DROPPED column to start tracking; Right(None) = nothing to do.
     * The field-length re-check (AddDifferentFieldLenColumns) needs the
     * lattice to carry flen, which this one folds into the type string —
     * a flen change IS a type clash here, caught earlier as a conflict.
     */
    def checkAddDropColumn(key: Key, addCol: Option[String],
                           dropCol: Option[String], prev: Tbl, post: Tbl,
                           newDropColumns: Seq[String])
        : Either[String, Option[String]] = {
      val curr = tables(key)
      def joinedWith(t: Tbl): Either[String, Tbl] = {
        tables(key) = t
        val j = joinAll(tables)
        tables(key) = curr
        j
      }
      val oldJoined = joinedWith(prev) match {
        case Left(_) => return Right(None)
        case Right(j) => j
      }
      val newJoined = joinedWith(post) match {
        case Left(_) => return Right(None)
        case Right(j) => j
      }
      val cmp = compare(oldJoined, newJoined) match {
        case Left(_) => return Right(None)
        case Right(c) => c
      }
      if (cmp <= 0) {
        for (col <- addCol)
          if (isDroppedColumn(key, col) || newDropColumns.contains(col))
            return Left(ErrAddNotFullyDropped)
      }
      if (cmp >= 0 && dropCol.nonEmpty) Right(dropCol)
      else Right(None)
    }

    /**
     * trySyncForOneDDL (:829-929). `prev`/`post` are the shard's table
     * images before/after its DDL.
     */
    def trySyncOne(key: Key, prev: Tbl, post: Tbl): Outcome = {
      // one conflict DDL per table: fresh info resets its conflict image
      conflictTables.remove(key)
      finalTables(key) = tables(key)

      // idempotent replay: master already has the POST image (:836-846)
      var idempotent = false
      if (!compare(prev, tables(key)).toOption.contains(0)) {
        if (compare(post, tables(key)).toOption.contains(0))
          idempotent = true
        tables(key) = prev
        finalTables(key) = prev
      }

      val tableCmp = compare(prev, post)

      if (tableCmp.isRight) {
        // normal DDL (:849-888)
        val oldJoined = joinAll(tables)
        tables(key) = post
        finalTables(key) = post
        val newJoined = joinAll(tables)
        if (newJoined.isRight) {
          if (conflictTables.nonEmpty && noConflictForFinalTables) {
            val redirected = redirectOthers(key)
            resolveTables()
            return Outcome(schemaChanged = true, Stage.None, redirected)
          }
          oldJoined match {
            case Left(_) =>
              return Outcome(schemaChanged = true, Stage.None, Seq.empty)
            case Right(oj) =>
              val joinedCmp = newJoined.flatMap(nj => compare(oj, nj))
              val changed =
                joinedCmp.map(_ != 0).getOrElse(true) || // joined moved
                  compare(post, oj).toOption.contains(0) || // CREATE-like
                  tableCmp.exists(_ <= 0) // prev ≤ post
              return Outcome(changed, Stage.None, Seq.empty)
          }
        }
        // the new join errors: fall through to the conflict leg with the
        // table reverted below (the Go falls out of the if block)
        tables(key) = prev
        finalTables(key) = prev
      }

      // conflict DDL (:893-928)
      if (idempotent || noConflictWithOneNormal(key, prev, post)) {
        tables(key) = post
        finalTables(key) = post
        return Outcome(schemaChanged = true, Stage.None, Seq.empty)
      }
      tables(key) = prev
      conflictTables(key) = post
      finalTables(key) = post
      if (!noConflictForConflictTables)
        return Outcome(schemaChanged = false, Stage.Detected, Seq.empty)
      if (noConflictForFinalTables) {
        val redirected = redirectOthers(key)
        resolveTables()
        return Outcome(schemaChanged = true, Stage.None, redirected)
      }
      Outcome(schemaChanged = false, Stage.SkipWaitRedirect, Seq.empty)
    }
  }
}
