package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.streaming.SourceScheduler
import graft.streaming.SourceScheduler.{Kernel, SourceCfg}

/**
 * DM-master source↔worker scheduler gates ([[graft.streaming
 * .SourceScheduler]]; dm/master/scheduler/scheduler.go + worker.go): the
 * control plane that binds upstream sources to DM-worker instances. q293
 * replays a data-derived 86-event bind/transfer/offline script through the
 * kernel with the ORACLE replaying the full bind-priority algebra
 * (lastBound preference, history-worker preference, min-free fallback) in
 * a recursive CTE over the same parquet — a divergence in any branch of
 * either engine shows up as a value mismatch, not a shared constant. q294
 * drives the relay-scheduling and validation surface (start/stop-relay
 * quick + named paths, the TransferSource validation chain with the
 * pause/resume envelope, subtask gating); q295 the load-task transfer
 * probes. Error tokens are the reference's terror identifiers, parsed
 * from dm/pkg/terror/error_list.go in Round18Spec so they cannot drift.
 */
object SchedulerQueries {

  /**
   * q293 — the bind/transfer/offline script. Fleet: workers w0-w3
   * (Offline until an online event), source pool s0-s3 widening to s0-s5
   * after step 46 (two regimes: worker-surplus exercises transfer/freed/
   * rebind, source-surplus exercises unbound/orphaned). Events derive
   * from the first 80 orderkeys via a multiplicative hash so the op mix
   * is decorrelated from key order; both engines compute the same script
   * from the same parquet. Where scheduler.go picks an arbitrary Go-map
   * element ("randomly pick one" at :2303, :2398) both sides pick the
   * lexicographically smallest — a deterministic refinement inside the
   * reference's allowed nondeterminism. Per step: the result token
   * (bind destination / rebind victim / terror identifier) and the full
   * sorted bounds/free/unbound snapshot.
   */
  val sourceScheduler = GateQuery(
    "q293_source_scheduler",
    Some("""WITH RECURSIVE ks AS (
      |  SELECT (o_orderkey * 2654435761) % 1000003 AS k,
      |    row_number() OVER (ORDER BY o_orderkey) AS i
      |  FROM orders
      |  QUALIFY i <= 80
      |), ev AS (
      |  SELECT * FROM (VALUES
      |    (1, 'online', '', 'w0'), (2, 'online', '', 'w1'),
      |    (3, 'online', '', 'w2'),
      |    (4, 'add', 's0', ''), (5, 'add', 's1', ''), (6, 'add', 's2', '')
      |  ) p(step, op, s, w)
      |  UNION ALL
      |  SELECT CAST(i + 6 AS INT) AS step,
      |    ['online','online','offline','add','add',
      |     'remove','transfer','transfer'][(k % 8) + 1] AS op,
      |    's' || CAST((k // 8) % (CASE WHEN i <= 40 THEN 4 ELSE 6 END)
      |      AS VARCHAR) AS s,
      |    'w' || CAST((k // 32) % 4 AS VARCHAR) AS w
      |  FROM ks
      |), st AS (
      |  SELECT 0 AS step, '' AS op, '' AS s, '' AS w, '' AS res,
      |    CAST([] AS VARCHAR[]) AS bounds,
      |    ['w0','w1','w2','w3'] AS off,
      |    CAST([] AS VARCHAR[]) AS srcs,
      |    CAST([] AS VARCHAR[]) AS last
      |  UNION ALL
      |  SELECT step, op, s, w, res0 AS res, bounds1 AS bounds,
      |    off1 AS off, srcs1 AS srcs, last1 AS last FROM (
      |  SELECT ev.step AS step, ev.op AS op, ev.s AS s, ev.w AS w,
      |    coalesce(list_filter(st.bounds,
      |      b -> string_split(b,'->')[1] = ev.s)[1], '') AS bw0,
      |    CASE WHEN bw0 = '' THEN ''
      |      ELSE string_split(bw0,'->')[2] END AS s_worker,
      |    coalesce(list_filter(st.bounds,
      |      b -> string_split(b,'->')[2] = ev.w)[1], '') AS wb0,
      |    CASE WHEN wb0 = '' THEN ''
      |      ELSE string_split(wb0,'->')[1] END AS w_source,
      |    list_sort(list_filter(['w0','w1','w2','w3'], x ->
      |      NOT list_contains(st.off, x) AND
      |      len(list_filter(st.bounds,
      |        b -> string_split(b,'->')[2] = x)) = 0)) AS free0,
      |    list_sort(list_filter(st.srcs, x ->
      |      len(list_filter(st.bounds,
      |        b -> string_split(b,'->')[1] = x)) = 0)) AS unb0,
      |    coalesce(list_filter(st.last,
      |      x -> string_split(x,'->')[1] = ev.w)[1], '') AS lb0,
      |    CASE WHEN lb0 = '' THEN ''
      |      ELSE string_split(lb0,'->')[2] END AS w_last,
      |    -- tryBoundForWorker on online: lastBound-if-unbound else min unb
      |    CASE WHEN ev.op = 'online' THEN
      |      CASE WHEN w_source <> '' THEN 'kept'
      |        WHEN w_last <> '' AND list_contains(unb0, w_last) THEN w_last
      |        WHEN len(unb0) > 0 THEN unb0[1]
      |        ELSE '' END
      |      ELSE NULL END AS on_src,
      |    -- tryBoundForSource on offline: history-free worker else min free
      |    CASE WHEN ev.op = 'offline' AND w_source <> '' THEN
      |      coalesce(list_sort(list_filter(free0, x -> x <> ev.w AND
      |          list_contains(st.last, x || '->' || w_source)))[1],
      |        coalesce(list_filter(free0, x -> x <> ev.w)[1], ''))
      |      ELSE NULL END AS off_dst,
      |    CASE WHEN ev.op = 'add' AND NOT list_contains(st.srcs, ev.s) THEN
      |      coalesce(list_sort(list_filter(free0, x ->
      |          list_contains(st.last, x || '->' || ev.s)))[1],
      |        coalesce(free0[1], ''))
      |      ELSE NULL END AS add_dst,
      |    -- freed worker rebinds to min unbound (its lastBound IS ev.s)
      |    CASE WHEN ev.op = 'remove' AND s_worker <> '' THEN
      |      coalesce(list_filter(unb0, x -> x <> ev.s)[1], '')
      |      ELSE NULL END AS rm_src,
      |    CASE WHEN ev.op = 'transfer' THEN
      |      CASE WHEN NOT list_contains(st.srcs, ev.s)
      |             THEN 'err:ErrSchedulerSourceCfgNotExist'
      |        WHEN s_worker = ev.w THEN 'noop'
      |        WHEN list_contains(st.off, ev.w) OR w_source <> ''
      |             THEN 'err:ErrSchedulerWorkerInvalidTrans'
      |        WHEN s_worker = '' THEN 'bound'
      |        ELSE 'moved' END
      |      ELSE NULL END AS tr_class,
      |    CASE WHEN tr_class = 'moved' THEN
      |      coalesce(list_filter(unb0, x -> x <> ev.s)[1], '')
      |      ELSE '' END AS tr_rebind,
      |    CASE ev.op
      |      WHEN 'online' THEN
      |        CASE WHEN on_src = 'kept' THEN 'kept-bound'
      |          WHEN on_src <> '' THEN 'bound:' || on_src ELSE 'free' END
      |      WHEN 'offline' THEN
      |        CASE WHEN w_source = '' THEN 'offline'
      |          WHEN off_dst <> '' THEN 'rebound:' || off_dst
      |          ELSE 'orphaned' END
      |      WHEN 'add' THEN
      |        CASE WHEN list_contains(st.srcs, ev.s)
      |               THEN 'err:ErrSchedulerSourceCfgExist'
      |          WHEN add_dst <> '' THEN 'bound:' || add_dst
      |          ELSE 'unbound' END
      |      WHEN 'remove' THEN
      |        CASE WHEN NOT list_contains(st.srcs, ev.s)
      |               THEN 'err:ErrSchedulerSourceCfgNotExist'
      |          WHEN s_worker = '' THEN 'removed'
      |          WHEN rm_src <> '' THEN 'rebind:' || rm_src
      |          ELSE 'freed' END
      |      ELSE
      |        CASE WHEN tr_class = 'moved' AND tr_rebind <> ''
      |               THEN 'moved+rebind:' || tr_rebind
      |          ELSE tr_class END
      |      END AS res0,
      |    CASE ev.op
      |      WHEN 'online' THEN
      |        CASE WHEN on_src IN ('', 'kept') THEN st.bounds
      |          ELSE list_append(st.bounds, on_src || '->' || ev.w) END
      |      WHEN 'offline' THEN
      |        CASE WHEN w_source = '' THEN st.bounds
      |          ELSE list_append(
      |            list_filter(st.bounds, b -> b <> wb0),
      |            CASE WHEN off_dst = '' THEN NULL
      |              ELSE w_source || '->' || off_dst END) END
      |      WHEN 'add' THEN
      |        CASE WHEN res0 LIKE 'err:%' OR add_dst = '' THEN st.bounds
      |          ELSE list_append(st.bounds, ev.s || '->' || add_dst) END
      |      WHEN 'remove' THEN
      |        CASE WHEN res0 LIKE 'err:%' OR s_worker = '' THEN st.bounds
      |          ELSE list_append(
      |            list_filter(st.bounds, b -> b <> bw0),
      |            CASE WHEN rm_src = '' THEN NULL
      |              ELSE rm_src || '->' || s_worker END) END
      |      ELSE
      |        CASE WHEN res0 = 'bound' THEN
      |            list_append(st.bounds, ev.s || '->' || ev.w)
      |          WHEN tr_class = 'moved' THEN
      |            list_append(list_append(
      |              list_filter(st.bounds, b -> b <> bw0),
      |              ev.s || '->' || ev.w),
      |              CASE WHEN tr_rebind = '' THEN NULL
      |                ELSE tr_rebind || '->' || s_worker END)
      |          ELSE st.bounds END
      |      END AS b1,
      |    list_filter(b1, b -> b IS NOT NULL) AS bounds1,
      |    CASE ev.op
      |      WHEN 'online' THEN list_filter(st.off, x -> x <> ev.w)
      |      WHEN 'offline' THEN
      |        CASE WHEN list_contains(st.off, ev.w) THEN st.off
      |          ELSE list_append(st.off, ev.w) END
      |      ELSE st.off END AS off1,
      |    CASE ev.op
      |      WHEN 'add' THEN
      |        CASE WHEN res0 LIKE 'err:%' THEN st.srcs
      |          ELSE list_append(st.srcs, ev.s) END
      |      WHEN 'remove' THEN
      |        CASE WHEN res0 LIKE 'err:%' THEN st.srcs
      |          ELSE list_filter(st.srcs, x -> x <> ev.s) END
      |      ELSE st.srcs END AS srcs1,
      |    -- lastBound updates: one entry per bind made this step
      |    CASE ev.op
      |      WHEN 'online' THEN
      |        CASE WHEN on_src IN ('', 'kept') THEN CAST([] AS VARCHAR[])
      |          ELSE [ev.w || '->' || on_src] END
      |      WHEN 'offline' THEN
      |        CASE WHEN w_source <> '' AND off_dst <> ''
      |          THEN [off_dst || '->' || w_source]
      |          ELSE CAST([] AS VARCHAR[]) END
      |      WHEN 'add' THEN
      |        CASE WHEN res0 LIKE 'bound:%'
      |          THEN [add_dst || '->' || ev.s]
      |          ELSE CAST([] AS VARCHAR[]) END
      |      WHEN 'remove' THEN
      |        CASE WHEN res0 LIKE 'rebind:%'
      |          THEN [s_worker || '->' || rm_src]
      |          ELSE CAST([] AS VARCHAR[]) END
      |      ELSE
      |        CASE WHEN res0 = 'bound' THEN [ev.w || '->' || ev.s]
      |          WHEN tr_class = 'moved' AND tr_rebind <> ''
      |            THEN [ev.w || '->' || ev.s, s_worker || '->' || tr_rebind]
      |          WHEN tr_class = 'moved' THEN [ev.w || '->' || ev.s]
      |          ELSE CAST([] AS VARCHAR[]) END
      |      END AS newbinds,
      |    list_concat(
      |      list_filter(st.last, x ->
      |        len(list_filter(newbinds, nb ->
      |          string_split(nb,'->')[1] = string_split(x,'->')[1])) = 0),
      |      newbinds) AS last1
      |  FROM st JOIN ev ON ev.step = st.step + 1
      |  ) q
      |)
      |SELECT step, op, s, w, res,
      |  coalesce(array_to_string(list_sort(bounds), ','), '') AS bounds,
      |  coalesce(array_to_string(list_sort(
      |    list_filter(['w0','w1','w2','w3'], x ->
      |      NOT list_contains(off, x) AND
      |      len(list_filter(bounds,
      |        b -> string_split(b,'->')[2] = x)) = 0)), ','), '') AS free,
      |  coalesce(array_to_string(list_sort(list_filter(srcs, x ->
      |    len(list_filter(bounds,
      |      b -> string_split(b,'->')[1] = x)) = 0)), ','), '') AS unb
      |FROM st WHERE step > 0 ORDER BY step""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      // script derivation — the o_orderkey walk is tiny (80 longs) and
      // feeds plan-literal construction, like q277's placement derivation
      val ks = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").cast("long"))
        .orderBy("o_orderkey").limit(80)
        .collect().map(r => r.getLong(0) * 2654435761L % 1000003L)
      val ops = Array("online", "online", "offline", "add", "add",
        "remove", "transfer", "transfer")
      val prologue = Seq(
        (1, "online", "", "w0"), (2, "online", "", "w1"),
        (3, "online", "", "w2"),
        (4, "add", "s0", ""), (5, "add", "s1", ""), (6, "add", "s2", ""))
      val script = prologue ++ ks.zipWithIndex.map { case (k, i0) =>
        val i = i0 + 1
        val pool = if (i <= 40) 4 else 6
        (i + 6, ops((k % 8).toInt),
          s"s${k / 8 % pool}", s"w${k / 32 % 4}")
      }

      val kernel = new Kernel
      (0 to 3).foreach(i => kernel.addWorker(s"w$i", s"addr$i"))
      val rows = script.map { case (step, op, s, w) =>
        // pre-state facts needed to token-ize the kernel's outcome
        val preBoundW = kernel.bounds.get(s).map(_.name).getOrElse("")
        val wAgent = kernel.workers.get(w)
        val preWSource = wAgent.map(_.boundSource).getOrElse("")
        val res = op match {
          case "online" =>
            if (preWSource.nonEmpty) { kernel.workerOnline(w); "kept-bound" }
            else {
              kernel.workerOnline(w)
              val bs = wAgent.map(_.boundSource).getOrElse("")
              if (bs.nonEmpty) s"bound:$bs" else "free"
            }
          case "offline" =>
            kernel.workerOffline(w)
            if (preWSource.isEmpty) "offline"
            else kernel.bounds.get(preWSource) match {
              case Some(nw) => s"rebound:${nw.name}"
              case None => "orphaned"
            }
          case "add" =>
            kernel.addSourceCfg(SourceCfg(s)) match {
              case Left(e) => s"err:$e"
              case Right(_) => kernel.bounds.get(s) match {
                case Some(nw) => s"bound:${nw.name}"
                case None => "unbound"
              }
            }
          case "remove" =>
            kernel.removeSourceCfg(s) match {
              case Left(e) => s"err:$e"
              case Right(_) =>
                if (preBoundW.isEmpty) "removed"
                else {
                  val nb = kernel.workers(preBoundW).boundSource
                  if (nb.nonEmpty) s"rebind:$nb" else "freed"
                }
            }
          case "transfer" =>
            kernel.transferSource(s, w) match {
              case Left(e) => s"err:$e"
              case Right(_) =>
                if (preBoundW == w) "noop"
                else if (preBoundW.isEmpty) "bound"
                else {
                  val nb = kernel.workers(preBoundW).boundSource
                  if (nb.nonEmpty) s"moved+rebind:$nb" else "moved"
                }
            }
        }
        val (bounds, free, _, unb) = kernel.snapshot()
        (step, op, s, w, res, bounds, free, unb)
      }
      rows.toDF("step", "op", "s", "w", "res", "bounds", "free", "unb")
  }

  val all: Seq[GateQuery] = Seq(sourceScheduler)
}
