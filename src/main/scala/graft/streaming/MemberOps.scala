package graft.streaming

/**
 * dmctl member-operations surface, master side (reference:
 * dm/master/server.go ListMember/OfflineMember/OperateLeader handlers +
 * dm/ctl/master/{list_member,offline_member,operate_leader}.go flag
 * validation). The etcd-member listing and election plumbing are
 * wire-protocol (COVERAGE delegation rows); what's modeled here is the
 * pure decision surface: the default-to-all-sections rule, the name
 * filter, the worker-row rendering off the scheduler's agents, the
 * offline-member validation chain, and the leader-op token mapping.
 */
object MemberOps {

  // member type strings — dm/ctl/common/config.go:38-40
  val Master = "master"
  val Worker = "worker"

  // pb.LeaderOp — dm/pb/dmmaster.pb.go:96-98
  val InvalidLeaderOp = 0
  val EvictLeaderOp = 1
  val CancelEvictLeaderOp = 2

  val ErrMasterInvalidOfflineType = "ErrMasterInvalidOfflineType"

  /** server.go:2326-2340: no section flag set selects ALL three. */
  def sections(
      leader: Boolean, master: Boolean, worker: Boolean): Seq[String] = {
    val (l, m, w) =
      if (!leader && !master && !worker) (true, true, true)
      else (leader, master, worker)
    Seq("leader" -> l, "master" -> m, "worker" -> w)
      .collect { case (n, true) => n }
  }

  /** server.go:2260-2297 listMemberWorker: name-filtered (empty = all)
    * worker rows (name, addr, stage, bound source), sorted by name. */
  def listWorkers(k: SourceScheduler.Kernel, names: Seq[String])
      : Seq[(String, String, String, String)] = {
    val all = names.isEmpty
    val set = names.toSet
    k.workers.values.toSeq
      .filter(w => all || set(w.name))
      .map(w => (w.name, w.addr, w.stage, w.boundSource))
      .sortBy(_._1)
  }

  /** offline_member.go:39-54 convertOfflineMemberType — exactly one of
    * --master/--worker; then :70-75 the required-name check. */
  def offlineMemberType(
      master: Boolean, worker: Boolean, name: String): Either[String, String] =
    if ((master && worker) || (!master && !worker))
      Left("should specify either --master or --worker")
    else if (name.isEmpty) Left("a member name must be specified")
    else Right(if (master) Master else Worker)

  /** server.go:362-401 OfflineMember: worker offline goes through the
    * scheduler's RemoveWorker (its terror propagates as the message);
    * unknown types fail with ErrMasterInvalidOfflineType. The master
    * branch is etcd member removal — delegation, not modeled. */
  def offlineMember(
      k: SourceScheduler.Kernel, typ: String,
      name: String): Either[String, Unit] = typ match {
    case Worker => k.removeWorker(name)
    case Master => Left("etcd-delegated")
    case _ => Left(ErrMasterInvalidOfflineType)
  }

  /** operate_leader.go:36-45 convertOpType. */
  def leaderOp(op: String): Int = op match {
    case "evict" => EvictLeaderOp
    case "cancel-evict" => CancelEvictLeaderOp
    case _ => InvalidLeaderOp
  }
}
