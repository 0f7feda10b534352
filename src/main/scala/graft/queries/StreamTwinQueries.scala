package graft.queries

import org.apache.spark.sql.functions._
import graft.core.CdcStream
import graft.operators.{Compaction, Transforms}

/**
 * Batch TWINS of streaming-only operators, so the batch-SQL correctness
 * gate covers them (the driver cannot oracle-check a running streaming
 * query): W2 exactly-once checkpoint replay and G3 optimistic shard-DDL
 * schema lattice. Each twin computes, in one deterministic batch plan, the
 * algebra the streaming path enforces at runtime — same operators, same
 * invariants.
 */
object StreamTwinQueries {

  private val cte = CdcStream.sqlCte

  /**
   * W2 — exactly-once under at-least-once delivery: microbatches are keyed
   * by batch id; a crash between sink-write and checkpoint-commit redelivers
   * a whole batch, and the idempotent sink (Sinks.parquetStateSink) skips
   * batch ids it already applied. Twin: duplicate one whole batch in the
   * delivery stream, apply the batch-id dedup, then fold to net state
   * through the REAL updateSplit + compact operators — final state must
   * equal the replay-free stream's. n_deliveries > n_applied witnesses that
   * the replay actually happened.
   */
  private val BatchTs = 500L
  private val ReplayBatch = 2001L

  val checkpointResume = GateQuery(
    "q74_checkpoint_resume",
    Some(cte +
      s""", b AS (SELECT *, commit_ts // $BatchTs AS batch_id FROM cdc),
         |deliv AS (
         |  SELECT * FROM b
         |  UNION ALL SELECT * FROM b WHERE batch_id = $ReplayBatch
         |), applied AS (
         |  SELECT * FROM deliv
         |  QUALIFY row_number() OVER (PARTITION BY batch_id, seq ORDER BY seq) = 1
         |), split AS (
         |  SELECT seq * 2 + leg AS seq,
         |    CASE WHEN leg = 1 THEN 'I'
         |         WHEN op = 'U' AND pk <> pk_after THEN 'D'
         |         ELSE op END AS op,
         |    commit_ts, schema_name, table_name,
         |    CASE WHEN leg = 1 THEN pk_after ELSE pk END AS pk,
         |    CASE WHEN leg = 1 THEN val_after
         |         WHEN op = 'U' AND pk <> pk_after THEN NULL
         |         WHEN op = 'D' THEN NULL
         |         ELSE val_after END AS val_after
         |  FROM (SELECT *,
         |          unnest(CASE WHEN op = 'U' AND pk <> pk_after
         |                      THEN [0, 1] ELSE [0] END) AS leg
         |        FROM applied)
         |), net AS (
         |  SELECT schema_name, table_name, pk,
         |    CASE WHEN first_op = 'I' AND last_op = 'D' THEN NULL
         |         WHEN last_op = 'D' THEN 'D'
         |         WHEN first_op = 'I' THEN 'I'
         |         WHEN first_op = 'D' THEN 'R'
         |         ELSE 'U' END AS net_op,
         |    CASE WHEN last_op = 'D' THEN NULL ELSE last_val_raw END AS final_val
         |  FROM (
         |    SELECT schema_name, table_name, pk,
         |      arg_min(op, seq) AS first_op, arg_max(op, seq) AS last_op,
         |      arg_max(coalesce(val_after, -1), seq) AS last_val_raw
         |    FROM split GROUP BY 1, 2, 3
         |  ) WHERE (CASE WHEN first_op = 'I' AND last_op = 'D' THEN NULL
         |                WHEN last_op = 'D' THEN 'D'
         |                WHEN first_op = 'I' THEN 'I'
         |                WHEN first_op = 'D' THEN 'R'
         |                ELSE 'U' END) IS NOT NULL
         |), state AS (
         |  SELECT schema_name, table_name, count(*) AS n_keys,
         |    CAST(sum(CASE WHEN net_op <> 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
         |    CAST(coalesce(sum(CASE WHEN net_op <> 'D'
         |      THEN CAST(final_val AS DECIMAL(18,6)) END), 0) AS DOUBLE) AS sum_val
         |  FROM net GROUP BY 1, 2
         |), dcount AS (
         |  SELECT schema_name, table_name, count(*) AS n_deliveries,
         |    count(DISTINCT seq) AS n_applied
         |  FROM deliv GROUP BY 1, 2
         |)
         |SELECT s.schema_name, s.table_name, d.n_deliveries, d.n_applied,
         |  s.n_keys, s.n_live, s.sum_val
         |FROM state s JOIN dcount d
         |  ON d.schema_name = s.schema_name AND d.table_name = s.table_name"""
        .stripMargin)) { (spark, dir) =>
    val cdc = CdcStream.derive(spark, dir)
      .withColumn("batch_id", expr(s"commit_ts DIV $BatchTs"))
    val deliv = cdc.unionByName(cdc.filter(col("batch_id") === ReplayBatch))
    // the idempotent sink's replay guard: one application per (batch, event)
    val applied = deliv.dropDuplicates("batch_id", "seq")
    val net = Compaction.compact(Transforms.updateSplit(applied))
    val state = net.groupBy("schema_name", "table_name").agg(
      count(lit(1)).as("n_keys"),
      sum(when(col("net_op") =!= "D", 1L).otherwise(0L)).as("n_live"),
      coalesce(sum(when(col("net_op") =!= "D",
        col("final_val").cast("decimal(18,6)"))), lit(0).cast("decimal(18,6)"))
        .cast("double").as("sum_val"))
    val dcount = deliv.groupBy("schema_name", "table_name").agg(
      count(lit(1)).as("n_deliveries"),
      countDistinct(col("seq")).as("n_applied"))
    state.join(dcount, Seq("schema_name", "table_name"))
      .select("schema_name", "table_name", "n_deliveries", "n_applied",
        "n_keys", "n_live", "sum_val")
  }

  /**
   * G3 — optimistic shard-DDL lattice: drifted shard schemas join to the
   * field-union (nullable where a shard lacks the column), and a same-name/
   * different-type drift surfaces as a CONFLICT instead of merging
   * (dm/pkg/shardddl/optimism). Twin: three shards declared in DDL TEXT
   * (parser → StructType → joinSchemas), one table with a type conflict;
   * the gate pins the joined field list, nullability, and the conflict row.
   */
  val optimisticLattice = GateQuery(
    "q75_optimistic_lattice",
    Some("""SELECT * FROM (VALUES
           |  ('tbl_0', 'pk', 'BIGINT', 'false', 'ok'),
           |  ('tbl_0', 'val', 'DOUBLE', 'true', 'ok'),
           |  ('tbl_0', 'c2', 'STRING', 'true', 'ok'),
           |  ('tbl_1', 'pk', 'BIGINT', 'false', 'ok'),
           |  ('tbl_1', 'val', 'DOUBLE', 'true', 'ok'),
           |  ('tbl_1', 'c2', 'STRING', 'true', 'ok'),
           |  ('tbl_2', 'pk', 'BIGINT', 'false', 'ok'),
           |  ('tbl_2', 'val', 'DOUBLE', 'true', 'ok'),
           |  ('tbl_2', 'c2', 'STRING', 'true', 'ok'),
           |  ('tbl_3', 'val', 'DOUBLE vs STRING', NULL, 'conflict')
           |) v(table_name, field, dtype, nullable, status)""".stripMargin)) {
    (spark, dir) =>
    import spark.implicits._
    import graft.core.{DdlParser, SchemaRegistry}
    import org.apache.spark.sql.types.StructType
    def schemaOf(ddl: String): StructType = {
      val ct = DdlParser.parse(ddl)
        .collectFirst { case c: DdlParser.CreateTable => c }.get
      StructType(ct.columns.map(c =>
        org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable)))
    }
    val tables = Seq("tbl_0", "tbl_1", "tbl_2", "tbl_3")
    val rows = tables.flatMap { t =>
      val shard0 = schemaOf(
        s"CREATE TABLE s0.$t (pk BIGINT NOT NULL PRIMARY KEY, val DOUBLE)")
      val shard1 = schemaOf(
        s"CREATE TABLE s1.$t (pk BIGINT NOT NULL PRIMARY KEY, val DOUBLE, c2 VARCHAR(64))")
      val shard2 = schemaOf(
        if (t == "tbl_3")
          s"CREATE TABLE s2.$t (pk BIGINT NOT NULL PRIMARY KEY, val VARCHAR(32))"
        else s"CREATE TABLE s2.$t (pk BIGINT NOT NULL PRIMARY KEY, val DOUBLE)")
      SchemaRegistry.joinSchemas(Seq(shard0, shard1, shard2)) match {
        case Right(joined) => joined.fields.toSeq.map(f =>
          (t, f.name, f.dataType.sql, f.nullable.toString, "ok"))
        case Left(c) =>
          Seq((t, c.field, c.types.map(_.sql).mkString(" vs "),
            null.asInstanceOf[String], "conflict"))
      }
    }
    rows.toDF("table_name", "field", "dtype", "nullable", "status")
  }

  def all: Seq[GateQuery] = Seq(checkpointResume, optimisticLattice)
}
