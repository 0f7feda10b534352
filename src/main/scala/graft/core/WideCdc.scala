package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * A WIDE mixed-type CDC envelope for the schema-generic codec layer: 20
 * columns covering the MySQL type matrix (integer family, bool, unsigned
 * with promotion-range values, decimal, float/double, char/varchar, date,
 * datetime, blob, enum/set ordinals, bit, year, json, vector). Before/after images
 * are flat columns prefixed `b_`/`a_` (tiflow's PreColumns/Columns,
 * cdc/model/sink.go:347-391); the whole image is NULL for the missing side
 * of I/D.
 *
 * Like [[CdcStream]], the stream derives deterministically from the
 * `events` table and [[sqlCte]] is the DuckDB twin — every derivation uses
 * integer arithmetic or exactly-representable quarters so both engines
 * produce bit-identical values. The before image uses the same formulas
 * with the base shifted by a prime, so UPDATE rows get plausible distinct
 * old values. Per-column NULLs are planted on a rolling modulus to
 * exercise every codec's null rendering.
 */
object WideCdc {

  val EnumMembers: Seq[String] = Seq("click", "error", "purchase", "signup", "view")
  val SetMembers: Seq[String] = Seq("red", "green", "blue")

  /** The table schema driving every generic encoder. */
  val specs: Seq[ColumnSpec] = Seq(
    ColumnSpec("id", "bigint", nullable = false, isHandle = true),
    ColumnSpec("qty", "int"),
    ColumnSpec("small", "smallint"),
    ColumnSpec("tiny", "tinyint"),
    ColumnSpec("active", "tinyint(1)"),
    ColumnSpec("ucnt", "int unsigned", unsigned = true),
    ColumnSpec("price", "decimal(12,2)"),
    ColumnSpec("score", "double"),
    ColumnSpec("ratio", "float"),
    ColumnSpec("name", "varchar(32)"),
    ColumnSpec("code", "char(4)"),
    ColumnSpec("born", "date"),
    ColumnSpec("updated", "datetime"),
    ColumnSpec("payload", "blob"),
    ColumnSpec("tag", "enum('click','error','purchase','signup','view')",
      members = EnumMembers),
    ColumnSpec("flags", "set('red','green','blue')", members = SetMembers),
    ColumnSpec("bits", "bit(8)"),
    ColumnSpec("yr", "year"),
    ColumnSpec("meta", "json"),
    ColumnSpec("vec", "vector(4)")) // TiDB v8 VECTOR → array<float>

  /** Prime shift producing the before image from the same formulas. */
  private val BeforeShift = 7919L

  // ---- per-column value derivations (Spark) ---------------------------
  // b = image base (event_id or event_id + BeforeShift), u = user_id,
  // et = event_type. Keep branch-for-branch with colSql below.

  private def colValue(name: String, b: Column, u: Column, et: Column): Column =
    name match {
      case "id" => u * 1000000L + b % 1000000L
      case "qty" => ((b % 2000L) - 1000L).cast("int")
      case "small" => ((b % 200L) - 100L).cast("int")
      case "tiny" => ((b % 100L) - 50L).cast("int")
      case "active" => (b % 2L) === 0L
      case "ucnt" => lit(2147483000L) + b % 1000L
      case "price" => ((b % 100000L).cast("double") / 4).cast(DecimalType(12, 2))
      case "score" => (b % 4000L).cast("double") / 4 - 500
      case "ratio" => ((b % 400L).cast("double") / 4).cast("float")
      case "name" => concat(et, lit("_"), (b % 7L).cast("string"))
      case "code" => upper(substring(et, 1, 3))
      case "born" => date_add(to_date(lit("2020-01-01")), (b % 1461L).cast("int"))
      case "updated" => timestamp_seconds(lit(1700000000L) + b % 86400L)
      case "payload" => encode(concat(lit("p_"), et, (b % 5L).cast("string")), "ISO-8859-1")
      case "tag" => lit(1L) + b % 5L
      case "flags" => b % 8L
      case "bits" => b % 256L
      case "yr" => (lit(1990L) + b % 40L).cast("int")
      case "meta" => concat(lit("{\"k\":"), (b % 5L).cast("string"), lit("}"))
      // quarters in [-50, 49.75]: exactly representable, plain-decimal band
      case "vec" => transform(sequence(lit(0L), lit(3L)),
        i => (((b + i * 37L) % 400L).cast("double") / 4 - 50).cast("float"))
    }

  // ---- per-column value derivations (DuckDB) --------------------------

  private def colSql(name: String, b: String, u: String, et: String): String =
    name match {
      case "id" => s"$u * 1000000 + $b % 1000000"
      case "qty" => s"CAST(($b % 2000) - 1000 AS INT)"
      case "small" => s"CAST(($b % 200) - 100 AS INT)"
      case "tiny" => s"CAST(($b % 100) - 50 AS INT)"
      case "active" => s"($b % 2) = 0"
      case "ucnt" => s"2147483000 + $b % 1000"
      case "price" => s"CAST(CAST($b % 100000 AS DOUBLE) / 4 AS DECIMAL(12,2))"
      case "score" => s"CAST($b % 4000 AS DOUBLE) / 4 - 500"
      case "ratio" => s"CAST(CAST($b % 400 AS DOUBLE) / 4 AS REAL)"
      case "name" => s"$et || '_' || CAST($b % 7 AS VARCHAR)"
      case "code" => s"upper(substr($et, 1, 3))"
      case "born" => s"DATE '2020-01-01' + CAST($b % 1461 AS INT)"
      case "updated" =>
        s"TIMESTAMP '1970-01-01 00:00:00' + to_seconds(CAST(1700000000 + $b % 86400 AS BIGINT))"
      case "payload" => s"encode('p_' || $et || CAST($b % 5 AS VARCHAR))"
      case "tag" => s"1 + $b % 5"
      case "flags" => s"$b % 8"
      case "bits" => s"$b % 256"
      case "yr" => s"CAST(1990 + $b % 40 AS INT)"
      case "meta" => """'{"k":' || CAST(""" + b + """ % 5 AS VARCHAR) || '}'"""
      case "vec" =>
        s"list_transform(range(0,4), i -> CAST(CAST(($b + i*37) % 400 AS DOUBLE)/4 - 50 AS REAL))"
    }

  /** Rolling per-column NULL plant: nullable column #i is NULL when
    * (base + 3i) % 19 == 0 — distinct positions per column, both images. */
  private def nullSalt(i: Int): Long = 3L * i

  /** Spark derivation. Output: seq, op, commit_ts, start_ts, schema_name,
    * table_name, then a_<col>/b_<col> per spec. */
  def derive(events: DataFrame): DataFrame = {
    val e = col("event_id")
    val op = when(e % 10 < 6, "I").when(e % 10 < 9, "U").otherwise("D")
    val commitTs = lit(2000000L) + expr("event_id DIV 5")
    val base = events.select(
      e.as("seq"), op.as("op"), commitTs.as("commit_ts"),
      (commitTs - 1 - e % 3).as("start_ts"),
      concat(lit("wd_"), (col("user_id") % 2).cast("string")).as("schema_name"),
      concat(lit("wt_"), (col("user_id") % 3).cast("string")).as("table_name"),
      col("event_id"), col("user_id"), col("event_type"))
    val imgCols = specs.zipWithIndex.flatMap { case (s, i) =>
      def img(b: Column): Column = {
        val v = colValue(s.name, b, col("user_id"), col("event_type"))
        if (s.nullable) when((b + nullSalt(i)) % 19 === 0, lit(null)).otherwise(v)
        else v
      }
      Seq(
        when(col("op") =!= "D", img(col("event_id"))).as(s"a_${s.name}"),
        when(col("op") =!= "I", img(col("event_id") + BeforeShift)).as(s"b_${s.name}"))
    }
    base.select(Seq(col("seq"), col("op"), col("commit_ts"), col("start_ts"),
      col("schema_name"), col("table_name")) ++ imgCols: _*)
  }

  def derive(spark: SparkSession, dir: String): DataFrame =
    derive(Tables.load(spark, dir, "events"))

  /** DuckDB twin as a CTE named `wide`. */
  val sqlCte: String = {
    val opE = "CASE WHEN event_id % 10 < 6 THEN 'I' WHEN event_id % 10 < 9 THEN 'U' ELSE 'D' END"
    val imgSelects = specs.zipWithIndex.flatMap { case (s, i) =>
      def img(b: String): String = {
        val v = colSql(s.name, b, "user_id", "event_type")
        if (s.nullable) s"CASE WHEN ($b + ${nullSalt(i)}) % 19 = 0 THEN NULL ELSE $v END"
        else v
      }
      Seq(
        s"CASE WHEN op <> 'D' THEN ${img("event_id")} END AS a_${s.name}",
        s"CASE WHEN op <> 'I' THEN ${img("(event_id + " + BeforeShift + ")")} END AS b_${s.name}")
    }
    s"""WITH w0 AS (
       |  SELECT event_id, user_id, event_type, $opE AS op FROM events
       |), wide AS (
       |  SELECT event_id AS seq, op,
       |    2000000 + event_id // 5 AS commit_ts,
       |    2000000 + event_id // 5 - 1 - event_id % 3 AS start_ts,
       |    'wd_' || CAST(user_id % 2 AS VARCHAR) AS schema_name,
       |    'wt_' || CAST(user_id % 3 AS VARCHAR) AS table_name,
       |    ${imgSelects.mkString(",\n    ")}
       |  FROM w0
       |)""".stripMargin
  }
}
