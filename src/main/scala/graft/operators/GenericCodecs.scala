package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{ColumnSpec, MySqlTypes}

/**
 * Schema-GENERIC wire-format encoders (SURVEY.md §2.7 E1-E7, full-depth
 * form): every encoder is driven by a `Seq[ColumnSpec]` — any table the
 * schema registry (or a parsed CREATE TABLE) describes flows through
 * without touching codec code. The fixed-envelope encoders in [[Codecs]]
 * remain as the minimal demo path; these generate the struct, the Canal
 * sqlType/mysqlType maps, the Open-Protocol column wrappers, the Debezium
 * Connect schema block, and per-type value rendering from the spec.
 *
 * Expected input columns: op ("I"/"U"/"D"), commit_ts, start_ts,
 * schema_name, table_name, plus `a_<col>` / `b_<col>` image columns (whole
 * image NULL on the missing side of I/D).
 *
 * Everything is a pure column expression (one `to_json`/`concat` per
 * message) — codegen'd and vectorized; no per-row interpretation, no UDFs.
 */
object GenericCodecs {

  private val jsonOpts = Map("ignoreNullFields" -> "false")

  private def a(s: ColumnSpec): Column = col("a_" + s.name)
  private def b(s: ColumnSpec): Column = col("b_" + s.name)
  /** Effective image for per-event metadata: before for D, after otherwise
    * (the reference keys sqlType per event the same way). */
  private def eff(s: ColumnSpec): Column =
    when(col("op") === "D", b(s)).otherwise(a(s))

  // ---- wire integrity (schema-generic) --------------------------------

  /** Generic row checksum: digest over the presence-prefixed CANAL-
    * rendered values (all strings), so a consumer can recompute it from
    * the decoded message alone — no type metadata needed at verify time. */
  def rowChecksum(specs: Seq[ColumnSpec], v: ColumnSpec => Column): Column =
    Codecs.checksumOverValues(specs.map(s => MySqlTypes.canalValue(s, v(s))))

  /** Consumer-side verification over the decoded all-string data struct;
    * unparseable messages verify FALSE, never null. */
  def verifyIntegrity(decodedData: Column, checksum: Column,
                      specs: Seq[ColumnSpec]): Column =
    coalesce(
      Codecs.checksumOverValues(specs.map(s => decodedData.getField(s.name)))
        === checksum,
      lit(false))

  // ---- E2: Canal-JSON -------------------------------------------------

  /** Generic Canal-JSON row message (canal_json_row_event_encoder.go:83-380
    * driven by the table schema instead of a fixed envelope): all-string
    * data/old images, per-row promoted sqlType ints, declared mysqlType
    * names, pkNames from the handle columns. */
  def canalJson(specs: Seq[ColumnSpec]): Column = {
    def img(v: ColumnSpec => Column): Column =
      array(struct(specs.map(s => MySqlTypes.canalValue(s, v(s)).as(s.name)): _*))
    val canalType = when(col("op") === "I", "INSERT")
      .when(col("op") === "U", "UPDATE").otherwise("DELETE")
    to_json(struct(
      lit(0L).as("id"),
      col("schema_name").as("database"),
      col("table_name").as("table"),
      array(specs.filter(_.isHandle).map(s => lit(s.name)): _*).as("pkNames"),
      lit(false).as("isDdl"),
      canalType.as("type"),
      col("commit_ts").as("es"),
      col("commit_ts").as("ts"),
      lit("").as("sql"),
      struct(specs.map(s => MySqlTypes.javaSqlTypeCol(s, eff(s)).as(s.name)): _*)
        .as("sqlType"),
      struct(specs.map(s => lit(s.mysqlType).as(s.name)): _*).as("mysqlType"),
      when(col("op") === "D", img(b)).otherwise(img(a)).as("data"),
      when(col("op") === "U", img(b)).as("old")), jsonOpts)
  }

  // ---- column-pruning encoder options ---------------------------------

  /**
   * The reference's column-pruning codec options
   * (pkg/sink/codec/common/config.go:78,95,256-268):
   *  - `only-output-updated-columns` — on UPDATE, drop from the OLD image
   *    every column whose value null-safe-equals the new image
   *    (canal_json_row_event_encoder.go:543-556 shouldIgnoreColumn /
   *    open_protocol_message.go:83-99 dropNotUpdatedColumns; equality is
   *    IsColumnValueEqual, encoder.go:76-91 — nil==nil is equal);
   *  - `delete-only-output-handle-key-columns` — on DELETE, emit only the
   *    handle-key columns (canal_json_row_event_encoder.go:92-94,
   *    open_protocol_message.go:142-145);
   *  - `output-old-value` (open protocol) — emit the `p` pre-image block
   *    on UPDATE (open_protocol_message.go:149-152).
   */
  final case class CodecOpts(
      onlyOutputUpdatedColumns: Boolean = false,
      deleteOnlyHandleKeyColumns: Boolean = false,
      openOutputOldValue: Boolean = false,
      // canal `content-compatible` type rendering (GetMySQLType fullType):
      // true = full declared types — the repo-wide pinned form; false =
      // the reference DEFAULT's bare names ("varchar", "int unsigned")
      fullTypeNames: Boolean = true)

  object CodecOpts {
    /** Reference config-combination rules, enforced at build time like
      * common/config.go / pkg/config/sink.go:
      * delete-only-output-handle-key-columns is rejected with
      * force-replicate (config.go:265-268) and with the CSV protocol
      * (sink.go:787-790); canal-json `content-compatible` implies
      * only-output-updated-columns (config.go:270-274). */
    def validate(opts: CodecOpts, protocol: String,
                 forceReplicate: Boolean = false): CodecOpts = {
      require(!(opts.deleteOnlyHandleKeyColumns && forceReplicate),
        "force-replicate must be disabled when " +
          "\"delete-only-output-handle-key-columns\" is true")
      require(!(opts.deleteOnlyHandleKeyColumns && protocol == "csv"),
        "CSV protocol requires old value to be enabled: do not set " +
          "`delete-only-output-handle-key-columns` to true")
      opts
    }
    /** canal-json `content-compatible` implies only-output-updated-columns
      * (config.go:270-274) and full type descriptions (GetMySQLType). */
    def contentCompatible(opts: CodecOpts): CodecOpts =
      opts.copy(onlyOutputUpdatedColumns = true, fullTypeNames = true)
  }

  /**
   * Large-message handling config (pkg/config/large_message.go:30-37) with
   * the reference's AdjustAndValidate rules (:47-92): the option must be
   * none/handle-key-only/claim-check; compression must be supported;
   * canal-json requires enable-tidb-extension; claim-check requires a
   * storage URI; and `claim-check-raw-value` is REJECTED for the open
   * protocol (:84-87 — raw side-files drop the key, which open's decoder
   * needs).
   */
  final case class LargeMessageHandle(
      option: String = "none",
      compression: String = "none",
      claimCheckStorageUri: String = "",
      claimCheckRawValue: Boolean = false) {
    def validate(protocol: String, enableTiDBExtension: Boolean = true)
        : LargeMessageHandle = {
      require(Seq("none", "handle-key-only", "claim-check").contains(option),
        s"unknown large message handle option: $option")
      require(graft.functions.MessageCompress.supported(compression),
        s"large message handle compression is not supported, got $compression")
      if (option != "none") {
        protocol match {
          case "open" | "simple" =>
          case "canal-json" => require(enableTiDBExtension,
            s"large message handle is set to $option, protocol is canal-json, " +
              "but enable-tidb-extension is false")
          case other => require(false,
            s"large message handle is set to $option, protocol is $other, " +
              "it's not supported")
        }
        if (option == "claim-check") {
          require(claimCheckStorageUri.nonEmpty,
            "large message handle is set to claim-check, but the " +
              "claim-check-storage-uri is empty")
          require(!(claimCheckRawValue && protocol == "open"),
            "large message handle is set to claim-check, raw value is not " +
              "supported for the open protocol")
        }
      }
      this
    }
  }

  /** `"name":<json value>` fragment for one column — to_json handles the
    * escaping and the explicit-null rendering; the braces strip leaves a
    * raw object member ready for concat assembly. */
  private def jsonMember(name: String, v: Column): Column =
    regexp_replace(to_json(struct(v.as(name)), jsonOpts), "^\\{|\\}$", "")

  /**
   * Canal-JSON with the pruning options: same member order as [[canalJson]]
   * but `data`/`old` assemble per-row — on UPDATE with
   * `only-output-updated-columns`, `old` carries EXACTLY the columns whose
   * before value differs (null-safely) from the after value; on DELETE with
   * `delete-only-output-handle-key-columns`, `data` carries only the handle
   * keys. The consumer overlays `old` onto `data` to recover the pre-image
   * (the reference's lossy contract — unchanged columns are not repeated).
   */
  def canalJsonWith(specs: Seq[ColumnSpec], opts: CodecOpts): Column = {
    val hs = specs.filter(_.isHandle)
    def fullImg(ss: Seq[ColumnSpec], v: ColumnSpec => Column): Column = to_json(
      array(struct(ss.map(s => MySqlTypes.canalValue(s, v(s)).as(s.name)): _*)),
      jsonOpts)
    // onlyHandleKey (D + delete-only-output-handle-key-columns, encoder
    // :92-94) restricts data AND the sqlType/mysqlType maps (:172)
    val header =
      if (opts.deleteOnlyHandleKeyColumns)
        when(col("op") === "D", canalHeader(specs, hs, opts.fullTypeNames))
          .otherwise(canalHeader(specs, specs, opts.fullTypeNames))
      else canalHeader(specs, specs, opts.fullTypeNames)
    val deleteImg =
      if (opts.deleteOnlyHandleKeyColumns) fullImg(hs, b) else fullImg(specs, b)
    val data = when(col("op") === "D", deleteImg).otherwise(fullImg(specs, a))
    val old =
      if (!opts.onlyOutputUpdatedColumns)
        when(col("op") === "U", fullImg(specs, b)).otherwise("null")
      else {
        // shouldIgnoreColumn: same schema ⇒ types equal; drop iff the raw
        // values are null-safe-equal (IsColumnValueEqual)
        val frags = specs.map(s =>
          when(!(a(s) <=> b(s)), jsonMember(s.name, MySqlTypes.canalValue(s, b(s)))))
        when(col("op") === "U",
          concat(lit("[{"), concat_ws(",", frags: _*), lit("}]")))
          .otherwise("null")
      }
    concat(regexp_replace(header, "\\}$", ""),
      lit(",\"data\":"), data, lit(",\"old\":"), old, lit("}"))
  }

  /** Canal-JSON header object (id..mysqlType) with the sqlType/mysqlType
    * maps over `mapSpecs` — the full list normally, the handle keys under
    * onlyHandleKey (encoder :172); pkNames always the handle list. */
  private def canalHeader(specs: Seq[ColumnSpec],
                          mapSpecs: Seq[ColumnSpec],
                          fullTypeNames: Boolean = true): Column = {
    val canalType = when(col("op") === "I", "INSERT")
      .when(col("op") === "U", "UPDATE").otherwise("DELETE")
    to_json(struct(
      lit(0L).as("id"),
      col("schema_name").as("database"),
      col("table_name").as("table"),
      array(specs.filter(_.isHandle).map(s => lit(s.name)): _*).as("pkNames"),
      lit(false).as("isDdl"),
      canalType.as("type"),
      col("commit_ts").as("es"),
      col("commit_ts").as("ts"),
      lit("").as("sql"),
      struct(mapSpecs.map(s => MySqlTypes.javaSqlTypeCol(s, eff(s)).as(s.name)): _*)
        .as("sqlType"),
      struct(mapSpecs.map(s =>
        lit(MySqlTypes.mysqlTypeName(s, fullTypeNames)).as(s.name)): _*)
        .as("mysqlType")),
      jsonOpts)
  }

  /**
   * Canal-JSON claim-check (canal_json_row_event_encoder.go:445-470 +
   * pkg/sink/kafka/claimcheck/claim_check.go:85-104): the FULL message
   * (with the `_tidb` extension's commitTs, required by validate) is
   * side-written when oversized; the in-stream replacement is the
   * handle-key-only message (images AND sqlType/mysqlType maps restricted,
   * newJSONMessageForDML with messageTooLarge=true) whose `_tidb` block
   * carries `claimCheckLocation`. The side payload is the wrapped
   * `{"key":null,"value":"<b64>"}` ClaimCheckMessage (common/message.go —
   * canal messages have a nil key) by default, or with
   * `claim-check-raw-value` the full message bytes VERBATIM
   * (claim_check.go:86-95; decoders branch on the mode,
   * canal_json_decoder.go:183-189).
   *
   * DEVIATION (same as the open-protocol path): content-addressed file
   * names (md5 of the full message) instead of UUIDv4 — idempotent under
   * at-least-once replay.
   *
   * Returns (message, location, payload); location/payload NULL for
   * inline-sized messages.
   */
  /** `,"_tidb":<ext>` appended to a canal message — the TiDB extension
    * block (encoder :256-279). */
  private def withExt(msg: Column, ext: Column): Column =
    concat(regexp_replace(msg, "\\}$", ""), lit(",\"_tidb\":"), ext, lit("}"))

  /** Canal-JSON with the `_tidb` extension carrying commitTs — the
    * enable-tidb-extension form every large-message mode requires. */
  def canalJsonTidb(specs: Seq[ColumnSpec],
                    opts: CodecOpts = CodecOpts()): Column =
    withExt(canalJsonWith(specs, opts),
      to_json(struct(col("commit_ts").as("commitTs"))))

  def canalJsonClaimCheck(specs: Seq[ColumnSpec], maxBytes: Int,
                          handle: LargeMessageHandle)
      : (Column, Column, Column) =
    canalJsonClaimCheck(specs, maxBytes, handle, canalJsonTidb(specs))

  /** Overload taking the PRE-STAGED full message column (r20): the
    * returned triple references `full` from the length gate, the md5
    * location, the payload and the in-stream fallback — inlining the
    * whole canal+ext encoder at each of those sites re-encoded the
    * message 4-5× per row. Callers stage `withColumn("_full", …)` and
    * pass the attribute. */
  def canalJsonClaimCheck(specs: Seq[ColumnSpec], maxBytes: Int,
                          handle: LargeMessageHandle, full: Column)
      : (Column, Column, Column) = {
    require(handle.option == "claim-check",
      s"canalJsonClaimCheck requires the claim-check option, got ${handle.option}")
    handle.validate("canal-json", enableTiDBExtension = true)
    val hs = specs.filter(_.isHandle)
    val big = length(full) > maxBytes
    val location = concat(
      lit(handle.claimCheckStorageUri.stripSuffix("/") + "/"),
      md5(full), lit(".json"))
    // handle-key-only in-stream message: hs images/maps on every op
    val hImg = to_json(
      array(struct(hs.map(s => MySqlTypes.canalValue(s, eff(s)).as(s.name)): _*)),
      jsonOpts)
    val hOld = when(col("op") === "U", to_json(
      array(struct(hs.map(s => MySqlTypes.canalValue(s, b(s)).as(s.name)): _*)),
      jsonOpts)).otherwise("null")
    val inStream = withExt(
      concat(regexp_replace(canalHeader(specs, hs), "\\}$", ""),
        lit(",\"data\":"), hImg, lit(",\"old\":"), hOld, lit("}")),
      to_json(struct(col("commit_ts").as("commitTs"),
        location.as("claimCheckLocation"))))
    val payload =
      if (handle.claimCheckRawValue) when(big, full)
      else when(big, concat(lit("{\"key\":null,\"value\":\""),
        MySqlTypes.b64(encode(full, "UTF-8")), lit("\"}")))
    (when(big, inStream).otherwise(full), when(big, location), payload)
  }

  // ---- E1: Open Protocol ----------------------------------------------

  /** Generic Open-Protocol value: per-column `{t, h?, f, v}` wrappers
    * (internal/column.go:28-68 — `h` present only on handle columns,
    * mirroring its omitempty), native-typed values. */
  def openProtocolValue(specs: Seq[ColumnSpec]): Column = {
    def colStruct(s: ColumnSpec, v: Column): Column = {
      val fields = Seq(lit(MySqlTypes.mysqlTypeCode(s)).as("t")) ++
        (if (s.isHandle) Seq(lit(true).as("h")) else Nil) ++
        Seq(lit(MySqlTypes.columnFlags(s)).as("f"),
          MySqlTypes.nativeValue(s, v).as("v"))
      struct(fields: _*)
    }
    def img(v: ColumnSpec => Column): Column =
      struct(specs.map(s => colStruct(s, v(s)).as(s.name)): _*)
    to_json(struct(
      when(col("op") =!= "D", img(a)).as("u"),
      when(col("op") === "D", img(b)).as("d")), jsonOpts)
  }

  /**
   * Open Protocol with the pruning options (open_protocol_message.go:
   * 130-167): `output-old-value` emits the `p` pre-image block on UPDATE;
   * `only-output-updated-columns` then drops from `p` every column whose
   * value null-safe-equals the new image (dropNotUpdatedColumns:83-99 —
   * the UPDATE `u` block stays full); `delete-only-output-handle-key-
   * columns` restricts the `d` block to handle keys (:142-145). Member
   * order u, p, d follows the reference struct (:53-57); absent images
   * render as explicit nulls, consistent with [[openProtocolValue]].
   */
  def openProtocolValueWith(specs: Seq[ColumnSpec], opts: CodecOpts): Column = {
    def colStruct(s: ColumnSpec, v: Column): Column = {
      val fields = Seq(lit(MySqlTypes.mysqlTypeCode(s)).as("t")) ++
        (if (s.isHandle) Seq(lit(true).as("h")) else Nil) ++
        Seq(lit(MySqlTypes.columnFlags(s)).as("f"),
          MySqlTypes.nativeValue(s, v).as("v"))
      struct(fields: _*)
    }
    def img(ss: Seq[ColumnSpec], v: ColumnSpec => Column): Column =
      to_json(struct(ss.map(s => colStruct(s, v(s)).as(s.name)): _*), jsonOpts)
    val u = when(col("op") =!= "D", img(specs, a)).otherwise("null")
    val p =
      if (!opts.openOutputOldValue) lit("null")
      else if (!opts.onlyOutputUpdatedColumns)
        when(col("op") === "U", img(specs, b)).otherwise("null")
      else {
        val frags = specs.map(s =>
          when(!(a(s) <=> b(s)), jsonMember(s.name, colStruct(s, b(s)))))
        when(col("op") === "U",
          concat(lit("{"), concat_ws(",", frags: _*), lit("}")))
          .otherwise("null")
      }
    val dImg =
      if (opts.deleteOnlyHandleKeyColumns) img(specs.filter(_.isHandle), b)
      else img(specs, b)
    val d = when(col("op") === "D", dImg).otherwise("null")
    concat(lit("{\"u\":"), u, lit(",\"p\":"), p, lit(",\"d\":"), d, lit("}"))
  }

  // ---- E6: Maxwell ----------------------------------------------------

  /** Generic Maxwell message: native-typed data/old images. */
  def maxwell(specs: Seq[ColumnSpec]): Column = {
    def img(v: ColumnSpec => Column): Column =
      struct(specs.map(s => MySqlTypes.nativeValue(s, v(s)).as(s.name)): _*)
    val mType = when(col("op") === "I", "insert")
      .when(col("op") === "U", "update").otherwise("delete")
    to_json(struct(
      col("schema_name").as("database"),
      col("table_name").as("table"),
      mType.as("type"),
      col("commit_ts").as("ts"),
      col("start_ts").as("xid"),
      when(col("op") === "D", img(b)).otherwise(img(a)).as("data"),
      when(col("op") === "U", img(b)).as("old")), jsonOpts)
  }

  // ---- E4: CSV --------------------------------------------------------

  /** Per-type CSV cell rendering: strings/temporal/json quoted, numerics
    * and ordinal types bare, bool 1/0, binary per config, NULL as the
    * configured literal (csv_message.go:105-518). */
  def csvValue(cfg: Codecs.CsvConfig, s: ColumnSpec, c: Column): Column = {
    val blobBases = Set("binary", "varbinary", "tinyblob", "blob",
      "mediumblob", "longblob")
    s.base match {
      case _ if s.isBool => when(c.isNull, cfg.nullLiteral)
        .otherwise(when(c, "1").otherwise("0"))
      case bb if blobBases(bb) => Codecs.csvBinaryWith(cfg)(c)
      case "char" | "varchar" | "tinytext" | "text" | "mediumtext" |
           "longtext" | "json" | "date" | "datetime" | "timestamp" | "time" =>
        Codecs.csvQuoteWith(cfg)(c.cast("string"))
      case "vector" => // csv_message.go:366-370: vec.String(), quoted form
        Codecs.csvQuoteWith(cfg)(MySqlTypes.canalValue(s, c))
      case "decimal" | "numeric" =>
        Codecs.csvNumWith(cfg)(MySqlTypes.canalValue(s, c)) // declared (p,s)
      case _ => Codecs.csvNumWith(cfg)(c) // ints, float/double, ordinals
    }
  }

  /** Generic CSV line: op flag, schema, table, commit ts, then every
    * column of the effective image. */
  def csvLine(specs: Seq[ColumnSpec],
              cfg: Codecs.CsvConfig = Codecs.CsvConfig()): Column =
    concat_ws(cfg.delimiter,
      Seq(Codecs.csvQuoteWith(cfg)(col("op")),
        Codecs.csvQuoteWith(cfg)(col("schema_name")),
        Codecs.csvQuoteWith(cfg)(col("table_name")),
        Codecs.csvNumWith(cfg)(col("commit_ts"))) ++
        specs.map(s => csvValue(cfg, s, eff(s))): _*)

  /** CSV row-layout options (csv_message.go:105-148, sink.go:146-147 —
    * terminator defaults to CRLF per RFC 4180). */
  final case class CsvRowOpts(
      includeCommitTs: Boolean = false,
      outputOldValue: Boolean = false,
      outputHandleKey: Boolean = false,
      terminator: String = "\r\n")

  /**
   * The reference's EXACT CSV message layout (csv_message.go encode
   * :105-148): `op, TABLE, SCHEMA` (table before schema — note the
   * q44-family layout predates this fidelity pass and keeps its pinned
   * schema-first order), then optional commit-ts, the `is-updated` flag
   * (true on UPDATE even for the two emitted legs) under
   * `output-old-value`, optional handle key, then the image cells; every
   * row ends with the terminator. With `output-old-value`, an UPDATE
   * emits TWO terminated rows in one message — the old image as "D",
   * the new as "I" (:107-115) — so downstream mergers can replay it as
   * delete+insert.
   */
  /**
   * The once-per-batch CSV header row (`output-field-header`,
   * csv_message.go encodeHeader:492-518): `ticdc-meta$…` names for the
   * meta columns present under the current options, then the raw column
   * names — note the reference writes NO header entry for the optional
   * handle-key column (its own asymmetry, mirrored here). Header cells
   * are unquoted regardless of the quote config.
   */
  def csvHeaderRef(specs: Seq[ColumnSpec],
                   cfg: Codecs.CsvConfig = Codecs.CsvConfig(),
                   opts: CsvRowOpts = CsvRowOpts()): String = {
    val meta = Seq("ticdc-meta$operation", "ticdc-meta$table",
      "ticdc-meta$schema") ++
      (if (opts.includeCommitTs) Seq("ticdc-meta$commit-ts") else Nil) ++
      (if (opts.outputOldValue) Seq("ticdc-meta$is-update") else Nil)
    (meta ++ specs.map(_.name)).mkString(cfg.delimiter) + opts.terminator
  }

  def csvLinesRef(specs: Seq[ColumnSpec],
                  cfg: Codecs.CsvConfig = Codecs.CsvConfig(),
                  opts: CsvRowOpts = CsvRowOpts()): Column = {
    val handleSpec = specs.find(_.isHandle)
    def meta(opStr: Column, v: ColumnSpec => Column): Seq[Column] =
      Seq(Codecs.csvQuoteWith(cfg)(opStr),
        Codecs.csvQuoteWith(cfg)(col("table_name")),
        Codecs.csvQuoteWith(cfg)(col("schema_name"))) ++
        (if (opts.includeCommitTs)
          Seq(Codecs.csvNumWith(cfg)(col("commit_ts"))) else Nil) ++
        (if (opts.outputOldValue) // fmt %v of a Go bool: bare true/false
          Seq(when(col("op") === "U", "true").otherwise("false")) else Nil) ++
        // each leg's handle key comes from its OWN image — on a pk-moving
        // UPDATE the "D" leg must name the OLD key or a merger replaying
        // delete+insert deletes the wrong row
        (if (opts.outputHandleKey)
          handleSpec.map(h => Codecs.csvQuoteWith(cfg)(
            MySqlTypes.canalValue(h, v(h)))).toSeq
        else Nil)
    def row(opStr: Column, v: ColumnSpec => Column): Column =
      concat(concat_ws(cfg.delimiter,
        meta(opStr, v) ++ specs.map(s => csvValue(cfg, s, v(s))): _*),
        lit(opts.terminator))
    val single = row(col("op"), eff)
    if (!opts.outputOldValue) single
    else when(col("op") === "U", concat(row(lit("D"), b), row(lit("I"), a)))
      .otherwise(single)
  }

  // ---- E5: Debezium with the Connect schema block ---------------------

  /** The static Connect field list for one image struct. */
  private def connectFields(specs: Seq[ColumnSpec]): String =
    specs.map(MySqlTypes.connectField).mkString("[", ",", "]")

  /** Debezium source-block fields (debezium/codec.go:985-1007). */
  private def sourceStruct(clusterId: String): Column = struct(
    lit("2.4.0.Final").as("version"),
    lit("graft").as("connector"),
    lit(clusterId).as("name"),
    col("commit_ts").as("ts_ms"),
    lit("false").as("snapshot"),
    col("schema_name").as("db"),
    col("table_name").as("table"),
    lit(0L).as("server_id"),
    lit(null).cast("string").as("gtid"),
    lit("").as("file"),
    lit(0L).as("pos"),
    lit(0L).as("row"),
    lit(0L).as("thread"),
    lit(null).cast("string").as("query"),
    col("commit_ts").as("commit_ts"),
    lit(clusterId).as("cluster_id"))

  /**
   * Full Debezium envelope `{"payload":…,"schema":…}` — the payload half
   * with Connect-typed values and the per-field `schema` descriptor block
   * every Kafka-Connect consumer requires (debezium/codec.go:949-1140).
   * The schema block is static per table schema except the
   * `<cluster>.<db>.<table>` name prefixes, which concat in per row.
   */
  def debezium(specs: Seq[ColumnSpec], clusterId: String = "graft"): Column = {
    def img(v: ColumnSpec => Column): Column =
      struct(specs.map(s => MySqlTypes.debeziumValue(s, v(s)).as(s.name)): _*)
    val payload = to_json(struct(
      sourceStruct(clusterId).as("source"),
      col("commit_ts").as("ts_ms"),
      lit(null).cast("string").as("transaction"),
      when(col("op") === "I", "c").when(col("op") === "U", "u").otherwise("d")
        .as("op"),
      when(col("op") =!= "I", img(b)).as("before"),
      when(col("op") =!= "D", img(a)).as("after")), jsonOpts)
    val topicName = concat(lit(clusterId + "."), col("schema_name"), lit("."),
      col("table_name"))
    val fieldsJson = connectFields(specs)
    def imageSchema(field: String): Column = concat(
      lit(s"""{"type":"struct","optional":true,"fields":$fieldsJson,"name":""""),
      topicName, lit(s""".Value","field":"$field"}"""))
    val sourceSchema =
      """{"type":"struct","optional":false,"name":"io.debezium.connector.mysql.Source","field":"source"}"""
    val schemaJson = concat(
      lit("""{"type":"struct","optional":false,"name":""""),
      topicName,
      lit(s""".Envelope","fields":[$sourceSchema,{"type":"int64","optional":true,"field":"ts_ms"},{"type":"string","optional":true,"field":"transaction"},{"type":"string","optional":false,"field":"op"},"""),
      imageSchema("before"), lit(","), imageSchema("after"), lit("]}"))
    concat(lit("{\"payload\":"), payload, lit(",\"schema\":"), schemaJson,
      lit("}"))
  }

  /**
   * Debezium with the two sink options (pkg/config/sink.go:259,
   * debezium/codec.go:1025-1048):
   *  - `debezium.output-old-value=false` — UPDATE omits the `before`
   *    field entirely (:1039-1041);
   *  - `debezium-disable-schema=true` — the Connect `schema` half is
   *    omitted, the message is `{"payload":…}` only (:1048, and the
   *    reference decoder REJECTS schema-less messages, decoder.go:143-145).
   *
   * Field presence follows the reference writer exactly (:1025-1045):
   * INSERT has no `before` member at all, DELETE writes an explicit
   * `"after":null` — unlike [[debezium]], whose fixed envelope renders
   * both images with explicit nulls (the q41b-pinned form).
   */
  def debeziumWith(specs: Seq[ColumnSpec], clusterId: String = "graft",
                   outputOldValue: Boolean = true,
                   disableSchema: Boolean = false,
                   timeZone: String = "UTC"): Column = {
    // Debezium is the one zone-aware codec (common/config.go:85-86,
    // debezium/codec.go:699-713): DATETIME wall times are interpreted in
    // the configured zone before the epoch-millis conversion. "UTC"
    // reproduces the repo-wide pinned rendering.
    def zonedValue(s: ColumnSpec, c: Column): Column = s.base match {
      case "datetime" if timeZone != "UTC" =>
        (unix_timestamp(to_utc_timestamp(c, timeZone)) * 1000).cast("long")
      case _ => MySqlTypes.debeziumValue(s, c)
    }
    def img(v: ColumnSpec => Column): Column = to_json(
      struct(specs.map(s => zonedValue(s, v(s)).as(s.name)): _*),
      jsonOpts)
    val head = to_json(struct(
      sourceStruct(clusterId).as("source"),
      col("commit_ts").as("ts_ms"),
      lit(null).cast("string").as("transaction"),
      when(col("op") === "I", "c").when(col("op") === "U", "u").otherwise("d")
        .as("op")), jsonOpts)
    val beforeFrag =
      (if (outputOldValue) when(col("op") =!= "I", concat(lit(",\"before\":"), img(b)))
       else when(col("op") === "D", concat(lit(",\"before\":"), img(b))))
        .otherwise("")
    val afterFrag = when(col("op") === "D", ",\"after\":null")
      .otherwise(concat(lit(",\"after\":"), img(a)))
    val payload = concat(regexp_replace(head, "\\}$", ""),
      beforeFrag, afterFrag, lit("}"))
    if (disableSchema) concat(lit("{\"payload\":"), payload, lit("}"))
    else {
      val topicName = concat(lit(clusterId + "."), col("schema_name"),
        lit("."), col("table_name"))
      val fieldsJson = connectFields(specs)
      def imageSchema(field: String): Column = concat(
        lit(s"""{"type":"struct","optional":true,"fields":$fieldsJson,"name":""""),
        topicName, lit(s""".Value","field":"$field"}"""))
      val sourceSchema =
        """{"type":"struct","optional":false,"name":"io.debezium.connector.mysql.Source","field":"source"}"""
      val schemaJson = concat(
        lit("""{"type":"struct","optional":false,"name":""""),
        topicName,
        lit(s""".Envelope","fields":[$sourceSchema,{"type":"int64","optional":true,"field":"ts_ms"},{"type":"string","optional":true,"field":"transaction"},{"type":"string","optional":false,"field":"op"},"""),
        imageSchema("before"), lit(","), imageSchema("after"), lit("]}"))
      concat(lit("{\"payload\":"), payload, lit(",\"schema\":"), schemaJson,
        lit("}"))
    }
  }

  // ---- E3: Avro schema generation with handling modes -----------------

  /** Avro value-handling modes (common/config.go:55-56,118-119 defaults
    * precise/long; avro.go:698-724 decimal, :833-840 unsigned bigint). */
  final case class AvroOpts(
      decimalHandlingMode: String = "precise", // "precise" | "string"
      bigintUnsignedHandlingMode: String = "long") { // "long" | "string"
    require(Seq("precise", "string").contains(decimalHandlingMode),
      s"avro-decimal-handling-mode: $decimalHandlingMode")
    require(Seq("long", "string").contains(bigintUnsignedHandlingMode),
      s"avro-bigint-unsigned-handling-mode: $bigintUnsignedHandlingMode")
  }

  /** `tidb_type` parameter (avro.go type2TiDBType:364-401): base family
    * name, UNSIGNED suffix on int/bigint, TEXT vs BLOB by binary flag. */
  def avroTidbType(s: ColumnSpec): String = {
    val blob = Set("binary", "varbinary", "tinyblob", "blob", "mediumblob",
      "longblob")
    val base = s.base match {
      case _ if s.isBool => "INT"
      case "tinyint" | "smallint" | "mediumint" | "int" | "integer" => "INT"
      case "bigint" => "BIGINT"
      case "float" => "FLOAT"
      case "double" | "real" => "DOUBLE"
      case "bit" => "BIT"
      case "decimal" | "numeric" => "DECIMAL"
      case b if blob(b) => "BLOB"
      case "char" | "varchar" | "tinytext" | "text" | "mediumtext" |
           "longtext" => "TEXT"
      case "enum" => "ENUM"
      case "set" => "SET"
      case "json" => "JSON"
      case "date" => "DATE"
      case "datetime" => "DATETIME"
      case "timestamp" => "TIMESTAMP"
      case "time" => "TIME"
      case "year" => "YEAR"
      case "vector" => "TiDBVECTORFloat32"
      case other => other.toUpperCase
    }
    if (s.unsigned && (base == "INT" || base == "BIGINT")) base + " UNSIGNED"
    else base
  }

  /** One column's Avro schema object (avro.go columnToAvroSchema:645-780):
    * `{"type":…,"connect.parameters":{"tidb_type":…}}` with the
    * decimal / unsigned-bigint modes deciding bytes-logical-decimal vs
    * string and long vs string. */
  def avroColumnSchema(s: ColumnSpec, opts: AvroOpts = AvroOpts()): String = {
    val blob = Set("binary", "varbinary", "tinyblob", "blob", "mediumblob",
      "longblob")
    def obj(tpe: String, extraParams: Seq[(String, String)] = Nil,
            logical: Option[(Int, Int)] = None): String = {
      def esc(v: String) = v.replace("\\", "\\\\").replace("\"", "\\\"")
      val params = (Seq("tidb_type" -> avroTidbType(s)) ++ extraParams)
        .map { case (k, v) => s""""$k":"${esc(v)}"""" }.mkString("{", ",", "}")
      val lg = logical.map { case (p, sc) =>
        s""","logicalType":"decimal","precision":$p,"scale":$sc"""
      }.getOrElse("")
      s"""{"type":"$tpe","connect.parameters":$params$lg}"""
    }
    def declArgs: (Int, Int) = {
      val m = "\\((\\d+)(?:\\s*,\\s*(\\d+))?\\)".r.findFirstMatchIn(s.mysqlType)
      (m.map(_.group(1).toInt).getOrElse(10),
        m.flatMap(x => Option(x.group(2))).map(_.toInt).getOrElse(0))
    }
    s.base match {
      case _ if s.isBool => obj("int")
      case "tinyint" | "smallint" | "mediumint" => obj("int")
      case "int" | "integer" => if (s.unsigned) obj("long") else obj("int")
      case "bigint" =>
        if (s.unsigned && opts.bigintUnsignedHandlingMode == "string")
          obj("string")
        else obj("long")
      case "float" => obj("float")
      case "double" | "real" => obj("double")
      case "bit" =>
        // MySQL's default is bit(1) — declArgs' fallback is decimal's (10)
        val len = "\\((\\d+)\\)".r.findFirstMatchIn(s.mysqlType)
          .map(_.group(1).toInt).getOrElse(1)
        obj("bytes", Seq("length" -> len.toString))
      case "decimal" | "numeric" =>
        if (opts.decimalHandlingMode == "precise")
          obj("bytes", logical = Some(declArgs))
        else obj("string")
      case b if blob(b) => obj("bytes")
      case "enum" | "set" =>
        // EscapeEnumAndSetOptions (helper.go:323-328)
        obj("string", Seq("allowed" ->
          s.members.map(_.replace(",", "\\,")).mkString(",")))
      case "char" | "varchar" | "tinytext" | "text" | "mediumtext" |
           "longtext" | "json" | "date" | "datetime" | "timestamp" |
           "time" | "vector" => obj("string")
      case "year" => obj("int")
      case _ => obj("string")
    }
  }

  /** Avro name sanitization (common/helper.go SanitizeName:342-371, per
    * the Avro spec's [A-Za-z_][A-Za-z0-9_]* names): invalid chars become
    * `_`; a leading digit keeps itself after the replacement char. The Go
    * loop ranges over RUNES, so iterate code points — a supplementary-plane
    * char (one rune, two UTF-16 units) must map to exactly ONE `_`. */
  def avroSanitizeName(name: String): String = {
    val sb = new StringBuilder
    var first = true
    var i = 0
    while (i < name.length) {
      val cp = name.codePointAt(i)
      val validFirst =
        (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') || cp == '_'
      val valid = validFirst || (cp >= '0' && cp <= '9')
      if (first && !validFirst) {
        sb += '_'; if (cp >= '0' && cp <= '9') sb += cp.toChar
      } else if (!valid) sb += '_'
      else sb.appendAll(Character.toChars(cp))
      first = false
      i += Character.charCount(cp)
    }
    sb.result()
  }

  /** Full record schema (avroSchemaTop:345-350): nullable columns wrap in
    * the goavro `["null", …]` union (columns2AvroData:634-640); record,
    * namespace and field names pass through SanitizeName like the
    * reference (helper.go:342-371). */
  def avroRecordSchema(database: String, table: String,
                       specs: Seq[ColumnSpec],
                       opts: AvroOpts = AvroOpts()): String = {
    val fields = specs.map { s =>
      val t0 = avroColumnSchema(s, opts)
      val t = if (s.nullable) s"""["null",$t0]""" else t0
      s"""{"name":"${avroSanitizeName(s.name)}","type":$t}"""
    }.mkString(",")
    s"""{"type":"record","name":"${avroSanitizeName(table)}",""" +
      s""""namespace":"${avroSanitizeName(database)}","fields":[$fields]}"""
  }

  /** Unsigned-bigint VALUE rendering (avro.go:833-840): `long` re-wraps
    * the uint64 bits (values ≥ 2^63 surface negative), `string` renders
    * the true uint64 decimal digits (FormatUint). */
  def avroBigintUnsignedValue(c: Column, mode: String): Column = mode match {
    case "long" => c
    case "string" =>
      when(c >= 0, c.cast("string"))
        .otherwise((c.cast(org.apache.spark.sql.types.DecimalType(21, 0)) +
          lit(new java.math.BigDecimal("18446744073709551616"))).cast("string"))
    case other =>
      throw new IllegalArgumentException(
        s"avro-bigint-unsigned-handling-mode: $other")
  }

  /** Go-JSON string escaping as a Column (the practical subset of
    * encoding/json's default escaper: backslash, quote, the three
    * HTML-safety \\u escapes, and the common control chars — the set a
    * DDL query can realistically contain). Keep in lockstep with
    * [[goWatermarkEscapeSql]]. */
  private def goJsonEscapeCol(c: Column): Column =
    Seq("\\" -> "\\\\", "\"" -> "\\\"", "\n" -> "\\n", "\r" -> "\\r",
      "\t" -> "\\t", "<" -> "\\u003c", ">" -> "\\u003e", "&" -> "\\u0026")
      .foldLeft(c) { case (acc, (from, to)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(from),
          java.util.regex.Matcher.quoteReplacement(to))
      }

  /** DuckDB twin of [[goJsonEscapeCol]] (same replace order; DuckDB
    * single-quoted literals take backslashes verbatim, and the control
    * chars splice via chr() so no raw bytes land in the SQL text). */
  def goWatermarkEscapeSql(e: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    Seq("'\\'" -> "'\\\\'", "'\"'" -> "'\\\"'", "chr(10)" -> "'\\n'",
      "chr(13)" -> "'\\r'", "chr(9)" -> "'\\t'",
      q("<") -> q("\\u003c"), q(">") -> q("\\u003e"), q("&") -> q("\\u0026"))
      .foldLeft(e) { case (acc, (from, to)) =>
        s"replace($acc, $from, $to)"
      }
  }

  /**
   * Avro WATERMARK events (avro.go:254-307 — gated internal-testing
   * surface): with BOTH enable-tidb-extension and the
   * AvroEnableWatermark flag, the encoder emits non-Confluent-framed
   * control messages — a DDL event as `0x01` ++ the Go-JSON
   * `{"query","type","schema","table","commitTs"}` (struct field order,
   * ddlByte avro.go:946), and a checkpoint as `0x02` ++ the big-endian
   * uint64 ts (checkpointByte:947). With either flag off the encoder
   * returns nil — surfaced as NULL. The official Confluent consumer
   * cannot read these (the reference marks them internal-only).
   */
  def avroDdlWatermark(query: Column, ddlType: Column, schemaN: Column,
      tableN: Column, commitTs: Column, enableTiDBExtension: Boolean,
      enableWatermark: Boolean): Column =
    if (!(enableTiDBExtension && enableWatermark))
      lit(null).cast(org.apache.spark.sql.types.BinaryType)
    else concat(unhex(lit("01")), encode(concat(
      lit("{\"query\":\""), goJsonEscapeCol(query),
      lit("\",\"type\":"), ddlType.cast("string"),
      lit(",\"schema\":\""), goJsonEscapeCol(schemaN),
      lit("\",\"table\":\""), goJsonEscapeCol(tableN),
      lit("\",\"commitTs\":"), commitTs.cast("string"), lit("}")), "UTF-8"))

  /** Checkpoint watermark: `0x02` ++ 8 big-endian ts bytes
    * (EncodeCheckpointEvent avro.go:256-271). */
  def avroCheckpointWatermark(ts: Column, enableTiDBExtension: Boolean,
      enableWatermark: Boolean): Column =
    if (!(enableTiDBExtension && enableWatermark))
      lit(null).cast(org.apache.spark.sql.types.BinaryType)
    else unhex(concat(lit("02"), lpad(hex(ts.cast("long")), 16, "0")))

  /** Consumer-side dispatch on the first value byte: 1 → ddl, 2 →
    * checkpoint, 0 → a Confluent-framed row (magic byte). */
  def avroWatermarkKind(value: Column): Column = {
    val b = substring(value, 1, 1)
    when(b === unhex(lit("01")), "ddl")
      .when(b === unhex(lit("02")), "checkpoint")
      .otherwise("row")
  }

  /** Decode the checkpoint ts back (consumer side). */
  def avroCheckpointTs(value: Column): Column =
    conv(hex(substring(value, 2, 8)), 16, 10).cast("long")

  // ---- E7: Simple protocol -------------------------------------------

  /** Generic BOOTSTRAP message: the column list derives from the specs. */
  def simpleBootstrap(specs: Seq[ColumnSpec], schemaVersion: Int): Column =
    to_json(struct(
      lit("BOOTSTRAP").as("type"),
      col("schema_name").as("database"),
      col("table_name").as("table"),
      lit(schemaVersion).as("schemaVersion"),
      array(specs.map(s => struct(
        lit(s.name).as("name"),
        lit(MySqlTypes.simpleDataType(s)).as("dataType"),
        lit(s.nullable).as("nullable"))): _*).as("columns")), jsonOpts)

  /**
   * Simple-protocol large-message handling (simple/encoder.go:70-92,
   * message.go:487-489): an oversized row message is replaced by its
   * handle-key-only form carrying `"handleKeyOnly":true`; under
   * claim-check the FULL message side-writes (wrapped ClaimCheckMessage
   * with a nil key, or verbatim bytes under `claim-check-raw-value` —
   * valid for simple, decoder.go:174) and the in-stream message also
   * carries `claimCheckLocation`. Returns (message, location, payload);
   * location/payload stay NULL for inline messages and for the
   * handle-key-only option.
   */
  def simpleRowLargeMessage(specs: Seq[ColumnSpec], schemaVersion: Int,
                            maxBytes: Int, handle: LargeMessageHandle)
      : (Column, Column, Column) =
    simpleRowLargeMessage(specs, schemaVersion, maxBytes, handle,
      simpleRow(specs, schemaVersion))

  /** Overload taking the PRE-STAGED full message (same rationale as the
    * canalJsonClaimCheck overload — r20). */
  def simpleRowLargeMessage(specs: Seq[ColumnSpec], schemaVersion: Int,
                            maxBytes: Int, handle: LargeMessageHandle,
                            full: Column)
      : (Column, Column, Column) = {
    handle.validate("simple")
    require(handle.option != "none", "large message handling is disabled")
    val big = length(full) > maxBytes
    val hs = specs.filter(_.isHandle)
    def img(v: ColumnSpec => Column): Column =
      struct(hs.map(s => MySqlTypes.nativeValue(s, v(s)).as(s.name)): _*)
    val sType = when(col("op") === "I", "INSERT")
      .when(col("op") === "U", "UPDATE").otherwise("DELETE")
    val isClaimCheck = handle.option == "claim-check"
    val location = concat(
      lit(handle.claimCheckStorageUri.stripSuffix("/") + "/"),
      md5(full), lit(".json"))
    val baseFields = Seq(
      sType.as("type"),
      col("commit_ts").as("commitTs"),
      col("schema_name").as("database"),
      col("table_name").as("table"),
      lit(schemaVersion).as("schemaVersion"),
      when(col("op") =!= "D", img(a)).as("data"),
      when(col("op") =!= "I", img(b)).as("old"),
      lit(true).as("handleKeyOnly"))
    val hMsg = to_json(struct(baseFields ++
      (if (isClaimCheck) Seq(location.as("claimCheckLocation")) else Nil): _*),
      jsonOpts)
    val msg = when(big, hMsg).otherwise(full)
    if (!isClaimCheck) (msg, lit(null).cast("string"), lit(null).cast("string"))
    else {
      val payload =
        if (handle.claimCheckRawValue) when(big, full)
        else when(big, concat(lit("{\"key\":null,\"value\":\""),
          MySqlTypes.b64(encode(full, "UTF-8")), lit("\"}")))
      (msg, when(big, location), payload)
    }
  }

  /** Generic Simple-protocol row message (native-typed images). */
  def simpleRow(specs: Seq[ColumnSpec], schemaVersion: Int): Column = {
    def img(v: ColumnSpec => Column): Column =
      struct(specs.map(s => MySqlTypes.nativeValue(s, v(s)).as(s.name)): _*)
    val sType = when(col("op") === "I", "INSERT")
      .when(col("op") === "U", "UPDATE").otherwise("DELETE")
    to_json(struct(
      sType.as("type"),
      col("commit_ts").as("commitTs"),
      col("schema_name").as("database"),
      col("table_name").as("table"),
      lit(schemaVersion).as("schemaVersion"),
      when(col("op") =!= "D", img(a)).as("data"),
      when(col("op") =!= "I", img(b)).as("old")), jsonOpts)
  }
}
