package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codec Catalyst expressions over [[CodecOps]] kernels. Algorithm /
  * schema arguments are compile-time literals (constructor params), so
  * each expression is a single static call — fully codegen'd, stateless,
  * executor-side only.
  */
case class Compress(child: Expression, algo: String) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(BinaryType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_compress"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.compress(a.asInstanceOf[Array[Byte]], algo)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val algoRef = ctx.addReferenceObj("algo", algo, "java.lang.String")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.compress($a, $algoRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Decompress(child: Expression, algo: String) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(BinaryType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_decompress"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.decompress(a.asInstanceOf[Array[Byte]], algo)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val algoRef = ctx.addReferenceObj("algo", algo, "java.lang.String")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.decompress($a, $algoRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class AvroEncode(child: Expression, schemaJson: String) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_avro_encode"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.avroEncode(a.asInstanceOf[UTF8String], schemaJson)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("schema", schemaJson, "java.lang.String")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.avroEncode($a, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class AvroDecode(child: Expression, schemaJson: String) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(BinaryType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_avro_decode"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.avroDecode(a.asInstanceOf[Array[Byte]], schemaJson)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("schema", schemaJson, "java.lang.String")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.avroDecode($a, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WireEncode(child: Expression, schemaJson: String, schemaId: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_wire_encode"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.wireEncode(a.asInstanceOf[UTF8String], schemaJson, schemaId)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("schema", schemaJson, "java.lang.String")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.wireEncode($a, $ref, $schemaId)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WireDecode(child: Expression, schemaJson: String) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(BinaryType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_wire_decode"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.wireDecode(a.asInstanceOf[Array[Byte]], schemaJson)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("schema", schemaJson, "java.lang.String")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.wireDecode($a, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Provider-resolved wire decode (registry-client path): the Avro
  * schema is looked up from the header id via the serialized
  * [[SchemaProvider]]. Codegen'd — the provider travels as a reference
  * object, the per-row work is one map lookup + the cached-codec
  * decode.
  */
case class WireDecodeProvider(child: Expression, provider: SchemaProvider,
                              lenient: Boolean = false)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(BinaryType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wire_decode_provider"
  private def kernel =
    if (lenient) "wireDecodeProviderLenient" else "wireDecodeProvider"
  override protected def nullSafeEval(a: Any): Any =
    if (lenient)
      CodecOps.wireDecodeProviderLenient(a.asInstanceOf[Array[Byte]], provider)
    else CodecOps.wireDecodeProvider(a.asInstanceOf[Array[Byte]], provider)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("provider", provider,
      "graft.functions.expressions.SchemaProvider")
    // a lenient kernel may return null for a non-null input, which
    // defineCodeGen's non-null contract can't express
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.expressions.CodecOps.$kernel($a, $ref);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Subject-resolved wire encode: subject → latest (id, schema) via the
  * provider (schema_registry_encode.adoc subject field).
  */
case class WireEncodeSubject(child: Expression, subject: String,
                             provider: SchemaProvider)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_wire_encode_subject"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.wireEncodeSubject(a.asInstanceOf[UTF8String], subject, provider)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("subject", subject, "java.lang.String")
    val pRef = ctx.addReferenceObj("provider", provider,
      "graft.functions.expressions.SchemaProvider")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.wireEncodeSubject($a, $sRef, $pRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** geoip_* lookup against a real .mmdb file ([[MmdbReader]] — hand-
  * rolled against the public MaxMind DB spec 2.0; reference
  * methods.adoc:4492-4557). Returns the record JSON or null when the
  * IP has no entry. The db loads once per executor JVM.
  */
case class GeoipLookup(child: Expression, dbPath: String)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_geoip_lookup"
  override protected def nullSafeEval(a: Any): Any =
    MmdbOps.lookupJson(a.asInstanceOf[UTF8String], dbPath)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dbPath", dbPath, "java.lang.String")
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.expressions.MmdbOps.lookupJson($a, $ref);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** compare_bcrypt (methods.adoc credentials section): password vs a
  * `$2a$...` hash via the self-contained [[BcryptOps]] kernel.
  */
case class CompareBcrypt(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName,
      Seq(left.dataType, right.dataType), Seq(StringType, StringType))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_compare_bcrypt"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    BcryptOps.compareU(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.BcryptOps.compareU($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** compare_argon2 (methods.adoc credentials section): password vs an
  * `$argon2(i|id)$...` spec via the self-contained [[Argon2Ops]]
  * kernel (RFC 9106 + RFC 7693 Blake2b).
  */
case class CompareArgon2(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName,
      Seq(left.dataType, right.dataType), Seq(StringType, StringType))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_compare_argon2"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Argon2Ops.compareU(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.Argon2Ops.compareU($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class ParseYaml(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_parse_yaml"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.yamlToJson(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.yamlToJson($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** parquet blob → JSON rows (reference processor_decode.go:76). */
case class ParquetBlobDecode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(BinaryType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_parquet_decode"
  override protected def nullSafeEval(a: Any): Any =
    ParquetBlobOps.decode(a.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.ParquetBlobOps.decode($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** JSON rows → parquet blob (reference processor_encode.go:92). */
case class ParquetBlobEncode(child: Expression, schemaText: String)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_parquet_encode"
  override protected def nullSafeEval(a: Any): Any =
    ParquetBlobOps.encode(a.asInstanceOf[UTF8String], schemaText)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("parquetSchema", schemaText, "java.lang.String")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.ParquetBlobOps.encode($a, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MsgPackEncode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_msgpack_encode"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.msgpackEncode(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.msgpackEncode($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MsgPackDecode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(BinaryType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_msgpack_decode"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.msgpackDecode(a.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.msgpackDecode($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** json_schema validation (processors/json_schema.adoc:26): null when
  * valid, else the first violation — feeds the error-channel pattern
  * (`tryColumn`/`catchErrors`) exactly like the reference marks failed
  * messages.
  */
case class JsonSchemaCheck(child: Expression, schemaJson: String)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_json_schema_check"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.jsonSchemaCheck(a.asInstanceOf[UTF8String], schemaJson)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("schema", schemaJson, "java.lang.String")
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.expressions.CodecOps.jsonSchemaCheck($a, $ref);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ProtoEncode(child: Expression, schema: String) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_proto_encode"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.protoEncode(a.asInstanceOf[UTF8String], schema)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("schema", schema, "java.lang.String")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.protoEncode($a, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ProtoDecode(child: Expression, schema: String) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(BinaryType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_proto_decode"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.protoDecode(a.asInstanceOf[Array[Byte]], schema)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("schema", schema, "java.lang.String")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.protoDecode($a, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class FormatYaml(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_format_yaml"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.jsonToYaml(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.jsonToYaml($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ParseXml(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_parse_xml"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.xmlToJson(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.xmlToJson($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ParseDuration(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_parse_duration"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.parseDuration(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.parseDuration($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class FormatXml(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_format_xml"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.jsonToXml(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.jsonToXml($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ParseDurationIso(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_parse_duration_iso"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.parseDurationIso(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.parseDurationIso($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ReFindObject(child: Expression, pattern: String, all: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_re_find_object"
  override protected def nullSafeEval(a: Any): Any =
    CodecOps.reFindObject(a.asInstanceOf[UTF8String], pattern, all)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pattern", pattern, "java.lang.String")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.reFindObject($a, $ref, $all)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class JwtHs(child: Expression, secret: String, algo: String, sign: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String =
    if (sign) "graft_sign_jwt" else "graft_parse_jwt"
  private def fn = if (sign) "signJwtHs" else "parseJwtHs"
  override protected def nullSafeEval(a: Any): Any =
    if (sign) CodecOps.signJwtHs(a.asInstanceOf[UTF8String],
      org.apache.spark.unsafe.types.UTF8String.fromString(secret), algo)
    else CodecOps.parseJwtHs(a.asInstanceOf[UTF8String],
      org.apache.spark.unsafe.types.UTF8String.fromString(secret), algo)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("secret",
      org.apache.spark.unsafe.types.UTF8String.fromString(secret),
      "org.apache.spark.unsafe.types.UTF8String")
    val al = ctx.addReferenceObj("algo", algo, "java.lang.String")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.CodecOps.$fn($a, $s, $al)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
