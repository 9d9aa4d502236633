package graft.functions.expressions

import org.apache.spark.unsafe.types.UTF8String

/** Unique-id format kernels (reference bloblang functions
  * ksuid/ulid/snowflake_id, functions.adoc general section). Pure
  * functions of (time, entropy) inputs — the nondeterminism lives in
  * the Catalyst builtins (current_timestamp/uuid) that feed them, so
  * the expressions stay deterministic-given-inputs and codegen-safe.
  */
object IdOps {

  private val Crockford = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
  private val Base62 =
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

  private def hexBytes(hex: String, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    while (i < n && 2 * i + 1 < hex.length) {
      out(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  /** ULID: 10-char Crockford-base32 of 48-bit millis + 16 chars from
    * 80 bits of entropy (ulid spec layout).
    */
  def ulid(millis: Long, entropyHex: UTF8String): UTF8String = {
    val sb = new StringBuilder(26)
    var i = 9
    val time = new Array[Char](10)
    var t = millis
    while (i >= 0) { time(i) = Crockford(((t & 0x1f)).toInt); t >>>= 5; i -= 1 }
    sb.appendAll(time)
    // 80 entropy bits = 16 base32 chars from 10 bytes
    val e = hexBytes(entropyHex.toString, 10)
    var acc = 0L
    var bits = 0
    e.foreach { b =>
      acc = (acc << 8) | (b & 0xff); bits += 8
      while (bits >= 5) {
        bits -= 5
        sb.append(Crockford(((acc >>> bits) & 0x1f).toInt))
      }
    }
    // 80 bits / 5 = 16 exactly — no remainder
    UTF8String.fromString(sb.toString)
  }

  /** KSUID: 27-char base62 of 20 bytes — 4-byte seconds since the ksuid
    * epoch (2014-05-13T16:53:20Z = 1400000000) + 16 payload bytes.
    */
  def ksuid(epochSec: Long, entropyHex: UTF8String): UTF8String = {
    val ts = (epochSec - 1400000000L).max(0).toInt
    val bytes = new Array[Byte](20)
    bytes(0) = (ts >>> 24).toByte; bytes(1) = (ts >>> 16).toByte
    bytes(2) = (ts >>> 8).toByte; bytes(3) = ts.toByte
    System.arraycopy(hexBytes(entropyHex.toString, 16), 0, bytes, 4, 16)
    // base62 of a 160-bit big-endian integer, left-padded to 27 chars
    var big = BigInt(1, bytes)
    val sb = new StringBuilder
    while (big > 0) { sb.append(Base62((big % 62).toInt)); big /= 62 }
    while (sb.length < 27) sb.append('0')
    UTF8String.fromString(sb.reverse.toString)
  }

  /** Snowflake id: 41-bit millis since the twitter epoch (2010-11-04)
    * << 22 | 22 low entropy bits; returned as the decimal string the
    * reference emits.
    */
  def snowflake(millis: Long, entropyHex: UTF8String): UTF8String = {
    val twepoch = 1288834974657L
    val low = java.lang.Long.parseLong(entropyHex.toString.take(6), 16) & 0x3fffffL
    UTF8String.fromString((((millis - twepoch) << 22) | low).toString)
  }
}

// expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

case class IdFormat(left: Expression, right: Expression, kind: String)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireTypes(prettyName,
      Seq(left.dataType, right.dataType), Seq(LongType, StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = s"graft_$kind"

  override protected def nullSafeEval(a: Any, b: Any): Any = kind match {
    case "ulid" => IdOps.ulid(a.asInstanceOf[Long],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    case "ksuid" => IdOps.ksuid(a.asInstanceOf[Long],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    case "snowflake" => IdOps.snowflake(a.asInstanceOf[Long],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.IdOps.$kind($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
