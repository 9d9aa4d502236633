package graft.operators

import java.lang.invoke.{MethodHandle, MethodType}

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.sources.Envelope

/** The `ffi` processor (reference internal/impl/ffi/processor.go:27,
  * impl/impl.go — contract only): dlopen a shared library and invoke a
  * C-ABI function per message. `args_mapping` (Bloblang) produces the
  * argument array; the message body is replaced by the result array —
  * the return value first (unless void), then every `out` parameter's
  * final bytes, matching the reference's result shape.
  *
  * Signature surface (impl.go:30-57): return `void`/`int32`/`int64`;
  * parameters `int32`/`int64`/`byte*`, where `byte*` takes the mapped
  * value's bytes in a native buffer and `out: true` marks buffers the
  * function mutates for harvest after the call (only pointers may be
  * out — processor.go:141).
  *
  * Mechanism: JDK 17's incubating foreign-function API (JEP 412),
  * accessed reflectively so the build doesn't depend on the incubator
  * module (`--add-modules jdk.incubator.foreign` at run time). The
  * downcall MethodHandle is resolved once per JVM per (library,
  * function, signature) and shared across partitions — the reference
  * likewise dlopens once at config-build.
  *
  * Scale shape: args_mapping compiles to one Catalyst projection
  * (distributed, codegen'd); only the trampoline call itself runs in
  * `mapPartitions`. Per-call native buffers come from a confined scope
  * that is closed after harvest — no leak across rows. A lookup or call
  * failure lands on the message error channel.
  */
object Ffi {

  sealed trait RetType { def name: String }
  case object RVoid extends RetType { val name = "void" }
  case object RInt32 extends RetType { val name = "int32" }
  case object RInt64 extends RetType { val name = "int64" }

  sealed trait ParamType { def name: String }
  case object PInt32 extends ParamType { val name = "int32" }
  case object PInt64 extends ParamType { val name = "int64" }
  case object PBytePtr extends ParamType { val name = "byte*" }

  final case class Param(tpe: ParamType, out: Boolean = false) {
    require(!out || tpe == PBytePtr,
      s"only pointers may be out parameters: ${tpe.name}")
  }
  final case class Signature(ret: RetType, params: Seq[Param])

  def retType(s: String): RetType = s match {
    case "void" => RVoid
    case "int32" => RInt32
    case "int64" => RInt64
    case other => throw new IllegalArgumentException(
      s"invalid return type '$other'")
  }
  def paramType(s: String): ParamType = s match {
    case "int32" => PInt32
    case "int64" => PInt64
    case "byte*" => PBytePtr
    case other => throw new IllegalArgumentException(
      s"invalid parameter type '$other'")
  }

  // ── reflective bridge to jdk.incubator.foreign ─────────────────────
  private object Native {
    private def cls(n: String) = Class.forName(s"jdk.incubator.foreign.$n")
    lazy val clinker = cls("CLinker")
    lazy val symLookup = cls("SymbolLookup")
    lazy val memSeg = cls("MemorySegment")
    lazy val memAddr = cls("MemoryAddress")
    lazy val funcDesc = cls("FunctionDescriptor")
    lazy val memLayout = cls("MemoryLayout")
    lazy val scopeCls = cls("ResourceScope")
    lazy val addressable = cls("Addressable")

    lazy val linker: AnyRef =
      clinker.getMethod("getInstance").invoke(null)
    lazy val cInt: AnyRef = clinker.getField("C_INT").get(null)
    lazy val cLong: AnyRef = clinker.getField("C_LONG_LONG").get(null)
    lazy val cPointer: AnyRef = clinker.getField("C_POINTER").get(null)

    private val loaded = mutable.Set.empty[String]
    def load(path: String): Unit = synchronized {
      if (!loaded.contains(path)) { System.load(path); loaded += path }
    }

    def lookup(fn: String): AnyRef = {
      val lk = symLookup.getMethod("loaderLookup").invoke(null)
      val opt = symLookup.getMethod("lookup", classOf[String])
        .invoke(lk, fn).asInstanceOf[java.util.Optional[AnyRef]]
      if (!opt.isPresent)
        throw new IllegalArgumentException(s"unable to find symbol '$fn'")
      opt.get
    }

    private def layout(p: ParamType): AnyRef = p match {
      case PInt32 => cInt
      case PInt64 => cLong
      case PBytePtr => cPointer
    }
    private def carrier(p: ParamType): Class[_] = p match {
      case PInt32 => classOf[Int]
      case PInt64 => classOf[Long]
      case PBytePtr => memAddr
    }

    def downcall(sym: AnyRef, sig: Signature): MethodHandle = {
      val layoutArr = java.lang.reflect.Array.newInstance(
        memLayout, sig.params.length).asInstanceOf[Array[AnyRef]]
      sig.params.zipWithIndex.foreach { case (p, i) =>
        layoutArr(i) = layout(p.tpe)
      }
      val desc = sig.ret match {
        case RVoid => funcDesc.getMethod("ofVoid", layoutArr.getClass)
          .invoke(null, layoutArr)
        case r => funcDesc.getMethod("of", memLayout, layoutArr.getClass)
          .invoke(null, if (r == RInt32) cInt else cLong, layoutArr)
      }
      val retCarrier: Class[_] = sig.ret match {
        case RVoid => classOf[Unit] // java void
        case RInt32 => classOf[Int]
        case RInt64 => classOf[Long]
      }
      val mt = MethodType.methodType(
        if (sig.ret == RVoid) java.lang.Void.TYPE else retCarrier,
        sig.params.map(p => carrier(p.tpe)).toArray)
      clinker.getMethod("downcallHandle", addressable,
          classOf[MethodType], funcDesc)
        .invoke(linker, sym, mt, desc).asInstanceOf[MethodHandle]
    }

    def newScope(): AnyRef =
      scopeCls.getMethod("newConfinedScope").invoke(null)
    def closeScope(s: AnyRef): Unit =
      scopeCls.getMethod("close").invoke(s)
    def allocate(n: Long, scope: AnyRef): AnyRef =
      memSeg.getMethod("allocateNative", classOf[Long], scopeCls)
        .invoke(null, java.lang.Long.valueOf(math.max(n, 1L)), scope)
    def write(seg: AnyRef, bytes: Array[Byte]): Unit =
      if (bytes.nonEmpty) {
        val heap = memSeg.getMethod("ofArray", classOf[Array[Byte]])
          .invoke(null, bytes)
        memSeg.getMethod("copyFrom", memSeg).invoke(seg, heap)
        ()
      }
    def read(seg: AnyRef): Array[Byte] =
      memSeg.getMethod("toByteArray").invoke(seg).asInstanceOf[Array[Byte]]
    def address(seg: AnyRef): AnyRef =
      memSeg.getMethod("address").invoke(seg)
  }

  /** Per-JVM downcall-handle cache (dlopen + symbol + handle once). */
  private val handles =
    mutable.Map.empty[(String, String, Signature), MethodHandle]
  private def handleFor(lib: String, fn: String,
                        sig: Signature): MethodHandle = handles.synchronized {
    handles.getOrElseUpdate((lib, fn, sig), {
      Native.load(lib)
      Native.downcall(Native.lookup(fn), sig)
    })
  }

  /** Invoke once: `args` are Longs (ints) or Array[Byte] (byte*).
    * Returns the result array per the reference's shape.
    */
  def invoke(lib: String, fn: String, sig: Signature,
             args: Seq[Any]): Seq[Any] = {
    require(args.length == sig.params.length,
      s"expected ${sig.params.length} args, got ${args.length}")
    val h = handleFor(lib, fn, sig)
    val scope = Native.newScope()
    try {
      val segs = new Array[AnyRef](args.length)
      val jargs = sig.params.zip(args).zipWithIndex.map {
        case ((p, a), i) => p.tpe match {
          case PInt32 => java.lang.Integer.valueOf(asLong(a).toInt)
          case PInt64 => java.lang.Long.valueOf(asLong(a))
          case PBytePtr =>
            val bytes = asBytes(a)
            val seg = Native.allocate(bytes.length.toLong, scope)
            Native.write(seg, bytes)
            segs(i) = seg
            Native.address(seg)
        }
      }
      val ret = h.invokeWithArguments(jargs: _*)
      val retPart: Seq[Any] = sig.ret match {
        case RVoid => Nil
        case RInt32 => Seq(ret.asInstanceOf[Int].toLong)
        case RInt64 => Seq(ret.asInstanceOf[Long])
      }
      retPart ++ sig.params.zipWithIndex.collect {
        case (p, i) if p.out => Native.read(segs(i))
      }
    } finally Native.closeScope(scope)
  }

  private def asLong(a: Any): Long = a match {
    case n: Long => n
    case n: Int => n.toLong
    case n: java.math.BigDecimal => n.longValueExact()
    case d: Double if d == math.rint(d) => d.toLong
    case s: String => s.toLong
    case other => throw new IllegalArgumentException(
      s"expected integer argument, got $other")
  }
  private def asBytes(a: Any): Array[Byte] = a match {
    case b: Array[Byte] => b
    case s: String => s.getBytes("UTF-8")
    case other => throw new IllegalArgumentException(
      s"expected bytes/string argument, got $other")
  }

  /** The processor: per message, evaluate `argsMapping` (Bloblang → an
    * array), downcall, and replace the body with the JSON result array
    * (return value first unless void, then each out buffer as UTF-8).
    */
  def processor(df0: DataFrame, libraryPath: String, functionName: String,
                sig: Signature, argsMapping: String): DataFrame = {
    // driver-side fail-fast: dlopen + symbol + handle construction
    handleFor(libraryPath, functionName, sig)

    val df = Envelope.ensure(df0)
    val metaCol =
      if (df.columns.contains(Envelope.MetadataCol)) Some(Envelope.MetadataCol)
      else None
    // args_mapping is written as a one-statement mapping (`root = […]`,
    // processor.go:67 example); compile the RHS as the args expression
    val exprSrc = {
      val rootForm = "(?s)^\\s*root\\s*=\\s*(.*)$".r
      argsMapping match {
        case rootForm(rhs) => rhs
        case other => other
      }
    }
    val argsExpr = graft.blobl.Blobl.exprJson(df, exprSrc,
      metadataCol = metaCol)
    val argsJson: Column = {
      val dt = df.select(argsExpr.as("a")).schema.head.dataType
      dt match {
        case StringType => argsExpr
        case _: ArrayType => to_json(argsExpr)
        case _ => to_json(argsExpr) // variant and friends
      }
    }
    val staged = df.withColumn("__ffi_args", argsJson)
    val schema = df.schema
    val vIdx = schema.fieldIndex(Envelope.ValueCol)
    val eIdx = schema.fieldIndex(Envelope.ErrorCol)
    val aIdx = staged.schema.fieldIndex("__ffi_args")
    val (lib, fn, s) = (libraryPath, functionName, sig)

    staged.mapPartitions { rows =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      rows.map { row =>
        val vals = row.toSeq.take(schema.length).toArray
        try {
          val argsNode = mapper.readTree(row.getString(aIdx))
          require(argsNode.isArray, "args_mapping must return an array")
          val args = (0 until argsNode.size()).map { i =>
            val n = argsNode.get(i)
            if (n.isTextual) n.asText()
            else if (n.isIntegralNumber) n.asLong()
            else if (n.isNumber && n.asDouble() == math.rint(n.asDouble()))
              n.asDouble().toLong // blobl number() yields doubles
            else throw new IllegalArgumentException(
              s"unsupported argument ${n.getNodeType} at $i")
          }
          val out = invoke(lib, fn, s, args)
          val arr = mapper.createArrayNode()
          out.foreach {
            case n: Long => arr.add(n); ()
            case b: Array[Byte] => arr.add(new String(b, "UTF-8")); ()
            case other => arr.add(String.valueOf(other)); ()
          }
          vals(vIdx) = mapper.writeValueAsString(arr)
        } catch {
          case e: Exception => vals(eIdx) = s"ffi: ${e.getMessage}"
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(ExpressionEncoder(RowEncoder.encoderFor(schema)))
  }
}
