package graft.tools

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.expressions.CodecOps

/** Dev harness: time codec kernels driver-side to separate kernel cost
  * from query-plan overhead.
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val schema = "1:event_id:int64,2:event_type:string,3:value:double"
    val docs = (0 until 10000).map(i =>
      UTF8String.fromString(s"""{"event_id":$i,"event_type":"purchase","value":${i * 1.5}}"""))
    // warmup
    docs.take(1000).foreach { d =>
      CodecOps.protoDecode(CodecOps.protoEncode(d, schema), schema)
    }
    var t0 = System.nanoTime()
    docs.foreach { d =>
      CodecOps.protoDecode(CodecOps.protoEncode(d, schema), schema)
    }
    println(f"proto rt x10k: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    t0 = System.nanoTime()
    docs.foreach { d => CodecOps.msgpackDecode(CodecOps.msgpackEncode(d)) }
    println(f"msgpack rt x10k: ${(System.nanoTime() - t0) / 1e9}%.3f s")

    val text = ("the quick brown fox jumps over the lazy dog " * 7).getBytes("UTF-8")
    for (algo <- Seq("gzip", "zstd", "snappy")) {
      CodecOps.decompress(CodecOps.compress(text, algo), algo) // warmup
      val t = System.nanoTime()
      (0 until 5000).foreach { _ =>
        CodecOps.decompress(CodecOps.compress(text, algo), algo)
      }
      println(f"$algo rt x5k: ${(System.nanoTime() - t) / 1e9}%.3f s")
    }
  }
}
