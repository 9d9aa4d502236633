package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalacheck.Gen

import graft.SparkSpec

/** Randomized round-trips for the round-11 hand-rolled codecs — the
  * fuzz that caught the AMQP uint truncation, applied to the rest.
  */
class WireCodecFuzzSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  private val textGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.const(""),
    Gen.const("naïve — ünïcode ✓ 中文"),
    Gen.listOf(Gen.choose('!', '~')).map(_.mkString))

  test("spicedb watch messages round-trip arbitrary strings") {
    (1 to 100).foreach { i =>
      val g = for {
        op <- Gen.oneOf("CREATE", "TOUCH", "DELETE")
        rt <- textGen; rid <- textGen; rel <- textGen
        st <- textGen; sid <- textGen; tok <- Gen.alphaNumStr
      } yield SpiceDb.Update(op, rt, rid, rel, st, sid, tok, 0L)
      val u = sample(g, i.toLong)
      val (got, tok) = SpiceDb.decodeWatchResponse(
        SpiceDb.encodeWatchResponse(u))
      assert(got.size == 1 && tok == u.zedToken)
      assert(got.head.copy(seq = 0L, zedToken = u.zedToken) == u,
        s"seed $i: $u -> ${got.head}")
    }
  }

  test("salesforce fetch requests/responses round-trip") {
    (1 to 100).foreach { i =>
      val g = for {
        topic <- textGen
        preset <- Gen.oneOf(0, 1, 2)
        replay <- Gen.chooseNum(0L, Long.MaxValue)
        n <- Gen.chooseNum(0, Int.MaxValue)
      } yield (topic, preset, replay, n)
      val (t, p, r, n) = sample(g, i.toLong)
      val (t2, p2, r2, n2) = SalesforceCdc.decodeFetchRequest(
        SalesforceCdc.encodeFetchRequest(t, p, r, n))
      assert(t2 == t && p2 == p && n2 == n)
      if (p == SalesforceCdc.PresetCustom) assert(r2 == r)
      val events = (0 until (i % 4)).map(j =>
        (s"id$j", s"schema$j", Array.tabulate[Byte](j * 7)(_.toByte),
          i.toLong * 10 + j))
      val (evs, latest) = SalesforceCdc.decodeFetchResponse(
        SalesforceCdc.encodeFetchResponse(events, i.toLong * 100))
      assert(latest == i.toLong * 100)
      assert(evs.size == events.size)
      evs.zip(events).foreach { case ((id, sc, pl, rp), (id0, sc0, pl0, rp0)) =>
        assert(id == id0 && sc == sc0 && rp == rp0 && pl.toSeq == pl0.toSeq)
      }
    }
  }

  test("bigquery write rows round-trip negatives, unicode, defaults") {
    import graft.sinks.BigQueryWriteApi._
    val fields = Seq(Field("s", "STRING"), Field("n", "INT64"),
      Field("d", "DOUBLE"), Field("b", "BOOL"))
    (1 to 100).foreach { i =>
      val g = for {
        s <- textGen
        n <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
        d <- Gen.oneOf(Gen.chooseNum(-1e12, 1e12),
          Gen.oneOf[Double](0.0, -0.0, Double.MinPositiveValue))
        b <- Gen.oneOf(true, false)
      } yield (s, n, d, b)
      val (s, n, d, b) = sample(g, i.toLong)
      val json = mapper.createObjectNode()
      json.put("s", s); json.put("n", n); json.put("d", d); json.put("b", b)
      val back = mapper.readTree(
        decodeRow(encodeRow(json, fields), fields).toString)
      assert(back.get("s").asText == s, s"seed $i string")
      assert(back.get("n").asLong == n, s"seed $i int64 (negatives!)")
      assert(java.lang.Double.compare(back.get("d").asDouble, d) == 0 ||
        back.get("d").asDouble == d, s"seed $i double")
      assert(back.get("b").asBoolean == b, s"seed $i bool")
    }
  }

  test("iceberg string partition values survive hive path escaping") {
    import spark.implicits._
    import graft.sinks.Iceberg
    // non-ASCII dir names die in the JVM's filesystem layer under the
    // default POSIX charset (Spark's own partitionBy included) — the
    // escaping under test is the hive %XX layer, all-ASCII
    val nasty = Seq("plain", "with space", "a=b", "pct%20enc", "semi;colon",
      "col:on", "q?mark")
    val loc = java.nio.file.Files.createTempDirectory("iceberg_esc").toString
    Iceberg.append(nasty.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("k", "part").repartition(1), loc, partitionCols = Seq("part"))
    val entries = Iceberg.planFiles(spark, loc)
    assert(entries.map(_.partition.head.asInstanceOf[String]).toSet ==
      nasty.toSet, "manifest partition tuples must carry the RAW values")
    val out = Iceberg.readTable(spark, loc).orderBy("k")
      .as[(Long, String)].collect().map(_._2)
    assert(out.toSeq == nasty, "data files round-trip the values")
  }
}
