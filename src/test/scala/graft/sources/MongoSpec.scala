package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSpec

/** MongoDB wire-protocol contracts against the loopback server: BSON
  * round-trips (every supported type), the OP_MSG conversation,
  * insert/find with cursor paging via getMore, query operators,
  * update/replace/upsert/delete semantics, the aggregate subset, and
  * the spark input/output components.
  */
class MongoSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private def fresh(): String =
    "mg_" + java.util.UUID.randomUUID.toString.replace("-", "").take(10)

  test("BSON round-trips the supported types byte-faithfully") {
    val doc = mapper.readTree(
      """{"s":"text","i":42,"l":9000000000,"d":1.5,"b":true,
        |"n":null,"nest":{"a":[1,"two",false]},
        |"oid":{"$oid":"507f1f77bcf86cd799439011"},
        |"ts":{"$date":"2024-03-05T13:14:15Z"},
        |"bin":{"$binary":{"base64":"AQID","subType":"00"}}}"""
        .stripMargin.replaceAll("\n", ""))
    val back = Mongo.Bson.decode(Mongo.Bson.encode(doc))
    assert(back.get("s").asText == "text")
    assert(back.get("i").asInt == 42 && back.get("i").isInt,
      "small ints stay int32")
    assert(back.get("l").asLong == 9000000000L && back.get("l").isLong,
      "wide ints promote to int64")
    assert(back.get("d").asDouble == 1.5)
    assert(back.get("b").asBoolean && back.get("n").isNull)
    assert(back.at("/nest/a/0").asInt == 1)
    assert(back.at("/nest/a/1").asText == "two")
    assert(back.at("/oid/$oid").asText == "507f1f77bcf86cd799439011")
    assert(back.at("/ts/$date").asText == "2024-03-05T13:14:15Z")
    assert(back.at("/bin/$binary/base64").asText == "AQID")
  }

  test("insert + find with operators; cursors page through getMore") {
    val name = fresh()
    val srv = Mongo.named(name)
    try {
      val c = Mongo.clientFor(s"mem://$name", "shop")
      try {
        val docs = (0 until 250).map(i =>
          mapper.readTree(s"""{"k":$i,"grp":"${if (i % 2 == 0) "even"
            else "odd"}"}"""))
        assert(c.insert("items", docs) == 250)
        // batchSize 40 forces 7 cursor pages
        val all = c.find("items",
          sort = Some(mapper.readTree("""{"k":1}""")), batchSize = 40)
        assert(all.size == 250)
        assert(all.map(_.get("k").asInt) == (0 until 250))
        assert(all.forall(_.has("_id")), "server assigns ObjectIds")
        // operators
        val gt = c.find("items", mapper.readTree("""{"k":{"$gte":240}}"""))
        assert(gt.size == 10)
        val in = c.find("items",
          mapper.readTree("""{"k":{"$in":[3,7,11]}}"""))
        assert(in.map(_.get("k").asInt).sorted == Seq(3, 7, 11))
        val combined = c.find("items",
          mapper.readTree("""{"grp":"even","k":{"$lt":10}}"""))
        assert(combined.map(_.get("k").asInt).sorted == Seq(0, 2, 4, 6, 8))
      } finally c.close()
    } finally Mongo.drop(name)
  }

  test("update-one ($set/$inc), replace keeps _id, upsert inserts, " +
       "delete-one vs delete-many") {
    val name = fresh()
    Mongo.named(name)
    try {
      val c = Mongo.clientFor(s"mem://$name", "shop")
      try {
        c.insert("acct", Seq(
          mapper.readTree("""{"user":"a","bal":10}"""),
          mapper.readTree("""{"user":"b","bal":20}"""),
          mapper.readTree("""{"user":"b","bal":30}""")))
        // $set + $inc
        val (n1, m1) = c.update("acct",
          mapper.readTree("""{"user":"a"}"""),
          mapper.readTree("""{"$set":{"vip":true},"$inc":{"bal":5}}"""))
        assert(n1 == 1 && m1 == 1)
        val a = c.findOne("acct", mapper.readTree("""{"user":"a"}""")).get
        assert(a.get("bal").asInt == 15 && a.get("vip").asBoolean)
        // replace-one keeps _id
        val idBefore = a.get("_id").toString
        c.update("acct", mapper.readTree("""{"user":"a"}"""),
          mapper.readTree("""{"user":"a","bal":0}"""))
        val a2 = c.findOne("acct", mapper.readTree("""{"user":"a"}""")).get
        assert(a2.get("bal").asInt == 0 && !a2.has("vip"))
        assert(a2.get("_id").toString == idBefore,
          "whole-document replace preserves _id")
        // upsert on a missing filter inserts
        val (n2, _) = c.update("acct",
          mapper.readTree("""{"user":"zz"}"""),
          mapper.readTree("""{"$set":{"user":"zz","bal":1}}"""),
          upsert = true)
        assert(n2 == 1)
        assert(c.findOne("acct",
          mapper.readTree("""{"user":"zz"}""")).isDefined)
        // delete-one removes exactly one of the two 'b' docs
        assert(c.delete("acct",
          mapper.readTree("""{"user":"b"}"""), limit = 1) == 1)
        assert(c.find("acct",
          mapper.readTree("""{"user":"b"}""")).size == 1)
        // delete-many removes the rest
        assert(c.delete("acct",
          mapper.readTree("""{"user":"b"}"""), limit = 0) == 1)
      } finally c.close()
    } finally Mongo.drop(name)
  }

  test("aggregate: $match → $sort → $limit → $project subset") {
    val name = fresh()
    Mongo.named(name)
    try {
      val c = Mongo.clientFor(s"mem://$name", "shop")
      try {
        c.insert("ev", (0 until 20).map(i =>
          mapper.readTree(s"""{"k":$i,"v":${i * 10},"junk":"x"}""")))
        val out = c.aggregate("ev", Seq(
          mapper.readTree("""{"$match":{"k":{"$gte":10}}}"""),
          mapper.readTree("""{"$sort":{"k":-1}}"""),
          mapper.readTree("""{"$limit":3}"""),
          mapper.readTree("""{"$project":{"k":1,"v":1}}""")))
        assert(out.map(_.get("k").asInt) == Seq(19, 18, 17))
        assert(out.forall(d => d.has("v") && !d.has("junk")))
      } finally c.close()
    } finally Mongo.drop(name)
  }

  test("spark components: output inserts per partition; input walks " +
       "the cursor with a filter and surfaces mongodb_* metadata") {
    import org.apache.spark.sql.functions._
    val name = fresh()
    val srv = Mongo.named(name)
    try {
      val df = spark.range(120).selectExpr(
        """concat('{"n":', id, ',"par":', id % 2, '}') AS value""")
        .repartition(4)
      Mongo.write(df, s"mem://$name", "lake", "nums")
      assert(srv.docs("lake", "nums").size == 120)
      val back = Mongo.read(spark, s"mem://$name", "lake", "nums",
        queryJson = """{"par":1}""", sortJson = """{"n":1}""",
        batchSize = 25)
      val rows = back.select(
        get_json_object(col("value"), "$.n").cast("long").as("n"),
        col("metadata")("mongodb_collection").as("coll"))
        .orderBy("n").collect()
      assert(rows.length == 60)
      assert(rows.map(_.getLong(0)).toSeq ==
        (0 until 120).filter(_ % 2 == 1).map(_.toLong))
      assert(rows.forall(_.getString(1) == "nums"))
    } finally Mongo.drop(name)
  }
}
