package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The in-process pgvector engine, driven with the EXACT statement
  * texts the reference RAG templates emit
  * (config/rag/templates/pgvector_output.yaml:20-44,
  * pgvector_query.yaml:16-28).
  */
class PgVectorSpec extends AnyFunSuite {

  private val m = new ObjectMapper()
  private def j(s: String) = m.readTree(s)
  private val dsn = "postgres://localhost/unit"

  private val init =
    """CREATE EXTENSION IF NOT EXISTS vector;
      |CREATE TABLE IF NOT EXISTS rag (
      |  topic text,
      |  key text,
      |  chunk_id integer,
      |  document text,
      |  embeddings vector(3),
      |  PRIMARY KEY(topic, key, chunk_id)
      |)""".stripMargin

  private val insertSql =
    "INSERT INTO rag (topic, key, chunk_id, document, embeddings) " +
      "SELECT $1, $2, (chunk->>'chunk_id')::INT, chunk->>'document', " +
      "(chunk->>'embeddings')::text::vector " +
      "FROM jsonb_array_elements($3) AS chunk"

  private val querySql =
    """SELECT (
      |  SELECT STRING_AGG(t2.document, '' ORDER BY chunk_id ASC)
      |  FROM rag t2
      |  WHERE t1.key = t2.key AND t1.topic = t2.topic
      |  GROUP BY key
      |) AS document, key, topic
      |FROM rag t1
      |ORDER BY embeddings <-> $1
      |LIMIT 3""".stripMargin

  private def seed(): Unit = {
    PgVector.reset(dsn)
    init.split(";").foreach(s => PgVector.exec(dsn, s, Nil))
    def chunks(k: String, docs: Seq[(String, Seq[Double])]) = {
      val arr = m.createArrayNode()
      docs.zipWithIndex.foreach { case ((d, v), i) =>
        val o = m.createObjectNode()
        o.put("chunk_id", i)
        o.put("document", d)
        o.put("embeddings", v.mkString("[", ",", "]"))
        arr.add(o)
      }
      PgVector.exec(dsn, insertSql,
        Seq(j("\"t\""), j("\"" + k + "\""), arr))
    }
    chunks("a", Seq(("Aaa ", Seq(1.0, 0, 0)), ("tail-a", Seq(0.9, 0.1, 0))))
    chunks("b", Seq(("Bbb ", Seq(0, 1.0, 0)), ("tail-b", Seq(0, 0.9, 0.1))))
    chunks("c", Seq(("Ccc", Seq(0, 0, 1.0))))
  }

  test("insert via jsonb_array_elements, delete by tuple, re-insert") {
    seed()
    assert(PgVector.table(dsn, "rag").get.rows.size == 5)
    PgVector.exec(dsn, "DELETE FROM rag WHERE (topic, key) = ($1, $2)",
      Seq(j("\"t\""), j("\"b\"")))
    assert(PgVector.table(dsn, "rag").get.rows.size == 3)
    // duplicate PK errors (the template's DELETE-then-INSERT contract)
    val e = intercept[IllegalArgumentException] {
      PgVector.exec(dsn, insertSql, Seq(j("\"t\""), j("\"a\""),
        j("""[{"chunk_id": 0, "document": "x", "embeddings": "[0,0,0]"}]""")))
    }
    assert(e.getMessage.contains("duplicate key"))
  }

  test("top-k by L2 with correlated STRING_AGG reassembly") {
    seed()
    val res = PgVector.exec(dsn, querySql, Seq(j("\"[0.95,0.05,0]\"")))
    assert(res.size == 3)
    // nearest chunk is key a / chunk 0; its reassembled document is the
    // ordered concat of BOTH a-chunks
    assert(res.head.get("key").asText == "a")
    assert(res.head.get("document").asText == "Aaa tail-a")
    assert(res.head.get("topic").asText == "t")
    // second-nearest is a's other chunk — same reassembled document
    assert(res(1).get("key").asText == "a")
    assert(res(1).get("document").asText == "Aaa tail-a")
  }

  test("cosine and inner-product operators order correctly") {
    seed()
    val cos = PgVector.exec(dsn,
      "SELECT key FROM rag t1 ORDER BY embeddings <=> $1 LIMIT 1",
      Seq(j("\"[0,2,0.1]\"")))
    assert(cos.head.get("key").asText == "b")
    val ip = PgVector.exec(dsn,
      "SELECT key FROM rag t1 ORDER BY embeddings <#> $1 LIMIT 1",
      Seq(j("\"[0,0,5]\"")))
    assert(ip.head.get("key").asText == "c")
  }

  test("unsupported statement shapes fail loudly") {
    seed()
    val e = intercept[IllegalArgumentException] {
      PgVector.exec(dsn, "UPDATE rag SET document = $1", Seq(j("\"x\"")))
    }
    assert(e.getMessage.contains("not supported"))
  }
}
