package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.A2a

/** a2a_message contracts: agent-card resolution, JSON-RPC envelope
  * discipline, task polling to terminal, direct-message replies,
  * error objects on the message error channel.
  */
class A2aSpec extends SparkSpec {
  import spark.implicits._

  private def fresh = "a2at_" + java.util.UUID.randomUUID.toString.replace("-", "")

  private def envelope(values: String*) = values.toSeq.toDF("value")

  test("agent card names the rpc endpoint; send polls the task to completion") {
    val name = fresh
    val agent = A2a.register(name, s => s"echo:$s", workPolls = 3)
    val out = A2a.processor(envelope("hi").coalesce(1), s"mem://$name/card")
      .select("value", "error").collect()
    assert(out.head.getString(0) == "echo:hi")
    assert(out.head.isNullAt(1))
    assert(agent.sends == 1)
    assert(agent.polls == 3, "task reaches terminal on the 3rd tasks/get")
    A2a.drop(name)
  }

  test("direct message replies skip polling entirely") {
    val name = fresh
    val agent = A2a.register(name, _.toUpperCase, direct = true)
    val out = A2a.processor(envelope("abc").coalesce(1), s"mem://$name/card")
      .select("value").as[String].collect()
    assert(out.toSeq == Seq("ABC"))
    assert(agent.polls == 0)
    A2a.drop(name)
  }

  test("extract_text=false returns the full structured result") {
    val name = fresh
    A2a.register(name, s => s, direct = true)
    val out = A2a.processor(envelope("x").coalesce(1), s"mem://$name/card",
        extractText = false)
      .select("value").as[String].collect().head
    assert(out.contains("\"kind\":\"message\""))
    assert(out.contains("\"role\":\"agent\""))
    A2a.drop(name)
  }

  test("rpc error objects land on the message error channel") {
    val name = fresh
    // an agent that errors every task lookup: transform unused
    val badClient: Http.Client = reqs => reqs.map { q =>
      if (q.verb == "GET")
        Http.Response(200, s"""{"url":"mem://$name/rpc"}""")
      else {
        val id = """"id":(\d+)""".r.findFirstMatchIn(q.body)
          .map(_.group(1)).getOrElse("0")
        Http.Response(200,
          s"""{"jsonrpc":"2.0","id":$id,"error":{"code":-32000,"message":"agent exploded"}}""")
      }
    }
    val out = A2a.processor(envelope("x").coalesce(1),
        s"mem://$name/card", client = badClient)
      .select("error").as[String].collect().head
    assert(out.contains("agent exploded"))
    A2a.drop(name)
  }

  test("JSON-RPC id must echo; a mismatched id is a protocol error") {
    val name = fresh
    val badClient: Http.Client = reqs => reqs.map { q =>
      if (q.verb == "GET")
        Http.Response(200, s"""{"url":"mem://$name/rpc"}""")
      else Http.Response(200,
        """{"jsonrpc":"2.0","id":999999,"result":{"kind":"message","parts":[]}}""")
    }
    val out = A2a.processor(envelope("x").coalesce(1),
        s"mem://$name/card", client = badClient)
      .select("error").as[String].collect().head
    assert(out.contains("id"))
    A2a.drop(name)
  }
}
