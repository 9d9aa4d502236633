package graft.blobl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-3 method surface: assign/diff/patch/infer_schema/vector,
  * dynamic `bloblang`, and the RS/ES JWT families.
  */
class MethodsRound3Spec extends SparkSpec {

  private def doc(json: String): DataFrame = {
    import spark.implicits._
    Seq(json).toDF("value")
  }

  private def mapOne(json: String, mapping: String): String =
    Blobl.mapping(doc(json), mapping).select("value").head().getString(0)

  test("assign overrides on conflict and concatenates arrays") {
    assert(mapOne(
      """{"foo":{"first_name":"fooer","likes":"bars"},"bar":{"second_name":"barer","likes":"foos"}}""",
      "root = this.foo.assign(this.bar)") ==
      """{"first_name":"fooer","likes":"foos","second_name":"barer"}""")
    assert(mapOne("""{"defaults":{"timeout":30,"retries":3},"user_settings":{"timeout":60}}""",
      "root.config = this.defaults.assign(this.user_settings)") ==
      """{"config":{"retries":3,"timeout":60}}""")
    assert(mapOne("""{"a":[1,2],"b":[3]}""", "root = this.a.assign(this.b)") ==
      "[1,2,3]")
  }

  test("diff emits the r3 changelog; patch applies it back") {
    assert(mapOne(
      """{"before":{"name":"Alice","age":30},"after":{"name":"Alice","age":31,"city":"NYC"}}""",
      "root.changes = this.before.diff(this.after)") ==
      """{"changes":[{"From":30,"Path":["age"],"To":31,"Type":"update"},{"From":null,"Path":["city"],"To":"NYC","Type":"create"}]}""")
    assert(mapOne(
      """{"old_config":{"debug":true,"timeout":30},"new_config":{"timeout":60}}""",
      "root.changelog = this.old_config.diff(this.new_config)") ==
      """{"changelog":[{"From":true,"Path":["debug"],"To":null,"Type":"delete"},{"From":30,"Path":["timeout"],"To":60,"Type":"update"}]}""")
    // patch(diff) reconstructs the after state
    assert(mapOne(
      """{"current":{"name":"Alice","age":30},"changelog":[{"Type":"update","Path":["age"],"From":30,"To":31},{"Type":"create","Path":["city"],"From":null,"To":"NYC"}]}""",
      "root.updated = this.current.patch(this.changelog)") ==
      """{"updated":{"age":31,"city":"NYC","name":"Alice"}}""")
    assert(mapOne("""{"a":{"x":1,"y":2},"b":{"x":1,"z":3}}""",
      "root = this.a.patch(this.a.diff(this.b))") ==
      """{"x":1,"z":3}""")
  }

  test("infer_schema describes objects, arrays and scalars") {
    assert(mapOne("""{"d":{"n":1,"s":"x","f":1.5,"b":true,"a":[1],"o":{}}}""",
      "root = this.d.infer_schema()") ==
      """{"properties":{"a":{"items":{"type":"integer"},"type":"array"},""" +
        """"b":{"type":"boolean"},"f":{"type":"number"},"n":{"type":"integer"},""" +
        """"o":{"properties":{},"type":"object"},"s":{"type":"string"}},"type":"object"}""")
  }

  test("vector renders a pgvector literal") {
    assert(mapOne("""{"embeddings":[0.5,1.0,2.25]}""",
      "root.v = this.embeddings.vector()") ==
      """{"v":"[0.5,1,2.25]"}""")
  }

  test("bloblang executes a literal dynamic mapping against the target") {
    assert(mapOne("""{"body":{"foo":"hello world"}}""",
      """root.body = this.body.bloblang("root.foo = this.foo.uppercase()")""") ==
      """{"body":{"foo":"HELLO WORLD"}}""")
  }

  test("RS256 and ES256 JWT sign/parse round-trip on generated keys") {
    def pem(bytes: Array[Byte]): String =
      java.util.Base64.getEncoder.encodeToString(bytes)

    val rsa = java.security.KeyPairGenerator.getInstance("RSA")
    rsa.initialize(2048)
    val rsaKp = rsa.generateKeyPair()
    val rsOut = mapOne("""{"claims":{"sub":"ada","n":7}}""",
      s"""root.claims = this.claims.sign_jwt_rs256("${pem(rsaKp.getPrivate.getEncoded)}").parse_jwt_rs256("${pem(rsaKp.getPublic.getEncoded)}")""")
    assert(rsOut == """{"claims":{"n":7,"sub":"ada"}}""", rsOut)

    val ec = java.security.KeyPairGenerator.getInstance("EC")
    ec.initialize(new java.security.spec.ECGenParameterSpec("secp256r1"))
    val ecKp = ec.generateKeyPair()
    val esOut = mapOne("""{"claims":{"sub":"bob"}}""",
      s"""root.claims = this.claims.sign_jwt_es256("${pem(ecKp.getPrivate.getEncoded)}").parse_jwt_es256("${pem(ecKp.getPublic.getEncoded)}")""")
    assert(esOut == """{"claims":{"sub":"bob"}}""", esOut)
  }
}
