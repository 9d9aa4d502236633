package graft.functions

import graft.SparkSpec
import graft.functions.expressions.Argon2Ops

/** Argon2 kernel against the REFERENCE's own published vectors
  * (internal/impl/crypto/argon2_test.go:27-28 — password
  * "some-fancy-secret", salt "salty-mcsaltface", m=4096,t=3,p=1),
  * plus the compare_argon2 bloblang surface and the strict-parse
  * error cases the reference tests.
  */
class Argon2Spec extends SparkSpec {

  private val id2 =
    "$argon2id$v=19$m=4096,t=3,p=1$c2FsdHktbWNzYWx0ZmFjZQ$XTu19IC4rYL/ERsDZr2HOZe9bcMx88ARJ/VVfT2Lb3U"
  private val i2 =
    "$argon2i$v=19$m=4096,t=3,p=1$c2FsdHktbWNzYWx0ZmFjZQ$fyLJGjF+IArVfBnQ6ihK8jQwdNv4sv1aEZGVzBu9oAs"

  test("argon2id reference vector matches") {
    assert(Argon2Ops.compare("some-fancy-secret", id2))
    assert(!Argon2Ops.compare("a-blobs-tale", id2))
  }

  test("argon2i reference vector matches") {
    assert(Argon2Ops.compare("some-fancy-secret", i2))
    assert(!Argon2Ops.compare("wrong", i2))
  }

  test("malformed specs throw (error-channel recoverable)") {
    // argon2d and junk parameters are rejected, like the reference's
    // strict parser (argon2_test.go parse cases)
    for (bad <- Seq(
        "$argon2d$v=19$m=4096,t=3,p=1$c2FsdHktbWNzYWx0ZmFjZQ$XTu19IC4rYL/ERsDZr2HOZe9bcMx88ARJ/VVfT2Lb3U",
        "$argon2id$v=19$m=4096,t=3,p=1$XTu19IC4rYL/ERsDZr2HOZe9bcMx88ARJ/VVfT2Lb3U",
        "$argon2id$v=19$m=4096,t=3,p=1lololol$c2FsdHktbWNzYWx0ZmFjZQ$XTu19IC4rYL/ERsDZr2HOZe9bcMx88ARJ/VVfT2Lb3U"))
      intercept[IllegalArgumentException](Argon2Ops.compare("x", bad))
  }

  test("compare_argon2 bloblang method") {
    import spark.implicits._
    val df = Seq("""{"secret":"some-fancy-secret"}""", """{"secret":"nope"}""")
      .toDF("value")
    val src = s"""root.m = this.secret.compare_argon2("$id2")"""
    val out = graft.blobl.Blobl.mapping(df, src, Map.empty)
      .select("value").as[String].collect().toSeq.sorted
    assert(out == Seq("""{"m":false}""", """{"m":true}""").sorted, out)
  }
}
