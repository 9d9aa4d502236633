package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.BcryptOps

/** bcrypt kernel against the published OpenBSD/jBCrypt test vectors
  * (public domain test suite), plus the compare_bcrypt bloblang
  * surface.
  */
class BcryptSpec extends SparkSpec {

  test("known vectors reproduce byte-for-byte") {
    assert(BcryptOps.hash("", "$2a$06$DCq7YPn5Rq63x1Lad4cll.") ==
      "$2a$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s.")
    assert(BcryptOps.hash("a", "$2a$06$m0CrhHm10qJ3lXRY.5zDGO") ==
      "$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe")
  }

  test("compare accepts the right password and rejects the wrong one") {
    val h = "$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe"
    assert(BcryptOps.compare("a", h))
    assert(!BcryptOps.compare("b", h))
    assert(!BcryptOps.compare("", h))
  }

  test("compare_bcrypt bloblang method") {
    import spark.implicits._
    val df = Seq("""{"secret":"a"}""", """{"secret":"nope"}""").toDF("value")
    val src =
      """root.m = this.secret.compare_bcrypt("$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe")
        |""".stripMargin
    val out = graft.blobl.Blobl.mapping(df, src, Map.empty)
      .select("value").as[String].collect().toSeq.sorted
    assert(out == Seq("""{"m":false}""", """{"m":true}""").sorted, out)
  }
}
