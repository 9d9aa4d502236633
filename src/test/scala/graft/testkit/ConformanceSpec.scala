package graft.testkit

import java.io.File

import graft.SparkSpec

/** Runs every declarative YAML test file under
  * src/test/resources/conformance/ through [[DeclarativeTest]] — the
  * ported form of the reference's `benthos test` harness
  * (docs/modules/configuration/pages/unit_testing.adoc:18-200).
  */
class ConformanceSpec extends SparkSpec {

  private val dir = new File("src/test/resources/conformance")

  private val files = {
    def walk(d: File): Seq[File] = Option(d.listFiles())
      .getOrElse(Array.empty[File]).toSeq
      .flatMap(f => if (f.isDirectory && f.getName != "schema" &&
        f.getName != "files") walk(f) else Seq(f))
    walk(dir).filter(_.getName.endsWith("_test.yaml")).sortBy(_.getName)
  }

  assert(files.nonEmpty, s"no conformance fixtures found in $dir")

  for (f <- files; tc <- DeclarativeTest.load(f.getPath)) {
    test(s"${f.getName}: ${tc.name}") {
      val failures = DeclarativeTest.run(spark, tc)
      assert(failures.isEmpty, failures.mkString("; "))
    }
  }
}
