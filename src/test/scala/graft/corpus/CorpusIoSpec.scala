package graft.corpus

import graft.SparkTestSession
import graft.core.Flow
import graft.sources.{Edn, EdnValue, GraftIO}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Test-for-test port of the reference's functional io corpus
  * (pigpen-core/src/test/clojure/pigpen/functional/io_test.clj, 236 LoC).
  * Each test name carries the reference deftest name; CORPUS.md maps the
  * full corpus. The reference's json fixtures use Clojure's relaxed reader
  * syntax (`{"a" 1}`); the port writes the same documents as standard JSON
  * since the operator under test is the loader, not the Clojure reader.
  * Keyword-vs-string key options (`:key-fn`) have no analog in a columnar
  * schema — the no-options/two-options cases port as schema identity and
  * post-load column transforms.
  */
class CorpusIoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def flow[T: org.apache.spark.sql.Encoder](xs: T*): Flow[T] =
    Flow.of(spark)(xs)

  /** Fresh dir per test (reference harness t/file); Spark sinks want a
    * non-existent target, so hand out a child path.
    */
  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("corpus-io").toFile
    d.deleteOnExit()
    new java.io.File(d, name).getAbsolutePath
  }

  /** Reference harness t/write: one string per line. */
  private def write(lines: Seq[String]): String = {
    val p = tmp("in")
    val f = new java.io.File(p)
    f.getParentFile.mkdirs()
    Files.write(f.toPath, lines.mkString("\n").getBytes("UTF-8"))
    p
  }

  /** Reference harness t/read: the stored lines. */
  private def read(path: String): Seq[String] =
    spark.read.textFile(path).collect().toSeq

  test("test-load-string: normal load string") {
    val file = write(Seq("The quick brown fox", "jumps over the lazy dog"))
    assert(GraftIO.loadString(spark, file).dump().toSet ==
      Set("The quick brown fox", "jumps over the lazy dog"))
  }

  test("test-load-tsv: normal load tsv") {
    val file = write(Seq("a\tb\tc", "1\t2\t3"))
    assert(GraftIO.loadTsv(spark, file).dump().toSet ==
      Set(Seq("a", "b", "c"), Seq("1", "2", "3")))
  }

  test("test-load-tsv-non-tab: load tsv, non-tab") {
    val file = write(Seq("a,b,c", "1,2,3"))
    assert(GraftIO.loadTsv(spark, file, ",").dump().toSet ==
      Set(Seq("a", "b", "c"), Seq("1", "2", "3")))
  }

  test("test-load-tsv-non-tab-with-tabs: comma split leaves tab lines whole") {
    val file = write(Seq("a\tb\tc", "1\t2\t3"))
    assert(GraftIO.loadTsv(spark, file, ",").dump().toSet ==
      Set(Seq("a\tb\tc"), Seq("1\t2\t3")))
  }

  test("test-load-csv-default-seperator-quotes: RFC-4180 doubled quotes") {
    val file = write(Seq("\"a string\",123,5.0", "\"a \"\"complex\"\" string\",-532,23.7"))
    val r = GraftIO.loadCsv(spark, file).collect().map(_.toSeq).toSet
    assert(r == Set(Seq("a string", "123", "5.0"), Seq("a \"complex\" string", "-532", "23.7")))
  }

  test("test-load-csv-non-comma-seperator-different-quotes: mismatched sep keeps lines whole") {
    val file = write(Seq("\"a string\",123,5.0", "\"another string\",-532,23.7"))
    val r = GraftIO.loadCsv(spark, file, sep = ";", quote = "'").collect().map(_.toSeq).toSet
    assert(r == Set(Seq("\"a string\",123,5.0"), Seq("\"another string\",-532,23.7")))
  }

  test("test-load-csv-semicolon-delimiter-single-quotor") {
    val file = write(Seq("'a string';123;5.0", "'another string';-532;23.7"))
    val r = GraftIO.loadCsv(spark, file, sep = ";", quote = "'").collect().map(_.toSeq).toSet
    assert(r == Set(Seq("a string", "123", "5.0"), Seq("another string", "-532", "23.7")))
  }

  private val cljDocs = Set[EdnValue](
    Edn.parse("{:a 1, :b \"foo\"}"),
    Edn.parse("{:a 2, :b \"bar\"}"))

  test("test-load-clj: normal load clj") {
    val file = write(Seq("{:a 1, :b \"foo\"}", "{:a 2, :b \"bar\"}"))
    assert(GraftIO.loadClj(spark, file).dump().toSet == cljDocs)
  }

  test("test-load-gz: gz input is decompressed transparently") {
    val p = tmp("in.gz")
    new java.io.File(p).getParentFile.mkdirs()
    val o = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(p))
    o.write("{:a 1, :b \"foo\"}\n{:a 2, :b \"bar\"}".getBytes("UTF-8"))
    o.close()
    assert(GraftIO.loadClj(spark, p).dump().toSet == cljDocs)
  }

  test("test-load-json: normal load json") {
    val file = write(Seq("{\"a\": 1, \"b\": \"foo\"}", "{\"a\": 2, \"b\": \"bar\"}"))
    val r = GraftIO.loadJson(spark, file).select("a", "b").as[(Long, String)].collect().toSet
    assert(r == Set((1L, "foo"), (2L, "bar")))
  }

  test("test-load-json-no-options: schema is taken as-is") {
    val file = write(Seq("{\"a\": 1, \"b\": \"foo\"}", "{\"a\": 2, \"b\": \"bar\"}"))
    val df = GraftIO.loadJson(spark, file)
    assert(df.columns.toSeq == Seq("a", "b"))
    assert(df.count() == 2)
  }

  test("test-load-json-two-options: post-load column transforms (:key-fn/:value-fn analog)") {
    val file = write(Seq("{\"a\": 1, \"b\": \"foo\"}", "{\"a\": 2, \"b\": \"bar\"}"))
    val r = GraftIO.loadJson(spark, file)
      .select((col("a") * col("a")).as("a"), length(col("b")).cast("long").as("b"))
      .as[(Long, Long)].collect().toSet
    assert(r == Set((1L, 3L), (4L, 3L)))
  }

  test("test-load-lazy: lazy-seq loader is the tsv relation") {
    val file = write(Seq("a\tb\tc", "1\t2\t3"))
    assert(GraftIO.loadTsv(spark, file).dump().toSet ==
      Set(Seq("a", "b", "c"), Seq("1", "2", "3")))
  }

  test("test-store-string: normal store string (non-strings via str)") {
    val out = tmp("out")
    GraftIO.storeString(out)(flow("The quick brown fox", "jumps over the lazy dog"))
    assert(read(out).toSet == Set("The quick brown fox", "jumps over the lazy dog"))
    // reference stores 42 and :foo as their printed forms
    val out2 = tmp("out2")
    GraftIO.storeString(out2)(flow(42))
    assert(read(out2) == Seq("42"))
  }

  test("test-store-tsv: normal store tsv") {
    val out = tmp("out")
    GraftIO.storeTsv(out)(flow(Seq("1", "foo", ":a"), Seq("2", "bar", ":b")))
    assert(read(out).toSet == Set("1\tfoo\t:a", "2\tbar\t:b"))
  }

  test("test-store-clj: normal store clj") {
    implicit val e: org.apache.spark.sql.Encoder[EdnValue] =
      org.apache.spark.sql.Encoders.kryo[EdnValue]
    val out = tmp("out")
    GraftIO.storeClj(out)(Flow.of(spark)(cljDocs.toSeq))
    assert(read(out).toSet == Set("{:a 1, :b \"foo\"}", "{:a 2, :b \"bar\"}"))
  }

  test("test-store-json: normal store json") {
    val out = tmp("out")
    GraftIO.storeJson(out)(Seq((1L, "foo"), (2L, "bar")).toDF("a", "b"))
    assert(read(out).toSet == Set("{\"a\":1,\"b\":\"foo\"}", "{\"a\":2,\"b\":\"bar\"}"))
  }
}
