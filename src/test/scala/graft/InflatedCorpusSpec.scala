package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The length-inflation recipe's load-bearing claims, asserted directly:
  * the bench lanes' honesty rests on segments never colliding in shingle
  * space (distinct permutations) while planted exact-dup twins survive
  * verbatim (same copy ⇒ same transform).
  */
class InflatedCorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("perm: 128 distinct bijections of the alphabet; perm(0) is the identity") {
    val alpha = InflatedCorpus.Alpha
    val ps = (0 until 128).map(InflatedCorpus.perm)
    assert(ps.distinct.size == 128, "stride-shift permutations must all be distinct")
    assert(ps.head == alpha, "perm(0) must be the identity")
    // each is a true bijection: same char multiset as the alphabet
    assert(ps.forall(_.sorted == alpha.sorted))
  }

  test("docLen build: paragraphs are distinct per doc, twins survive, marker gates reuse") {
    val src = "/root/testdata/sf0.001"
    val out = "target/test_inflated_len"
    // idempotent across runs: a twin left by a previous test execution
    // would make the first ensure() a (correct) reuse, not a build
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val b1 = InflatedCorpus.ensure(spark, src, factor = 2, out, docLen = 4)
    assert(b1.built, "first ensure() must build")
    val b2 = InflatedCorpus.ensure(spark, src, factor = 2, out, docLen = 4)
    assert(!b2.built, "matching marker must be reused, not rebuilt")

    val srcDocs = spark.read.parquet(s"$src/documents.parquet")
    val inf = spark.read.parquet(s"$out/documents.parquet")
    assert(inf.count() == 2 * srcDocs.count(), "factor multiplies row count")

    val parts = inf.select(col("doc_id"), split(col("text"), "\n\n").as("p"))
    assert(parts.where(size(col("p")) =!= 4).count() == 0,
      "every inflated doc carries docLen paragraphs")
    assert(parts.where(size(array_distinct(col("p"))) =!= size(col("p"))).count() == 0,
      "all segments of a doc are distinct permutations (no shingle collisions)")

    // copy 0, segment 0 uses perm(0) = identity: the original text survives
    // verbatim as the first paragraph, so planted exact-dup structure in
    // the SOURCE corpus is preserved in the twin
    val n = srcDocs.count()
    val firstPara = parts.where(col("doc_id") < n)
      .select(col("doc_id"), element_at(col("p"), 1).as("p0"))
    val joined = firstPara.join(srcDocs.select(col("doc_id"), col("text")), "doc_id")
    assert(joined.where(col("p0") =!= col("text")).count() == 0,
      "copy-0 segment-0 must be the identity transform of the source text")
  }
}
