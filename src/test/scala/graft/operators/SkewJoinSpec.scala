package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted join: result equality with the plain join under heavy key skew,
  * actual spread of the hot key, and left-join miss preservation.
  */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 10k rows, 90% on one hot key
  private def bigDf = spark.range(0, 10000)
    .select(col("id"),
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 50).as("k"))
  private def smallDf = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted

  test("inner salted join equals the plain join under 90% single-key skew") {
    val plain = bigDf.join(smallDf, Seq("k")).select(col("id"), col("k"), col("name"))
    val salted = SkewJoin.saltedJoin(bigDf, smallDf, Seq("k"), salts = 16,
      saltOn = Seq("id")).select(col("id"), col("k"), col("name"))
    assert(canon(salted) == canon(plain))
  }

  test("left salted join preserves misses exactly once") {
    val small = smallDf.where(col("k") < 5) // most keys miss
    val plain = bigDf.join(small, Seq("k"), "left")
      .select(col("id"), col("k"), coalesce(col("name"), lit("-")).as("name"))
    val salted = SkewJoin.saltedJoin(bigDf, small, Seq("k"), salts = 16,
      saltOn = Seq("id"), joinType = "left")
      .select(col("id"), col("k"), coalesce(col("name"), lit("-")).as("name"))
    assert(canon(salted) == canon(plain))
  }

  test("the hot key's rows actually spread across many salts") {
    val salted = bigDf
      .withColumn("__salt", pmod(xxhash64(col("id")), lit(16)).cast("int"))
    val spread = salted.where(col("k") === 7L)
      .select(countDistinct(col("__salt"))).first().getLong(0)
    assert(spread >= 12, s"hot key landed on only $spread of 16 salts")
  }

  // misses both ways: small keeps k<5 and adds keys 100..104 absent from big
  private def smallBoth = smallDf.where(col("k") < 5)
    .union((100L until 105L).map(k => (k, s"dim$k")).toDF("k", "name"))

  private def canonOuter(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, String)] =
    df.select(coalesce(col("k"), lit(-1L)).as("k"),
        coalesce(col("id"), lit(-1L)).as("id"),
        coalesce(col("name"), lit("-")).as("name"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted

  test("right salted join equals the plain right join under skew with misses") {
    val plain = bigDf.join(smallBoth, Seq("k"), "right")
    val salted = SkewJoin.saltedJoin(bigDf, smallBoth, Seq("k"), salts = 16,
      saltOn = Seq("id"), joinType = "right")
    assert(canonOuter(salted) == canonOuter(plain))
  }

  test("full salted join equals the plain full join under skew with misses both ways") {
    val plain = bigDf.join(smallBoth, Seq("k"), "full")
    val salted = SkewJoin.saltedJoin(bigDf, smallBoth, Seq("k"), salts = 16,
      saltOn = Seq("id"), joinType = "full")
    assert(canonOuter(salted) == canonOuter(plain))
  }

  test("an existing __salt column is rejected") {
    val tainted = bigDf.withColumn("__salt", lit(1))
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(tainted, smallDf, Seq("k"), salts = 4)
    }
  }

  test("salts=1 degenerates to the plain join") {
    val plain = bigDf.join(smallDf, Seq("k")).count()
    assert(SkewJoin.saltedJoin(bigDf, smallDf, Seq("k"), salts = 1).count() == plain)
  }
}
