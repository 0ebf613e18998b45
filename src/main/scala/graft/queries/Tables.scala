package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

// Typed views of the driver-generated tables (TESTDATA.md). Timestamps use
// java.sql.Timestamp (micros); parquet ns values truncate on read, which is
// fine — no query keys on sub-micro precision.
case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
    l_quantity: Double, l_extendedprice: Double, l_discount: Double, l_tax: Double,
    l_returnflag: String, l_linestatus: String, l_shipdate: java.sql.Timestamp)
case class Orders(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderdate: java.sql.Timestamp, o_orderpriority: String)
case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
    c_acctbal: Double, c_mktsegment: String)
case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
case class Region(r_regionkey: Int, r_name: String)
case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int, s_acctbal: Double)
case class Part(p_partkey: Long, p_name: String, p_brand: String, p_type: String,
    p_size: Int, p_retailprice: Double)
// ts arrives as nanos-since-epoch long (spark.sql.legacy.parquet.nanosAsLong)
case class Event(event_id: Long, ts: Long, user_id: Long,
    event_type: String, value: Double, props: String)
case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

object Tables {
  def df(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._; df(spark, dir, "lineitem").as[Lineitem]
  }
  def orders(spark: SparkSession, dir: String): Dataset[Orders] = {
    import spark.implicits._; df(spark, dir, "orders").as[Orders]
  }
  def customer(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._; df(spark, dir, "customer").as[Customer]
  }
  def nation(spark: SparkSession, dir: String): Dataset[Nation] = {
    import spark.implicits._; df(spark, dir, "nation").as[Nation]
  }
  def region(spark: SparkSession, dir: String): Dataset[Region] = {
    import spark.implicits._; df(spark, dir, "region").as[Region]
  }
  def supplier(spark: SparkSession, dir: String): Dataset[Supplier] = {
    import spark.implicits._; df(spark, dir, "supplier").as[Supplier]
  }
  def part(spark: SparkSession, dir: String): Dataset[Part] = {
    import spark.implicits._; df(spark, dir, "part").as[Part]
  }
  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._; df(spark, dir, "events").as[Event]
  }
  def documents(spark: SparkSession, dir: String): Dataset[Doc] = {
    import spark.implicits._; df(spark, dir, "documents").as[Doc]
  }
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    df(spark, dir, "embeddings")
}
