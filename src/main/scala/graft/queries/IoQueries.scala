package graft.queries

import graft.core.Flow
import graft.sources.{Edn, EdnValue, GraftIO}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink coverage (SURVEY.md §2.2): each loader is exercised as a
  * write→read round-trip whose oracle is a plain SELECT over the original
  * parquet table — if the loader/serializer pair drops, re-types, or
  * reorders anything, the hash comparison fails.
  */
object IoQueries {

  private def tmp(d: String, name: String): String =
    s"/root/repo/target/io_tmp/${name}_${math.abs(d.hashCode)}"

  private def q(name: String, oracle: String = null)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Option(oracle))

  /** load-string / store-string (reference io.clj:59-70, 182-194). */
  private val stringRt = q("q_io_string",
    "SELECT n_name AS value FROM nation") { (s, d) =>
    import s.implicits._
    val path = tmp(d, "string")
    GraftIO.storeString(path)(Flow(Tables.nation(s, d)).map(_.n_name))
    GraftIO.loadString(s, path).toDF
  }

  /** load-tsv / store-tsv (reference io.clj:72-86, 196-212). */
  private val tsvRt = q("q_io_tsv",
    "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier") { (s, d) =>
    import s.implicits._
    val path = tmp(d, "tsv")
    GraftIO.storeTsv(path)(Flow(Tables.supplier(s, d)).map(x =>
      Seq(x.s_suppkey.toString, x.s_name, x.s_nationkey.toString, x.s_acctbal.toString)))
    GraftIO.loadTsv(s, path)
      .map(r => (r(0).toLong, r(1), r(2).toInt, r(3).toDouble))
      .toDF.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
  }

  /** load-csv (reference io.clj:88-104) via the platform CSV source. */
  private val csvRt = q("q_io_csv",
    "SELECT p_partkey, p_name, p_brand, p_size, p_retailprice FROM part") { (s, d) =>
    val path = tmp(d, "csv")
    val src = Tables.df(s, d, "part")
      .select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
    GraftIO.storeCsv(path)(src)
    GraftIO.loadCsv(s, path, Some(StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType)))))
  }

  /** load-json / store-json (reference io.clj:122-138, 230-246). */
  private val jsonRt = q("q_io_json",
    "SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer") { (s, d) =>
    val path = tmp(d, "json")
    GraftIO.storeJson(path)(Tables.df(s, d, "customer")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal"))
    GraftIO.loadJson(s, path)
      .select(col("c_custkey").cast("long"), col("c_name"),
        col("c_nationkey").cast("int"), col("c_acctbal").cast("double"))
  }

  /** load-clj / store-clj (EDN; reference io.clj:106-120, 214-228). */
  private val cljRt = q("q_io_clj",
    "SELECT n_nationkey, n_name FROM nation") { (s, d) =>
    import s.implicits._
    import EdnValue._
    implicit val ednEnc: org.apache.spark.sql.Encoder[EdnValue] =
      org.apache.spark.sql.Encoders.kryo[EdnValue]
    val path = tmp(d, "clj")
    GraftIO.storeClj(path)(Flow(Tables.nation(s, d)).map(n =>
      M(Vector(
        (Kw("nationkey"): EdnValue) -> (Num(n.n_nationkey.toDouble, isInt = true): EdnValue),
        (Kw("name"): EdnValue) -> (Str(n.n_name): EdnValue))): EdnValue))
    GraftIO.loadClj(s, path).map { v =>
      val m = v.asInstanceOf[M].entries.toMap
      (m(Kw("nationkey")).asInstanceOf[Num].d.toInt, m(Kw("name")).asInstanceOf[Str].s)
    }.toDF.toDF("n_nationkey", "n_name")
  }

  /** load-parquet / store-parquet (reference pigpen-parquet:105-147). */
  private val parquetRt = q("q_io_parquet",
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders") { (s, d) =>
    val path = tmp(d, "parquet")
    GraftIO.storeParquet(path)(Tables.df(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
    GraftIO.loadParquet(s, path)
  }

  /** Loose-file round-trip: rows → one real file each (storeBinaryFiles)
    * → re-ingested via the `binaryFile` source; the oracle compares
    * parsed ids, file sizes, and decoded payloads against the source
    * table (ASCII corpus: octet_length == file bytes).
    */
  private val binaryFilesRt = q("q_io_binary_files",
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, text
       FROM documents WHERE doc_id < 20""") { (s, d) =>
    val path = tmp(d, "binfiles")
    val rows = Tables.df(s, d, "documents").where(col("doc_id") < 20)
      .select(concat(lit("doc_"), col("doc_id"), lit(".bin")).as("name"),
        col("text").cast("binary").as("payload"))
    GraftIO.storeBinaryFiles(path)(rows)
    GraftIO.loadBinaryFiles(s, path)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        col("content").cast("string").as("text"))
  }

  /** ORC round-trip (beyond the reference — warehouse interchange). */
  private val orcRt = q("q_io_orc",
    "SELECT p_partkey, p_name, p_brand, p_retailprice FROM part") { (s, d) =>
    val path = tmp(d, "orc")
    GraftIO.storeOrc(path)(Tables.df(s, d, "part")
      .select("p_partkey", "p_name", "p_brand", "p_retailprice"))
    GraftIO.loadOrc(s, path)
  }

  /** load-binary / store-binary (reference io.clj:30-35, 151-157): opaque
    * serialized values in a binary column — the frozen lane on disk.
    */
  private val binaryRt = q("q_io_binary",
    "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer") { (s, d) =>
    import s.implicits._
    val path = tmp(d, "binary")
    GraftIO.storeBinary(path)(Flow(Tables.customer(s, d)))
    GraftIO.loadBinary[Customer](s, path).toDF
  }

  /** load-avro / store-avro (reference pigpen-avro/avro.clj:46-99) via
    * the Avro MapReduce container formats.
    */
  private val avroRt = q("q_io_avro",
    "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier") { (s, d) =>
    val path = tmp(d, "avro")
    val schema =
      """{"type":"record","name":"supplier","fields":[
         {"name":"s_suppkey","type":"long"},
         {"name":"s_name","type":"string"},
         {"name":"s_nationkey","type":"int"},
         {"name":"s_acctbal","type":"double"}]}"""
    graft.sources.AvroIO.storeAvro(path, schema)(
      Tables.df(s, d, "supplier").select("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))
    graft.sources.AvroIO.loadAvro(s, path, schema)
  }

  /** store-many (reference io.clj:248-263): two sinks off one shared,
    * persisted lineage; returns one read back.
    */
  private val storeManyQ = q("q_store_many",
    """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM orders
       GROUP BY o_orderstatus""") { (s, d) =>
    val base = Tables.df(s, d, "orders").groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))
    val p1 = tmp(d, "many_counts")
    val p2 = tmp(d, "many_copy")
    GraftIO.storeMany(
      (GraftIO.storeParquet(p1), base),
      (GraftIO.storeParquet(p2), base))
    GraftIO.loadParquet(s, p1)
  }

  val all: Seq[QueryDef] = Seq(
    stringRt, tsvRt, csvRt, jsonRt, cljRt, parquetRt, orcRt, binaryRt,
    binaryFilesRt, avroRt, storeManyQ)
}
