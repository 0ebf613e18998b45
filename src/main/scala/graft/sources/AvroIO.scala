package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro source/sink (reference pigpen-avro, SURVEY.md §2.2) built directly
  * on the Avro MapReduce formats (no connector package needed): container
  * files split per-block, so reads parallelize across executors exactly
  * like any Hadoop-format source. Nested records map to nested StructType —
  * the dotted-name flattening of the reference (avro/core.clj:58-88) is
  * unnecessary because Spark structs nest natively.
  *
  * Scope mirrors the reference's surface: records of
  * string/int/long/float/double/boolean/bytes + nested records + nullable
  * unions (the shapes in the reference's test resources).
  */
object AvroIO {

  def loadAvro(spark: SparkSession, path: String, schemaJson: String): DataFrame = {
    val schema = new Schema.Parser().parse(schemaJson)
    val sparkSchema = toSparkType(schema).asInstanceOf[StructType]
    val conf = new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("avro.schema.input.key", schema.toString)
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      conf)
    // convert eagerly within the iterator: AvroKey objects are reused
    val rows = rdd.mapPartitions { it =>
      val schemaLocal = sparkSchema
      it.map { case (k, _) => toRow(k.datum(), schemaLocal) }
    }
    spark.createDataFrame(rows, sparkSchema)
  }

  def storeAvro(path: String, schemaJson: String)(df: DataFrame): Unit = {
    val spark = df.sparkSession
    // overwrite semantics, consistent with the DataFrame sinks (the Hadoop
    // OutputFormat otherwise refuses an existing directory)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    val sparkSchema = df.schema
    df.rdd
      .mapPartitions { it =>
        // parse once per partition (Schema is not serializable across
        // closures, so it can't be parsed on the driver and shipped)
        val schema = new Schema.Parser().parse(schemaJson)
        it.map { row =>
          (new AvroKey[GenericRecord](toAvro(row, sparkSchema, schema)), NullWritable.get())
        }
      }
      .saveAsNewAPIHadoopFile(
        path,
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        classOf[AvroKeyOutputFormat[GenericRecord]],
        job.getConfiguration)
  }

  /** Avro schema → Spark type (primitives, records, arrays, maps,
    * nullable unions).
    */
  def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING => StringType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.ENUM => StringType
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.map(f =>
        StructField(f.name(), toSparkType(f.schema()), nullable = true)).toSeq)
    case Schema.Type.ARRAY => ArrayType(toSparkType(s.getElementType))
    case Schema.Type.MAP => MapType(StringType, toSparkType(s.getValueType))
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only nullable unions supported, got $s")
      toSparkType(nonNull.head)
    case Schema.Type.NULL => NullType
  }

  private def toRow(rec: GenericRecord, st: StructType): Row = {
    val vals = st.fields.map(f => fromAvroValue(rec.get(f.name), f.dataType))
    Row.fromSeq(vals.toSeq)
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (r: GenericRecord, st: StructType) => toRow(r, st)
    case (s: CharSequence, StringType) => s.toString
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (f: org.apache.avro.generic.GenericFixed, BinaryType) => f.bytes().clone()
    case (e: org.apache.avro.generic.GenericEnumSymbol[_], StringType) => e.toString
    case (l: java.util.Collection[_], ArrayType(et, _)) =>
      l.asScala.map(fromAvroValue(_, et)).toSeq
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, mv) => k.toString -> fromAvroValue(mv, vt) }.toMap
    case (other, _) => other
  }

  private def toAvro(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      val fieldSchema = nonNullable(schema.getField(f.name).schema())
      rec.put(f.name, toAvroValue(row.get(i), f.dataType, fieldSchema))
    }
    rec
  }

  private def nonNullable(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def toAvroValue(v: Any, dt: DataType, s: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (r: Row, st: StructType) => toAvro(r, st, s)
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
      seq.map(toAvroValue(_, et, s.getElementType)).asJava
    case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
      m.map { case (k, mv) => k.toString -> toAvroValue(mv, vt, s.getValueType) }.asJava
    case (other, _) => other
  }
}
