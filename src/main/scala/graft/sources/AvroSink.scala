package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Avro serializer (T4, s3/destination.rs:400-471) built directly on the
  * Avro Java library — this Spark build ships avro/avro-mapred jars but no
  * `spark-avro` datasource, so the container-file write happens inside
  * `foreachPartition`: every task serializes its own partition into one
  * Avro object-container file per partition-key group, exactly the
  * "one object per collection group" layout of the reference's S3 uploader
  * (s3/destination.rs:537-546). Fully distributed — no driver collect; the
  * driver only creates the output directory.
  *
  * Like the reference's fixed envelope record (nullable unions,
  * s3/destination.rs:418-433), the schema maps scalar Spark types to
  * nullable Avro fields; timestamps travel as timestamp-micros longs.
  */
object AvroSink {

  private def avroType(dt: DataType): Schema = dt match {
    case StringType    => Schema.create(Schema.Type.STRING)
    case LongType      => Schema.create(Schema.Type.LONG)
    case IntegerType   => Schema.create(Schema.Type.INT)
    case DoubleType    => Schema.create(Schema.Type.DOUBLE)
    case FloatType     => Schema.create(Schema.Type.FLOAT)
    case BooleanType   => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType    => Schema.create(Schema.Type.BYTES)
    case TimestampType => // logical timestamp-micros
      val s = Schema.create(Schema.Type.LONG)
      org.apache.avro.LogicalTypes.timestampMicros().addToSchema(s)
    case other => throw new IllegalArgumentException(
      s"AvroSink supports flat scalar schemas; got $other")
  }

  /** Nullable-union record schema for a flat Spark schema. */
  def avroSchema(schema: StructType, name: String = "graft_record"): Schema = {
    val fields = schema.fields.map { f =>
      val base = avroType(f.dataType)
      val t = if (f.nullable)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, t, null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  private def codec(name: String): CodecFactory = name match {
    case "gzip"   => CodecFactory.deflateCodec(6)
    case "zstd"   => CodecFactory.zstandardCodec(3)
    case "snappy" => CodecFactory.snappyCodec()
    case _        => CodecFactory.nullCodec()
  }

  def write(df: DataFrame, path: String,
            compression: OutCompression = OutCompression.None,
            partitionColumns: Seq[String] = Seq.empty): Unit = {
    val schema = df.schema
    val schemaJson = avroSchema(schema).toString
    val compName = compression.name
    val partCols = partitionColumns.toArray
    val hadoopConfSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    // fresh output dir (mirror of mode=overwrite)
    val fs = FileSystem.get(new java.net.URI(path).resolve("/"),
      df.sparkSession.sparkContext.hadoopConfiguration)
    val outRoot = new Path(path)
    if (fs.exists(outRoot)) fs.delete(outRoot, true)
    fs.mkdirs(outRoot)

    df.foreachPartition { (rows: Iterator[Row]) =>
      val conf = hadoopConfSer.value
      val avro = new Schema.Parser().parse(schemaJson)
      val pid = org.apache.spark.TaskContext.getPartitionId()
      // one open container file per partition-key group seen in this task
      val writers = mutable.Map.empty[String, DataFileWriter[GenericRecord]]
      def writerFor(keyDir: String): DataFileWriter[GenericRecord] =
        writers.getOrElseUpdate(keyDir, {
          val dir = if (keyDir.isEmpty) new Path(path) else new Path(path, keyDir)
          val file = new Path(dir, f"part-$pid%05d${OutFormat.Avro.extension}")
          val pfs = file.getFileSystem(conf)
          pfs.mkdirs(dir)
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](avro))
          w.setCodec(codec(compName))
          w.create(avro, pfs.create(file, true))
          w
        })
      try {
        rows.foreach { row =>
          val keyDir = partCols.map { c =>
            s"$c=${Option(row.getAs[Any](c)).map(_.toString).getOrElse("__NULL__")}"
          }.mkString("/")
          val rec = new GenericData.Record(avro)
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            val v = if (row.isNullAt(i)) null else f.dataType match {
              case TimestampType =>
                val inst = row.getTimestamp(i).toInstant
                java.lang.Long.valueOf(
                  inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
              case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
              case _ => row.get(i).asInstanceOf[AnyRef]
            }
            rec.put(f.name, v)
          }
          writerFor(keyDir).append(rec)
        }
      } finally writers.values.foreach(_.close())
    }
  }

  /** Distributed read-back: list container files, parallelize the file
    * list, each task decodes its files with DataFileReader. Partition-key
    * directories are layout only — every field is also in the record, so
    * nothing is lost. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(path).resolve("/"), conf)
    val files = mutable.Buffer.empty[String]
    val it = fs.listFiles(new Path(path), true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(OutFormat.Avro.extension))
        files += f.getPath.toString
    }
    require(files.nonEmpty, s"no avro files under $path")
    // schema from the first container file
    val first = new DataFileReader[GenericRecord](
      new FsInput(new Path(files.head), conf),
      new GenericDatumReader[GenericRecord]())
    val avro = first.getSchema
    first.close()
    val sparkSchema = StructType(avro.getFields.asScala.map { f =>
      val (t, nullable) = f.schema().getType match {
        case Schema.Type.UNION =>
          val nonNull = f.schema().getTypes.asScala
            .find(_.getType != Schema.Type.NULL).get
          (nonNull, true)
        case _ => (f.schema(), false)
      }
      val dt = t.getType match {
        case Schema.Type.STRING  => StringType
        case Schema.Type.LONG =>
          if (t.getLogicalType != null &&
            t.getLogicalType.getName == "timestamp-micros") TimestampType
          else LongType
        case Schema.Type.INT     => IntegerType
        case Schema.Type.DOUBLE  => DoubleType
        case Schema.Type.FLOAT   => FloatType
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.BYTES   => BinaryType
        case other => throw new IllegalArgumentException(s"unsupported $other")
      }
      StructField(f.name, dt, nullable)
    }.toArray)
    val schemaJson = avro.toString
    val hadoopConfSer = new org.apache.spark.util.SerializableConfiguration(conf)
    val rows = spark.sparkContext
      .parallelize(files.toSeq, math.min(files.size, 32))
      .mapPartitions { paths =>
        val c = hadoopConfSer.value
        val schema = new Schema.Parser().parse(schemaJson)
        paths.flatMap { p =>
          val r = new DataFileReader[GenericRecord](
            new FsInput(new Path(p), c), new GenericDatumReader[GenericRecord](schema))
          val buf = mutable.Buffer.empty[Row]
          while (r.hasNext) {
            val rec = r.next()
            buf += Row.fromSeq(schema.getFields.asScala.map { f =>
              val v = rec.get(f.name)
              val fieldSchema = f.schema().getType match {
                case Schema.Type.UNION => f.schema().getTypes.asScala
                  .find(_.getType != Schema.Type.NULL).get
                case _ => f.schema()
              }
              (v, fieldSchema) match {
                case (null, _) => null
                case (x: org.apache.avro.util.Utf8, _) => x.toString
                case (x: java.lang.Long, s) if s.getLogicalType != null &&
                  s.getLogicalType.getName == "timestamp-micros" =>
                  java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
                    Math.floorDiv(x.longValue(), 1000000L),
                    Math.floorMod(x.longValue(), 1000000L) * 1000L))
                case (x: java.nio.ByteBuffer, _) =>
                  val b = new Array[Byte](x.remaining()); x.get(b); b
                case (x, _) => x
              }
            }.toSeq)
          }
          r.close()
          buf
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
