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

  /** Save modes mirror the engine's writer: `overwrite` clears the target,
    * `append` adds new part files (names carry a per-job token so jobs
    * never collide), `errorifexists`/`error`/`default` refuse a non-empty
    * target, `ignore` returns without writing.
    *
    * Task commit protocol: every task writes a DOT-PREFIXED temp file
    * (invisible to readers and to [[read]]'s listing) and renames it to
    * its final name as its last step — the rename is the commit point, so
    * a mid-job failure leaves only hidden temps behind, never a partial
    * file a reader would consume. Duplicate task attempts (speculation /
    * stage retry) target the SAME final name from distinct temps;
    * first-rename-wins and the loser deletes its temp — benign, because
    * two attempts of one deterministic partition carry identical rows. */
  def write(df: DataFrame, path: String,
            compression: OutCompression = OutCompression.None,
            partitionColumns: Seq[String] = Seq.empty,
            mode: String = "overwrite"): Unit = {
    val schema = df.schema
    val schemaJson = avroSchema(schema).toString
    val compName = compression.name
    val partCols = partitionColumns.toArray
    val hadoopConfSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val fs = FileSystem.get(new java.net.URI(path).resolve("/"),
      df.sparkSession.sparkContext.hadoopConfiguration)
    val outRoot = new Path(path)
    val exists = fs.exists(outRoot) && fs.listStatus(outRoot).nonEmpty
    mode.toLowerCase match {
      case "overwrite" => if (fs.exists(outRoot)) fs.delete(outRoot, true)
      case "append"    => ()
      case "ignore"    => if (exists) return
      case "errorifexists" | "error" | "default" =>
        if (exists) throw new IllegalStateException(
          s"path $path already exists (mode=$mode)")
      case other => throw new IllegalArgumentException(s"unknown save mode $other")
    }
    fs.mkdirs(outRoot)
    // per-job token: append jobs never collide on part names
    val jobToken = java.util.UUID.randomUUID().toString.take(8)

    df.foreachPartition { (rows: Iterator[Row]) =>
      val conf = hadoopConfSer.value
      val avro = new Schema.Parser().parse(schemaJson)
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val attempt = tc.taskAttemptId()
      // one open container file per partition-key group seen in this task;
      // temp (dot-prefixed) and final paths tracked for the commit renames
      val writers = mutable.Map.empty[String, DataFileWriter[GenericRecord]]
      val pending = mutable.Buffer.empty[(Path, Path)] // (temp, final)
      def writerFor(keyDir: String): DataFileWriter[GenericRecord] =
        writers.getOrElseUpdate(keyDir, {
          val dir = if (keyDir.isEmpty) new Path(path) else new Path(path, keyDir)
          val base = f"part-$pid%05d-$jobToken${OutFormat.Avro.extension}"
          val temp = new Path(dir, s".$base.$attempt.tmp")
          val fin = new Path(dir, base)
          val pfs = temp.getFileSystem(conf)
          pfs.mkdirs(dir)
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](avro))
          w.setCodec(codec(compName))
          w.create(avro, pfs.create(temp, true))
          pending += ((temp, fin))
          w
        })
      var committed = false
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
        writers.values.foreach(_.close())
        // commit: rename temps to final names; a racing attempt that
        // committed first keeps its file, we drop ours (identical content)
        pending.foreach { case (temp, fin) =>
          val pfs = temp.getFileSystem(conf)
          if (!pfs.rename(temp, fin)) pfs.delete(temp, false)
        }
        committed = true
      } finally {
        if (!committed) {
          scala.util.Try(writers.values.foreach(_.close()))
          pending.foreach { case (temp, _) =>
            scala.util.Try(temp.getFileSystem(conf).delete(temp, false))
          }
        }
      }
    }
  }

  /** Distributed read-back: list container files, parallelize ONE FILE PER
    * TASK (read scales with the file count, like the write side), each
    * task streams its file through DataFileReader's iterator — O(1) memory
    * per task regardless of container size. Partition-key directories
    * (`k=v` path segments) are recovered as columns, typed Integer when
    * every value parses as one (mirroring the engine's partition
    * discovery), so an Avro layout reads back shape-identical to the
    * jsonl/csv/parquet layouts. An empty layout returns an empty frame
    * when `schemaDDL` supplies the shape, and errors otherwise (there is
    * nothing to infer from). */
  def read(spark: SparkSession, path: String,
           schemaDDL: Option[String] = None): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(path).resolve("/"), conf)
    val root = new Path(path)
    val files = mutable.Buffer.empty[String]
    if (fs.exists(root)) {
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(OutFormat.Avro.extension) &&
          !f.getPath.getName.startsWith("."))
          files += f.getPath.toString
      }
    }
    if (files.isEmpty) {
      schemaDDL match {
        case Some(ddl) =>
          return spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], StructType.fromDDL(ddl))
        case None => throw new IllegalArgumentException(
          s"no avro files under $path and no schema to shape an empty result")
      }
    }
    // partition columns from the k=v path segments between root and file
    val rootUri = fs.makeQualified(root).toUri.getPath
    def partsOf(file: String): Seq[(String, String)] = {
      val rel = new java.net.URI(file).getPath.stripPrefix(rootUri)
      rel.split("/").filter(_.contains("=")).toSeq.map { seg =>
        val Array(k, v) = seg.split("=", 2)
        k -> v
      }
    }
    val fileParts = files.map(f => f -> partsOf(f)).toMap
    val partCols: Seq[String] = fileParts.values.headOption
      .map(_.map(_._1)).getOrElse(Nil)
    require(fileParts.values.forall(_.map(_._1) == partCols),
      s"inconsistent partition layout under $path")
    def intable(v: String): Boolean =
      v != "__NULL__" && v.matches("-?\\d+") && scala.util.Try(v.toInt).isSuccess
    val partTypes: Seq[DataType] = partCols.zipWithIndex.map { case (_, i) =>
      if (fileParts.values.forall(ps => intable(ps(i)._2) || ps(i)._2 == "__NULL__"))
        IntegerType
      else StringType
    }
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
    // every partitioned field is ALSO a record field in this sink's layout
    // (partition dirs are derived, not projected away) — the record value
    // wins and only genuinely new columns (e.g. a destination's batch_id)
    // are appended, exactly like the engine's partition discovery
    val keepIdx = partCols.indices
      .filterNot(i => sparkSchema.fieldNames.contains(partCols(i)))
    val fullSchema = StructType(sparkSchema.fields ++
      keepIdx.map(i => StructField(partCols(i), partTypes(i), true)))
    val schemaJson = avro.toString
    val hadoopConfSer = new org.apache.spark.util.SerializableConfiguration(conf)
    val filesWithParts: Seq[(String, Seq[Any])] = files.toSeq.map { f =>
      val ps = fileParts(f)
      f -> keepIdx.map { i =>
        (ps(i)._2, partTypes(i)) match {
          case ("__NULL__", _)     => null
          case (v, IntegerType)    => Int.box(v.toInt)
          case (v, _)              => v
        }
      }
    }
    val rows = spark.sparkContext
      .parallelize(filesWithParts, math.max(1, filesWithParts.size))
      .mapPartitions { paths =>
        val c = hadoopConfSer.value
        val schema = new Schema.Parser().parse(schemaJson)
        paths.flatMap { case (p, partVals) =>
          val r = new DataFileReader[GenericRecord](
            new FsInput(new Path(p), c), new GenericDatumReader[GenericRecord](schema))
          // stream the container: no per-file buffering, close on exhaustion
          new Iterator[Row] {
            private var closed = false
            def hasNext: Boolean = {
              if (closed) false
              else if (r.hasNext) true
              else { r.close(); closed = true; false }
            }
            def next(): Row = {
              val rec = r.next()
              Row.fromSeq(schema.getFields.asScala.map { f =>
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
              }.toSeq ++ partVals)
            }
          }
        }
      }
    spark.createDataFrame(rows, fullSchema)
  }
}
