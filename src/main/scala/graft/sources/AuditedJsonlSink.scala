package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType, StringType, StructType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 WRITE path — the sink half of the DSv2 story
  * (SyntheticEventsSource covers the read ladder): an audited JSONL
  * sink implementing Spark's two-phase commit contract end to end.
  *
  *  - each TASK writes its partition to `path/_temp/part-<p>-<t>.jsonl`
  *    and returns a [[WriterCommitMessage]] carrying (tempFile, rows);
  *  - the DRIVER's `commit` runs only after EVERY task succeeded: it
  *    renames each temp file into place and then writes `_MANIFEST`
  *    (file list + per-file and total row counts) as the LAST step —
  *    readers that require the manifest therefore never observe a
  *    partial write (the rename-then-manifest order is the atomicity);
  *  - `abort` (any task failed / job cancelled) deletes the temp files
  *    so a failed job leaves nothing visible.
  *
  * This is the same speculation-safe protocol every production sink
  * (parquet's FileCommitProtocol, Iceberg/Delta commits) implements:
  * task attempts may run twice, but only files named in COMMITTED
  * messages are renamed, and the manifest is the single publication
  * point. At 100 TB the commit cost is one metadata pass over
  * task-count messages — no data moves at commit time.
  *
  * Usage: `df.write.format("graft.sources.AuditedJsonlSink")
  *   .option("path", dir).mode("append").save()`; read back with
  * `spark.read.schema(s).json(dir + "/part-*.jsonl")`.
  */
class AuditedJsonlSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AuditedJsonlTable(schema, properties.get("path"))
}

class AuditedJsonlTable(writeSchema: StructType, path: String)
    extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "AuditedJsonlSink requires .option(\"path\", ...)")
  override def name(): String = s"audited_jsonl($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new AuditedJsonlBatchWrite(info.schema(), path)
      }
    }
}

case class JsonlCommitMessage(tempFile: String, finalName: String,
    rows: Long) extends WriterCommitMessage

class AuditedJsonlBatchWrite(schema: StructType, path: String)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new JsonlWriterFactory(schema, path)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    val committed = messages.collect { case m: JsonlCommitMessage => m }
    committed.foreach { m =>
      val src = new java.io.File(m.tempFile)
      val dst = new java.io.File(dir, m.finalName)
      if (!src.renameTo(dst))
        throw new java.io.IOException(s"commit rename failed: ${m.tempFile}")
    }
    // manifest LAST: the single publication point
    val manifest = new java.io.File(dir, "_MANIFEST")
    val pw = new java.io.PrintWriter(manifest, "UTF-8")
    try {
      committed.sortBy(_.finalName).foreach(m =>
        pw.println(s"""{"file":"${m.finalName}","rows":${m.rows}}"""))
      pw.println(s"""{"total_rows":${committed.map(_.rows).sum}}""")
    } finally pw.close()
    val temp = new java.io.File(dir, "_temp")
    if (temp.isDirectory && temp.list().isEmpty) temp.delete()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case m: JsonlCommitMessage => new java.io.File(m.tempFile).delete()
      case _ => ()
    }
  }
}

class JsonlWriterFactory(schema: StructType, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new JsonlDataWriter(schema, path, partitionId, taskId)
}

/** Task-side writer: rows stream to a temp file; `commit` seals it and
  * hands the driver a rename instruction. Attempt id is in the temp
  * name, so a speculative twin can never collide. */
class JsonlDataWriter(schema: StructType, path: String, partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {
  private val tempDir = new java.io.File(path, "_temp")
  tempDir.mkdirs()
  private val finalName = f"part-$partitionId%05d.jsonl"
  private val tempFile = new java.io.File(tempDir,
    s"$finalName.attempt-$taskId")
  private val out = new java.io.PrintWriter(tempFile, "UTF-8")
  private var rows = 0L

  private def esc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  override def write(row: InternalRow): Unit = {
    val parts = schema.fields.zipWithIndex.map { case (f, i) =>
      val v =
        if (row.isNullAt(i)) "null"
        else f.dataType match {
          case LongType => row.getLong(i).toString
          case IntegerType => row.getInt(i).toString
          case DoubleType => row.getDouble(i).toString
          case BooleanType => row.getBoolean(i).toString
          case StringType => "\"" + esc(row.getUTF8String(i).toString) + "\""
          // epoch micros as a number — lossless and schema-replayable
          case TimestampType | TimestampNTZType => row.getLong(i).toString
          case other =>
            throw new UnsupportedOperationException(
              s"AuditedJsonlSink: unsupported type $other for ${f.name}")
        }
      "\"" + esc(f.name) + "\":" + v
    }
    out.println(parts.mkString("{", ",", "}"))
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    JsonlCommitMessage(tempFile.toString, finalName, rows)
  }

  override def abort(): Unit = {
    out.close()
    tempFile.delete()
  }

  override def close(): Unit = out.close()
}
