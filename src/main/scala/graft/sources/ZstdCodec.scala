package graft.sources

import java.io.{InputStream, OutputStream}
import org.apache.hadoop.conf.{Configurable, Configuration}
import org.apache.hadoop.io.compress._
import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}

/** Hadoop CompressionCodec for zstd backed by zstd-jni (T6 for TEXT
  * formats): stock Hadoop's ZStandardCodec needs libhadoop compiled with
  * zstd, which this environment lacks — but zstd-jni ships with Spark, so
  * a stream-level codec closes the gap. JSON/CSV writers accept the codec
  * CLASS NAME in `.option("compression", ...)`, and the reader resolves
  * `.zst` files back through `getDefaultExtension`.
  *
  * Only the stream API is implemented (that is all the text file formats
  * use); the block-compressor entry points intentionally signal
  * unsupported rather than silently mis-compressing.
  */
final class ZstdCodec extends CompressionCodec with Configurable {
  private var conf: Configuration = new Configuration(false)
  override def setConf(c: Configuration): Unit = conf = c
  override def getConf: Configuration = conf

  override def getDefaultExtension: String = ".zst"

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new CompressionOutputStream(out) {
      // close-shield: finish() must TERMINATE the zstd frame without
      // closing the underlying FS stream (the CompressionOutputStream
      // contract — callers may finish(), then close the raw stream
      // themselves; a bare flush() left the frame unterminated and such a
      // .zst read back as truncated). z.close() through the shield ends
      // the frame but leaves `out` open.
      private val shield = new java.io.FilterOutputStream(out) {
        override def write(b: Array[Byte], off: Int, len: Int): Unit =
          out.write(b, off, len)
        override def close(): Unit = out.flush() // leave `out` open
      }
      private val z = new ZstdOutputStream(shield, 3)
      private var finished = false
      override def write(b: Int): Unit = z.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        z.write(b, off, len)
      override def finish(): Unit = if (!finished) { finished = true; z.close() }
      override def resetState(): Unit = ()
      override def flush(): Unit = if (!finished) z.flush()
      override def close(): Unit = { finish(); out.close() }
    }

  override def createOutputStream(out: OutputStream,
                                  c: Compressor): CompressionOutputStream =
    createOutputStream(out)

  override def createInputStream(in: InputStream): CompressionInputStream =
    new CompressionInputStream(in) {
      private val z = new ZstdInputStream(in)
      override def read(): Int = z.read()
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        z.read(b, off, len)
      override def resetState(): Unit = ()
      override def close(): Unit = { z.close(); super.close() }
    }

  override def createInputStream(in: InputStream,
                                 d: Decompressor): CompressionInputStream =
    createInputStream(in)

  override def createCompressor(): Compressor =
    throw new UnsupportedOperationException("stream API only")
  override def createDecompressor(): Decompressor =
    throw new UnsupportedOperationException("stream API only")
  override def getCompressorType: Class[_ <: Compressor] = null
  override def getDecompressorType: Class[_ <: Decompressor] = null
}
