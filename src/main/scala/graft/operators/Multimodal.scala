package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `BinaryType` columns with typed metadata structs; decode / feature
  * extraction runs batched per partition.
  *
  * The real decoders (image/audio codecs) are NOT available in this
  * environment, so [[fakeDecode]] is a clearly-marked deterministic stand-in
  * — the Spark-side contract (schema, batching, partition-parallel map, no
  * shuffle) is the real, tested part. Swap `decodeBytes` for a JNI/FFM codec
  * call in production; everything around it is unchanged.
  *
  * Scale notes: decode is a narrow transformation (mapPartitions) — it
  * pipelines with the scan, never shuffles, and batches rows per partition
  * so a vectorized decoder amortizes setup cost. Payload skew is handled
  * upstream by `spark.sql.files.maxPartitionBytes` on the binaryFile scan.
  */
object Multimodal {

  /** Metadata schema attached to every decoded payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** STUB decoder — deterministic fake. A real build replaces this body with
    * an actual codec (e.g. TwelveMonkeys ImageIO / JCodec); the signature —
    * bytes in, fixed-schema features out — is the production contract.
    */
  def decodeBytes(payload: Array[Byte]): (Int, Int, Int, Int) = {
    val n = if (payload == null) 0 else payload.length
    (n, n % 640, (n * 7) % 480, n % 30)
  }

  /** Attach a decoded-metadata struct column to a DataFrame with a binary
    * `payload` column. Runs as mapPartitions over an explicit row encoder —
    * partition-batched, shuffle-free.
    */
  def withDecodedMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("meta", MetaSchema))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (n, w, h, f) = decodeBytes(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq :+ Row(n, w, h, f))
      }
    }(enc)
  }

  /** STUB resize — production body: vectorized image resize (e.g. libvips
    * via FFM). The contract: payload + target dims in, payload out; the fake
    * truncates/pads deterministically so batch-shape tests are stable. */
  def resizeBytes(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, (w * h) / 256)
    java.util.Arrays.copyOf(if (payload == null) Array.emptyByteArray else payload, target)
  }

  /** Batched resize over partitions: rows are processed in fixed-size
    * batches (the reference's 64/100-row batching contract — a vectorized
    * decoder amortizes setup per batch, not per row). Shuffle-free. */
  def withResized(df: DataFrame, payloadCol: String, w: Int, h: Int,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("resized", BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // production: one vectorized call per batch
        batch.map(r => Row.fromSeq(r.toSeq :+ resizeBytes(r.getAs[Array[Byte]](idx), w, h)))
      }
    }(enc)
  }

  /** Frame sampling for video-ish payloads: every `stride`-th frame index up
    * to the stub-decoded n_frames, exploded to one row per sampled frame —
    * the 1-row→N-rows generator shape (UDTF analog) for multimodal data. */
  def explodeSampledFrames(df: DataFrame, payloadCol: String, stride: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val nFrames = udf((b: Array[Byte]) => decodeBytes(b)._4)
    df.withColumn("__n", nFrames(col(payloadCol)))
      .withColumn("frame_idx",
        explode(when(col("__n") > 0, sequence(lit(0), col("__n") - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))))
      .drop("__n")
  }
}
