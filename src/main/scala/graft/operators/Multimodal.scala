package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (charter requirement).
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct.
  * The decode / feature-extract step is STUBBED — this container has no
  * image/audio codecs — with a deterministic fake ([[fakeDecode]]) so the
  * Spark-side plumbing (schema, batch shape, partition-parallel decode via
  * mapPartitions, feature schema) is real and tested end to end. Swapping in
  * a real codec means replacing ONLY the body of [[fakeDecode]].
  *
  * Scale design: decode runs inside `mapPartitions` (per-partition, no
  * shuffle, codec state reused across a partition's rows); feature columns
  * come back as a typed struct so downstream ops stay columnar.
  */
object Multimodal {

  /** Metadata carried next to every media payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType),
    StructField("head_hex", StringType),
    StructField("byte_mean", DoubleType)))

  /** Wraps a text table into the multimodal shape: payload = UTF-8 bytes,
    * metadata derived from the payload. Stands in for reading real media
    * files (`spark.read.format("binaryFile")` at production time).
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("text/plain").as("media_type"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        length(col(textCol).cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** Deterministic stand-in for a real decoder: byte length, first-8-bytes
    * hex, mean byte value. Everything a real decoder needs from the harness
    * (binary in, struct out, per-partition batching) is exercised.
    */
  def fakeDecode(payload: Array[Byte]): (Long, String, Double) = {
    val head = payload.take(8).map(b => f"${b & 0xff}%02x").mkString
    val mean = if (payload.isEmpty) 0.0 else payload.map(b => (b & 0xff).toLong).sum.toDouble / payload.length
    (payload.length.toLong, head, mean)
  }

  /** Partition-parallel decode: binary payload → feature struct. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields :+ StructField("features", featureSchema))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val (n, hex, mean) = fakeDecode(payload)
        Row.fromSeq(r.toSeq :+ Row(n, hex, mean))
      }
    }(enc)
  }

  /** Frame-sampling stub: emits every `stride`-th fixed-size window of the
    * payload as a "frame" (what a video decoder's keyframe sampler would
    * produce), preserving the row-multiplying generator shape.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(col("media_id"), col("payload"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest((length(col("payload")) / (frameBytes * stride)).cast("int") - 1, lit(0)))))
      .withColumn("frame",
        expr(s"substring(payload, frame_idx * $frameBytes * $stride + 1, $frameBytes)"))

  /** Resize stub (image pipeline shape): the DIMENSION math is real — fit
    * (width, height) inside `maxDim` preserving aspect ratio, never
    * upscaling — while the pixel resample is the deterministic fake (byte
    * subsampling at the computed stride) running in the same
    * partition-parallel `mapPartitions` harness a real codec would use.
    * Media without dimensions (audio/text) pass through with
    * `resized = false` and an untouched payload.
    */
  def resizeStub(media: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, "maxDim must be positive")
    val w = col("meta.width")
    val h = col("meta.height")
    val needs = w.isNotNull && h.isNotNull && greatest(w, h) > maxDim
    val outW = when(needs, greatest((w * maxDim / greatest(w, h)).cast("int"), lit(1))).otherwise(w)
    val outH = when(needs, greatest((h * maxDim / greatest(w, h)).cast("int"), lit(1))).otherwise(h)
    val stride = when(needs, ceil(greatest(w, h).cast("double") / maxDim).cast("int")).otherwise(lit(1))
    val planned = media
      .withColumn("resized", needs)
      .withColumn("out_width", outW)
      .withColumn("out_height", outH)
      .withColumn("stride", stride)
    val enc = RowEncoder.encoderFor(
      StructType(planned.schema.fields.map(f =>
        if (f.name == "payload") f.copy(dataType = BinaryType) else f)))
    val payloadIdx = planned.schema.fieldIndex("payload")
    val strideIdx = planned.schema.fieldIndex("stride")
    planned.mapPartitions { rows =>
      rows.map { r =>
        val st = r.getInt(strideIdx)
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val out =
          if (st <= 1 || payload == null) payload
          else Array.range(0, payload.length, st).map(payload)
        Row.fromSeq(r.toSeq.updated(payloadIdx, out))
      }
    }(enc)
  }

  /** Overlapped chunking (the audio feature-extraction shape): windows of
    * `chunkBytes` starting every `hopBytes` (hop < chunk ⇒ overlap), the
    * final window truncated at the payload end. One generator expression —
    * chunk count per row is ceil(n_bytes / hop) with no shuffle; a real
    * spectrogram/embedding step would map over `chunk` downstream.
    */
  def chunkPayload(media: DataFrame, chunkBytes: Int, hopBytes: Int): DataFrame = {
    require(chunkBytes > 0 && hopBytes > 0, "chunkBytes and hopBytes must be positive")
    media.select(col("media_id"), col("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .filter(col("n_bytes") > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), ceil(col("n_bytes").cast("double") / hopBytes).cast("long") - 1)))
      .withColumn("chunk",
        expr(s"substring(payload, chunk_idx * $hopBytes + 1, $chunkBytes)"))
      .withColumn("chunk_bytes", length(col("chunk")).cast("long"))
      .select("media_id", "chunk_idx", "chunk", "chunk_bytes")
  }
}
