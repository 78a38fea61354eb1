package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY §2.7 X5): media as opaque BINARY
  * payloads with a typed metadata struct, flowing through relational
  * operators untouched.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE decoder (documented below); the
  * Spark-side plumbing — binary columns, metadata schema, batch-shaped
  * feature extraction, partition behavior — is real and oracle-checked.
  * Swapping the stub for a real codec (an `mapInPandas`/`mapInArrow`
  * Python worker or a JNI call inside `mapPartitions`) changes ONE
  * function; every schema and operator stays.
  *
  * Scale: payloads never explode, never join on themselves, and flow as
  * opaque bytes — only the small metadata/feature columns participate in
  * shuffles. Feature extraction is per-row scalar expressions (or at
  * worst one `mapPartitions` batch), embarrassingly parallel.
  */
object Multimodal {

  /** Metadata carried with every media payload. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)
  ))

  /** Build a media table from documents: payload = UTF-8 bytes of the
    * text (stands in for image/audio bytes), metadata derived from the
    * payload. Deterministic — the oracle rebuilds it byte-identically. */
  def mediaTable(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    docs.select(
      col(idCol).as("media_id"),
      payload.as("payload"),
      struct(
        lit("text/plain").as("media_type"),
        octet_length(payload).cast(LongType).as("n_bytes"),
        md5(payload).as("checksum")
      ).as("meta"))
  }

  /** FAKE DECODER — deterministic stand-in for an image decode.
    *
    * A real deployment replaces this body with a codec call; the
    * signature (binary in, fixed-width feature struct out) is the
    * contract. The fake derives "width"/"height" from payload bytes and
    * a 4-element "histogram" from the md5 digest — all built-in
    * expressions, so the plumbing is testable end-to-end today.
    */
  def decodeStub(payload: Column): Column = {
    val hexDigest = md5(payload)
    def hexAt(pos: Int): Column =
      conv(substring(hexDigest, pos, 2), 16, 10).cast(IntegerType)
    struct(
      (hexAt(1) % 64 + 1).as("width"),
      (hexAt(3) % 64 + 1).as("height"),
      array(hexAt(5), hexAt(7), hexAt(9), hexAt(11)).as("histogram"))
  }

  /** Feature extraction over a media table: metadata + decoded features
    * as flat columns. The shape a downstream trainer consumes. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val f = decodeStub(col("payload"))
    media.select(
      col("media_id"),
      col("meta.media_type").as("media_type"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.checksum").as("checksum"),
      f.getField("width").as("width"),
      f.getField("height").as("height"),
      f.getField("histogram").as("histogram"))
  }

  /** "Frame sampling" over a byte payload: every `stride`-th byte of the
    * first `n` bytes as an int array (stands in for video frame
    * sampling; same slicing pattern, real arrays). */
  def sampleBytes(payload: Column, n: Int, stride: Int): Column =
    transform(sequence(lit(1), lit(n), lit(stride)),
      i => conv(substring(hex(payload), i * 2 - 1, lit(2)), 16, 10)
        .cast(IntegerType))

  /** Batch-shaped decode path: the `mapPartitions` integration point
    * where a REAL codec (JNI library, or a Python worker via
    * `mapInPandas`/`mapInArrow` from PySpark) plugs in — the iterator
    * processes a whole partition per call, so codec init is amortized
    * per-batch, exactly like a pandas-UDF batch. The decode itself is
    * the same clearly-marked deterministic FAKE as [[decodeStub]]
    * (byte-derived), keeping the plumbing testable without codecs.
    *
    * Prefer [[extractFeatures]] (pure Catalyst expressions, codegen,
    * no serialization boundary) whenever the decode can be expressed as
    * expressions; this path exists for decoders that can't. */
  def decodeBatched(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // real codec would be initialized HERE, once per partition
        batch.map { case (id, bytes) =>
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(bytes)
          (id, bytes.length.toLong,
            (digest(0) & 0xff) % 64 + 1, (digest(1) & 0xff) % 64 + 1)
        }
      }
      .toDF("media_id", "n_bytes", "width", "height")
  }
}
