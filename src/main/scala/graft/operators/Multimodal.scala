package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata (the training-data-pipeline extension of
  * SURVEY.md §8).
  *
  * REAL image-format header decode (JPEG segment walk, CRC-verified PNG
  * IHDR) lives in [[graft.functions.ImageCodec]] as a native expression.
  * This object carries the container plumbing: the schema, the binary
  * column handling, the batched `mapPartitions` execution shape (the
  * Scala analog of `mapInPandas`: process rows in bounded batches so a
  * real pixel codec could amortize model/codec setup per batch), and the
  * partition-parallel execution. Full pixel resize/frame-sample kernels
  * stay out of scope (no media libraries in this container); the
  * test-only stand-ins that exercise `mapPayloadBatches` live in the
  * test sources.
  *
  * Fake container format (header parsed byte-for-byte — the PLUMBING is
  * real): magic "GFTM" | modality u8 | width u16 | height u16 |
  * channels u8 | sampleRate u32 | payload bytes.
  */
object Multimodal {

  val MAGIC: Array[Byte] = "GFTM".getBytes("ASCII")

  val metaSchema: StructType = StructType(Seq(
    StructField("modality", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("payload_bytes", IntegerType)))

  /** Deterministic payload builder: wraps arbitrary content bytes in the
    * fake container, with metadata derived from the content length so an
    * external oracle can recompute it. */
  def encodePayload(content: Array[Byte], modality: Byte): Array[Byte] = {
    val n = content.length
    val width = n % 64 + 1
    val height = n % 48 + 1
    val channels = 3
    val sampleRate = 16000
    val buf = ByteBuffer.allocate(4 + 1 + 2 + 2 + 1 + 4 + n)
    buf.put(MAGIC).put(modality)
      .putShort(width.toShort).putShort(height.toShort)
      .put(channels.toByte).putInt(sampleRate)
      .put(content)
    buf.array()
  }

  def modalityName(b: Byte): String = b match {
    case 0 => "image"; case 1 => "audio"; case 2 => "video"; case _ => "unknown"
  }

  /** Header decode — real byte parsing of the container. Returns null
    * for payloads without the magic (decoder-robustness path). */
  def decodeMeta(payload: Array[Byte]): Row = {
    if (payload == null || payload.length < 14 ||
        !payload.take(4).sameElements(MAGIC)) null
    else {
      val buf = ByteBuffer.wrap(payload, 4, payload.length - 4)
      val modality = modalityName(buf.get())
      val width = buf.getShort.toInt
      val height = buf.getShort.toInt
      val channels = buf.get().toInt
      val sampleRate = buf.getInt
      Row(modality, width, height, channels, sampleRate, payload.length - 14)
    }
  }

  /** Header decode over binary payloads — a native Catalyst expression
    * ([[graft.functions.MultimodalMeta]]): the fixed-offset byte parse
    * stays inside whole-stage codegen with column pruning intact; no
    * `df.rdd` boundary (which deserialized InternalRow→Row and measured
    * ~3× a comparable projection). `batchSize` is retained for API
    * compatibility; batching only matters for real decode kernels,
    * which run through [[mapPayloadBatches]]. */
  def decodeBatched(df: DataFrame, idCol: String, payloadCol: String,
      batchSize: Int = 64): DataFrame =
    df.select(col(idCol),
      graft.functions.MultimodalCodec.multimodal_meta(col(payloadCol)).as("meta"))

  /** Batched kernel runner — the `mapInPandas` analog for genuinely
    * swappable kernels (real codec/model calls that amortize setup per
    * batch). Runs through the TYPED Dataset API: column pruning happens
    * above the boundary and Tungsten encoders handle (de)serialization —
    * not `df.rdd`. The kernel sees `batchSize` payloads at a time and
    * must return one output payload per input. */
  def mapPayloadBatches(df: DataFrame, idCol: String, payloadCol: String,
      batchSize: Int = 64)(
      kernel: Seq[Array[Byte]] => Seq[Array[Byte]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val outs = kernel(batch.map(_._2))
          require(outs.length == batch.length,
            s"kernel returned ${outs.length} outputs for ${batch.length} inputs")
          batch.map(_._1).zip(outs)
        }
      }.toDF(idCol, payloadCol)
  }

  /** Deterministic feature-extraction stub: payload bytes → fixed-dim
    * float vector via seeded rolling hashes (stands in for an encoder
    * model; REAL pipelines swap this kernel, the surrounding plumbing —
    * binary in, Array[Float] out, batched — is what's being built). */
  def embedStub(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    if (payload == null) return null
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      val d = i % dim
      out(d) = out(d) * 31.0f + (payload(i) & 0xFF)
      out(d) = out(d) % 1000003.0f
      i += 1
    }
    out
  }

  /** End-to-end ingest: wrap a text column into container payloads —
    * used to build multimodal test tables from `documents`. Pure
    * projection through the codegen'd encode expression (no RDD). */
  def ingestFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      graft.functions.MultimodalCodec.multimodal_encode(
        col(idCol), col(textCol)).as("payload"))

  /** Near-duplicate IMAGE pairs by 64-bit perceptual dHash
    * ([[graft.functions.ImageDhash]]) — the multimodal member of the
    * dedup family, riding the exact machinery the text paths use:
    * band the hash into 4 × 16-bit blocks (pigeonhole: any two hashes
    * within hamming ≤ 3 share at least one block), equi-join block
    * buckets (skew-capped with drop accounting, like every band join
    * here), then filter by exact `bit_count(xor)`. Decode runs ONCE
    * per image inside the signature projection; the join carries
    * (id, hash) only — pixels never shuffle. */
  def imageNearDupPairs(df: DataFrame, bytesCol: String, idCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame =
    bandedHashPairs(
      df.select(col(idCol).as("id"),
        graft.functions.ImageCodec.image_dhash(col(bytesCol)).as("dh")),
      maxHamming, maxBucket, "image_dhash")

  /** [[imageNearDupPairs]] with the DCT hash
    * ([[graft.functions.ImagePhash]]) as the signature — catches
    * brightness-shifted / mildly blurred duplicates whose edge
    * structure (and therefore dHash) drifted; same banded machinery,
    * pixels never shuffle. Run BOTH and union for recall: the two
    * hashes fail on disjoint perturbation classes. */
  def imageNearDupPairsPhash(df: DataFrame, bytesCol: String, idCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame =
    bandedHashPairs(
      df.select(col(idCol).as("id"),
        graft.functions.ImageCodec.image_phash(col(bytesCol)).as("dh")),
      maxHamming, maxBucket, "image_phash")

  /** Near-duplicate AUDIO pairs by the 64-bit energy-contour
    * fingerprint ([[graft.functions.AudioFingerprint]]) — identical
    * banded machinery to [[imageNearDupPairs]]; decode runs once per
    * clip inside the signature projection, PCM never shuffles. */
  def audioNearDupPairs(df: DataFrame, bytesCol: String, idCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame =
    bandedHashPairs(
      df.select(col(idCol).as("id"),
        graft.functions.AudioCodec.audio_fingerprint(col(bytesCol)).as("dh")),
      maxHamming, maxBucket, "audio_fp")

  /** Shared 64-bit-hash near-dup machinery: band into 4 × 16-bit
    * blocks (pigeonhole: hamming ≤ 3 pairs share ≥ 1 block),
    * skew-capped block-bucket equi-join, exact `bit_count(xor)`
    * verify. */
  private def bandedHashPairs(hashes0: DataFrame, maxHamming: Int,
      maxBucket: Int, tag: String): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4x16-bit banding is exact only for hamming <= 3")
    val hashes = hashes0.filter(col("dh").isNotNull)
    val banded = Dedup.capBuckets(
      hashes.select(col("id"), col("dh"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("blk_no"),
            shiftright(col("dh"), b * 16).bitwiseAND(lit(0xFFFFL)).as("blk"))
        }: _*)).as("bb"))
        .select(col("id"), col("dh"), col("bb.blk_no"), col("bb.blk")),
      Seq("blk_no", "blk"), "id", maxBucket, tag)
    Dedup.bucketPairs(banded, Seq("blk_no", "blk"), "id", Seq("dh"),
        bounded = maxBucket > 0)
      .select(col("id1"), col("id2"),
        bit_count(col("dh1").bitwiseXOR(col("dh2"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id1", "id2")
  }
}
