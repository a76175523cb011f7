package graft.operators

import java.nio.ByteBuffer

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Test-only stand-in kernels exercising the [[Multimodal]] plumbing
  * (real pixel codecs are out of scope in this container — see the
  * real-format header decode in [[graft.functions.ImageCodec]]). */
object MultimodalTestKernels {
  /** Rewrites the container header dims and truncates the payload
    * proportionally — enough to drive `mapPayloadBatches` end-to-end. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val meta = Multimodal.decodeMeta(payload)
    if (meta == null) null
    else {
      val content = payload.drop(14)
      val scale = math.min(1.0,
        (w.toDouble * h) / math.max(1, meta.getInt(1) * meta.getInt(2)))
      val kept = content.take(math.max(1, (content.length * scale).toInt))
      val buf = ByteBuffer.allocate(14 + kept.length)
      buf.put(Multimodal.MAGIC).put(payload(4))
        .putShort(w.toShort).putShort(h.toShort)
        .put(payload(9)).putInt(ByteBuffer.wrap(payload, 10, 4).getInt)
        .put(kept)
      buf.array()
    }
  }

  /** Treats the content as fixed-size frames, keeps every `everyN`-th. */
  def frameSampleStub(payload: Array[Byte], frameBytes: Int, everyN: Int): Array[Byte] = {
    if (payload == null || payload.length < 14) null
    else {
      val content = payload.drop(14)
      val kept = content.grouped(frameBytes).zipWithIndex
        .collect { case (f, i) if i % everyN == 0 => f }
        .flatten.toArray
      payload.take(14) ++ kept
    }
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  test("ingest → batched decode: metadata round-trips through the container") {
    val docs = graft.Tables.load(spark, sfDir, "documents").limit(50)
    val media = Multimodal.ingestFromText(docs, "doc_id", "text")
    val decoded = Multimodal.decodeBatched(media, "doc_id", "payload", batchSize = 16)
    assert(decoded.count() == 50)
    val joined = decoded.join(docs, "doc_id")
      .select(col("doc_id"), col("meta.width"), col("meta.payload_bytes"),
        length(col("text")).cast("int").as("text_len"))
      .collect()
    joined.foreach { r =>
      val textLen = r.getInt(3)
      assert(r.getInt(1) == textLen % 64 + 1)    // width formula
      assert(r.getInt(2) == textLen)             // payload bytes = utf8 len (ascii corpus)
    }
  }

  test("decode robustness: garbage payload → null meta") {
    val df = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    val out = Multimodal.decodeBatched(df, "id", "payload").collect()
    assert(out(0).isNullAt(1))
  }

  test("resize stub rewrites header dims; frame sampler keeps every Nth frame") {
    val p = Multimodal.encodePayload(Array.fill[Byte](100)(7), 0)
    val resized = MultimodalTestKernels.resizeStub(p, 4, 4)
    val meta = Multimodal.decodeMeta(resized)
    assert(meta.getInt(1) == 4 && meta.getInt(2) == 4)
    assert(meta.getInt(5) < 100) // payload truncated proportionally

    val video = Multimodal.encodePayload(Array.tabulate[Byte](40)(_.toByte), 2)
    val sampled = MultimodalTestKernels.frameSampleStub(video, frameBytes = 10, everyN = 2)
    assert(sampled.length == 14 + 20) // frames 0 and 2 of 4 kept
  }

  test("decodeBatched is a pure projection: no RDD boundary in the plan") {
    val docs = graft.Tables.load(spark, sfDir, "documents").limit(10)
    val media = Multimodal.ingestFromText(docs, "doc_id", "text")
    val decoded = Multimodal.decodeBatched(media, "doc_id", "payload")
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan ExistingRDD"), s"RDD boundary leaked:\n$plan")
    assert(plan.contains("multimodal_meta") || plan.contains("Project"))
  }

  test("mapPayloadBatches runs a swappable kernel in bounded batches") {
    val docs = graft.Tables.load(spark, sfDir, "documents").limit(30)
    val media = Multimodal.ingestFromText(docs, "doc_id", "text")
    val resized = Multimodal.mapPayloadBatches(media, "doc_id", "payload",
      batchSize = 8) { batch =>
      // executes on executors: oversized batches fail the job itself
      require(batch.nonEmpty && batch.length <= 8,
        s"kernel saw batch of ${batch.length}")
      batch.map(p => MultimodalTestKernels.resizeStub(p, 4, 4))
    }
    val metas = Multimodal.decodeBatched(resized, "doc_id", "payload")
      .select("meta.width", "meta.height").collect()
    assert(metas.length == 30)
    assert(metas.forall(r => r.getInt(0) == 4 && r.getInt(1) == 4))
  }

  test("embed stub: deterministic fixed-dim vectors, distributed") {
    val docs = graft.Tables.load(spark, sfDir, "documents").limit(20)
    val media = Multimodal.ingestFromText(docs, "doc_id", "text")
    val embedded = media.rdd.map { r =>
      (r.getLong(0), Multimodal.embedStub(r.getAs[Array[Byte]](1)).toSeq)
    }.collect().toMap
    assert(embedded.size == 20)
    assert(embedded.values.forall(_.size == 8))
    // deterministic: same input → same vector
    val again = media.rdd.map { r =>
      (r.getLong(0), Multimodal.embedStub(r.getAs[Array[Byte]](1)).toSeq)
    }.collect().toMap
    assert(embedded == again)
  }
}
