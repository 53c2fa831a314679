package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal asset: opaque bytes + typed metadata. */
final case class Asset(assetId: Long, kind: String, bytes: Array[Byte],
                       declaredWidth: Int, declaredHeight: Int)

/** Extracted features (what a real image/audio decoder would emit). */
final case class AssetFeatures(assetId: Long, kind: String, byteLen: Int,
                               sha: String, width: Int, height: Int,
                               frameCount: Int, meanLuma: Double)

/** Multimodal-column plumbing: images/audio/video as opaque `binary`
  * columns with typed metadata, decoded batch-wise inside
  * `mapPartitions` (the Scala analogue of `mapInPandas`: one iterator
  * per partition, decoder state amortized across the batch).
  *
  * The decode step is STUBBED (no image/audio libs in this container):
  * [[FakeDecoder]] derives deterministic pseudo-features from the
  * bytes. The Spark-side plumbing — binary schema, partition sizing,
  * batch iteration, feature schema — is real and tested; swap
  * `FakeDecoder.decode` for a JNI/VM decoder to go live.
  */
object Multimodal {

  /** Deterministic stand-in for a real decoder. */
  object FakeDecoder extends Serializable {
    def decode(a: Asset): AssetFeatures = {
      val h = graft.index.Sha.digest(a.bytes)
      def u8(i: Int): Int = h(i) & 0xff
      AssetFeatures(
        assetId = a.assetId,
        kind = a.kind,
        byteLen = a.bytes.length,
        sha = graft.index.Sha.toHex(h),
        width = if (a.declaredWidth > 0) a.declaredWidth else 16 + u8(0),
        height = if (a.declaredHeight > 0) a.declaredHeight else 16 + u8(1),
        frameCount = if (a.kind == "video") 1 + u8(2) % 32 else 1,
        meanLuma = (u8(3) * 256 + u8(4)).toDouble / 65535.0)
    }
  }

  /** Wrap a text table as binary assets (the test-fixture path; in
    * production this is `spark.read.format("binaryFile")` or an
    * Iceberg table with a binary column). */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("assetId"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"),
      lit(0).as("declaredWidth"), lit(0).as("declaredHeight"))

  /** Batch feature extraction: one decoder per partition, streaming
    * iterator (never materializes a partition in memory). */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it => it.map(FakeDecoder.decode) }
  }

  /** Uniform frame sampling plan for video assets: (assetId, frameIdx)
    * without decoding — the explode the real pipeline feeds to a frame
    * decoder. */
  def sampleFrames(spark: SparkSession, features: Dataset[AssetFeatures],
                   everyN: Int): DataFrame = {
    features.toDF()
      .where(col("kind") === "video")
      .select(col("assetId"),
        explode(sequence(lit(0), col("frameCount") - 1,
          lit(everyN))).as("frameIdx"))
  }
}
