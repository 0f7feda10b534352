package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Multimodal

/**
 * The typed mapPartitions decode path must compute exactly what the pure
 * column-expression twin computes — proving the Spark-side plumbing
 * (schema, partitioning, batch shape) is faithful regardless of which
 * engine path runs. Image decode is REAL (javax.imageio, lossless PNG
 * round trip pinned below), audio decode is REAL (javax.sound.sampled WAV
 * round trip), and video frame sampling strides a frame container decoding
 * only the selected frames (skipped frames are proven never decoded).
 */
class MultimodalSpec extends SparkSpec {

  test("mapPartitions features == column-expression features, row for row") {
    val media = Multimodal.mediaTable(Tables.load(spark, sf, "documents"))
    val typed = Multimodal.decodeFeatures(spark, media, partitions = 8).toDF()
      .withColumn("frame_offsets", col("frame_offsets").cast("array<string>"))
    val sql = Multimodal.featuresSql(media)
      .withColumn("frame_offsets", col("frame_offsets").cast("array<string>"))
      .withColumn("head_byte", col("head_byte").cast("int"))
    assert(typed.count() > 0)
    assert(typed.exceptAll(sql).isEmpty && sql.exceptAll(typed).isEmpty)
  }

  test("media envelope: binary payload with typed metadata, stable buckets") {
    val media = Multimodal.mediaTable(Tables.load(spark, sf, "documents"))
    val f = media.schema("payload")
    assert(f.dataType === org.apache.spark.sql.types.BinaryType)
    assert(media.select("kind").distinct().count() === 3)
    // deterministic partitioning: same id bucket on every run
    val a = Multimodal.decodeFeatures(spark, media, partitions = 4)
      .select("media_id", "phash")
    val b = Multimodal.decodeFeatures(spark, media, partitions = 16)
      .select("media_id", "phash")
    assert(a.exceptAll(b).isEmpty, "partition count must not change results")
  }

  test("real PNG decode recovers exact encoded pixels (hand-computed case)") {
    // id=0: w=8, h=8; pixel (x,y) = (3x+7y, 5x+y, x+11y) mod 256 — compute
    // the expected stats directly in scala and demand the full ImageIO
    // round trip reproduce them.
    var lumaSum = 0L; var dark = 0L; var bright = 0L; var pix = 0L
    for (y <- 0 until 8; x <- 0 until 8) {
      val (r, g, b) = ((3 * x + 7 * y) % 256, (5 * x + y) % 256, (x + 11 * y) % 256)
      val luma = (299 * r + 587 * g + 114 * b) / 1000
      lumaSum += luma
      if (luma < 64) dark += 1
      if (luma >= 192) bright += 1
      pix += r + g + b
    }
    import spark.implicits._
    val images = Seq(0L).toDF("doc_id")
    val got = Multimodal.decodeImageFeatures(
      spark, Multimodal.pngTable(spark, images)).collect().head
    assert(got.width === 8 && got.height === 8 && got.channels === 3)
    assert(got.mean_luma === lumaSum / 64 && got.n_dark === dark)
    assert(got.n_bright === bright && got.pix_sum === pix)
  }

  test("decode also handles JPEG-encoded payloads (dims/channels)") {
    // the decoder is format-agnostic: a JPEG payload (lossy, so only
    // dimensions and channel count are pinned) decodes through the same path
    val img = new java.awt.image.BufferedImage(
      12, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 5; x <- 0 until 12) img.setRGB(x, y, (x * 20 << 16) | (y * 50))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    import spark.implicits._
    val df = Seq((7L, bos.toByteArray)).toDF("media_id", "payload")
    val got = Multimodal.decodeImageFeatures(spark, df).collect().head
    assert(got.media_id === 7L && got.width === 12 && got.height === 5)
    assert(got.channels === 3)
  }

  test("real WAV decode recovers exact encoded samples (hand-computed cases)") {
    import spark.implicits._
    // ids 0 and 9: recompute the closed form directly and demand the full
    // AudioSystem round trip (header parse + PCM read) reproduce it
    for (id <- Seq(0L, 9L)) {
      val n = 240 + (id % 64).toInt
      var sumAbs = 0L; var sumSq = 0L; var zc = 0L; var prev = 0
      for (i <- 0 until n) {
        val s = (((id * 31 + i * 17) % 65536) - 32768).toInt
        sumAbs += math.abs(s.toLong); sumSq += s.toLong * s
        if (i > 0 && (s >= 0) != (prev >= 0)) zc += 1
        prev = s
      }
      val got = Multimodal.decodeAudioFeatures(
        spark, Multimodal.wavTable(spark, Seq(id).toDF("doc_id"))).collect().head
      assert(got.sample_rate === 8000 && got.channels === 1 && got.bits === 16)
      assert(got.n_frames === n.toLong, s"id=$id")
      assert(got.sum_abs === sumAbs && got.sum_sq === sumSq, s"id=$id")
      assert(got.zero_cross === zc, s"id=$id")
    }
  }

  test("stereo WAV zero-cross strides by channel: interleaving never counts as a crossing") {
    import spark.implicits._
    // 2-channel clip where ch0 alternates sign every frame (n-1 crossings)
    // and ch1 stays positive (0 crossings). An interleaved walk would see a
    // sign flip at nearly every adjacent SAMPLE (ch0 +, ch1 +, ch0 -, ...);
    // the per-channel walk must report exactly n-1.
    val n = 100
    val pcm = new Array[Byte](n * 2 * 2)
    for (f <- 0 until n) {
      val s0 = if (f % 2 == 0) 1000 else -1000
      val s1 = 500
      pcm(4 * f) = (s0 & 0xff).toByte; pcm(4 * f + 1) = ((s0 >> 8) & 0xff).toByte
      pcm(4 * f + 2) = (s1 & 0xff).toByte; pcm(4 * f + 3) = ((s1 >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val df = Seq((42L, bos.toByteArray)).toDF("media_id", "payload")
    val got = Multimodal.decodeAudioFeatures(spark, df).collect().head
    assert(got.channels === 2 && got.n_frames === n.toLong)
    assert(got.zero_cross === (n - 1).toLong)
    assert(got.sum_abs === n.toLong * 1000 + n.toLong * 500)
  }

  test("video sampling decodes only selected frames: corrupt skipped frame is never touched") {
    import spark.implicits._
    // container with 3 frames where frame 1 (odd, skipped at stride=2) is
    // garbage: stride sampling must succeed BECAUSE it never decodes it,
    // and must emit exactly frames 0 and 2
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeInt(0x47465631); dos.writeInt(3)
    val f0 = Multimodal.syntheticPng(500L); dos.writeInt(f0.length); dos.write(f0)
    val junk = Array.fill[Byte](37)(0x5a); dos.writeInt(junk.length); dos.write(junk)
    val f2 = Multimodal.syntheticPng(502L); dos.writeInt(f2.length); dos.write(f2)
    val df = Seq((5L, bos.toByteArray)).toDF("media_id", "payload")
    val got = Multimodal.sampleVideoFrames(spark, df, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq === Seq(0, 2))
    // frame features equal a direct single-image decode of the same pixels
    for ((fr, fid) <- got.zip(Seq(500L, 502L))) {
      val direct = Multimodal.decodeImageFeatures(
        spark, Multimodal.pngTable(spark, Seq(fid).toDF("doc_id"))).collect().head
      assert(fr.width === direct.width && fr.height === direct.height)
      assert(fr.mean_luma === direct.mean_luma && fr.pix_sum === direct.pix_sum)
    }
    // stride=1 DOES decode the corrupt frame and must fail loudly
    intercept[org.apache.spark.SparkException] {
      Multimodal.sampleVideoFrames(spark, df, stride = 1).collect()
    }
  }

  test("undecodable payload fails loudly, not silently") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImageFeatures(spark, df).collect()
    }
    assert(e.getMessage != null)
  }
}
