package graft

import graft.multimodal.Media

/** Multimodal plumbing: schema, batch iteration, determinism. */
class MediaSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("media features are deterministic and kind-complete") {
    val a = Media.mediaFeatureQuery(spark, dir).collect().map(_.toString).toSeq
    val b = Media.mediaFeatureQuery(spark, dir).collect().map(_.toString).toSeq
    assert(a == b)
    assert(a.size == 3) // image, audio, video
  }

  test("histogram accounts for every payload byte; thumb/frames rules hold") {
    import spark.implicits._
    val feats = Media.extractFeatures(Media.synthMedia(spark, dir), batchSize = 7).collect()
    assert(feats.nonEmpty)
    for (f <- feats) {
      assert(f.luma_hist.sum == f.n_bytes, s"media ${f.media_id}")
      assert(f.frames_sampled >= 1)
      if (f.kind == "image") {
        assert(f.thumb_w == 128 && f.thumb_h > 0 && f.thumb_h <= 128)
      }
      if (f.kind == "audio") assert(f.thumb_w == 0 && f.thumb_h == 0)
    }
  }

  test("frame sampling partitions each payload exactly, once per sampled frame") {
    import spark.implicits._
    val media = Media.synthMedia(spark, dir).collect()
    val frames = Media.sampleFrames(Media.synthMedia(spark, dir), batchSize = 5)
      .collect().groupBy(_.media_id)
    assert(frames.nonEmpty)
    for (m <- media) {
      val fs = frames(m.media_id).sortBy(_.frame_idx)
      // count follows the sampling rule; indices are dense from 0
      assert(fs.length == Media.framesToSample(m.kind, m.meta))
      assert(fs.map(_.frame_idx).toSeq == (0L until fs.length.toLong))
      // the slices tile the payload: byte counts sum exactly
      assert(fs.map(_.frame_bytes).sum == m.payload.length.toLong, s"media ${m.media_id}")
      // timestamps follow the per-kind stride
      val stride = m.kind match { case "video" => 10000L; case "audio" => 30000L; case _ => 0L }
      assert(fs.forall(f => f.frame_ts_ms == f.frame_idx * stride))
      // single-frame media fingerprint the whole payload
      if (fs.length == 1) {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(m.payload).map(b => f"$b%02x").mkString
        assert(fs.head.frame_md5 == hex)
      }
    }
  }

  test("batch size does not change results (mapInPandas-shape invariance)") {
    import spark.implicits._
    val m = Media.synthMedia(spark, dir)
    def key(f: Media.MediaFeatures) =
      (f.media_id, f.kind, f.n_bytes, f.luma_hist.toSeq, f.mean_luma,
        f.frames_sampled, f.thumb_w, f.thumb_h)
    val a = Media.extractFeatures(m, batchSize = 3).collect().sortBy(_.media_id).map(key)
    val b = Media.extractFeatures(m, batchSize = 200).collect().sortBy(_.media_id).map(key)
    assert(a.toSeq == b.toSeq)
  }
}
