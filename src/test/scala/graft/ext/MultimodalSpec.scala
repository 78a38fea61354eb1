package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world")).toDF("doc_id", "text")

  test("mediaTable: payload bytes + typed metadata struct") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("payload").dataType.typeName == "binary")
    val meta = m.select("meta.media_type", "meta.n_bytes", "meta.checksum")
      .head()
    assert(meta.getString(0) == "text/plain")
    assert(meta.getLong(1) == 11L)
    assert(meta.getString(2).length == 32)
  }

  test("extractFeatures: deterministic stub features in range") {
    val f = Multimodal.extractFeatures(Multimodal.mediaTable(docs)).head()
    val width = f.getAs[Int]("width")
    val height = f.getAs[Int]("height")
    assert(width >= 1 && width <= 64 && height >= 1 && height <= 64)
    val hist = f.getAs[scala.collection.Seq[Int]]("histogram")
    assert(hist.length == 4 && hist.forall(b => b >= 0 && b <= 255))
    // determinism: same input → same features
    val again = Multimodal.extractFeatures(Multimodal.mediaTable(docs)).head()
    assert(again.getAs[Int]("width") == width)
  }

  test("sampleBytes: strided byte extraction") {
    val out = Multimodal.mediaTable(docs)
      .select(Multimodal.sampleBytes(col("payload"), 4, 2).as("s"))
      .head().getSeq[Int](0)
    // "hello world" bytes: h=104, l=108 (positions 1 and 3, stride 2)
    assert(out == Seq(104, 108))
  }

  test("decodeBatched: mapPartitions batch path matches stub contract") {
    val out = Multimodal.decodeBatched(Multimodal.mediaTable(docs)).head()
    assert(out.getAs[Long]("n_bytes") == 11L)
    val w = out.getAs[Int]("width")
    assert(w >= 1 && w <= 64)
    val again = Multimodal.decodeBatched(Multimodal.mediaTable(docs)).head()
    assert(again.getAs[Int]("width") == w) // deterministic fake decode
  }

  test("REAL image arm: PNG encode→decode round-trips through the " +
    "JDK codec with exact features matching the render parameters") {
    val ids = Seq(1L, 2L, 17L, 255L, 100000L)
    val media = Multimodal.imageTable(
      ids.toDF("doc_id"))
    // payloads are genuine PNGs (magic bytes)
    val png = media.select("payload").head().getAs[Array[Byte]](0)
    assert(png.length > 8 &&
      (png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' &&
      png(3) == 'G', "not a PNG payload")
    val feats = Multimodal.decodeImages(media)
      .orderBy("media_id")
      .as[(Long, Int, Int, Long, Long, Long)].collect()
    assert(feats.length == ids.length)
    feats.foreach { case (id, w, h, sr, sg, sb) =>
      val (ew, eh, ra, ga, ba, rb, gb, bb) = Multimodal.renderParams(id)
      assert(w == ew && h == eh, s"id=$id size $w x $h vs $ew x $eh")
      val half = ew.toLong * (eh / 2)
      assert(sr == half * (ra + rb), s"id=$id sum_r")
      assert(sg == half * (ga + gb), s"id=$id sum_g")
      assert(sb == half * (ba + bb), s"id=$id sum_b")
    }
    // an undecodable payload raises instead of emitting garbage
    val bad = Seq((9L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "payload")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImages(bad).collect()
    }
  }

  test("resize: nearest-neighbor thumbnail round-trips through two " +
    "codec passes with exact band sums; non-divisible sizes sample " +
    "without drift") {
    val ids = Seq(5L, 33L, 47L) // widths 21/49/63 — none divisible by 8
    val thumbs = Multimodal.resizeImages(
      Multimodal.imageTable(ids.toDF("doc_id")), 8, 8)
    val feats = Multimodal.decodeImages(thumbs).orderBy("media_id")
      .as[(Long, Int, Int, Long, Long, Long)].collect()
    feats.foreach { case (id, w, h, sr, sg, sb) =>
      val (_, _, ra, ga, ba, rb, gb, bb) = Multimodal.renderParams(id)
      assert(w == 8 && h == 8)
      assert(sr == 32L * (ra + rb), s"id=$id sum_r")
      assert(sg == 32L * (ga + gb), s"id=$id sum_g")
      assert(sb == 32L * (ba + bb), s"id=$id sum_b")
    }
  }

  test("frame sampling: strided frames decode with exact per-frame " +
    "features; SKIPPED frames are never decoded (a corrupt odd frame " +
    "is harmless at stride 2, fatal at stride 1)") {
    val ids = Seq(3L, 4L)
    val out = Multimodal.sampleFrames(
      Multimodal.videoTable(ids.toDF("doc_id"), frames = 6), stride = 2)
      .as[(Long, Int, Int, Int, Long, Long, Long)].collect()
    assert(out.length == ids.length * 3)
    assert(out.forall(_._2 % 2 == 0), "sampled a non-stride frame")
    out.foreach { case (id, f, w, h, sr, _, _) =>
      val (ew, eh, ra, _, _, rb, _, _) =
        Multimodal.renderParams(id * 31 + f)
      assert(w == ew && h == eh)
      assert(sr == ew.toLong * (eh / 2) * (ra + rb))
    }

    // hand-built payload: frame 0 valid, frame 1 garbage — the skip
    // path must pass over the garbage by length prefix alone
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeInt(2)
    val good = Multimodal.renderPng(7L)
    dos.writeInt(good.length); dos.write(good)
    dos.writeInt(3); dos.write(Array[Byte](1, 2, 3))
    dos.flush()
    val vid = Seq((7L, bos.toByteArray)).toDF("media_id", "payload")
    assert(Multimodal.sampleFrames(vid, stride = 2).count() == 1)
    intercept[org.apache.spark.SparkException] {
      Multimodal.sampleFrames(vid, stride = 1).collect()
    }
  }

  test("REAL audio arm: WAV encode→decode round-trips through the JDK " +
    "codec with exact format fields and amplitude sums") {
    val ids = Seq(2L, 99L)
    val media = Multimodal.audioTable(ids.toDF("doc_id"))
    // payloads are genuine RIFF/WAVE files
    val wav = media.select("payload").head().getAs[Array[Byte]](0)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val feats = Multimodal.decodeAudio(media).orderBy("media_id")
      .as[(Long, Int, Int, Long, Long)].collect()
    feats.foreach { case (id, rate, ch, n, sumAbs) =>
      assert(rate == 8000 && ch == 1 && n == Multimodal.AudioSamples)
      val want = (0 until Multimodal.AudioSamples)
        .map(i => math.abs(Multimodal.audioSample(id, i)).toLong).sum
      assert(sumAbs == want, s"id=$id amplitude sum")
    }
  }

  test("media payload flows through relational ops untouched") {
    val m = Multimodal.mediaTable(docs)
    val joined = m.join(m.select(col("media_id"),
      col("meta.checksum").as("c2")), "media_id")
    val r = joined.select("payload", "c2").head()
    assert(new String(r.getAs[Array[Byte]](0), "UTF-8") == "hello world")
  }

  test("dHash: brightness twin collides at 0, jitter twin lands near, " +
    "bytes differ, and the decoded hash matches the closed form") {
    val ids = Seq(0L, 50L, 140L, 7L, 70L, 420L)
    val media = Multimodal.rampImageTable(ids.toDF("doc_id"))
    // 6 originals + 2 brightness twins (0, 50)
    //             + 4 jitter twins (0, 140, 70, 420)
    assert(media.count() == 12)
    val hashes = Multimodal.imageDHash(media)
      .as[(Long, String)].collect().toMap
    assert(hashes.size == 12 && hashes.values.forall(h =>
      h.length == 64 && h.forall(c => c == '0' || c == '1')))
    // closed-form recomputation (the oracle's definition, shift-free)
    def oracleHash(id: Long): String = {
      val (w, h, _, _, _, _) = Multimodal.rampParams(id)
      (for (y <- 0 until 8; x <- 0 until 8) yield {
        val sy = y * h / 8
        val g0 = Multimodal.rampGray(id, x * w / 9, sy)
        val g1 = Multimodal.rampGray(id, (x + 1) * w / 9, sy)
        if (g1 > g0) '1' else '0'
      }).mkString
    }
    hashes.foreach { case (id, dh) =>
      assert(dh == oracleHash(id), s"id=$id decoded hash != closed form")
    }
    def dist(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    // brightness twin: different payload bytes, identical hash
    val checksums = media
      .select(col("media_id"), col("meta.checksum")).as[(Long, String)]
      .collect().toMap
    Seq(0L, 50L).foreach { id =>
      val twin = id + Multimodal.RampBrightTwin
      assert(checksums(id) != checksums(twin),
        s"brightness twin of $id has identical bytes")
      assert(dist(hashes(id), hashes(twin)) == 0,
        s"brightness twin of $id not hash-identical")
    }
    // jitter twin: small distance — the a+1 re-render only moves the
    // mod-wrap positions, so few (sometimes zero) sampled gradient
    // signs flip; ids 70 and 420 are fixture points where some DO
    Seq(0L, 140L, 70L, 420L).foreach { id =>
      val twin = id + Multimodal.RampJitterTwin
      val d = dist(hashes(id), hashes(twin))
      assert(d <= 6, s"jitter twin of $id at distance $d")
    }
    Seq(70L, 420L).foreach { id =>
      val d = dist(hashes(id), hashes(id + Multimodal.RampJitterTwin))
      assert(d > 0, s"jitter twin of $id unexpectedly hash-identical")
    }
    // unrelated images are far apart
    assert(dist(hashes(7L), hashes(140L)) > 6)
  }

  test("dhashPairs finds the planted twins through prefix buckets and " +
    "reports exact Hamming distances") {
    val ids = (0L until 60L).toSeq
    val media = Multimodal.rampImageTable(ids.toDF("doc_id"))
    val pairs = Multimodal.dhashPairs(Multimodal.imageDHash(media), 6)
      .as[(Long, Long, Int)].collect()
    // the brightness twin of 0 and of 50 must be found at distance 0
    Seq(0L, 50L).foreach { id =>
      assert(pairs.exists(p =>
        p._1 == id && p._2 == id + Multimodal.RampBrightTwin && p._3 == 0),
        s"missing brightness pair for $id")
    }
    // every reported pair's distance is the true string distance
    val hs = Multimodal.imageDHash(media).as[(Long, String)]
      .collect().toMap
    pairs.foreach { case (a, b, d) =>
      assert(hs(a).zip(hs(b)).count(p => p._1 != p._2) == d)
    }
  }
}
