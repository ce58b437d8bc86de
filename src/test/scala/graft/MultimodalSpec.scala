package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Multimodal, Tables}

/** Pins the multimodal plumbing: typed Dataset schema, per-partition feature
  * extraction, stub-decode determinism. */
class MultimodalSpec extends AnyFunSuite with SharedSparkSpec {

  test("media pipeline: binary payloads → per-partition features") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.asMedia(spark, docs)
    val feats = Multimodal.extractFeatures(media).cache()

    assert(feats.count() == docs.count())
    val f = feats.filter(_.doc_id == 0).head()
    val text = docs.filter("doc_id = 0").head().getAs[String]("text")
    assert(f.n_bytes == text.getBytes("UTF-8").length)
    assert(f.checksum == text.getBytes("UTF-8").take(8).map(_ & 0xff).sum)
    val (w, h, fr) = Multimodal.decodeStub(text.getBytes("UTF-8"))
    assert(f.width == w && f.height == h && f.n_frames == fr)
    assert(f.width >= 1 && f.width <= 64 && f.n_frames >= 1 && f.n_frames <= 10)
  }

  test("repartition by byte budget keeps batches balanced") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.asMedia(spark, docs).repartition(8)
    val perPart = media.rdd.mapPartitions(it => Iterator(it.map(_.payload.length).sum)).collect()
    assert(perPart.length == 8)
    assert(perPart.sum > 0)
  }
}
